"""Matrix-free variational Stokes operators on the MAC grid.

TPU-native re-design of the reference's sparse triplet assembly
(exec/HDK_PolyStokesSolver_ConstructMatrixBlocks.cpp): instead of building
CSR matrices, we precompute *coefficient fields* (the stencil weights,
gated by the activity masks) and apply G / Dt and their transposes as
masked shift-and-multiply passes that XLA fuses into a handful of
bandwidth-bound kernels.

DOF families (matching the reference layout, ConstructMatrixBlocks.cpp:12-21):
  * velocity:   3 face arrays (active faces)
  * pressure:   cell array (active cells)
  * stress:     3 center arrays (tau_xx, tau_yy, tau_zz on active cells) +
                3 edge arrays (tau_yz, tau_xz, tau_xy on active/boundary
                edges)
  * reduced:    [R, D] region coefficients (D = 26 quadratic / 11 affine)

Stencil rules (ConstructMatrixBlocks.cpp:393-640):
  * G[face, cell]   = sign(dir) * faceFluidW * centerLiquidW / dx
  * Dt[face, cellstress_a] = -sign * faceFluidW * centerLiquidW / dx
  * Dt[face, edgestress]   = -sign * faceFluidW * edgeLiquidW / dx
  * Mc[face]  = clamp(faceFluidW * faceLiquidW, MINWEIGHT^2, 1) * rho
  * uInv: centers  invVisc * clamp(vw, 1e-2, 1),  vw = clamp(fw, MINWEIGHT, 1) * lw
          edges 2 * invVisc * vw
  (invVisc itself clamped to [0, 1e10]; u uses clamp(1/vw, 0, 1e2).)
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from .config import MINWEIGHT, SolverParams
from .classify import Classification, is_active
from .grid import Grid


# ---------------------------------------------------------------------------
# Shape-conversion views between families
# ---------------------------------------------------------------------------

def _slice_ax(a, axis, start, length):
    s = [slice(None)] * a.ndim
    s[axis] = slice(start, start + length)
    return a[tuple(s)]


def cell_at_face(cell_arr, axis, direction, fill=0.0):
    """Face-shaped view of a cell array: the cell on side `direction`
    (0 = lower, at face index - 1; 1 = upper, at face index).  Out-of-range
    cells are `fill` (reference OOB checks, ConstructMatrixBlocks.cpp:401)."""
    n = cell_arr.shape[axis]
    pad = [(0, 0)] * 3
    pad[axis] = (1, 1)
    p = jnp.pad(cell_arr, pad, constant_values=fill)
    # face index f in [0, n]; dir 1 -> cell f -> p[f+1]; dir 0 -> cell f-1 -> p[f]
    return _slice_ax(p, axis, direction, n + 1)


def face_at_cell(face_arr, axis, direction):
    """Cell-shaped view of a face array: the cell's face on side
    `direction` (0 = lower face, index == cell; 1 = upper, index+1)."""
    n = face_arr.shape[axis] - 1
    return _slice_ax(face_arr, axis, direction, n)


def edge_at_face(edge_arr, face_axis, edge_axis, direction):
    """Face-shaped view of an edge array: edge = face + direction * e_t with
    t = 3 - face_axis - edge_axis (faceToEdgeMap)."""
    t = 3 - face_axis - edge_axis
    n_t = edge_arr.shape[t] - 1
    return _slice_ax(edge_arr, t, direction, n_t)


def scatter_face_to_edge(face_vals, face_axis, edge_axis, direction):
    """Edge-shaped accumulation view: value from face = edge - direction*e_t.

    Inverse of `edge_at_face`: pad the face-shaped array with one zero
    plane along t (at the end for direction 0, at the start for 1)."""
    t = 3 - face_axis - edge_axis
    pad = [(0, 0)] * 3
    pad[t] = (1, 0) if direction == 1 else (0, 1)
    return jnp.pad(face_vals, pad, constant_values=0.0)


# ---------------------------------------------------------------------------
# Assembled operator state
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PTau:
    """A (pressure, stress) vector: the solve variable of the default
    pressure-stress scheme."""

    p: jnp.ndarray  # (nx,ny,nz)
    tc: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # tau_xx/yy/zz
    te: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # tau_yz/xz/xy

    def __add__(self, o):
        return jax.tree.map(jnp.add, self, o)

    def __sub__(self, o):
        return jax.tree.map(jnp.subtract, self, o)

    def scale(self, a):
        return jax.tree.map(lambda x: a * x, self)

    def dot(self, o) -> jnp.ndarray:
        parts = [jnp.vdot(self.p, o.p)]
        parts += [jnp.vdot(x, y) for x, y in zip(self.tc, o.tc)]
        parts += [jnp.vdot(x, y) for x, y in zip(self.te, o.te)]
        return sum(parts)

    @staticmethod
    def zeros_like(x: "PTau") -> "PTau":
        return jax.tree.map(jnp.zeros_like, x)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Assembled:
    """Everything the matrix-free apply needs; built once per step."""

    # scalars
    dt: jnp.ndarray
    inv_dx: jnp.ndarray

    # gated weight fields (the stencil coefficients factor as products of
    # these; storing the factors instead of 18 per-face coefficient arrays
    # cuts persistent memory and per-iteration HBM reads):
    #   G/Dt cell coeff at face f, side d = ffw[a][f] * clw_s[cell_d(f)]
    #   Dt edge coeff                    = ffw[a][f] * elw_s[e][edge_d(f)]
    clw_s: jnp.ndarray  # active-gated center liquid weight / dx
    elw_s: Tuple[jnp.ndarray, ...]  # active-gated edge liquid weights / dx
    ffw: Tuple[jnp.ndarray, ...]  # face fluid weights

    # diagonals
    mc: Tuple[jnp.ndarray, ...]
    mc_inv: Tuple[jnp.ndarray, ...]
    uinv_c: jnp.ndarray  # center stress inverse-viscosity diag (xx=yy=zz)
    u_c: jnp.ndarray
    uinv_e: Tuple[jnp.ndarray, ...]
    u_e: Tuple[jnp.ndarray, ...]

    # right-hand sides
    b_v: Tuple[jnp.ndarray, ...]  # face: vel * vol * rho (active)
    old_v: Tuple[jnp.ndarray, ...]  # face: old velocity (active)
    rhs_solid: PTau  # pressureRHS / stressRHS solid-velocity terms

    # reduced-region data
    com: jnp.ndarray  # [R, 3] center of mass, cell units
    binv: jnp.ndarray  # [R, D, D]  inv(Mr/dt + 2 * Vr)
    mr: jnp.ndarray  # [R, D, D]
    vr: jnp.ndarray  # [R, D, D] interior Galerkin viscosity
    best_fit: jnp.ndarray  # [R, D]
    b_w: jnp.ndarray  # [R, D] = Mr @ best_fit
    region_valid: jnp.ndarray  # [R] bool

    # classification (regions needed by the apply)
    face_region: Tuple[jnp.ndarray, ...]


def _mask(x, dtype):
    return x.astype(dtype)


def build_gated_weights(grid: Grid, cls: Classification, liquid_w, fluid_w, params: SolverParams):
    """Gated weight factor fields (see Assembled docstring)."""
    dtype = params.dtype
    inv_dx = jnp.asarray(1.0 / grid.dx, dtype)
    cell_active = is_active(cls.cell_labels)
    clw_s = jnp.where(cell_active, liquid_w["center"], 0.0).astype(dtype) * inv_dx
    elw_s = tuple(
        jnp.where(is_active(cls.edge_labels[e]), liquid_w[f"edge{e}"], 0.0).astype(dtype) * inv_dx
        for e in range(3)
    )
    ffw = tuple(fluid_w[f"face{a}"].astype(dtype) for a in range(3))
    return clw_s, elw_s, ffw


def coeff_fields(asm: "Assembled", a: int):
    """Materialize the per-face stencil coefficient arrays for axis `a`
    (used by setup-time consumers: solid RHS, diagonal preconditioner,
    explicit export).  (c_lo, c_hi, {e: (elo, ehi)})."""
    c_lo = asm.ffw[a] * cell_at_face(asm.clw_s, a, 0)
    c_hi = asm.ffw[a] * cell_at_face(asm.clw_s, a, 1)
    erow = {}
    for e in range(3):
        if e == a:
            continue
        erow[e] = (
            asm.ffw[a] * edge_at_face(asm.elw_s[e], a, e, 0),
            asm.ffw[a] * edge_at_face(asm.elw_s[e], a, e, 1),
        )
    return c_lo, c_hi, erow


def build_diagonals(grid: Grid, cls: Classification, liquid_w, fluid_w, viscosity_c, viscosity_e, params: SolverParams):
    """Mass and stress diagonals (ConstructMatrixBlocks.cpp:361-391,650-867)."""
    dtype = params.dtype
    rho = jnp.asarray(params.effective_density, dtype)

    mc, mc_inv = [], []
    for a in range(3):
        vol = fluid_w[f"face{a}"].astype(dtype) * liquid_w[f"face{a}"].astype(dtype)
        vol = jnp.clip(vol, MINWEIGHT * MINWEIGHT, 1.0)
        m = _mask(is_active(cls.face_labels[a]), dtype)
        mc.append(vol * rho * m)
        mc_inv.append(m / (vol * rho))

    inv_visc_c = jnp.clip(1.0 / viscosity_c.astype(dtype), 0.0, 1e10)
    vw_c = jnp.clip(fluid_w["center"].astype(dtype), MINWEIGHT, 1.0) * liquid_w["center"].astype(dtype)
    mctr = _mask(is_active(cls.cell_labels), dtype)
    uinv_c = inv_visc_c * jnp.clip(vw_c, 1e-2, 1.0) * mctr
    u_c = viscosity_c.astype(dtype) * jnp.clip(jnp.where(vw_c > 0, 1.0 / jnp.maximum(vw_c, 1e-30), 1e2), 0.0, 1e2) * mctr

    uinv_e, u_e = [], []
    for e in range(3):
        inv_visc = jnp.clip(1.0 / viscosity_e[e].astype(dtype), 0.0, 1e10)
        vw = jnp.clip(fluid_w[f"edge{e}"].astype(dtype), MINWEIGHT, 1.0) * liquid_w[f"edge{e}"].astype(dtype)
        m = _mask(is_active(cls.edge_labels[e]), dtype)
        uinv_e.append(2.0 * inv_visc * vw * m)
        u_e.append(0.5 * viscosity_e[e].astype(dtype) * jnp.clip(jnp.where(vw > 0, 1.0 / jnp.maximum(vw, 1e-30), 1e2), 0.0, 1e2) * m)
    return tuple(mc), tuple(mc_inv), uinv_c, u_c, tuple(uinv_e), tuple(u_e)


# ---------------------------------------------------------------------------
# Forward stencil: s[face] = (G p + Dt tau)[face]  (on ALL in-system faces;
# callers apply the active/reduced masks)
# ---------------------------------------------------------------------------

def forward_face_values(asm: Assembled, x: PTau):
    """s[face] = (G p + Dt tau)[face].  Factored form: the cell-side
    weight multiplies at the source cell/edge, the face weight at the
    face, so each gated field is read once."""
    g = [asm.clw_s * (x.p - x.tc[a]) for a in range(3)]
    h = [asm.elw_s[e] * x.te[e] for e in range(3)]
    s = []
    for a in range(3):
        v = cell_at_face(g[a], a, 1) - cell_at_face(g[a], a, 0)
        for e in range(3):
            if e == a:
                continue
            v = v + edge_at_face(h[e], a, e, 0) - edge_at_face(h[e], a, e, 1)
        s.append(asm.ffw[a] * v)
    return s


def transpose_from_faces(asm: Assembled, f) -> PTau:
    """(p, tau) accumulation of [G Dt]^T applied to face values `f`.
    Factored like the forward pass: the face weight multiplies at the
    face, the cell/edge weight once at the target."""
    p_out = jnp.zeros_like(asm.clw_s)
    tc_out = []
    te_acc = [jnp.zeros_like(asm.elw_s[e]) for e in range(3)]
    for a in range(3):
        w = asm.ffw[a] * f[a]
        d = face_at_cell(w, a, 0) - face_at_cell(w, a, 1)  # lower face (+) - upper face (-)
        p_out = p_out + d
        tc_out.append(-asm.clw_s * d)
        for e in range(3):
            if e == a:
                continue
            te_acc[e] = te_acc[e] + scatter_face_to_edge(w, a, e, 0) - scatter_face_to_edge(w, a, e, 1)
    p_out = asm.clw_s * p_out
    te_out = tuple(asm.elw_s[e] * te_acc[e] for e in range(3))
    return PTau(p=p_out, tc=tuple(tc_out), te=te_out)
