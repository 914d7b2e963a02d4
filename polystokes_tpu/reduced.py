"""Per-region polynomial reduction: COM, least-squares fits, reduced mass
and interior-viscosity Galerkin matrices, and the J coupling operators.

TPU-native re-design of the reference's threaded per-region sweeps
(exec/HDK_PolyStokesSolver.cpp:1275-1909 and _AssembleBlocks.cpp): thread-
local accumulation + serial merge becomes batched segmented reductions
into dense [R, D, D] tensors, and the per-region 26x26 LU factorizations
(fullPivLu / .inverse()) become batched solves on the MXU.

Key algebraic simplification (exactly equivalent to the reference's
pair-wise sweep, buildReducedViscosityMatrixSystemsInteriorOnly,
Solver.cpp:1485-1694): summing the reference's 4 (cell) / 16 (edge)
ordered stencil pairs per stress sample gives rank-1 outer products,

  V_r  =  sum_{reduced cells}    (mu_c / dx^2)       * d_c d_c^T
        + sum_{interior edges} 0.5 (mu_e / dx^2)     * u_e u_e^T

with d_c = c(upper face) - c(lower face) and u_e the signed sum of the 4
surrounding faces' basis rows.  This is the Galerkin projection of the
stress-divergence operator restricted to region-interior stencils.

All basis evaluations use offsets in CELL units (see basis.py) — an exact
diagonal re-parameterization of the reference's world-unit coefficients.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from .basis import conversion_coefficients
from .classify import ACTIVEFLUID, REDUCED, Classification, is_active
from .config import SolverParams
from .grid import Grid, face_offsets
from .operators import cell_at_face, edge_at_face


def _coords(shape, dtype):
    cs = []
    for a in range(3):
        c = jnp.arange(shape[a], dtype=dtype).reshape([-1 if i == a else 1 for i in range(3)])
        cs.append(jnp.broadcast_to(c, shape))
    return jnp.stack(cs, axis=-1)  # (..., 3)


def _seg(ids, valid):
    """Segment ids with invalid entries routed to a dump slot R."""
    return jnp.where(valid, ids, jnp.int32(-1))


def segment_sum_vec(vals, ids, R):
    """vals (..., D) flattened-segment-summed by ids (...) -> [R, D]."""
    D = vals.shape[-1]
    flat = vals.reshape(-1, D)
    seg = jnp.where(ids.reshape(-1) >= 0, ids.reshape(-1), R)
    out = jax.ops.segment_sum(flat, seg, num_segments=R + 1)
    return out[:R]


def segment_rank1(C1, C2, w, ids, R, chunk=1 << 16):
    """[R, D, D] accumulation of w_i * C1_i C2_i^T grouped by ids.

    Processes faces in chunks so the [chunk, D, D] intermediate stays
    small; the per-chunk work is a masked outer product + scatter-add.
    """
    D = C1.shape[-1]
    C1 = C1.reshape(-1, D)
    C2 = C2.reshape(-1, D)
    w = w.reshape(-1)
    seg = jnp.where((ids.reshape(-1) >= 0) & (w != 0), ids.reshape(-1), R)
    N = C1.shape[0]
    if N <= chunk:
        outer = (w[:, None] * C1)[:, :, None] * C2[:, None, :]
        return jax.ops.segment_sum(outer.reshape(N, D * D), seg, num_segments=R + 1)[:R].reshape(R, D, D)

    nchunks = -(-N // chunk)
    padN = nchunks * chunk
    C1 = jnp.pad(C1, ((0, padN - N), (0, 0)))
    C2 = jnp.pad(C2, ((0, padN - N), (0, 0)))
    w = jnp.pad(w, (0, padN - N))
    seg = jnp.pad(seg, (0, padN - N), constant_values=R)

    def body(acc, args):
        c1, c2, ww, ss = args
        outer = (ww[:, None] * c1)[:, :, None] * c2[:, None, :]
        acc = acc + jax.ops.segment_sum(outer.reshape(chunk, D * D), ss, num_segments=R + 1)
        return acc, None

    acc0 = jnp.zeros((R + 1, D * D), dtype=C1.dtype)
    acc, _ = jax.lax.scan(
        body,
        acc0,
        (
            C1.reshape(nchunks, chunk, D),
            C2.reshape(nchunks, chunk, D),
            w.reshape(nchunks, chunk),
            seg.reshape(nchunks, chunk),
        ),
    )
    return acc[:R].reshape(R, D, D)


# ---------------------------------------------------------------------------
# Tiled (scatter-free) setup accumulation.  Same idea as the tiled J path
# below: with one region per tile cube, the per-region [R, D, D] / [R, D]
# reductions become dense per-cube einsums (batched matmuls on the MXU)
# followed by a tiny [ncubes] scatter, replacing multi-million-element
# scatter-adds.  Sample families map to cubes as:
#   cells:   cube = i // T on every axis
#   edges:   cube = (m - 1) // T along the edge's two offset axes (index 0
#            holds no interior samples when tile_padding >= 1), m // T on
#            the edge's own axis
# ---------------------------------------------------------------------------

def _family_blocks(arr, facelike_axes, T: int, cs):
    """Blockify a grid-family array (optionally with trailing dims) into
    [ncubes, T, T, T, ...]: drop index 0 along `facelike_axes`, zero-pad to
    cube multiples, regroup cube-major."""
    x = arr
    for ax in facelike_axes:
        sl = [slice(None)] * x.ndim
        sl[ax] = slice(1, None)
        x = x[tuple(sl)]
    pads = [(0, cs[i] * T - x.shape[i]) for i in range(3)] + [(0, 0)] * (x.ndim - 3)
    x = jnp.pad(x, pads)
    trail = x.shape[3:]
    x = x.reshape((cs[0], T, cs[1], T, cs[2], T) + trail)
    x = jnp.moveaxis(x, (1, 3), (3, 4))  # -> (cs0, cs1, cs2, T, T, T, ...)
    return x.reshape((cs[0] * cs[1] * cs[2], T, T, T) + trail)


def _cube_scatter(vals, region_of_cube, R: int):
    seg = jnp.where(region_of_cube >= 0, region_of_cube, R)
    return jax.ops.segment_sum(vals, seg, num_segments=R + 1)[:R]


def cube_rank1(C1, C2, w, facelike_axes, region_of_cube, R: int, T: int, cs):
    """[R, D, D] accumulation of w * C1 C2^T via per-cube batched matmul."""
    D = C1.shape[-1]
    nc = cs[0] * cs[1] * cs[2]
    t3 = T * T * T
    wb = _family_blocks(w, facelike_axes, T, cs).reshape(nc, t3)
    C1b = _family_blocks(C1, facelike_axes, T, cs).reshape(nc, t3, D)
    C2b = _family_blocks(C2, facelike_axes, T, cs).reshape(nc, t3, D)
    m = jnp.einsum("ctm,ctn->cmn", C1b * wb[..., None], C2b)
    return _cube_scatter(m.reshape(nc, D * D), region_of_cube, R).reshape(R, D, D)


def cube_vec(vals, facelike_axes, region_of_cube, R: int, T: int, cs):
    """[R, D] accumulation of (already masked/weighted) vals (..., D)."""
    D = vals.shape[-1]
    nc = cs[0] * cs[1] * cs[2]
    vb = _family_blocks(vals, facelike_axes, T, cs).reshape(nc, T * T * T, D)
    return _cube_scatter(jnp.sum(vb, axis=1), region_of_cube, R)


class _Accumulator:
    """Dispatches per-region reductions to the tiled or segmented path."""

    def __init__(self, grid: Grid, cls: Classification, params: SolverParams, R: int):
        self.cls = cls
        self.R = R
        self.tiled = params.do_tile and params.tile_padding >= 1
        if self.tiled:
            self.T = params.tile_size
            self.cs = tuple(-(-n // self.T) for n in grid.res)
            self.roc = cls.region_of_cube

    def rank1(self, C1, C2, w, family):
        """family: 'cell' or ('edge', e); w must be zero off-region."""
        if self.tiled:
            face_axes = () if family == "cell" else _edge_facelike(family[1])
            return cube_rank1(C1, C2, w, face_axes, self.roc, self.R, self.T, self.cs)
        ids = self._ids(family, w)
        return segment_rank1(C1, C2, w, ids, self.R)

    def vec(self, vals, family):
        if self.tiled:
            face_axes = () if family == "cell" else _edge_facelike(family[1])
            return cube_vec(vals, face_axes, self.roc, self.R, self.T, self.cs)
        ids = self._ids(family, None)
        return segment_sum_vec(vals, ids, self.R)

    def _ids(self, family, w):
        if family == "cell":
            red = self.cls.cell_labels == REDUCED
            return jnp.where(red, self.cls.cell_region, -1)
        e = family[1]
        red = self.cls.edge_labels[e] == REDUCED
        return jnp.where(red, self.cls.edge_region[e], -1)


def _edge_facelike(e: int):
    from .grid import EDGE_OFFSET_AXES

    return EDGE_OFFSET_AXES[e]


# ---------------------------------------------------------------------------
# Region geometry
# ---------------------------------------------------------------------------

def center_of_masses(cls: Classification, R: int, dtype, acc: "_Accumulator" = None):
    """[R, 3] mean cell coordinate per region, in cell units
    (reference scales by dx: Solver.cpp:329-372; we keep cell units to
    match the basis parameterization)."""
    red = cls.cell_labels == REDUCED
    coords = _coords(cls.cell_labels.shape, dtype)
    vals = jnp.where(red[..., None], coords, 0.0)
    ones = jnp.where(red[..., None], jnp.ones_like(coords[..., :1]), 0.0)
    if acc is not None:
        sums = acc.vec(vals, "cell")
        counts = acc.vec(ones, "cell")[:, 0]
    else:
        sums = segment_sum_vec(vals, jnp.where(red, cls.cell_region, -1), R)
        counts = segment_sum_vec(ones, jnp.where(red, cls.cell_region, -1), R)[:, 0]
    return sums / jnp.maximum(counts, 1.0)[:, None], counts


def _face_basis(grid: Grid, com_at, axis: int, params: SolverParams, face_shape):
    """Basis rows for every face of `axis`: offset = face_pos - com (cell
    units); com_at is a face-shaped (...,3) gather of the region COM."""
    dtype = params.dtype
    pos = _coords(face_shape, dtype) + jnp.asarray(face_offsets(axis), dtype)
    return conversion_coefficients(pos - com_at, axis, params.basis)


def gather_com(com, region_ids):
    safe = jnp.clip(region_ids, 0, com.shape[0] - 1)
    out = com[safe]
    return jnp.where((region_ids >= 0)[..., None], out, 0.0)


# ---------------------------------------------------------------------------
# Least-squares fit and reduced matrices
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ReducedData:
    com: jnp.ndarray  # [R, 3]
    cell_counts: jnp.ndarray  # [R]
    mr: jnp.ndarray  # [R, D, D] mass
    vr: jnp.ndarray  # [R, D, D] interior viscosity
    binv: jnp.ndarray  # [R, D, D] inv(Mr/dt + 2 Vr)
    best_fit: jnp.ndarray  # [R, D]
    b_w: jnp.ndarray  # [R, D] = Mr @ best_fit


def _cell_face_basis_pair(grid: Grid, cls, com, axis, params):
    """For every cell: basis rows at its lower and upper face of `axis`
    (offsets cell -+ 0.5 e_axis - com), cell-shaped (..., D)."""
    dtype = params.dtype
    shape = cls.cell_labels.shape
    com_at = gather_com(com, cls.cell_region)
    pos = _coords(shape, dtype)
    e = jnp.zeros((3,), dtype).at[axis].set(0.5)
    c_lo = conversion_coefficients(pos - e - com_at, axis, params.basis)
    c_hi = conversion_coefficients(pos + e - com_at, axis, params.basis)
    return c_lo, c_hi


def build_reduced(grid: Grid, cls: Classification, velocity, viscosity_c, viscosity_e, params: SolverParams, R: int) -> ReducedData:
    dtype = params.dtype
    D = params.reduced_dof
    red_cell = cls.cell_labels == REDUCED
    acc = _Accumulator(grid, cls, params, R)

    com, counts = center_of_masses(cls, R, dtype, acc)

    # ---- least-squares best fit (Solver.cpp:1331-1399): faces of reduced
    # cells whose across-cell neighbor is ACTIVE contribute c c^T and
    # u_face * c.
    fitM = jnp.zeros((R, D, D), dtype)
    fitb = jnp.zeros((R, D), dtype)
    # ---- reduced mass (Solver.cpp:1406-1482): lower face always, upper
    # face only when the neighbor is ACTIVE (counts shared faces once).
    mr = jnp.zeros((R, D, D), dtype)
    rho = jnp.asarray(params.constant_density, dtype)

    from .grid import shift as _shift
    from .operators import face_at_cell

    active_cell = is_active(cls.cell_labels)
    for a in range(3):
        c_lo, c_hi = _cell_face_basis_pair(grid, cls, com, a, params)
        d_lo = [0, 0, 0]
        d_lo[a] = -1
        d_hi = [0, 0, 0]
        d_hi[a] = 1
        nb_lo = _shift(active_cell, tuple(d_lo), fill=False)
        nb_hi = _shift(active_cell, tuple(d_hi), fill=False)
        u_lo = face_at_cell(velocity[a].astype(dtype), a, 0)
        u_hi = face_at_cell(velocity[a].astype(dtype), a, 1)

        w_lo = (red_cell & nb_lo).astype(dtype)
        w_hi = (red_cell & nb_hi).astype(dtype)
        fitM = fitM + acc.rank1(c_lo, c_lo, w_lo, "cell")
        fitM = fitM + acc.rank1(c_hi, c_hi, w_hi, "cell")
        fitb = fitb + acc.vec(c_lo * (w_lo * u_lo)[..., None], "cell")
        fitb = fitb + acc.vec(c_hi * (w_hi * u_hi)[..., None], "cell")

        m_lo = red_cell.astype(dtype)
        m_hi = (red_cell & nb_hi).astype(dtype)
        mr = mr + acc.rank1(c_lo, c_lo, rho * m_lo, "cell")
        mr = mr + acc.rank1(c_hi, c_hi, rho * m_hi, "cell")

    # ---- interior viscosity Galerkin matrix (rank-1 form; see module doc)
    inv_dx2 = jnp.asarray(1.0 / (grid.dx * grid.dx), dtype)
    vr = jnp.zeros((R, D, D), dtype)
    # cell-centered stress terms: mu_c/dx^2 * (c_hi - c_lo)(c_hi - c_lo)^T
    for a in range(3):
        c_lo, c_hi = _cell_face_basis_pair(grid, cls, com, a, params)
        d = c_hi - c_lo
        w = red_cell.astype(dtype) * viscosity_c.astype(dtype) * inv_dx2
        vr = vr + acc.rank1(d, d, w, "cell")
    # edge-centered stress terms: 0.5 mu_e/dx^2 * u u^T over strictly
    # REDUCED edges; u = sum over the 4 surrounding faces of s * c(face),
    # s = +1 for the face on the lower offset side, -1 on the edge itself.
    from .grid import EDGE_OFFSET_AXES

    for e in range(3):
        p, q = EDGE_OFFSET_AXES[e]
        edge_red = cls.edge_labels[e] == REDUCED
        eshape = cls.edge_labels[e].shape
        com_e = gather_com(com, cls.edge_region[e])
        pos_e = _coords(eshape, dtype)
        u_vec = jnp.zeros(eshape + (D,), dtype)
        # faces of family p neighbor the edge along q; family q along p.
        for fa, other in ((p, q), (q, p)):
            off = jnp.asarray(face_offsets(fa), dtype)
            e_o = jnp.zeros((3,), dtype).at[other].set(1.0)
            # face at the edge index (upper side, sign -1) and at
            # edge - e_other (lower side, sign +1)
            c_up = conversion_coefficients(pos_e + off - com_e, fa, params.basis)
            c_dn = conversion_coefficients(pos_e - e_o + off - com_e, fa, params.basis)
            u_vec = u_vec + (c_dn - c_up)
        w = edge_red.astype(dtype) * 0.5 * viscosity_e[e].astype(dtype) * inv_dx2
        vr = vr + acc.rank1(u_vec, u_vec, w, ("edge", e))

    # ---- batched least-squares solve (reference: per-region fullPivLu,
    # Solver.cpp:401-416) on the MXU
    eye = jnp.eye(D, dtype=dtype)
    valid = cls.region_valid
    fitM_safe = jnp.where(valid[:, None, None], fitM, eye)
    best_fit = jnp.linalg.solve(fitM_safe, fitb[..., None])[..., 0]
    best_fit = jnp.where(valid[:, None], best_fit, 0.0)

    return ReducedData(com=com, cell_counts=counts, mr=mr, vr=vr, binv=jnp.zeros_like(mr), best_fit=best_fit, b_w=jnp.zeros_like(best_fit))


def finalize_reduced(rd: ReducedData, valid, dt, dtype, D):
    """B = Mr/dt + 2 Vr per region; invert (AssembleBlocks.cpp:196-244)."""
    eye = jnp.eye(D, dtype=dtype)
    B = rd.mr / dt + 2.0 * rd.vr
    B_safe = jnp.where(valid[:, None, None], B, eye)
    binv = jnp.linalg.inv(B_safe)
    binv = jnp.where(valid[:, None, None], binv, 0.0)
    b_w = jnp.einsum("rij,rj->ri", rd.mr, rd.best_fit)
    return dataclasses.replace(rd, binv=binv, b_w=b_w)


# ---------------------------------------------------------------------------
# Tiled (scatter-free) J coupling fast path.
#
# With tiling on, every region lives inside one tile cube (the padding
# slabs separate cubes; classify.enforce_one_region_per_cube guarantees at
# most one region per cube).  A reduced face of axis `a` at index f>0
# belongs to the cube (f-1)//T along `a` (f == 0 is never reduced when
# tile_padding >= 1).  The segmented reduction over millions of faces then
# becomes a dense reshape + per-cube einsum on the MXU — no scatter in the
# CG hot loop (the reference's hot kernel is the analogous 26-row-block
# SpMV, lib/include/ApplyPressureStressMatrix.h:102-179).
# ---------------------------------------------------------------------------

def _use_tiled(params: SolverParams) -> bool:
    return params.do_tile and params.tile_padding >= 1


def _face_blocks(arr, axis: int, T: int, cs):
    """Face-shaped array -> [ncubes, T, T, T] cube blocks (drops face 0)."""
    sl = [slice(None)] * 3
    sl[axis] = slice(1, None)
    x = arr[tuple(sl)]
    pads = [(0, cs[i] * T - x.shape[i]) for i in range(3)]
    x = jnp.pad(x, pads)
    x = x.reshape(cs[0], T, cs[1], T, cs[2], T).transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(cs[0] * cs[1] * cs[2], T, T, T)


def _blocks_to_face(blocks, axis: int, T: int, cs, face_shape):
    """Inverse of _face_blocks (re-inserts a zero plane at face 0)."""
    x = blocks.reshape(cs[0], cs[1], cs[2], T, T, T).transpose(0, 3, 1, 4, 2, 5)
    x = x.reshape(cs[0] * T, cs[1] * T, cs[2] * T)
    crop = list(face_shape)
    crop[axis] -= 1
    x = x[tuple(slice(0, c) for c in crop)]
    pad = [(0, 0)] * 3
    pad[axis] = (1, 0)
    return jnp.pad(x, pad)


def _cube_basis(grid: Grid, cls: Classification, com, axis: int, params: SolverParams, T: int, cs):
    """Basis rows for every face slot of every cube: [ncubes, T^3, D]."""
    dtype = params.dtype
    nc = cs[0] * cs[1] * cs[2]
    corner = jnp.stack(
        jnp.meshgrid(*[jnp.arange(c, dtype=dtype) * T for c in cs], indexing="ij"), axis=-1
    ).reshape(nc, 1, 1, 1, 3)
    local = jnp.stack(
        jnp.meshgrid(*[jnp.arange(T, dtype=dtype) for _ in range(3)], indexing="ij"), axis=-1
    )
    off_local = jnp.zeros((3,), dtype).at[axis].set(0.5)
    pos = corner + local + off_local  # [nc, T,T,T, 3]
    safe = jnp.clip(cls.region_of_cube, 0, com.shape[0] - 1)
    com_c = jnp.where((cls.region_of_cube >= 0)[:, None], com[safe], 0.0)
    offs = pos - com_c[:, None, None, None, :]
    C = conversion_coefficients(offs, axis, params.basis)
    D = C.shape[-1]
    return C.reshape(nc, T * T * T, D)


def reduce_J_tiled(grid: Grid, cls: Classification, com, s_faces, params: SolverParams, R: int):
    T = params.tile_size
    cs = tuple(-(-n // T) for n in grid.res)
    nc = cs[0] * cs[1] * cs[2]
    D = params.reduced_dof
    y_cube = jnp.zeros((nc, D), dtype=params.dtype)
    for a in range(3):
        reg = cls.face_region[a]
        red = (cls.face_labels[a] == REDUCED) & (reg >= 0)
        s = jnp.where(red, s_faces[a], 0.0)
        blocks = _face_blocks(s, a, T, cs).reshape(nc, T * T * T)
        C = _cube_basis(grid, cls, com, a, params, T, cs)
        y_cube = y_cube + jnp.einsum("ct,ctd->cd", blocks, C)
    seg = jnp.where(cls.region_of_cube >= 0, cls.region_of_cube, R)
    return jax.ops.segment_sum(y_cube, seg, num_segments=R + 1)[:R]


def expand_J_tiled(grid: Grid, cls: Classification, com, w, params: SolverParams):
    T = params.tile_size
    cs = tuple(-(-n // T) for n in grid.res)
    nc = cs[0] * cs[1] * cs[2]
    safe = jnp.clip(cls.region_of_cube, 0, w.shape[0] - 1)
    w_cube = jnp.where((cls.region_of_cube >= 0)[:, None], w[safe], 0.0)
    out = []
    for a in range(3):
        C = _cube_basis(grid, cls, com, a, params, T, cs)
        u = jnp.einsum("ctd,cd->ct", C, w_cube)
        fshape = cls.face_region[a].shape
        u_face = _blocks_to_face(u.reshape(nc, T, T, T), a, T, cs, fshape)
        red = (cls.face_labels[a] == REDUCED) & (cls.face_region[a] >= 0)
        out.append(jnp.where(red, u_face, 0.0))
    return out


# ---------------------------------------------------------------------------
# J coupling: grid (p, tau) stencil values on reduced faces <-> [R, D]
# ---------------------------------------------------------------------------

def reduce_J(grid: Grid, cls: Classification, com, s_faces, params: SolverParams, R: int):
    if _use_tiled(params):
        return reduce_J_tiled(grid, cls, com, s_faces, params, R)
    return _reduce_J_general(grid, cls, com, s_faces, params, R)


def expand_J(grid: Grid, cls: Classification, com, w, params: SolverParams):
    if _use_tiled(params):
        return expand_J_tiled(grid, cls, com, w, params)
    return _expand_J_general(grid, cls, com, w, params)


def _reduce_J_general(grid: Grid, cls: Classification, com, s_faces, params: SolverParams, R: int):
    """y[r] = sum over reduced faces of basis(face) * s_face  ==  J x."""
    D = params.reduced_dof
    y = jnp.zeros((R, D), dtype=params.dtype)
    for a in range(3):
        reg = cls.face_region[a]
        red = (cls.face_labels[a] == REDUCED) & (reg >= 0)
        com_at = gather_com(com, reg)
        C = _face_basis(grid, com_at, a, params, reg.shape)
        vals = C * jnp.where(red, s_faces[a], 0.0)[..., None]
        y = y + segment_sum_vec(vals, jnp.where(red, reg, -1), R)
    return y


def _expand_J_general(grid: Grid, cls: Classification, com, w, params: SolverParams):
    """u_face = basis(face) . w[region] on reduced faces  ==  J^T w rows."""
    out = []
    for a in range(3):
        reg = cls.face_region[a]
        red = (cls.face_labels[a] == REDUCED) & (reg >= 0)
        com_at = gather_com(com, reg)
        C = _face_basis(grid, com_at, a, params, reg.shape)
        safe = jnp.clip(reg, 0, w.shape[0] - 1)
        wf = w[safe]
        u = jnp.sum(C * wf, axis=-1)
        out.append(jnp.where(red, u, 0.0))
    return out
