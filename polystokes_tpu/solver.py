"""Top-level PolyStokes step: weights -> classify -> reduce -> assemble ->
solve -> recover -> write back.

TPU-native re-design of the reference pipeline driver
(exec/HDK_PolyStokes.C:222-609 `solveGasSubclass`) and solver state
(exec/HDK_PolyStokesSolver.{h,cpp}).  The entire step is one jittable
function of dense arrays; each stage corresponds to one reference stage
(see the call-stack map in SURVEY.md section 3.1).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import krylov
from .classify import (
    ACTIVEFLUID,
    REDUCED,
    SOLID,
    UNSOLVED,
    Classification,
    classify,
    effective_max_regions,
    is_active,
)
from .config import MatrixScheme, PreconditionerType, SolverParams, SolverType
from .grid import Grid
from .precision import precise_matmul
from .operators import (
    Assembled,
    PTau,
    build_diagonals,
    build_gated_weights,
    coeff_fields,
    cell_at_face,
    edge_at_face,
    face_at_cell,
    forward_face_values,
    scatter_face_to_edge,
    transpose_from_faces,
)
from .reduced import (
    ReducedData,
    build_reduced,
    expand_J,
    finalize_reduced,
    gather_com,
    reduce_J,
)
from .weights import compute_weights


# ---------------------------------------------------------------------------
# Scene: the NumPy-facing state API replacing the reference's 10 Houdini
# input fields (exec/HDK_PolyStokes.C:235-314)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Scene:
    """One solve's input state on the MAC grid.

    Optional `surface_weights` / `collision_weights` (3 face arrays each)
    override the face liquid/fluid weights with externally supplied values
    (the reference's useInputSurfaceWeights/useInputCollisionWeights
    passthrough, Solver.cpp:183-237: supplied face weights are floored at
    MINWEIGHT where positive).

    Optional `density` is a center-sampled density field; the reference
    takes such a field, REJECTS variable density, and samples the constant
    from it (HDK_PolyStokes.C:290-304).  Call `sample_density(scene,
    params)` on the host before jitting to validate it and fold the
    sampled constant into params (see run.py)."""

    surface_sdf: jnp.ndarray  # (nx,ny,nz) liquid SDF at centers, <0 inside
    collision_sdf: jnp.ndarray  # (nx,ny,nz) solid SDF at centers, <0 inside
    velocity: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # face arrays
    collision_velocity: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
    viscosity: jnp.ndarray  # (nx,ny,nz) dynamic viscosity at centers
    dt: jnp.ndarray  # timestep (scalar)
    surface_weights: object = None  # optional (fx, fy, fz) face liquid weights
    collision_weights: object = None  # optional (fx, fy, fz) face fluid weights
    density: object = None  # optional (nx,ny,nz) center density field


@jax.jit
@jax.jit
def _min_max(x):
    return jnp.min(x), jnp.max(x)


def sample_density(scene: Scene, params: SolverParams) -> SolverParams:
    """Density-field input validation (HDK_PolyStokes.C:290-304): the
    reference errors out on a variable density field ("only constant
    density is supported") and otherwise samples the constant from the
    field, clamped into [min_density, max_density].  Host-side helper —
    returns params with constant_density set from the field; a no-op when
    the scene carries no density field."""
    if scene.density is None:
        return params
    import numpy as np

    d = scene.density
    if isinstance(d, jax.Array):
        # reduce on device and ship two scalars — materializing the full
        # field on host costs a grid-sized transfer (67 MB at 256^3)
        lo, hi = _min_max(d)
        lo, hi = float(lo), float(hi)
    else:
        d = np.asarray(d, dtype=np.float64)
        lo, hi = float(d.min()), float(d.max())
    scale = max(abs(lo), abs(hi), 1e-30)
    if (hi - lo) / scale > 1e-6:
        raise ValueError(
            f"variable density fields are not supported (field range [{lo}, {hi}]); "
            "the reference solver imposes the same restriction (HDK_PolyStokes.C:290-304)"
        )
    return params.replace(constant_density=lo)


def _apply_input_weights(lw, fw, scene, dtype):
    from .config import MINWEIGHT

    def floor_min(w):
        w = w.astype(dtype)
        return jnp.where(w > 0, jnp.maximum(w, MINWEIGHT), 0.0)

    if scene.surface_weights is not None:
        lw = dict(lw)
        for a in range(3):
            lw[f"face{a}"] = floor_min(scene.surface_weights[a])
    if scene.collision_weights is not None:
        fw = dict(fw)
        for a in range(3):
            fw[f"face{a}"] = floor_min(scene.collision_weights[a])
    return lw, fw


def edge_viscosity(viscosity_c, edge_axis: int):
    """Viscosity at edge sampling points: bilinear average of the 4
    surrounding cell centers with edge-clamped borders (the reference
    trilinearly samples its center-sampled field at the edge position;
    Solver.cpp:693-695)."""
    from .grid import EDGE_OFFSET_AXES

    p, q = EDGE_OFFSET_AXES[edge_axis]
    pad = [(0, 0)] * 3
    pad[p] = (1, 0)
    pad[q] = (1, 0)
    v = jnp.pad(viscosity_c, pad, mode="edge")
    # also pad the upper side so views are edge-shaped
    pad2 = [(0, 0)] * 3
    pad2[p] = (0, 1)
    pad2[q] = (0, 1)
    v = jnp.pad(v, pad2, mode="edge")

    def view(dp, dq):
        s = [slice(None)] * 3
        n = list(viscosity_c.shape)
        s[p] = slice(dp, dp + n[p] + 1)
        s[q] = slice(dq, dq + n[q] + 1)
        return v[tuple(s)]

    return 0.25 * (view(0, 0) + view(0, 1) + view(1, 0) + view(1, 1))


# ---------------------------------------------------------------------------
# Assembly
# ---------------------------------------------------------------------------

def _solid_rhs(grid: Grid, cls: Classification, asm, fluid_w, collision_velocity, dtype) -> PTau:
    """Solid-velocity boundary RHS terms (ConstructMatrixBlocks.cpp:424-441,
    493-511, 581-599): for each ACTIVE face f with stencil coefficient
    coeff(f, target) > 0,

      rhs[target] += sign * coeff * svel_f * (1[faceFluidW<1] - 1[targetFluidW<1])

    where `target` ranges over the adjacent active pressure cells, center
    stresses, and edge stresses.  (Pressure and stress both use
    +sign*coeff; the matrix's Dt uses -sign*coeff.)"""
    p_out = jnp.zeros(grid.center_shape, dtype)
    tc_out = [jnp.zeros(grid.center_shape, dtype) for _ in range(3)]
    te_out = [jnp.zeros(fluid_w[f"edge{e}"].shape, dtype) for e in range(3)]

    phi_c = (fluid_w["center"] < 1.0).astype(dtype)
    for a in range(3):
        c_lo, c_hi, erow = coeff_fields(asm, a)
        act = is_active(cls.face_labels[a]).astype(dtype)
        svel = collision_velocity[a].astype(dtype) * act
        phi_f = (fluid_w[f"face{a}"] < 1.0).astype(dtype)
        w1 = svel * phi_f  # face-indicator part
        # cell targets: cell's lower face (cell on upper side, sign +1,
        # coeff c_hi at face index == cell) and upper face (sign -1, c_lo)
        t1 = face_at_cell(c_hi * w1, a, 0) - face_at_cell(c_lo * w1, a, 1)
        t2 = (face_at_cell(c_hi * svel, a, 0) - face_at_cell(c_lo * svel, a, 1)) * phi_c
        contrib = t1 - t2
        p_out = p_out + contrib
        tc_out[a] = tc_out[a] + contrib
        for e in range(3):
            if e == a:
                continue
            elo, ehi = erow[e]
            phi_e = (fluid_w[f"edge{e}"] < 1.0).astype(dtype)
            # edge targets: sign(dir0) = -1, sign(dir1) = +1
            s1 = scatter_face_to_edge(ehi * w1, a, e, 1) - scatter_face_to_edge(elo * w1, a, e, 0)
            s2 = (scatter_face_to_edge(ehi * svel, a, e, 1) - scatter_face_to_edge(elo * svel, a, e, 0)) * phi_e
            te_out[e] = te_out[e] + s1 - s2
    return PTau(p=p_out, tc=tuple(tc_out), te=tuple(te_out))


def assemble(grid: Grid, scene: Scene, cls: Classification, liquid_w, fluid_w, params: SolverParams, R: int):
    """Build all operator state for the pressure-stress factored scheme
    (assembleSystemPressureStressFactored, AssembleSystem.cpp:432-470)."""
    dtype = params.dtype
    dt = jnp.asarray(scene.dt, dtype)
    visc_c = scene.viscosity.astype(dtype)
    visc_e = tuple(edge_viscosity(visc_c, e) for e in range(3))

    clw_s, elw_s, ffw = build_gated_weights(grid, cls, liquid_w, fluid_w, params)
    mc, mc_inv, uinv_c, u_c, uinv_e, u_e = build_diagonals(
        grid, cls, liquid_w, fluid_w, visc_c, visc_e, params
    )

    vmask = tuple(is_active(cls.face_labels[a]).astype(dtype) for a in range(3))
    b_v = tuple(scene.velocity[a].astype(dtype) * mc[a] for a in range(3))
    old_v = tuple(scene.velocity[a].astype(dtype) * vmask[a] for a in range(3))

    if params.do_reduced_regions:
        rd = build_reduced(grid, cls, scene.velocity, visc_c, visc_e, params, R)
        rd = finalize_reduced(rd, cls.region_valid, dt, dtype, params.reduced_dof)
    else:
        D = params.reduced_dof
        rd = ReducedData(
            com=jnp.zeros((R, 3), dtype),
            cell_counts=jnp.zeros((R,), dtype),
            mr=jnp.zeros((R, D, D), dtype),
            vr=jnp.zeros((R, D, D), dtype),
            binv=jnp.zeros((R, D, D), dtype),
            best_fit=jnp.zeros((R, D), dtype),
            b_w=jnp.zeros((R, D), dtype),
        )

    asm = Assembled(
        dt=dt,
        inv_dx=jnp.asarray(1.0 / grid.dx, dtype),
        clw_s=clw_s,
        elw_s=elw_s,
        ffw=ffw,
        mc=mc,
        mc_inv=mc_inv,
        uinv_c=uinv_c,
        u_c=u_c,
        uinv_e=uinv_e,
        u_e=u_e,
        b_v=b_v,
        old_v=old_v,
        rhs_solid=PTau(
            p=jnp.zeros(grid.center_shape, dtype),
            tc=tuple(jnp.zeros(grid.center_shape, dtype) for _ in range(3)),
            te=tuple(jnp.zeros_like(uinv_e[e]) for e in range(3)),
        ),
        com=rd.com,
        binv=rd.binv,
        mr=rd.mr,
        vr=rd.vr,
        best_fit=rd.best_fit,
        b_w=rd.b_w,
        region_valid=cls.region_valid,
        face_region=cls.face_region,
    )
    asm = dataclasses.replace(asm, rhs_solid=_solid_rhs(grid, cls, asm, fluid_w, scene.collision_velocity, dtype))
    return asm, rd


# ---------------------------------------------------------------------------
# The matrix-free pressure-stress Schur operator
# (ApplyPressureStressMatrix::applyMatrixVectorProducts,
#  lib/include/ApplyPressureStressMatrix.h:102-179)
# ---------------------------------------------------------------------------

def _use_packed(grid: Grid, params: SolverParams) -> bool:
    from .pallas_apply import pallas_compatible

    return (
        params.use_pallas
        and params.preconditioner != PreconditionerType.MULTIGRID
        and pallas_compatible(grid.res, params)
    )


@partial(jax.jit, static_argnames=("grid", "params"))
def _boundary_activity_count(grid, scene, params):
    liquid_w, fluid_w = compute_weights(grid, scene.surface_sdf, scene.collision_sdf, params.dtype)
    liquid_w, fluid_w = _apply_input_weights(liquid_w, fluid_w, scene, params.dtype)
    cls = classify(grid, liquid_w, fluid_w, params)
    total = jnp.int32(0)
    for a in range(3):
        sl = [slice(None)] * 3
        sl[a] = slice(0, 1)
        total += jnp.sum(is_active(cls.face_labels[a][tuple(sl)]))
    from .grid import EDGE_OFFSET_AXES

    for e in range(3):
        for ax in EDGE_OFFSET_AXES[e]:
            sl = [slice(None)] * 3
            sl[ax] = slice(0, 1)
            total += jnp.sum(is_active(cls.edge_labels[e][tuple(sl)]))
    return total


def boundary_activity(grid: Grid, scene: Scene, params: SolverParams) -> int:
    """Count of active faces/edges on the dropped index-0 domain planes —
    the packed Pallas layout is exact iff this is 0 (pallas_apply.py
    docstring).  Host-side pre-flight for `check_pallas` below."""
    return int(_boundary_activity_count(grid, scene, params))


def check_pallas(grid: Grid, scene: Scene, params: SolverParams) -> SolverParams:
    """Gate the packed Pallas path on its layout invariant: when the scene
    has active DOFs on the dropped index-0 boundary planes, fall back to
    the exact XLA apply (with a warning) instead of silently computing
    wrong physics.  Call once per scene topology before jitting step();
    the CLI / bench / suite drivers all do."""
    if not _use_packed(grid, params):
        return params
    n = boundary_activity(grid, scene, params)
    if n:
        import warnings

        warnings.warn(
            f"scene has {n} active DOFs on the domain-boundary index-0 planes; "
            "the packed Pallas layout drops those, so use_pallas is disabled "
            "for this solve (falling back to the XLA apply)",
            stacklevel=2,
        )
        return params.replace(use_pallas=False)
    return params


def _region_algebra_packed(grid: Grid, cls: Classification, asm: Assembled, params: SolverParams, R: int, matrix=None):
    """The tiny per-cube region algebra between the moments and expand
    kernels: mom [cs0, cs1, 3K, cs2] -> v_arr [cs0, cs1, 3K, cs2] (cube-
    origin-basis polynomial coefficients of `matrix` @ (J x), default
    matrix = BInv), plus the reduced-face mask stack the kernels gate on."""
    from .basis import monomial_matrix, monomial_shift_matrix, n_monomials
    from .reduced import _cube_scatter

    T = params.tile_size
    K = n_monomials(params.basis)
    A_mats = [jnp.asarray(monomial_matrix(a, params.basis), params.dtype) for a in range(3)]
    # setup: per-cube shift matrices turning cube-origin moments into
    # COM-relative moments (S(com - origin); kernel uses origin-local
    # positions for fp32 conditioning)
    cs = tuple(-(-n // T) for n in grid.res)
    origins = jnp.stack(
        jnp.meshgrid(*[jnp.arange(c, dtype=params.dtype) * T for c in cs], indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    roc = cls.region_of_cube
    safe = jnp.clip(roc, 0, asm.com.shape[0] - 1)
    com_cube = jnp.where((roc >= 0)[:, None], asm.com[safe], 0.0)
    cprime = com_cube - origins  # [nc, 3]
    S = monomial_shift_matrix(cprime[:, 0], cprime[:, 1], cprime[:, 2], params.basis)

    safe_cube = jnp.clip(roc, 0, R - 1)
    cube_ok = (roc >= 0).astype(params.dtype)
    from .classify import REDUCED as _RED
    from .pallas_apply import _face_to_slot as _f2s

    red_packed = jnp.stack(
        [
            _f2s(((cls.face_labels[a] == _RED) & (cls.face_region[a] >= 0)).astype(params.dtype), a)
            for a in range(3)
        ],
        axis=0,
    )
    if params.coeff_bf16:
        # 0/1 mask values are exact in bf16; halves the expand pass's read
        red_packed = red_packed.astype(jnp.bfloat16)

    mtx = asm.binv if matrix is None else matrix

    def algebra(mom):
        m = jnp.transpose(mom, (0, 1, 3, 2)).reshape(-1, 3, K)  # [nc, 3, K] raw
        m_rel = jnp.einsum("ckj,caj->cak", S, m)
        y = sum(m_rel[:, a, :] @ A_mats[a].T for a in range(3))  # [nc, D]
        yR = _cube_scatter(y, cls.region_of_cube, R)
        w = jnp.einsum("rij,rj->ri", mtx, yR)
        w_cube = w[safe_cube] * cube_ok[:, None]  # [nc, D]
        v_com = jnp.stack([w_cube @ A_mats[a] for a in range(3)], axis=1)  # [nc, 3, K]
        v_origin = jnp.einsum("ckj,cak->caj", S, v_com)
        return jnp.transpose(v_origin.reshape(cs[0], cs[1], cs[2], 3 * K), (0, 1, 3, 2))

    return algebra, red_packed


def make_apply_packed(grid: Grid, cls: Classification, asm: Assembled, params: SolverParams, R: int):
    """The fused-kernel apply on packed [7, nx, ny, nz] vectors.  The
    reduced J coupling runs as: fused per-cube moments kernel -> tiny
    region algebra (scatter + batched BInv) -> XLA polynomial expand ->
    fused combine kernel (which recomputes s in-block)."""
    from .pallas_apply import (
        _pad_halo,
        apply_reduced_packed,
        apply_uniform_packed,
        expand_packed,
        moments_packed,
        pack_coeffs,
    )

    reduced = params.do_reduced_regions
    storage = jnp.bfloat16 if params.coeff_bf16 else None
    coeffs = pack_coeffs(asm, cls if reduced else None, storage_dtype=storage)
    if not reduced:

        def apply_uniform(xp):
            return apply_uniform_packed(xp, coeffs, grid.res)

        return apply_uniform

    T = params.tile_size
    algebra, red_packed = _region_algebra_packed(grid, cls, asm, params, R)

    def apply_packed(xp):
        xpad = _pad_halo(xp)
        mom = moments_packed(xpad, coeffs, grid.res, T, params.basis)
        v_arr = algebra(mom)
        up = expand_packed(v_arr, red_packed, grid.res, T, params.basis)
        return apply_reduced_packed(xpad, coeffs, up, grid.res)

    return apply_packed


def make_apply_packed_pap(grid: Grid, cls: Classification, asm: Assembled, params: SolverParams, R: int, defer_finish: bool = False):
    """Fused apply returning (A x, <x, A x>): the grid branch, per-cube
    moments and the pAp block-partials run in ONE kernel (one read of the
    x/coeff windows); the reduced-branch pAp term is the tiny-space dot
    -sum(mom * v) (see pallas_apply._finish_kernel), so the finish pass no
    longer reads x.  With `defer_finish` the finish kernel is skipped and
    `A x` is returned as the (out_grid, up) pair for the fused
    finish+update kernel to consume (Ap never round-trips through HBM)."""
    from .pallas_apply import (
        _pad_halo,
        apply_uniform_pap_packed,
        expand_packed,
        finish_packed,
        grid_mom_pap_packed,
        pack_coeffs,
    )

    reduced = params.do_reduced_regions
    storage = jnp.bfloat16 if params.coeff_bf16 else None
    coeffs = pack_coeffs(asm, cls if reduced else None, storage_dtype=storage)
    if not reduced:

        def apply_dot_uniform(xp):
            out, pap = apply_uniform_pap_packed(xp, coeffs, grid.res)
            return out, jnp.sum(pap)

        return apply_dot_uniform

    T = params.tile_size
    algebra, red_packed = _region_algebra_packed(grid, cls, asm, params, R)

    def apply_dot(xp):
        xpad = _pad_halo(xp)
        out_grid, mom, pap1 = grid_mom_pap_packed(xpad, coeffs, grid.res, T, params.basis)
        v_arr = algebra(mom)
        pap = jnp.sum(pap1) - jnp.sum(mom * v_arr)
        if defer_finish:
            if _fuse_expand_ok(grid, params):
                # fully-fused finish: hand the tiny coefficient slab to the
                # expand+finish+update kernel; `up` is never materialized
                return (out_grid, v_arr), pap
            up = expand_packed(v_arr, red_packed, grid.res, T, params.basis)
            return (out_grid, up), pap
        up = expand_packed(v_arr, red_packed, grid.res, T, params.basis)
        return finish_packed(coeffs, out_grid, up, grid.res), pap

    return apply_dot


def _fuse_expand_ok(grid: Grid, params: SolverParams) -> bool:
    """Whether the deferred reduced finish should use the fully-fused
    expand+finish+update kernel (params.fuse_expand and the config within
    the kernel's static support)."""
    from .pallas_apply import exp_finish_supported

    return bool(
        params.fuse_expand
        and params.do_reduced_regions
        and exp_finish_supported(grid.res, params.tile_size)
    )


@precise_matmul
def precond_factors_packed(grid: Grid, cls: Classification, asm: Assembled, params: SolverParams):
    """Loop-invariant preconditioner factor fields for the packed path.

    The arrow/diagonal setup includes the reduced-diagonal quadratic-form
    probe (`precond._diag_quadratic_form`) which costs whole seconds of
    device time at 128^3+ — computing it once here and threading the
    result through every jitted segment keeps the per-segment cost at
    zero (the reference's analog is building the preconditioner once
    before the solve, Preconditioner.cpp:30-158)."""
    from .pallas_apply import _edge_to_slot, pack_ptau

    if params.preconditioner == PreconditionerType.IDENTITY:
        return None
    if params.preconditioner in (PreconditionerType.CELL_ARROW, PreconditionerType.REGION_ARROW):
        from .precond import _arrow_solve_from, cell_arrow_factors, region_schur_inv

        region = (
            params.preconditioner == PreconditionerType.REGION_ARROW
            and params.do_reduced_regions
        )
        fac = cell_arrow_factors(grid, cls, asm, params, include_reduced_q=not region)
        k, inv_d, kd, inv_schur, te_inv = fac
        te_inv_s = [_edge_to_slot(te_inv[e], e) for e in range(3)]
        out = dict(
            k=list(k), inv_d=list(inv_d), kd=list(kd),
            inv_schur=inv_schur, te_inv_s=te_inv_s,
        )
        if region:
            R = asm.binv.shape[0]
            out["sinv"] = region_schur_inv(grid, cls, asm, params, R, _arrow_solve_from(*fac))
        return out
    from .precond import _safe_inv, schur_diagonal

    d = schur_diagonal(grid, cls, asm, params)
    return dict(inv_packed=pack_ptau(jax.tree.map(_safe_inv, d)))


def make_fused_update(grid: Grid, params: SolverParams, factors=None, cls=None, asm=None):
    """The fused CG vector-update callable (pallas_apply.cg_update_packed)
    when params allow it on this path, else None.  Qualifying
    preconditioners are pointwise in the packed layout; deflation wraps
    the preconditioner with an operator apply, so it disqualifies.

    When `cls`/`asm` are given (the reduced fuse_pap path), the returned
    callable also accepts `ap` as the deferred (out_grid, up) pair from
    make_apply_packed_pap(defer_finish=True) and runs the fused
    finish+update kernel instead."""
    if not (params.fuse_update and _use_packed(grid, params)):
        return None
    if params.deflation:
        return None
    from .pallas_apply import (
        cg_update_packed,
        exp_finish_update_packed,
        finish_update_packed,
        pack_arrow_factors,
        pack_coeffs,
    )

    if params.preconditioner == PreconditionerType.CELL_ARROW:
        fstack = pack_arrow_factors(factors)
        kind = "arrow"
    elif params.preconditioner == PreconditionerType.DIAGONAL:
        fstack = factors["inv_packed"]
        kind = "diag"
    elif params.preconditioner == PreconditionerType.IDENTITY:
        fstack = None
        kind = "none"
    else:
        return None

    coeffs = None
    if cls is not None and asm is not None and params.do_reduced_regions:
        storage = jnp.bfloat16 if params.coeff_bf16 else None
        coeffs = pack_coeffs(asm, cls, storage_dtype=storage)
    fuse_expand = cls is not None and _fuse_expand_ok(grid, params)
    T, basis = params.tile_size, params.basis

    def fused(x, r, p, ap, alpha):
        if isinstance(ap, tuple):
            og, tail = ap
            if fuse_expand:
                # tail is the tiny [cs0, cs1, 3K, cs2] coefficient slab
                return exp_finish_update_packed(
                    x, r, p, alpha, coeffs, og, tail, grid.res, T, basis,
                    factors=fstack, kind=kind,
                )
            return finish_update_packed(x, r, p, alpha, coeffs, og, tail, factors=fstack, kind=kind)
        return cg_update_packed(x, r, p, ap, alpha, factors=fstack, kind=kind)

    return fused


def _defer_finish(grid: Grid, params: SolverParams, fused_update) -> bool:
    """Whether apply_dot should return the deferred (out_grid, up) pair:
    only when the fused finish+update kernel will consume it."""
    return bool(params.do_reduced_regions and fused_update is not None)


def make_preconditioner_packed(grid: Grid, cls: Classification, asm: Assembled, params: SolverParams, factors=None):
    """Packed-layout preconditioners (identity / Jacobi / arrow).  Pass
    `factors` (precond_factors_packed) to reuse setup across jitted
    segment calls."""
    if params.preconditioner == PreconditionerType.IDENTITY:
        return None
    if factors is None:
        factors = precond_factors_packed(grid, cls, asm, params)
    if params.preconditioner in (PreconditionerType.CELL_ARROW, PreconditionerType.REGION_ARROW):
        k, inv_d, kd = factors["k"], factors["inv_d"], factors["kd"]
        inv_schur, te_inv_s = factors["inv_schur"], factors["te_inv_s"]

        def solve_arrow(rp):
            z_p = (rp[0] + sum(kd[a] * rp[1 + a] for a in range(3))) * inv_schur
            z_tc = [(rp[1 + a] + k[a] * z_p) * inv_d[a] for a in range(3)]
            z_te = [rp[4 + e] * te_inv_s[e] for e in range(3)]
            return jnp.stack([z_p] + z_tc + z_te, axis=0)

        if "sinv" not in factors:
            return solve_arrow

        # REGION_ARROW's Woodbury correction on the packed layout:
        # z = y - M0^-1 F^T chi J^T S^-1 J chi F y, y = M0^-1 r — the
        # moments/expand legs reuse the fused reduced-apply kernels.
        from .pallas_apply import _pad_halo, expand_packed, moments_packed, pack_coeffs, transpose_u_packed

        R = asm.binv.shape[0]
        T = params.tile_size
        storage = jnp.bfloat16 if params.coeff_bf16 else None
        coeffs = pack_coeffs(asm, cls, storage_dtype=storage)
        algebra, red_packed = _region_algebra_packed(grid, cls, asm, params, R, matrix=factors["sinv"])

        def solve_region(rp):
            y = solve_arrow(rp)
            mom = moments_packed(_pad_halo(y), coeffs, grid.res, T, params.basis)
            v = algebra(mom)
            up = expand_packed(v, red_packed, grid.res, T, params.basis)
            g = transpose_u_packed(coeffs, up, grid.res)
            return y - solve_arrow(g)

        return solve_region

    inv_packed = factors["inv_packed"]

    def solve_diag(rp):
        return inv_packed * rp

    return solve_diag


def make_apply(grid: Grid, cls: Classification, asm: Assembled, params: SolverParams, R: int):
    reduced = params.do_reduced_regions

    if params.use_pallas and _use_packed(grid, params):
        from .pallas_apply import pack_ptau, unpack_ptau

        apply_packed = make_apply_packed(grid, cls, asm, params, R)

        def apply_A_pallas(x: PTau) -> PTau:
            return unpack_ptau(apply_packed(pack_ptau(x)))

        return apply_A_pallas

    def apply_A(x: PTau) -> PTau:
        s = forward_face_values(asm, x)  # (G p + Dt tau) on every face
        # active branch: -dt [G Dt]^T McInv [G Dt] x
        fv = [-asm.dt * asm.mc_inv[a] * s[a] for a in range(3)]
        if reduced:
            # reduced branch: -[JG JDt]^T BInv [JG JDt] x
            y = reduce_J(grid, cls, asm.com, s, params, R)
            w = jnp.einsum("rij,rj->ri", asm.binv, y)
            u = expand_J(grid, cls, asm.com, w, params)
            fv = [fv[a] - u[a] for a in range(3)]
        out = transpose_from_faces(asm, fv)
        tc = tuple(out.tc[a] - 0.5 * asm.uinv_c * x.tc[a] for a in range(3))
        te = tuple(out.te[e] - 0.5 * asm.uinv_e[e] * x.te[e] for e in range(3))
        return PTau(p=out.p, tc=tc, te=te)

    return apply_A


def build_rhs(grid: Grid, cls: Classification, asm: Assembled, params: SolverParams, R: int) -> PTau:
    """b = -[G Dt]^T McInv b_v - (1/dt) [JG JDt]^T BInv b_w + rhs_solid
    (AssembleSystem.cpp:448-459)."""
    fv = [-(asm.mc_inv[a] * asm.b_v[a]) for a in range(3)]
    if params.do_reduced_regions:
        w0 = jnp.einsum("rij,rj->ri", asm.binv, asm.b_w) / asm.dt
        u0 = expand_J(grid, cls, asm.com, w0, params)
        fv = [fv[a] - u0[a] for a in range(3)]
    b = transpose_from_faces(asm, fv)
    return b + asm.rhs_solid


def recover_velocity(grid: Grid, cls: Classification, asm: Assembled, x: PTau, params: SolverParams, R: int):
    """v = dt McInv (b_v/dt - G p - Dt tau);  w = BInv (b_w/dt - JG p - JDt tau)
    (recoverVelocityFromPressureStress, Solver.cpp:493-510)."""
    s = forward_face_values(asm, x)
    v = tuple(asm.mc_inv[a] * asm.b_v[a] - asm.dt * asm.mc_inv[a] * s[a] for a in range(3))
    if params.do_reduced_regions:
        y = reduce_J(grid, cls, asm.com, s, params, R)
        w = jnp.einsum("rij,rj->ri", asm.binv, asm.b_w / asm.dt - y)
    else:
        w = jnp.zeros((R, params.reduced_dof), params.dtype)
    return v, w


def apply_solution_to_velocity(grid: Grid, cls: Classification, asm: Assembled, scene: Scene, v, w, params: SolverParams):
    """Per-face write-back (applySolutionToVelocity, Solver.cpp:938-1028):
    reduced faces evaluate the region polynomial, active faces take the
    solved value, solid faces take the collision velocity; invalid faces
    keep their previous velocity.  Also returns the valid-face masks
    (buildValidFaces, Classifier.cpp:5-54)."""
    if params.do_reduced_regions:
        u_red = expand_J(grid, cls, asm.com, w, params)
    else:
        u_red = [jnp.zeros(grid.face_shape(a), params.dtype) for a in range(3)]
    new_vel = []
    valid = []
    for a in range(3):
        lbl = cls.face_labels[a]
        val = lbl != UNSOLVED
        red = (lbl == REDUCED) & (cls.face_region[a] >= 0)
        act = is_active(lbl)
        sol = lbl == SOLID
        out = jnp.where(
            red,
            u_red[a],
            jnp.where(
                act,
                v[a],
                jnp.where(sol, scene.collision_velocity[a].astype(params.dtype), scene.velocity[a].astype(params.dtype)),
            ),
        )
        out = jnp.where(val, out, scene.velocity[a].astype(params.dtype))
        new_vel.append(out)
        valid.append(val)
    return tuple(new_vel), tuple(valid)


# ---------------------------------------------------------------------------
# The full step
# ---------------------------------------------------------------------------

def _dof_counts(cls: Classification):
    n_center = jnp.sum(is_active(cls.cell_labels))
    n_faces = sum(jnp.sum(is_active(l)) for l in cls.face_labels)
    n_edges = sum(jnp.sum(is_active(l)) for l in cls.edge_labels)
    return n_center, n_faces, n_edges


@precise_matmul
def _setup(grid: Grid, scene: Scene, params: SolverParams):
    """Weights -> classify -> assemble (the scene-dependent, solve-
    independent part of the pipeline)."""
    R = effective_max_regions(grid, params)
    liquid_w, fluid_w = compute_weights(grid, scene.surface_sdf, scene.collision_sdf, params.dtype)
    liquid_w, fluid_w = _apply_input_weights(liquid_w, fluid_w, scene, params.dtype)
    cls = classify(grid, liquid_w, fluid_w, params)
    asm, _rd = assemble(grid, scene, cls, liquid_w, fluid_w, params, R)
    return cls, asm


@precise_matmul
def _make_deflation(grid: Grid, cls, asm, params: SolverParams):
    """Build the A-DEF2 deflation state (deflation.py) when enabled and
    statically supported; None otherwise.  Probe applies use the packed
    layout (wrapping the PTau apply when the Pallas path is off)."""
    from .deflation import build_deflation, deflation_supported

    if not params.deflation:
        return None
    if not deflation_supported(grid, params):
        import warnings

        warnings.warn(
            "deflation requested but unsupported for this grid/params "
            "(coarse tile must divide the resolution; reduced solves must "
            "be tiled with deflation_tile a multiple of tile_size) — "
            "continuing without deflation",
            stacklevel=2,
        )
        return None
    R = effective_max_regions(grid, params)
    if _use_packed(grid, params):
        ap = make_apply_packed(grid, cls, asm, params, R)
    else:
        from .pallas_apply import pack_ptau, unpack_ptau

        inner = make_apply(grid, cls, asm, params, R)

        def ap(xp):
            return pack_ptau(inner(unpack_ptau(xp)))

    return build_deflation(grid, cls, params, ap)


# Module-level jitted wrappers: solve_chunked used to create fresh
# jax.jit wrappers per call, re-tracing + re-lowering the whole setup
# graph every solve (whole seconds of host time at 256^3 even with the
# persistent compile cache).  One wrapper each -> warm calls are pure
# executable-cache hits.
_setup_jit = jax.jit(_setup, static_argnames=("grid", "params"))
_make_deflation_jit = jax.jit(_make_deflation, static_argnames=("grid", "params"))
_precond_factors_packed_jit = jax.jit(precond_factors_packed, static_argnames=("grid", "params"))


@precise_matmul
def _build_krylov_system(grid: Grid, cls, asm, scene: Scene, params: SolverParams, initial_guess=None, defl=None, pfac=None, mesh=None, mesh_axis="x"):
    """(apply_K, precond, b_K, x0_K, packed): the Krylov-space operator,
    preconditioner, RHS and initial guess — packed [7,...] channel layout
    when the fused Pallas path is enabled, PTau otherwise.  `defl` (a
    DeflationState) wraps the preconditioner in the A-DEF2 two-level
    combination and projects the initial guess.  `pfac` (precomputed
    precond_factors_packed) skips the factor probe — the chunked driver
    computes it once and threads it through init and every segment
    (recomputing it inside _chunk_init cost whole seconds per solve at
    128^3).

    `mesh` (a >1-device jax.sharding.Mesh whose only >1 axis is
    `mesh_axis`) routes the packed apply through the shard_map'ed x-slab
    kernels (parallel/shard_apply) so a multi-chip solve keeps the fused
    Pallas path; the fused pAp/update kernels are single-device-only and
    are skipped under a mesh (the caller pre-flights legality with
    parallel.sharding.pallas_shardable)."""
    R = effective_max_regions(grid, params)
    packed = _use_packed(grid, params)
    b = build_rhs(grid, cls, asm, params, R)

    x0 = PTau(
        p=jnp.zeros(grid.center_shape, params.dtype),
        tc=tuple(jnp.zeros(grid.center_shape, params.dtype) for _ in range(3)),
        te=tuple(jnp.zeros_like(asm.uinv_e[e]) for e in range(3)),
    )
    if initial_guess is not None:
        x0 = initial_guess
    elif params.device_warm_start and params.use_warm_start:
        fguess = list(asm.old_v)
        if params.do_reduced_regions:
            u_fit = expand_J(grid, cls, asm.com, asm.best_fit, params)
            fguess = [fguess[a] + u_fit[a] for a in range(3)]
        t = transpose_from_faces(asm, fguess)
        x0 = PTau(
            p=-t.p,
            tc=tuple(2.0 * asm.uinv_c * t.tc[a] for a in range(3)),
            te=tuple(2.0 * asm.uinv_e[e] * t.te[e] for e in range(3)),
        )

    if packed:
        from .pallas_apply import pack_ptau

        sharded = mesh is not None and mesh.size > 1
        if sharded:
            from .parallel.shard_apply import make_apply_packed_sharded

            apply_K = make_apply_packed_sharded(grid, cls, asm, params, R, mesh, axis=mesh_axis)
            # the fused pAp / fused-update kernels are single-device
            # programs; under a mesh the CG runs plain apply + XLA BLAS1
            # (GSPMD psums the dots over the mesh)
            fused_update = None
            apply_dot = None
        else:
            apply_K = make_apply_packed(grid, cls, asm, params, R)
        if pfac is None:
            pfac = precond_factors_packed(grid, cls, asm, params)
        if not sharded:
            fused_update = make_fused_update(grid, params, pfac, cls=cls, asm=asm)
            apply_dot = (
                make_apply_packed_pap(grid, cls, asm, params, R, defer_finish=_defer_finish(grid, params, fused_update))
                if params.fuse_pap
                else None
            )
        precond = make_preconditioner_packed(grid, cls, asm, params, factors=pfac)
        b_K, x0_K = pack_ptau(b), pack_ptau(x0)
        if defl is not None:
            from .deflation import deflate_guess_packed, deflated_precond_packed

            x0_K = deflate_guess_packed(defl, apply_K, b_K, x0_K)
            precond = deflated_precond_packed(defl, apply_K, base=precond)
        return apply_K, apply_dot, fused_update, precond, b_K, x0_K, True
    from .precond import make_preconditioner

    apply_K = make_apply(grid, cls, asm, params, R)
    precond = make_preconditioner(grid, cls, asm, params)
    if defl is not None:
        from .deflation import deflated_precond_ptau, deflate_guess_ptau

        x0 = deflate_guess_ptau(defl, apply_K, b, x0)
        precond = deflated_precond_ptau(defl, apply_K, base=precond)
    return apply_K, None, None, precond, b, x0, False


@partial(jax.jit, static_argnames=("grid", "params", "mesh", "mesh_axis"))
@precise_matmul
def _chunk_init(grid: Grid, scene: Scene, params: SolverParams, cls, asm, initial_guess=None, defl=None, pfac=None, mesh=None, mesh_axis="x"):
    apply_K, _apply_dot, _fused_update, precond, b_K, x0_K, _packed = _build_krylov_system(grid, cls, asm, scene, params, initial_guess, defl, pfac, mesh=mesh, mesh_axis=mesh_axis)
    return krylov.pcg_init(apply_K, b_K, x0_K, precond)


@partial(jax.jit, static_argnames=("grid", "params", "segment_iters", "mesh", "mesh_axis"), donate_argnames=("carry",))
@precise_matmul
def _chunk_segment(grid: Grid, params: SolverParams, cls, asm, carry, segment_iters: int, defl=None, pfac=None, mesh=None, mesh_axis="x"):
    R = effective_max_regions(grid, params)
    packed = _use_packed(grid, params)
    apply_dot = None
    fused_update = None
    if packed:
        sharded = mesh is not None and mesh.size > 1
        if sharded:
            from .parallel.shard_apply import make_apply_packed_sharded

            apply_K = make_apply_packed_sharded(grid, cls, asm, params, R, mesh, axis=mesh_axis)
        else:
            apply_K = make_apply_packed(grid, cls, asm, params, R)
            fused_update = make_fused_update(grid, params, pfac, cls=cls, asm=asm)
            if params.fuse_pap:
                apply_dot = make_apply_packed_pap(grid, cls, asm, params, R, defer_finish=_defer_finish(grid, params, fused_update))
        precond = make_preconditioner_packed(grid, cls, asm, params, factors=pfac)
        if defl is not None:
            from .deflation import deflated_precond_packed

            precond = deflated_precond_packed(defl, apply_K, base=precond)
    else:
        from .precond import make_preconditioner

        apply_K = make_apply(grid, cls, asm, params, R)
        precond = make_preconditioner(grid, cls, asm, params)
        if defl is not None:
            from .deflation import deflated_precond_ptau

            precond = deflated_precond_ptau(defl, apply_K, base=precond)
    return krylov.pcg_segment(
        apply_K, carry, precond, tol=params.tolerance,
        max_iters=params.max_iterations, segment_iters=segment_iters,
        apply_dot=apply_dot, fused_update=fused_update,
    )


@partial(jax.jit, static_argnames=("grid", "params"))
@precise_matmul
def _chunk_finalize(grid: Grid, scene: Scene, params: SolverParams, cls, asm, carry):
    R = effective_max_regions(grid, params)
    res = krylov.pcg_result(carry)
    if _use_packed(grid, params):
        from .pallas_apply import unpack_ptau

        x = unpack_ptau(res.x)
    else:
        x = res.x
    v, w = recover_velocity(grid, cls, asm, x, params, R)
    new_vel, valid = apply_solution_to_velocity(grid, cls, asm, scene, v, w, params)
    converged = res.converged
    if _use_packed(grid, params):
        # fail safe on the packed layout invariant (see step()): liquid
        # touching the domain box makes the dropped index-0 planes carry
        # active DOFs -> poison converged instead of wrong physics
        boundary_active = jnp.int32(0)
        for a in range(3):
            sl = [slice(None)] * 3
            sl[a] = slice(0, 1)
            boundary_active += jnp.sum(is_active(cls.face_labels[a][tuple(sl)]))
        from .grid import EDGE_OFFSET_AXES

        for e in range(3):
            for ax in EDGE_OFFSET_AXES[e]:
                sl = [slice(None)] * 3
                sl[ax] = slice(0, 1)
                boundary_active += jnp.sum(is_active(cls.edge_labels[e][tuple(sl)]))
        converged = converged & (boundary_active == 0)
    if not params.keep_non_converged:
        new_vel = tuple(
            jnp.where(converged, nv, scene.velocity[a].astype(params.dtype))
            for a, nv in enumerate(new_vel)
        )
    n_center, n_faces, n_edges = _dof_counts(cls)
    stats = {
        "iterations": res.iterations,
        "error": res.error,
        "converged": converged,
        "n_pressures": n_center,
        "n_active_velocities": n_faces,
        "n_stresses": 3 * n_center + n_edges,
        "n_regions": cls.n_regions,
        "n_reduced_dofs": cls.n_regions * params.reduced_dof,
        "region_overflow": cls.region_overflow,
    }
    return new_vel, valid, stats


def solve_chunked(
    grid: Grid,
    scene: Scene,
    params: SolverParams,
    segment_iters: int = 500,
    max_seconds: float = None,
    callback=None,
    state_path: str = None,
    resume: bool = False,
    initial_guess=None,
    mesh=None,
    mesh_axis: str = "x",
):
    """One Stokes solve as a host loop over K-iteration jitted CG
    segments, with the Krylov state held on device between calls.

    The chunked structure restores the reference's interrupt semantics
    (opInterrupt polling in every long loop, Classifier.cpp:73-74) for the
    jitted solve — Ctrl-C between segments cancels cleanly and returns the
    partial result under keep_non_converged — and bounds every single
    device execution (a converged 256^3 run exceeds the remote-tunnel
    execution limit as one call, but runs fine as < 4-minute segments).

      * max_seconds: stop after this much wall-clock (partial result)
      * callback(stats_dict) -> truthy to request a stop
      * state_path + resume: persist the PCG carry after each segment and
        resume a killed run from the saved state (same scene/params)

    Returns (new_velocity, valid_masks, stats) like `step`.
    """
    import time as _time

    import numpy as np

    import os as _os

    verbose = bool(int(_os.environ.get("POLYSTOKES_VERBOSE", "0")))

    def _v(msg, t0=[None]):
        if verbose:
            now = _time.monotonic()
            dt = 0.0 if t0[0] is None else now - t0[0]
            t0[0] = now
            print(f"[solve_chunked +{dt:7.1f}s] {msg}", flush=True)

    t_start = _time.monotonic()
    _v("setup...")
    cls, asm = _setup_jit(grid, scene, params)
    jax.block_until_ready(asm.clw_s)
    _v("deflation build...")
    defl = _make_deflation_jit(grid, cls, asm, params)
    pfac = None
    if _use_packed(grid, params):
        _v("precond factors...")
        pfac = _precond_factors_packed_jit(grid, cls, asm, params)
        jax.block_until_ready(pfac)

    _v("chunk init...")
    carry = _chunk_init(grid, scene, params, cls, asm, initial_guess, defl, pfac, mesh=mesh, mesh_axis=mesh_axis)
    jax.block_until_ready(carry.r)
    _v("first segment...")
    if resume and state_path and _os.path.exists(state_path):
        d = np.load(state_path)
        leaves, treedef = jax.tree.flatten(carry)
        arrs = [jnp.asarray(d[f"leaf{i}"], leaves[i].dtype) for i in range(len(leaves))]
        carry = jax.tree.unflatten(treedef, arrs)

    interrupted = False
    try:
        while True:
            carry = _chunk_segment(grid, params, cls, asm, carry, segment_iters, defl, pfac, mesh=mesh, mesh_axis=mesh_axis)
            k = int(carry.k)
            done = bool(carry.done)
            rre = float(carry.rre)
            _v(f"segment done: k={k} rre={rre:.3e} done={done}")
            if state_path:
                leaves = jax.tree.leaves(carry)
                np.savez(state_path, **{f"leaf{i}": np.asarray(l) for i, l in enumerate(leaves)})
            if callback is not None:
                if callback({"iterations": k, "rre": rre, "done": done}):
                    interrupted = True
            if done or k >= params.max_iterations or interrupted:
                break
            if max_seconds is not None and _time.monotonic() - t_start > max_seconds:
                interrupted = True
                break
    except KeyboardInterrupt:
        # the reference's opInterrupt: abort mid-solve, keep partial state
        interrupted = True

    new_vel, valid, stats = _chunk_finalize(grid, scene, params, cls, asm, carry)
    stats = dict(stats)
    stats["interrupted"] = interrupted
    return new_vel, valid, stats


@partial(jax.jit, static_argnames=("grid", "params", "mesh", "mesh_axis"))
@precise_matmul
def step(grid: Grid, scene: Scene, params: SolverParams, initial_guess=None, mesh=None, mesh_axis="x"):
    """One Stokes solve.  Returns (new_velocity, valid_masks, stats).

    `initial_guess` (optional PTau) seeds the Krylov solve — the device
    analog of readInWarmStart + solveWithGuess (Solver.cpp:621-642,
    814-862); see export.solution_guess_ptau for loading an exported
    solution into one.

    `mesh`/`mesh_axis` (static) route the packed apply through the
    shard_map'ed slab kernels for a multi-chip solve; use
    parallel.sharding.sharded_step, which pre-flights legality
    (pallas_shardable) and shards the scene inputs."""
    R = effective_max_regions(grid, params)
    cls, asm = _setup(grid, scene, params)
    defl = _make_deflation(grid, cls, asm, params)

    # packed fast path: the whole Krylov loop runs on channel-stacked
    # [7, nx, ny, nz] vectors through the fused Pallas kernels, with one
    # pack before and one unpack after (pallas_apply.py); the device
    # warm-start guess (constructGuessVectors, Solver.cpp:521-531) is
    # built inside _build_krylov_system
    apply_K, apply_dot, fused_update, precond, b_K, x0_K, packed = _build_krylov_system(grid, cls, asm, scene, params, initial_guess, defl, mesh=mesh, mesh_axis=mesh_axis)
    if packed:
        from .pallas_apply import unpack_ptau

    if params.do_solve:
        if params.solver_type == SolverType.PCG_MATRIX_VECTOR_PRODUCTS:
            res = krylov.pcg(apply_K, b_K, x0_K, precond=precond, tol=params.tolerance, max_iters=params.max_iterations, apply_dot=apply_dot, fused_update=fused_update)
            if params.bicgstab_fallback:
                def _fallback(_):
                    return krylov.bicgstab(apply_K, b_K, x0_K, tol=params.tolerance, max_iters=params.max_iterations)

                def _keep(r):
                    return r

                res = jax.lax.cond(res.converged, _keep, _fallback, res)
        elif params.solver_type == SolverType.BICGSTAB:
            res = krylov.bicgstab(apply_K, b_K, x0_K, tol=params.tolerance, max_iters=params.max_iterations)
        else:
            res = krylov.minres(apply_K, b_K, x0_K, tol=params.tolerance, max_iters=params.max_iterations)
        x = unpack_ptau(res.x) if packed else res.x
    else:
        x = unpack_ptau(x0_K) if packed else x0_K
        res = krylov.KrylovResult(x=x, iterations=jnp.int32(0), error=jnp.asarray(0.0, params.dtype), converged=jnp.bool_(True))

    v, w = recover_velocity(grid, cls, asm, x, params, R)
    new_vel, valid = apply_solution_to_velocity(grid, cls, asm, scene, v, w, params)

    # activity on the dropped index-0 boundary planes (must be 0 for the
    # packed Pallas layout to be exact; see pallas_apply.py docstring)
    boundary_active = jnp.int32(0)
    for a in range(3):
        sl = [slice(None)] * 3
        sl[a] = slice(0, 1)
        boundary_active += jnp.sum(is_active(cls.face_labels[a][tuple(sl)]))
    for e in range(3):
        from .grid import EDGE_OFFSET_AXES

        for ax in EDGE_OFFSET_AXES[e]:
            sl = [slice(None)] * 3
            sl[ax] = slice(0, 1)
            boundary_active += jnp.sum(is_active(cls.edge_labels[e][tuple(sl)]))

    # fail safe on the packed layout invariant: a direct step() caller
    # who skipped check_pallas and has liquid touching the domain box
    # would otherwise get silently wrong physics from the dropped
    # index-0 planes.  Poison converged so downstream (and the
    # keep_non_converged gate below) treats the solve as failed.
    converged = res.converged
    if packed:
        converged = converged & (boundary_active == 0)

    # keep_non_converged semantics (HDK_PolyStokes.C:566-604): on failure,
    # either keep the partial result or leave the velocity untouched.
    if not params.keep_non_converged:
        keep = converged
        new_vel = tuple(jnp.where(keep, nv, scene.velocity[a].astype(params.dtype)) for a, nv in enumerate(new_vel))

    n_center, n_faces, n_edges = _dof_counts(cls)
    stats = {
        "boundary_active": boundary_active,
        "iterations": res.iterations,
        "error": res.error,
        "converged": converged,
        "n_pressures": n_center,
        "n_active_velocities": n_faces,
        "n_stresses": 3 * n_center + n_edges,
        "n_regions": cls.n_regions,
        "n_reduced_dofs": cls.n_regions * params.reduced_dof,
        "region_overflow": cls.region_overflow,
    }
    return new_vel, valid, stats
