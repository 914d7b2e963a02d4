"""Fused Pallas apply == XLA apply (interpret mode on CPU).

The packed layout drops index-0 face/edge planes; the test scenes keep
liquid off the domain boundary, so the operators must agree exactly on
all DOFs (and the boundary_active stat must be 0)."""
import numpy as np
import pytest

import jax.numpy as jnp

from polystokes_tpu.operators import PTau

from test_operators import build_all, make_case


def _make(reduced):
    # x/y must be divisible by 8 for the pallas block picker; the packed
    # layout requires liquid strictly inside the domain box (make_case's
    # all-liquid surface would activate boundary faces)
    import dataclasses

    from polystokes_tpu import sdf

    # tile 8 divides the 16-block and every axis -> pallas-compatible
    grid, params, scene = make_case(res=(16, 16, 16), tile=8, reduced=reduced, solid=False)
    params = params.replace(dtype=jnp.float32, use_pallas=False, tile_padding=2)
    inner = sdf.box((0.12, 0.12, 0.12), (0.88, 0.88, 0.88))
    surface = sdf.sample_at_centers(inner, grid.res, grid.dx, params.dtype)
    scene = dataclasses.replace(scene, surface_sdf=surface)
    R, lw, fw, cls, asm, rd, orc = build_all(grid, params, scene)
    return grid, params, scene, cls, asm, R


@pytest.mark.parametrize("reduced", [False, True])
def test_pallas_apply_matches_xla(reduced):
    from polystokes_tpu.solver import _use_packed, make_apply

    grid, params, scene, cls, asm, R = _make(reduced)
    assert _use_packed(grid, params.replace(use_pallas=True))  # path really taken
    rng = np.random.default_rng(0)
    x = PTau(
        p=jnp.asarray(rng.standard_normal(grid.center_shape), params.dtype),
        tc=tuple(jnp.asarray(rng.standard_normal(grid.center_shape), params.dtype) for _ in range(3)),
        te=tuple(jnp.asarray(rng.standard_normal(np.asarray(asm.uinv_e[e]).shape), params.dtype) for e in range(3)),
    )
    y_xla = make_apply(grid, cls, asm, params, R)(x)
    y_pl = make_apply(grid, cls, asm, params.replace(use_pallas=True), R)(x)

    def maxdiff(a, b):
        return float(jnp.max(jnp.abs(a - b)))

    scale = max(float(jnp.max(jnp.abs(y_xla.p))), 1.0)
    assert maxdiff(y_xla.p, y_pl.p) < 1e-5 * scale
    for a in range(3):
        assert maxdiff(y_xla.tc[a], y_pl.tc[a]) < 1e-5 * scale
    for e in range(3):
        # the pallas path leaves the dropped index-0 planes at 0; the XLA
        # path also produces 0 there when nothing on the boundary is active
        assert maxdiff(y_xla.te[e], y_pl.te[e]) < 1e-5 * scale


def test_pack_roundtrip():
    from polystokes_tpu.pallas_apply import pack_ptau, unpack_ptau

    grid, params, scene, cls, asm, R = _make(False)
    rng = np.random.default_rng(1)
    x = PTau(
        p=jnp.asarray(rng.standard_normal(grid.center_shape), params.dtype),
        tc=tuple(jnp.asarray(rng.standard_normal(grid.center_shape), params.dtype) for _ in range(3)),
        te=tuple(jnp.asarray(rng.standard_normal(np.asarray(asm.uinv_e[e]).shape), params.dtype) for e in range(3)),
    )
    # zero the dropped boundary planes so the roundtrip is exact
    def zero_bnd(arr, e):
        from polystokes_tpu.grid import EDGE_OFFSET_AXES

        for ax in EDGE_OFFSET_AXES[e]:
            sl = [slice(None)] * 3
            sl[ax] = slice(0, 1)
            arr = arr.at[tuple(sl)].set(0.0)
        return arr

    x = PTau(p=x.p, tc=x.tc, te=tuple(zero_bnd(x.te[e], e) for e in range(3)))
    x2 = unpack_ptau(pack_ptau(x))
    assert float(jnp.max(jnp.abs(x.p - x2.p))) == 0.0
    for e in range(3):
        assert float(jnp.max(jnp.abs(x.te[e] - x2.te[e]))) == 0.0


@pytest.mark.parametrize("reduced", [False, True])
def test_pap_fused_matches_separate(reduced):
    """make_apply_packed_pap == (make_apply_packed, <x, Ax>): the fused
    apply+dot kernels (grid_mom_pap / finish_pap / uniform_pap) must
    reproduce the separate apply and the exact CG dot."""
    from polystokes_tpu.pallas_apply import pack_ptau
    from polystokes_tpu.solver import make_apply_packed, make_apply_packed_pap

    grid, params, scene, cls, asm, R = _make(reduced)
    params = params.replace(use_pallas=True)
    rng = np.random.default_rng(2)
    xp = jnp.asarray(rng.standard_normal((7,) + tuple(grid.res)), params.dtype)
    # mask to the packed DOF layout so the dot is over real DOFs only
    from polystokes_tpu.deflation import packed_masks

    xp = xp * packed_masks(grid, cls, params.dtype)

    y_sep = make_apply_packed(grid, cls, asm, params, R)(xp)
    y_fused, pap = make_apply_packed_pap(grid, cls, asm, params, R)(xp)

    scale = max(float(jnp.max(jnp.abs(y_sep))), 1.0)
    assert float(jnp.max(jnp.abs(y_sep - y_fused))) < 1e-5 * scale
    pap_ref = float(jnp.sum(xp * y_sep))
    assert abs(float(pap) - pap_ref) < 1e-4 * max(abs(pap_ref), 1.0)


@pytest.mark.parametrize("pc", ["cell_arrow", "diagonal"])
def test_packed_step_matches_xla_step(pc):
    """Full packed-loop step == XLA step (same iterations, same velocities).
    Identity is omitted: it cannot converge a viscous case in a CPU-sized
    iteration budget (the apply-level test already covers that path)."""
    from polystokes_tpu import step
    from polystokes_tpu.config import PreconditionerType

    grid, params, scene, cls, asm, R = _make(True)
    params = params.replace(
        max_iterations=2000, bicgstab_fallback=False, tolerance=1e-5,
        preconditioner=PreconditionerType(pc),
    )
    v0, _, s0 = step(grid, scene, params)
    v1, _, s1 = step(grid, scene, params.replace(use_pallas=True))
    # both must converge: capped runs drift apart in fp32 iteration noise
    assert bool(s0["converged"]) and bool(s1["converged"])
    assert abs(int(s1["iterations"]) - int(s0["iterations"])) <= 3
    scale = max(float(jnp.max(jnp.abs(v0[0]))), 1e-8)
    for a in range(3):
        np.testing.assert_allclose(np.asarray(v1[a]), np.asarray(v0[a]), atol=2e-4 * scale)


@pytest.mark.parametrize("by", [4, 2])
def test_partial_y_blocks_match(monkeypatch, by):
    """by < tile (the nz>128 VMEM regime at 256^3): partial-cube moments
    accumulate across the ypb consecutive y-grid blocks of a cube column
    (_mom_block / _mom_spec).  Forced here by shrinking the y block, and
    checked against the XLA apply and the fused pAp pair."""
    import polystokes_tpu.pallas_apply as pa
    from polystokes_tpu.solver import make_apply, make_apply_packed, make_apply_packed_pap

    grid, params, scene, cls, asm, R = _make(True)
    monkeypatch.setattr(pa, "_blocks_for", lambda res: (8, by))
    assert pa.pallas_compatible(grid.res, params)  # T=8, T % by == 0
    rng = np.random.default_rng(3)
    x = PTau(
        p=jnp.asarray(rng.standard_normal(grid.center_shape), params.dtype),
        tc=tuple(jnp.asarray(rng.standard_normal(grid.center_shape), params.dtype) for _ in range(3)),
        te=tuple(jnp.asarray(rng.standard_normal(np.asarray(asm.uinv_e[e]).shape), params.dtype) for e in range(3)),
    )
    y_xla = make_apply(grid, cls, asm, params, R)(x)
    y_pl = make_apply(grid, cls, asm, params.replace(use_pallas=True), R)(x)
    scale = max(float(jnp.max(jnp.abs(y_xla.p))), 1.0)
    assert float(jnp.max(jnp.abs(y_xla.p - y_pl.p))) < 1e-5 * scale
    for a in range(3):
        assert float(jnp.max(jnp.abs(y_xla.tc[a] - y_pl.tc[a]))) < 1e-5 * scale
    for e in range(3):
        assert float(jnp.max(jnp.abs(y_xla.te[e] - y_pl.te[e]))) < 1e-5 * scale

    # fused pAp path under the same partial-y blocks
    from polystokes_tpu.deflation import packed_masks

    pparams = params.replace(use_pallas=True)
    xp = jnp.asarray(rng.standard_normal((7,) + tuple(grid.res)), params.dtype)
    xp = xp * packed_masks(grid, cls, params.dtype)
    y_sep = make_apply_packed(grid, cls, asm, pparams, R)(xp)
    y_fused, pap = make_apply_packed_pap(grid, cls, asm, pparams, R)(xp)
    assert float(jnp.max(jnp.abs(y_sep - y_fused))) < 1e-5 * scale
    pap_ref = float(jnp.sum(xp * y_sep))
    assert abs(float(pap) - pap_ref) < 1e-4 * max(abs(pap_ref), 1.0)


@pytest.mark.parametrize("bx,by", [(4, 8), (4, 4), (8, 4)])
def test_partial_xy_blocks_match(monkeypatch, bx, by):
    """Tile larger than the block on x (the T=32/64 regime): partial-cube
    moments accumulate across the xpb*ypb consecutive sub-grid steps of a
    cube column (3-D grid in _grid_and_specs).  Forced here by shrinking
    both block axes below the tile, and checked against the XLA apply and
    the fused pAp pair."""
    import polystokes_tpu.pallas_apply as pa
    from polystokes_tpu.solver import make_apply, make_apply_packed, make_apply_packed_pap

    grid, params, scene, cls, asm, R = _make(True)
    monkeypatch.setattr(pa, "_blocks_for", lambda res: (bx, by))
    assert pa.pallas_compatible(grid.res, params)  # T=8 is a multiple of bx/by
    rng = np.random.default_rng(7)
    x = PTau(
        p=jnp.asarray(rng.standard_normal(grid.center_shape), params.dtype),
        tc=tuple(jnp.asarray(rng.standard_normal(grid.center_shape), params.dtype) for _ in range(3)),
        te=tuple(jnp.asarray(rng.standard_normal(np.asarray(asm.uinv_e[e]).shape), params.dtype) for e in range(3)),
    )
    y_xla = make_apply(grid, cls, asm, params, R)(x)
    y_pl = make_apply(grid, cls, asm, params.replace(use_pallas=True), R)(x)
    scale = max(float(jnp.max(jnp.abs(y_xla.p))), 1.0)
    assert float(jnp.max(jnp.abs(y_xla.p - y_pl.p))) < 1e-5 * scale
    for a in range(3):
        assert float(jnp.max(jnp.abs(y_xla.tc[a] - y_pl.tc[a]))) < 1e-5 * scale
    for e in range(3):
        assert float(jnp.max(jnp.abs(y_xla.te[e] - y_pl.te[e]))) < 1e-5 * scale

    # fused pAp path under the same partial-cube sub-grid
    from polystokes_tpu.deflation import packed_masks

    pparams = params.replace(use_pallas=True)
    xp = jnp.asarray(rng.standard_normal((7,) + tuple(grid.res)), params.dtype)
    xp = xp * packed_masks(grid, cls, params.dtype)
    y_sep = make_apply_packed(grid, cls, asm, pparams, R)(xp)
    y_fused, pap = make_apply_packed_pap(grid, cls, asm, pparams, R)(xp)
    assert float(jnp.max(jnp.abs(y_sep - y_fused))) < 1e-5 * scale
    pap_ref = float(jnp.sum(xp * y_sep))
    assert abs(float(pap) - pap_ref) < 1e-4 * max(abs(pap_ref), 1.0)


def test_large_tile_compatible():
    """pallas_compatible admits tiles LARGER than the block (whole blocks
    per cube) and still rejects incommensurate sizes."""
    import polystokes_tpu.pallas_apply as pa

    grid, params, scene, cls, asm, R = _make(True)
    # 128^3-style resolutions: blocks are (16, 16) or (16, 8)
    assert pa.pallas_compatible((128, 128, 128), params.replace(tile_size=32))
    assert pa.pallas_compatible((128, 128, 128), params.replace(tile_size=64))
    assert pa.pallas_compatible((256, 256, 256), params.replace(tile_size=64))
    assert not pa.pallas_compatible((128, 128, 128), params.replace(tile_size=24))


def test_boundary_active_stat():
    from polystokes_tpu import step

    # interior liquid -> 0; all-liquid box -> nonzero (detects violations)
    grid, params, scene, cls, asm, R = _make(True)
    params = params.replace(max_iterations=5, bicgstab_fallback=False)
    _, _, stats = step(grid, scene, params)
    assert int(stats["boundary_active"]) == 0

    grid2, params2, scene2 = make_case(res=(16, 16, 12), tile=6, reduced=True, solid=False)
    params2 = params2.replace(dtype=jnp.float32, max_iterations=5, bicgstab_fallback=False)
    _, _, stats2 = step(grid2, scene2, params2)
    assert int(stats2["boundary_active"]) > 0


@pytest.mark.parametrize("kind", ["none", "diag", "arrow"])
def test_cg_update_kernel_matches_manual(kind):
    """cg_update_packed == the unfused axpys + pointwise preconditioner +
    three dots, for each qualifying preconditioner kind."""
    import jax.numpy as jnp

    from polystokes_tpu.pallas_apply import cg_update_packed, pack_arrow_factors
    from polystokes_tpu.solver import make_preconditioner_packed, precond_factors_packed
    from polystokes_tpu.config import PreconditionerType

    grid, params, scene, cls, asm, R = _make(True)
    rng = np.random.default_rng(5)
    shape = (7,) + tuple(grid.res)
    x, r, p, ap = (jnp.asarray(rng.standard_normal(shape), params.dtype) for _ in range(4))
    alpha = jnp.asarray(0.37, params.dtype)

    if kind == "arrow":
        params = params.replace(preconditioner=PreconditionerType.CELL_ARROW)
        pfac = precond_factors_packed(grid, cls, asm, params)
        fstack = pack_arrow_factors(pfac)
        precond = make_preconditioner_packed(grid, cls, asm, params, factors=pfac)
    elif kind == "diag":
        params = params.replace(preconditioner=PreconditionerType.DIAGONAL)
        pfac = precond_factors_packed(grid, cls, asm, params)
        fstack = pfac["inv_packed"]
        precond = make_preconditioner_packed(grid, cls, asm, params, factors=pfac)
    else:
        fstack, precond = None, (lambda v: v)

    xo, ro, zo, rr, xx, rz = cg_update_packed(x, r, p, ap, alpha, factors=fstack, kind=kind)
    x_ref = x + alpha * p
    r_ref = r - alpha * ap
    z_ref = precond(r_ref)

    def close(a, b, tol=1e-5):
        s = max(float(jnp.max(jnp.abs(b))), 1.0)
        assert float(jnp.max(jnp.abs(a - b))) < tol * s

    close(xo, x_ref)
    close(ro, r_ref)
    close(zo, z_ref)
    for got, ref in ((rr, jnp.sum(r_ref * r_ref)), (xx, jnp.sum(x_ref * x_ref)), (rz, jnp.sum(r_ref * z_ref))):
        assert abs(float(got) - float(ref)) < 1e-4 * max(abs(float(ref)), 1.0)


@pytest.mark.parametrize("pc", ["cell_arrow", "identity"])
def test_fused_update_step_matches_unfused(pc):
    """Full packed step with fuse_update on == off (iterations within
    fp-noise, same velocities)."""
    from polystokes_tpu import step
    from polystokes_tpu.config import PreconditionerType

    grid, params, scene, cls, asm, R = _make(True)
    params = params.replace(
        use_pallas=True, max_iterations=2000, bicgstab_fallback=False, tolerance=1e-5,
        preconditioner=PreconditionerType(pc),
    )
    if pc == "identity":
        params = params.replace(max_iterations=4000)
    v0, _, s0 = step(grid, scene, params.replace(fuse_update=False))
    v1, _, s1 = step(grid, scene, params.replace(fuse_update=True))
    assert bool(s0["converged"]) and bool(s1["converged"])
    assert abs(int(s1["iterations"]) - int(s0["iterations"])) <= 3
    scale = max(float(jnp.max(jnp.abs(v0[0]))), 1e-8)
    for a in range(3):
        np.testing.assert_allclose(np.asarray(v1[a]), np.asarray(v0[a]), atol=2e-4 * scale)


def test_coeff_bf16_close_and_symmetric():
    """bf16 coefficient storage: the packed apply stays within the bf16
    coefficient rounding of the f32 operator, and remains exactly
    self-adjoint over the DOF masks (forward and transpose read the SAME
    rounded values)."""
    from polystokes_tpu.deflation import packed_masks
    from polystokes_tpu.solver import make_apply_packed

    grid, params, scene, cls, asm, R = _make(True)
    pparams = params.replace(use_pallas=True)
    rng = np.random.default_rng(9)
    m = packed_masks(grid, cls, params.dtype)
    xp = jnp.asarray(rng.standard_normal((7,) + tuple(grid.res)), params.dtype) * m
    yp = jnp.asarray(rng.standard_normal((7,) + tuple(grid.res)), params.dtype) * m

    A32 = make_apply_packed(grid, cls, asm, pparams, R)
    A16 = make_apply_packed(grid, cls, asm, pparams.replace(coeff_bf16=True), R)
    ax32, ax16 = A32(xp), A16(xp)
    scale = float(jnp.max(jnp.abs(ax32)))
    assert float(jnp.max(jnp.abs(ax32 - ax16))) < 0.03 * scale  # bf16 rounding
    # exact symmetry of the bf16-coefficient operator
    lhs = float(jnp.sum(yp * ax16))
    rhs = float(jnp.sum(xp * A16(yp)))
    assert abs(lhs - rhs) < 1e-4 * max(abs(lhs), 1.0)


def _finish_case(kind):
    """Shared setup for the deferred-finish kernel tests: one pass-1
    evaluation plus the reference finish_update inputs."""
    from polystokes_tpu.pallas_apply import (
        _pad_halo,
        expand_packed,
        grid_mom_pap_packed,
        pack_arrow_factors,
        pack_coeffs,
    )
    from polystokes_tpu.config import PreconditionerType
    from polystokes_tpu.deflation import packed_masks
    from polystokes_tpu.solver import _region_algebra_packed, precond_factors_packed

    grid, params, scene, cls, asm, R = _make(True)
    if kind == "arrow":
        params = params.replace(preconditioner=PreconditionerType.CELL_ARROW)
    params = params.replace(use_pallas=True)
    T = params.tile_size
    rng = np.random.default_rng(11)
    shape = (7,) + tuple(grid.res)
    xp, rp, pp = (jnp.asarray(rng.standard_normal(shape), params.dtype) for _ in range(3))
    pp = pp * packed_masks(grid, cls, params.dtype)
    coeffs = pack_coeffs(asm, cls)
    algebra, red_packed = _region_algebra_packed(grid, cls, asm, params, R)
    og, mom, _ = grid_mom_pap_packed(_pad_halo(pp), coeffs, grid.res, T, params.basis)
    v_arr = algebra(mom)
    up = expand_packed(v_arr, red_packed, grid.res, T, params.basis)
    alpha = jnp.asarray(0.37, params.dtype)
    fstack = None
    if kind == "arrow":
        fstack = pack_arrow_factors(precond_factors_packed(grid, cls, asm, params))
    return grid, params, T, xp, rp, pp, coeffs, og, v_arr, up, alpha, fstack


@pytest.mark.parametrize("kind", ["none", "arrow"])
def test_exp_finish_update_matches_unfused(kind):
    """exp_finish_update_packed (in-kernel polynomial expand) ==
    finish_update_packed fed the materialized expand_packed output."""
    from polystokes_tpu.pallas_apply import exp_finish_update_packed, finish_update_packed

    grid, params, T, xp, rp, pp, coeffs, og, v_arr, up, alpha, fstack = _finish_case(kind)
    ref = finish_update_packed(xp, rp, pp, alpha, coeffs, og, up, factors=fstack, kind=kind)
    got = exp_finish_update_packed(
        xp, rp, pp, alpha, coeffs, og, v_arr, grid.res, T, params.basis,
        factors=fstack, kind=kind,
    )
    for name, a, b in zip(("x", "r", "z", "rr", "xx", "rz"), got, ref):
        a, b = np.asarray(a), np.asarray(b)
        s = max(float(np.abs(b).max()), 1.0)
        assert float(np.abs(a - b).max()) < 1e-5 * s, name


@pytest.mark.parametrize("bx,by", [(8, 4), (4, 8), (4, 4)])
def test_exp_finish_update_partial_blocks(monkeypatch, bx, by):
    """The fused expand+finish under blocks smaller than the tile (the
    nz>128 VMEM regime: 256^3 single-region/tiled-16 uses by=8 < T=16):
    the window fringes cross cube boundaries and the traced cube-index
    segment decomposition must still match the materialized-up path."""
    import polystokes_tpu.pallas_apply as pa
    from polystokes_tpu.pallas_apply import exp_finish_update_packed, finish_update_packed

    monkeypatch.setattr(pa, "_blocks_for", lambda res: (bx, by))
    assert pa.exp_finish_supported((16, 16, 16), 8)
    grid, params, T, xp, rp, pp, coeffs, og, v_arr, up, alpha, fstack = _finish_case("arrow")
    ref = finish_update_packed(xp, rp, pp, alpha, coeffs, og, up, factors=fstack, kind="arrow")
    got = exp_finish_update_packed(
        xp, rp, pp, alpha, coeffs, og, v_arr, grid.res, T, params.basis,
        factors=fstack, kind="arrow",
    )
    for name, a, b in zip(("x", "r", "z", "rr", "xx", "rz"), got, ref):
        a, b = np.asarray(a), np.asarray(b)
        s = max(float(np.abs(b).max()), 1.0)
        assert float(np.abs(a - b).max()) < 1e-5 * s, name


def test_exp_finish_supported_gate():
    """Configs with halo > min(tile, block) fall outside the fused
    expand+finish kernel's static support and must be rejected (the
    solver then falls back to the materialized-up finish)."""
    import polystokes_tpu.pallas_apply as pa

    assert pa.exp_finish_supported((128, 128, 128), 16)
    assert pa.exp_finish_supported((256, 256, 256), 16)  # by=8 < T
    assert pa.exp_finish_supported((128, 128, 128), 64)  # T > blocks
    assert not pa.exp_finish_supported((128, 128, 128), 2)  # T < HALO_Y


def test_fuse_expand_step_matches_unfused():
    """Full packed step with fuse_expand on == off (same iterations up to
    fp noise, same velocities)."""
    from polystokes_tpu import step
    from polystokes_tpu.config import PreconditionerType

    grid, params, scene, cls, asm, R = _make(True)
    params = params.replace(
        use_pallas=True, fuse_update=True, max_iterations=2000,
        bicgstab_fallback=False, tolerance=1e-5,
        preconditioner=PreconditionerType.CELL_ARROW,
    )
    v0, _, s0 = step(grid, scene, params.replace(fuse_expand=False))
    v1, _, s1 = step(grid, scene, params.replace(fuse_expand=True))
    assert bool(s0["converged"]) and bool(s1["converged"])
    assert abs(int(s1["iterations"]) - int(s0["iterations"])) <= 3
    scale = max(float(jnp.max(jnp.abs(v0[0]))), 1e-8)
    for a in range(3):
        np.testing.assert_allclose(np.asarray(v1[a]), np.asarray(v0[a]), atol=2e-4 * scale)


def test_boundary_liquid_fails_safe():
    """Packed layout invariant made safe in step()/solve_chunked itself
    (not only in the check_pallas pre-flight): liquid touching the domain
    box means active DOFs on the dropped index-0 planes -> the solve must
    poison converged=False and (under keep_non_converged=False) leave the
    velocity untouched, never silently compute wrong physics."""
    from polystokes_tpu import step
    from polystokes_tpu.solver import _use_packed, solve_chunked

    # make_case's all-liquid surface touches every domain boundary plane
    grid, params, scene = make_case(res=(16, 16, 16), tile=8, reduced=True, solid=False)
    params = params.replace(
        dtype=jnp.float32, use_pallas=True, tile_padding=2,
        keep_non_converged=False, tolerance=1e3, max_iterations=20,
        bicgstab_fallback=False,
    )
    assert _use_packed(grid, params)  # the packed path really is taken

    new_vel, valid, stats = step(grid, scene, params)
    assert int(stats["boundary_active"]) > 0  # the invariant really is violated
    assert not bool(stats["converged"])  # poisoned, despite the loose tolerance
    for a in range(3):  # velocity untouched under keep_non_converged=False
        np.testing.assert_array_equal(
            np.asarray(new_vel[a]), np.asarray(scene.velocity[a], dtype=np.float32)
        )

    new_vel, _, stats = solve_chunked(grid, scene, params, segment_iters=10)
    assert not bool(stats["converged"])
    for a in range(3):
        np.testing.assert_array_equal(
            np.asarray(new_vel[a]), np.asarray(scene.velocity[a], dtype=np.float32)
        )
