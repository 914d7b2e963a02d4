"""Cross-check the vectorized matrix-free operators against the explicit
loop-based scipy oracle on small random scenes."""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from polystokes_tpu import sdf
from polystokes_tpu.classify import classify, effective_max_regions, is_active
from polystokes_tpu.config import SolverParams
from polystokes_tpu.grid import Grid
from polystokes_tpu.operators import PTau
from polystokes_tpu.solver import (
    Scene,
    assemble,
    build_rhs,
    edge_viscosity,
    make_apply,
    recover_velocity,
)
from polystokes_tpu.weights import compute_weights

from oracle import Oracle


def make_case(res=(14, 12, 12), tile=6, reduced=True, solid=False, seed=0):
    rng = np.random.default_rng(seed)
    if solid and reduced:
        res = (14, 12, 18)  # room for interior regions above the floor
    grid = Grid(res=res, dx=1.0 / max(res))
    params = SolverParams(
        dtype=jnp.float64,
        do_reduced_regions=reduced,
        do_tile=True,
        tile_size=tile,
        tile_padding=2,
        liquid_boundary_layer_size=2,
        solid_boundary_layer_size=2,
    )
    surface = jnp.full(res, -1.0)
    if solid:
        floor = sdf.plane((0.0, 0.0, 1.0), 0.18)
        coll = sdf.sample_at_centers(floor, res, grid.dx, jnp.float64)  # solid below z=0.18
    else:
        coll = jnp.full(res, 1.0)

    vel = tuple(jnp.asarray(rng.standard_normal(grid.face_shape(a))) for a in range(3))
    svel = tuple(jnp.asarray(rng.standard_normal(grid.face_shape(a))) for a in range(3))
    visc = jnp.asarray(0.5 + rng.random(res) * 2.0)
    scene = Scene(
        surface_sdf=surface,
        collision_sdf=coll,
        velocity=vel,
        collision_velocity=svel,
        viscosity=visc,
        dt=jnp.asarray(0.04),
    )
    return grid, params, scene


def build_all(grid, params, scene):
    R = effective_max_regions(grid, params)
    lw, fw = compute_weights(grid, scene.surface_sdf, scene.collision_sdf, params.dtype)
    cls = classify(grid, lw, fw, params)
    asm, rd = assemble(grid, scene, cls, lw, fw, params, R)

    lw_np = {k: np.asarray(v) for k, v in lw.items()}
    fw_np = {k: np.asarray(v) for k, v in fw.items()}
    labels = (
        np.asarray(cls.cell_labels),
        [np.asarray(l) for l in cls.face_labels],
        [np.asarray(l) for l in cls.edge_labels],
    )
    visc_c = np.asarray(scene.viscosity)
    visc_e = [np.asarray(edge_viscosity(scene.viscosity, e)) for e in range(3)]
    orc = Oracle(
        res=grid.res,
        dx=grid.dx,
        dt=float(scene.dt),
        labels=labels,
        weights=(lw_np, fw_np),
        velocity=[np.asarray(v) for v in scene.velocity],
        collision_velocity=[np.asarray(v) for v in scene.collision_velocity],
        visc_c=visc_c,
        visc_e=visc_e,
        density=params.constant_density,
        cell_region=np.asarray(cls.cell_region),
        face_region=[np.asarray(r) for r in cls.face_region],
        edge_region=[np.asarray(r) for r in cls.edge_region],
        n_regions=R,
        basis=params.basis,
    )
    return R, lw, fw, cls, asm, rd, orc


def pack(orc, x: PTau):
    parts = [np.asarray(x.p)[orc.cell_idx >= 0]]
    for a in range(3):
        parts.append(np.asarray(x.tc[a])[orc.cell_idx >= 0])
    for e in range(3):
        parts.append(np.asarray(x.te[e])[orc.edge_idx[e] >= 0])
    return np.concatenate(parts)


def unpack(orc, vec, grid) -> PTau:
    p = np.zeros(grid.res)
    p[orc.cell_idx >= 0] = vec[: orc.nP]
    off = orc.nP
    tc = []
    for a in range(3):
        t = np.zeros(grid.res)
        t[orc.cell_idx >= 0] = vec[off : off + orc.nP]
        off += orc.nP
        tc.append(jnp.asarray(t))
    te = []
    for e in range(3):
        t = np.zeros(orc.edge_labels[e].shape)
        t[orc.edge_idx[e] >= 0] = vec[off : off + orc.nE[e]]
        off += orc.nE[e]
        te.append(jnp.asarray(t))
    return PTau(p=jnp.asarray(p), tc=tuple(tc), te=tuple(te))


CASES = [
    dict(reduced=False, solid=False),
    dict(reduced=False, solid=True),
    dict(reduced=True, solid=False),
    dict(reduced=True, solid=True),
]


@pytest.mark.parametrize("case", CASES, ids=["uniform", "uniform_solid", "reduced", "reduced_solid"])
def test_apply_and_rhs_match_oracle(case):
    grid, params, scene = make_case(reduced=case["reduced"], solid=case["solid"])
    R, lw, fw, cls, asm, rd, orc = build_all(grid, params, scene)

    com = np.asarray(rd.com)
    A, b_orc, mats = orc.schur_system(com)

    # sanity: some DOFs of each family exist
    assert orc.nP > 0 and orc.nV > 0
    if case["reduced"]:
        assert int(cls.n_regions) >= 2

    # reduced quantities match the loop oracle
    if case["reduced"]:
        com_o, cnt_o = orc.coms()
        valid = np.asarray(cls.region_valid)
        np.testing.assert_allclose(np.asarray(rd.com)[valid], com_o[valid], atol=1e-12)
        np.testing.assert_allclose(np.asarray(rd.mr)[valid], mats["Mr"][valid], atol=1e-9)
        np.testing.assert_allclose(np.asarray(rd.vr)[valid], mats["Vr"][valid], atol=1e-9, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(rd.best_fit)[valid], mats["w_fit"][valid], atol=1e-7)

    # operator apply matches the assembled Schur complement
    rng = np.random.default_rng(1)
    apply_A = make_apply(grid, cls, asm, params, R)
    for trial in range(3):
        xv = rng.standard_normal(A.shape[0])
        x = unpack(orc, xv, grid)
        y = apply_A(x)
        y_ref = A @ pack(orc, x)
        np.testing.assert_allclose(pack(orc, y), y_ref, atol=1e-8, rtol=1e-8)

    # right-hand side matches
    b_mine = build_rhs(grid, cls, asm, params, R)
    np.testing.assert_allclose(pack(orc, b_mine), b_orc, atol=1e-8)

    # off-DOF entries of apply output are exactly zero
    xv = rng.standard_normal(A.shape[0])
    y = apply_A(unpack(orc, xv, grid))
    assert np.all(np.asarray(y.p)[orc.cell_idx < 0] == 0)
    for e in range(3):
        assert np.all(np.asarray(y.te[e])[orc.edge_idx[e] < 0] == 0)


def test_system_is_symmetric_negative_definite():
    grid, params, scene = make_case(reduced=True, solid=True)
    R, lw, fw, cls, asm, rd, orc = build_all(grid, params, scene)
    A, b, mats = orc.schur_system(np.asarray(rd.com))
    Ad = A.toarray()
    np.testing.assert_allclose(Ad, Ad.T, atol=1e-10)
    evals = np.linalg.eigvalsh(Ad)
    assert np.max(evals) <= 1e-9  # negative semi-definite


def test_solve_matches_direct():
    """End-to-end: my on-device PCG solution must match scipy spsolve on
    the oracle system, and the recovered velocities must agree."""
    grid, params, scene = make_case(reduced=True, solid=True)
    params = params.replace(tolerance=1e-9, max_iterations=4000)
    R, lw, fw, cls, asm, rd, orc = build_all(grid, params, scene)
    A, b, mats = orc.schur_system(np.asarray(rd.com))

    from polystokes_tpu import krylov

    import jax

    apply_A = jax.jit(make_apply(grid, cls, asm, params, R))
    b_mine = build_rhs(grid, cls, asm, params, R)
    x0 = PTau.zeros_like(b_mine)
    res = krylov.pcg(apply_A, b_mine, x0, tol=params.tolerance, max_iters=params.max_iterations)
    assert bool(res.converged)

    x_direct = spla.spsolve(A.tocsc(), b)
    x_mine = pack(orc, res.x)
    np.testing.assert_allclose(x_mine, x_direct, atol=1e-5, rtol=1e-5)

    # velocity recovery: v = McInv b_v - dt McInv (G p + Dt tau)
    v, w = recover_velocity(grid, cls, asm, res.x, params, R)
    GD = np.concatenate([mats["G"] @ x_direct[: orc.nP] + mats["Dt"] @ x_direct[orc.nP :]])
    McInv = 1.0 / mats["Mc"]
    v_ref = McInv * mats["b_v"] - float(scene.dt) * McInv * GD
    v_mine = np.concatenate([np.asarray(v[a])[orc.face_idx[a] >= 0] for a in range(3)])
    np.testing.assert_allclose(v_mine, v_ref, atol=1e-5)
