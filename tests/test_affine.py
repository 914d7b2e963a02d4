"""Affine (11-DOF) basis variant: oracle cross-check + translation test
(reference compile switch AFFINE_REGIONS, units.h:9-18)."""
import jax.numpy as jnp
import numpy as np

from polystokes_tpu.config import BasisOrder
from polystokes_tpu.solver import build_rhs, make_apply

from test_operators import build_all, make_case, pack, unpack


def test_affine_apply_matches_oracle():
    grid, params, scene = make_case(reduced=True, solid=False)
    params = params.replace(basis=BasisOrder.AFFINE)
    R, lw, fw, cls, asm, rd, orc = build_all(grid, params, scene)
    assert orc.D == 11

    com = np.asarray(rd.com)
    A, b_orc, mats = orc.schur_system(com)

    valid = np.asarray(cls.region_valid)
    np.testing.assert_allclose(np.asarray(rd.mr)[valid], mats["Mr"][valid], atol=1e-9)
    np.testing.assert_allclose(np.asarray(rd.vr)[valid], mats["Vr"][valid], atol=1e-9)

    rng = np.random.default_rng(2)
    apply_A = make_apply(grid, cls, asm, params, R)
    xv = rng.standard_normal(A.shape[0])
    x = unpack(orc, xv, grid)
    np.testing.assert_allclose(pack(orc, apply_A(x)), A @ pack(orc, x), atol=1e-8, rtol=1e-8)
    b_mine = build_rhs(grid, cls, asm, params, R)
    np.testing.assert_allclose(pack(orc, b_mine), b_orc, atol=1e-8)


def test_affine_translation_preserved():
    from polystokes_tpu import step

    from test_step import small_params, sphere_scene

    grid, _ = sphere_scene()
    const = (0.4, 0.1, -0.6)
    vel = tuple(jnp.full(grid.face_shape(a), const[a], jnp.float64) for a in range(3))
    grid, scene = sphere_scene(velocity=vel)
    params = small_params(basis=BasisOrder.AFFINE, tolerance=1e-9)
    out, valid_masks, stats = step(grid, scene, params)
    assert bool(stats["converged"])
    for a in range(3):
        v = np.asarray(out[a])
        m = np.asarray(valid_masks[a])
        np.testing.assert_allclose(v[m], const[a], atol=1e-6)
