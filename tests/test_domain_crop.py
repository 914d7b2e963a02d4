"""Solve-domain cropping (domain.py): the cropped solve must agree with
the full-domain solve on every face the liquid can influence — the crop
is a pure domain-fitting optimization, mirroring the reference's
host-fitted solve domain (its host app hands HDK_PolyStokes a voxel
range sized to the surface field)."""
import jax.numpy as jnp
import numpy as np
import pytest

from polystokes_tpu import Scene, SolverParams, sdf
from polystokes_tpu.domain import active_bbox, crop_scene, solve_cropped
from polystokes_tpu.grid import Grid
from polystokes_tpu.solver import solve_chunked


def corner_sphere_scene(n=48, dtype=jnp.float64, r=0.13, center=(0.26, 0.3, 0.28)):
    grid = Grid(res=(n, n, n), dx=1.0 / n)
    surf = sdf.sample_at_centers(sdf.sphere(center, r), grid.res, grid.dx, dtype)
    rng = np.random.default_rng(3)
    vel = tuple(jnp.asarray(rng.standard_normal(grid.face_shape(a)), dtype) for a in range(3))
    scene = Scene(
        surface_sdf=surf,
        collision_sdf=jnp.full(grid.res, 1.0, dtype),
        velocity=vel,
        collision_velocity=tuple(jnp.zeros(grid.face_shape(a), dtype) for a in range(3)),
        viscosity=jnp.full(grid.res, 8.0, dtype),
        dt=jnp.asarray(1.0 / 24, dtype),
    )
    return grid, scene


def params64(**kw):
    base = dict(
        dtype=jnp.float64, do_reduced_regions=True, do_tile=True,
        tile_size=8, tile_padding=2, tolerance=1e-8, max_iterations=4000,
        bicgstab_fallback=False,
    )
    base.update(kw)
    return SolverParams(**base)


def test_active_bbox_alignment():
    grid, scene = corner_sphere_scene()
    p = params64()
    lo, hi = active_bbox(scene, p)
    for a in range(3):
        assert lo[a] % 16 == 0 and hi[a] % 16 == 0
        assert 0 <= lo[a] < hi[a] <= grid.res[a]
    # the sphere (center ~0.28*48, radius ~6 cells) plus margin fits well
    # inside the box, so a real crop must have been chosen
    assert tuple(hi[a] - lo[a] for a in range(3)) != grid.res


def test_active_bbox_no_liquid_and_full_box():
    grid, scene = corner_sphere_scene()
    p = params64()
    import dataclasses

    dry = dataclasses.replace(scene, surface_sdf=jnp.full(grid.res, 1.0, scene.surface_sdf.dtype))
    assert active_bbox(dry, p) is None
    flooded = dataclasses.replace(scene, surface_sdf=jnp.full(grid.res, -1.0, scene.surface_sdf.dtype))
    assert active_bbox(flooded, p) is None  # no saving


@pytest.mark.quick
def test_cropped_solve_matches_full():
    grid, scene = corner_sphere_scene()
    p = params64()
    vel_f, valid_f, stats_f = solve_chunked(grid, scene, p, segment_iters=500)
    vel_c, valid_c, stats_c = solve_cropped(grid, scene, p, segment_iters=500)
    assert "crop" in stats_c and stats_c["converged"]
    assert stats_f["converged"]
    # identical active systems: same DOF counts and region count
    for key in ("n_pressures", "n_active_velocities", "n_stresses", "n_regions"):
        assert stats_c[key] == stats_f[key], key
    lo, hi = stats_c["crop"]["lo"], stats_c["crop"]["hi"]
    for a in range(3):
        vf, vc = np.asarray(vel_f[a]), np.asarray(vel_c[a])
        scale = np.abs(vf).max()
        # inside the crop both solves write identical physics (operator,
        # rhs and write-back coincide; only CG dot reassociation differs)
        sl = tuple(
            slice(lo[i], hi[i] + (1 if i == a else 0)) for i in range(3)
        )
        np.testing.assert_allclose(vc[sl], vf[sl], atol=5e-6 * scale)
        # outside it, the cropped path keeps the input velocity; with no
        # solid in this scene the full solve does too
        mask = np.ones(vf.shape, bool)
        mask[sl] = False
        np.testing.assert_array_equal(vc[mask], np.asarray(scene.velocity[a])[mask])
        np.testing.assert_array_equal(np.asarray(valid_c[a])[mask], False)
        np.testing.assert_array_equal(
            np.asarray(valid_c[a])[~mask], np.asarray(valid_f[a])[~mask]
        )


def test_crop_scene_shapes():
    grid, scene = corner_sphere_scene()
    p = params64()
    lo, hi = active_bbox(scene, p)
    grid_c, scene_c = crop_scene(grid, scene, lo, hi)
    assert scene_c.surface_sdf.shape == grid_c.res
    for a in range(3):
        assert scene_c.velocity[a].shape == grid_c.face_shape(a)
