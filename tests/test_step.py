"""End-to-end physics tests for the full jitted step (the TPU-native
analogs of the reference's scene-based verification, SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polystokes_tpu import Scene, SolverParams, step
from polystokes_tpu import sdf
from polystokes_tpu.grid import Grid


def small_params(**kw):
    base = dict(
        dtype=jnp.float64,
        do_reduced_regions=True,
        do_tile=True,
        tile_size=6,
        tile_padding=2,
        tolerance=1e-6,
        max_iterations=3000,
        bicgstab_fallback=False,
    )
    base.update(kw)
    return SolverParams(**base)


def sphere_scene(n=20, dtype=jnp.float64, velocity=None, viscosity=5.0):
    grid = Grid(res=(n, n, n), dx=1.0 / n)
    surf = sdf.sample_at_centers(sdf.sphere((0.5, 0.5, 0.5), 0.36), grid.res, grid.dx, dtype)
    coll = jnp.full(grid.res, 1.0, dtype)
    vel = velocity if velocity is not None else tuple(jnp.zeros(grid.face_shape(a), dtype) for a in range(3))
    scene = Scene(
        surface_sdf=surf,
        collision_sdf=coll,
        velocity=vel,
        collision_velocity=tuple(jnp.zeros(grid.face_shape(a), dtype) for a in range(3)),
        viscosity=jnp.full(grid.res, viscosity, dtype),
        dt=jnp.asarray(1.0 / 24, dtype),
    )
    return grid, scene


def test_step_smoke_and_stats():
    grid, _ = sphere_scene()
    rng = np.random.default_rng(0)
    vel = tuple(jnp.asarray(rng.standard_normal(grid.face_shape(a))) for a in range(3))
    grid, scene = sphere_scene(velocity=vel)
    params = small_params()
    vel, valid, stats = step(grid, scene, params)
    assert bool(stats["converged"])
    assert int(stats["iterations"]) > 0
    assert not bool(stats["region_overflow"])
    for a in range(3):
        assert np.all(np.isfinite(np.asarray(vel[a])))


@pytest.mark.parametrize("reduced", [False, True], ids=["uniform", "reduced"])
def test_rigid_translation_is_preserved(reduced):
    """A constant velocity field is divergence- and strain-free: the
    Stokes solve must return it unchanged on all solved faces (both the
    grid DOFs and the polynomial regions represent constants exactly)."""
    grid, scene = sphere_scene()
    const = (0.7, -0.3, 0.2)
    vel = tuple(jnp.full(grid.face_shape(a), const[a], jnp.float64) for a in range(3))
    grid, scene = sphere_scene(velocity=vel)
    params = small_params(do_reduced_regions=reduced, tolerance=1e-9)
    out, valid, stats = step(grid, scene, params)
    assert bool(stats["converged"])
    for a in range(3):
        v = np.asarray(out[a])
        m = np.asarray(valid[a])
        np.testing.assert_allclose(v[m], const[a], atol=1e-6)


def test_velocity_divergence_is_small():
    """After the solve, the weighted divergence (continuity residual) on
    interior active cells should be near zero."""
    grid, scene = sphere_scene()
    rng = np.random.default_rng(3)
    vel = tuple(jnp.asarray(rng.standard_normal(grid.face_shape(a))) for a in range(3))
    grid, scene = sphere_scene(velocity=vel)
    params = small_params(do_reduced_regions=False, tolerance=1e-9)
    out, valid, stats = step(grid, scene, params)
    assert bool(stats["converged"])

    # plain divergence on deep-interior cells (liquid weight 1 nearby)
    from polystokes_tpu.weights import compute_weights
    from polystokes_tpu.classify import classify, is_active

    lw, fw = compute_weights(grid, scene.surface_sdf, scene.collision_sdf, jnp.float64)
    cls = classify(grid, lw, fw, params)
    div = np.zeros(grid.res)
    for a in range(3):
        v = np.asarray(out[a])
        hi = np.take(v, range(1, grid.res[a] + 1), axis=a)
        lo = np.take(v, range(0, grid.res[a]), axis=a)
        div += (hi - lo) / grid.dx
    interior = np.array(lw["center"] == 1.0)
    for a in range(3):
        interior &= np.roll(interior, 1, axis=a) & np.roll(interior, -1, axis=a)
    act = np.asarray(is_active(cls.cell_labels)) & interior
    vel_scale = max(max(np.abs(np.asarray(out[a])).max() for a in range(3)), 1e-12)
    # a random input field has |div| ~ vel/dx; the solve must reduce it by
    # orders of magnitude on interior cells
    assert np.abs(div[act]).max() < 1e-3 * vel_scale / grid.dx


def test_uniform_vs_reduced_ab():
    """The reduced solve approximates the uniform solve (the reference's
    jelly_jam uniform/reduced A/B comparison)."""
    n = 24
    grid = Grid(res=(n, n, n), dx=1.0 / n)
    dtype = jnp.float64
    surf = jnp.full(grid.res, -1.0, dtype)  # all liquid, closed box
    coll = jnp.full(grid.res, 1.0, dtype)
    rng = np.random.default_rng(7)
    # smooth, large-scale initial velocity (well representable by quadratics)
    xs = np.linspace(0, 1, n)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    base = np.sin(2 * np.pi * X) * np.cos(np.pi * Y)
    vel = []
    for a in range(3):
        shape = grid.face_shape(a)
        f = np.zeros(shape)
        f[: n, : n, : n] = np.roll(base, a, axis=a)
        vel.append(jnp.asarray(f))
    scene = Scene(
        surface_sdf=surf,
        collision_sdf=coll,
        velocity=tuple(vel),
        collision_velocity=tuple(jnp.zeros(grid.face_shape(a), dtype) for a in range(3)),
        viscosity=jnp.full(grid.res, 20.0, dtype),
        dt=jnp.asarray(1.0 / 24, dtype),
    )
    p_uni = small_params(do_reduced_regions=False, tolerance=1e-8)
    p_red = small_params(do_reduced_regions=True, tile_size=8, tile_padding=2, tolerance=1e-8)
    v_uni, _, s_uni = step(grid, scene, p_uni)
    v_red, _, s_red = step(grid, scene, p_red)
    assert bool(s_uni["converged"]) and bool(s_red["converged"])
    assert int(s_red["n_regions"]) >= 1

    num = 0.0
    den = 0.0
    for a in range(3):
        d = np.asarray(v_uni[a]) - np.asarray(v_red[a])
        num += float((d**2).sum())
        den += float((np.asarray(v_uni[a]) ** 2).sum())
    rel = np.sqrt(num / den)
    # model reduction is an approximation (the exact-parity check is the
    # operator-level oracle test); this is a physics-level sanity bound
    assert rel < 0.15, f"uniform-vs-reduced relative L2 {rel:.3f}"


def test_keep_non_converged_semantics():
    grid, _ = sphere_scene()
    rng = np.random.default_rng(5)
    vel = tuple(jnp.asarray(rng.standard_normal(grid.face_shape(a))) for a in range(3))
    grid, scene = sphere_scene(velocity=vel)
    params = small_params(max_iterations=2, tolerance=1e-14, keep_non_converged=False, bicgstab_fallback=False)
    out, valid, stats = step(grid, scene, params)
    assert not bool(stats["converged"])
    for a in range(3):
        np.testing.assert_array_equal(np.asarray(out[a]), np.asarray(scene.velocity[a]))


def test_step_instrumented_smoke():
    """Per-stage instrumented step (profiling parity) returns timings."""
    from polystokes_tpu.profiling import step_instrumented

    grid, _ = sphere_scene(n=16)
    rng = np.random.default_rng(9)
    vel = tuple(jnp.asarray(rng.standard_normal(grid.face_shape(a))) for a in range(3))
    grid, scene = sphere_scene(n=16, velocity=vel)
    params = small_params(tile_size=8, max_iterations=2000, tolerance=1e-3)
    out, valid, stats = step_instrumented(grid, scene, params)
    assert stats["converged"]
    for key in ("build_integration_weights", "classify", "assemble", "solve"):
        assert stats["stage_wall_s"][key] > 0
    assert stats["solve_wall_s"] > 0 and stats["setup_wall_s"] > 0
