"""Multi-frame simulation driver sanity tests."""
import jax.numpy as jnp
import numpy as np

from polystokes_tpu import SolverParams
from polystokes_tpu.scenes.builders import viscous_beam
from polystokes_tpu.sim import simulate


def test_beam_sags_over_frames():
    """A clamped viscous beam under gravity should move down (center of
    liquid mass decreases in z) while staying finite and converged."""
    grid, scene = viscous_beam(n=20, dtype=jnp.float64, viscosity=5.0, dt=1 / 24)
    params = SolverParams(
        dtype=jnp.float64,
        do_reduced_regions=True,
        do_tile=True,
        tile_size=8,
        tile_padding=2,
        tolerance=1e-5,
        max_iterations=1500,
        bicgstab_fallback=False,
    )

    def com_z(s):
        m = np.asarray(s.surface_sdf) < 0
        zs = np.arange(grid.res[2])[None, None, :]
        return float((m * zs).sum() / max(m.sum(), 1))

    z0 = com_z(scene)
    out, stats = simulate(grid, scene, params, frames=3)
    z1 = com_z(out)
    for st in stats:
        assert bool(st["converged"])
        assert np.isfinite(float(st["error"]))
    for a in range(3):
        assert np.all(np.isfinite(np.asarray(out.velocity[a])))
    assert z1 < z0  # the free end sags under gravity


def test_window_advect_matches_gather():
    """The gather-free windowed advection (advect_field) equals the exact
    gather path (advect_field_gather) when the backtrace stays within the
    window: exactly under constant velocity (same positions, same hat
    weights), closely under a smooth velocity field (the only difference
    is the midpoint velocity's lattice resampling)."""
    import jax.numpy as jnp

    from polystokes_tpu.grid import face_offsets
    from polystokes_tpu.sim import advect_field, advect_field_gather, cfl_substeps

    n = 12
    rng = np.random.default_rng(3)
    surf = jnp.asarray(rng.standard_normal((n, n, n)))

    # constant velocity: bit-comparable paths
    vel_c = tuple(
        jnp.full((n + (a == 0), n + (a == 1), n + (a == 2)), 0.7 - 0.3 * a) for a in range(3)
    )
    for offsets in [(0.0, 0.0, 0.0), face_offsets(0)]:
        fld = surf if offsets == (0.0, 0.0, 0.0) else vel_c[0]
        a = advect_field_gather(fld, vel_c, jnp.asarray(1.3), offsets)
        b = advect_field(fld, vel_c, jnp.asarray(1.3), offsets)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)

    # smooth varying velocity: agreement to interpolation-order tolerance
    xs = jnp.linspace(0, 1, n)
    smooth = 0.5 * jnp.sin(2 * np.pi * xs)[:, None, None] * jnp.ones((n, n, n))
    vel_s = tuple(
        jnp.pad(smooth * (1.0 - 0.2 * a), [(0, a == 0), (0, a == 1), (0, a == 2)], mode="edge")
        for a in range(3)
    )
    dtdx = jnp.asarray(1.0)
    assert cfl_substeps(vel_s, float(dtdx)) == 1  # max|u| 0.5 < max_disp
    a = advect_field_gather(surf, vel_s, dtdx, (0.0, 0.0, 0.0))
    b = advect_field(surf, vel_s, dtdx, (0.0, 0.0, 0.0))
    d = np.max(np.abs(np.asarray(a) - np.asarray(b)))
    scale = float(jnp.max(jnp.abs(surf)))
    assert d < 0.08 * scale, d

    # substeps stay finite and bounded-displacement correct
    c = advect_field(surf, vel_s, dtdx, (0.0, 0.0, 0.0), substeps=3)
    assert np.all(np.isfinite(np.asarray(c)))


def test_dynamic_substeps_no_retrace_and_exact():
    """The CFL substep count is a dynamic fori_loop trip count: changing
    it must neither retrace the jitted advection (one compile covers
    every per-frame CFL — the frame loop previously recompiled the 128^3
    advection whenever max|u| crossed a multiple of max_disp) nor change
    the result vs a Python-int count."""
    import jax

    from polystokes_tpu.sim import advect_field

    n = 12
    rng = np.random.default_rng(3)
    surf = jnp.asarray(rng.standard_normal((n, n, n)))
    vel = tuple(
        jnp.asarray(0.3 * rng.standard_normal((n + (a == 0), n + (a == 1), n + (a == 2))))
        for a in range(3)
    )
    dtdx = jnp.asarray(0.9)

    traces = []

    @jax.jit
    def adv(f, v, d, substeps):
        traces.append(1)
        return advect_field(f, v, d, (0.0, 0.0, 0.0), substeps=substeps)

    out2 = adv(surf, vel, dtdx, 2)
    out5 = adv(surf, vel, dtdx, 5)
    assert len(traces) == 1, "substep count change retraced the advection"

    # traced trip count == unrolled Python loop count (bit-exact)
    ref5 = advect_field(surf, vel, dtdx, (0.0, 0.0, 0.0), substeps=5)
    np.testing.assert_array_equal(np.asarray(out5), np.asarray(ref5))
    assert not np.array_equal(np.asarray(out2), np.asarray(out5))
