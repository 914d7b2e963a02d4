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
