"""FLIP loop components: P2G/G2P consistency, advection, particle surface."""
import numpy as np
import pytest

import jax.numpy as jnp

from polystokes_tpu.flip import (
    FlipState,
    advect_particles,
    g2p_flip,
    p2g,
    seed_particles,
    surface_from_particles,
)
from polystokes_tpu.grid import Grid


def _grid(n=16):
    return Grid(res=(n, n, n), dx=1.0 / n)


@pytest.mark.quick
def test_p2g_g2p_constant_velocity():
    """A constant particle velocity field transfers to a constant grid
    field on every covered face, and PIC G2P (alpha=0) reads it back
    exactly (partition of unity of the trilinear weights)."""
    grid = _grid(16)
    rng = np.random.default_rng(0)
    P = 4096
    pos = jnp.asarray(rng.uniform(2.0, 14.0, (P, 3)), jnp.float32)
    c = jnp.asarray([1.5, -2.0, 0.25], jnp.float32)
    vel = jnp.broadcast_to(c, (P, 3))
    st = FlipState(pos=pos, vel=vel, alive=jnp.ones(P, jnp.float32))
    gvel, cov = p2g(st, grid)
    for a in range(3):
        covered = np.asarray(cov[a]) > 0
        assert covered.any()
        np.testing.assert_allclose(np.asarray(gvel[a])[covered], float(c[a]), rtol=1e-5)
    st2 = g2p_flip(st, gvel, gvel, alpha=0.0)
    # interior particles see only covered faces -> exact readback
    np.testing.assert_allclose(np.asarray(st2.vel), np.asarray(vel), atol=1e-5)


@pytest.mark.quick
def test_dead_particles_ignored():
    grid = _grid(8)
    pos = jnp.asarray([[4.0, 4.0, 4.0], [2.0, 2.0, 2.0]], jnp.float32)
    vel = jnp.asarray([[1.0, 1.0, 1.0], [100.0, 100.0, 100.0]], jnp.float32)
    st = FlipState(pos=pos, vel=vel, alive=jnp.asarray([1.0, 0.0], jnp.float32))
    gvel, cov = p2g(st, grid)
    for a in range(3):
        assert float(jnp.max(jnp.abs(gvel[a]))) <= 1.0 + 1e-6


@pytest.mark.quick
def test_advect_uniform_velocity():
    grid = _grid(16)
    u = (
        jnp.ones((17, 16, 16), jnp.float32) * 2.0,
        jnp.ones((16, 17, 16), jnp.float32) * -1.0,
        jnp.zeros((16, 16, 17), jnp.float32),
    )
    pos = jnp.asarray([[8.0, 8.0, 8.0]], jnp.float32)
    st = FlipState(pos=pos, vel=jnp.zeros((1, 3), jnp.float32), alive=jnp.ones(1, jnp.float32))
    st2 = advect_particles(st, u, dt_over_dx=0.5, res=grid.res)
    np.testing.assert_allclose(np.asarray(st2.pos[0]), [9.0, 7.5, 8.0], atol=1e-5)


@pytest.mark.quick
def test_flip_blend():
    """alpha=1 keeps the particle velocity plus the grid delta."""
    grid = _grid(8)
    zeros = (
        jnp.zeros((9, 8, 8), jnp.float32),
        jnp.zeros((8, 9, 8), jnp.float32),
        jnp.zeros((8, 8, 9), jnp.float32),
    )
    ones = tuple(z + 1.0 for z in zeros)
    pos = jnp.asarray([[4.0, 4.0, 4.0]], jnp.float32)
    st = FlipState(pos=pos, vel=jnp.asarray([[5.0, 5.0, 5.0]], jnp.float32), alive=jnp.ones(1, jnp.float32))
    st2 = g2p_flip(st, zeros, ones, alpha=1.0)
    np.testing.assert_allclose(np.asarray(st2.vel[0]), [6.0, 6.0, 6.0], atol=1e-6)
    st3 = g2p_flip(st, zeros, ones, alpha=0.0)
    np.testing.assert_allclose(np.asarray(st3.vel[0]), [1.0, 1.0, 1.0], atol=1e-6)


@pytest.mark.quick
def test_seed_and_surface_sign():
    """Seeding fills liquid cells only; the rebuilt SDF is negative deep
    inside the particle block and positive well outside."""
    grid = _grid(16)
    x = (jnp.arange(16, dtype=jnp.float32) + 0.5) / 16.0
    X, Y, Z = jnp.meshgrid(x, x, x, indexing="ij")
    # slab: liquid where 0.25 < z < 0.75
    sdf = jnp.maximum(0.25 - Z, Z - 0.75)
    st = seed_particles(grid, sdf, max_particles=1 << 15, seed=1)
    assert float(jnp.sum(st.alive)) > 0
    pos = np.asarray(st.pos[np.asarray(st.alive) > 0])
    zc = pos[:, 2]  # cell units
    assert zc.min() > 0.25 * 16 - 1.0 and zc.max() < 0.75 * 16 + 1.0

    phi = surface_from_particles(st, grid)
    phi_np = np.asarray(phi)
    assert phi_np[8, 8, 8] < 0.0  # slab center
    assert phi_np[8, 8, 0] > 0.0 and phi_np[8, 8, 15] > 0.0  # outside
    # the surface sits near z = 0.25/0.75: |phi| small on the crossing cells
    assert abs(phi_np[8, 8, 4]) < 2.5 * grid.dx


@pytest.mark.quick
def test_reseed_refills_stretched_sheet():
    """A liquid sheet stretched by a divergent flow keeps bounded particle
    density when recycling is on: after repeated stretch + reseed rounds
    every interior liquid cell holds >= min_ppc live particles, while the
    same loop WITHOUT reseeding leaves under-dense cells (the adaptive-
    reseeding behavior of the reference's Houdini host loop)."""
    import dataclasses

    from polystokes_tpu.flip import reseed

    import jax
    from functools import partial

    grid = _grid(32)
    n = 32
    x = (jnp.arange(n, dtype=jnp.float32)) / n
    X, Y, Z = jnp.meshgrid(x, x, x, indexing="ij")
    # a block centered in x (so stretching never hits the domain walls),
    # slab-bounded in z, full extent in y
    sdf0 = jnp.maximum(jnp.maximum(0.35 - Z, Z - 0.65), jnp.abs(X - 0.5) - 0.15)
    st0 = seed_particles(grid, sdf0, max_particles=1 << 17, seed=2)

    # stretching map: x' = c + (x - c) * (1 + s) pulls the sheet apart
    s = 0.12
    c = n / 2.0
    vel = (
        jnp.zeros((n + 1, n, n), jnp.float32),
        jnp.zeros((n, n + 1, n), jnp.float32),
        jnp.zeros((n, n, n + 1), jnp.float32),
    )

    @partial(jax.jit, static_argnames=("do_reseed",))
    def one_round(st, k, do_reseed):
        newx = c + (st.pos[:, 0] - c) * (1.0 + s)
        pos = st.pos.at[:, 0].set(jnp.clip(newx, 0.01, n - 0.01))
        st = dataclasses.replace(st, pos=pos)
        surf = surface_from_particles(st, grid)
        if do_reseed:
            st = reseed(st, grid, surf, vel, k, min_ppc=3.0, target_ppc=6)
        return st, surf

    def stretch(st, rounds, do_reseed):
        for k in range(rounds):
            st, surf = one_round(st, jnp.int32(k), do_reseed)
        return st, surf

    def liquid_cell_counts(st, surf):
        from polystokes_tpu.flip import _cell_counts

        cnt, _ = _cell_counts(st, grid.res)
        # interior liquid cells (strictly inside: away from the surface)
        interior = np.asarray(surf) < -1.5 * grid.dx
        return np.asarray(cnt)[interior], interior

    st_r, surf_r = stretch(st0, 8, do_reseed=True)
    counts_r, interior_r = liquid_cell_counts(st_r, surf_r)
    assert interior_r.sum() > 100
    assert counts_r.min() >= 3.0, f"reseeded min density {counts_r.min()}"

    st_n, surf_n = stretch(st0, 8, do_reseed=False)
    counts_n, interior_n = liquid_cell_counts(st_n, surf_n)
    assert counts_n.min() < 3.0, "stretching should under-fill without reseeding"

    # the budget is respected: alive never exceeds the slot count
    assert float(jnp.sum(st_r.alive)) <= st_r.pos.shape[0]


@pytest.mark.quick
def test_reseed_kills_escapees():
    """Particles outside the liquid are culled and their slots become
    available for refill."""
    from polystokes_tpu.flip import reseed

    grid = _grid(16)
    n = 16
    x = jnp.arange(n, dtype=jnp.float32) / n
    X, Y, Z = jnp.meshgrid(x, x, x, indexing="ij")
    sdf = jnp.maximum(0.3 - Z, Z - 0.7)  # slab in z
    # two particles: one deep inside the slab, one far outside (z ~ 1)
    pos = jnp.asarray([[8.0, 8.0, 8.0], [8.0, 8.0, 15.5]], jnp.float32)
    st = FlipState(pos=pos, vel=jnp.zeros((2, 3), jnp.float32), alive=jnp.ones(2, jnp.float32))
    vel = (
        jnp.zeros((n + 1, n, n), jnp.float32),
        jnp.zeros((n, n + 1, n), jnp.float32),
        jnp.zeros((n, n, n + 1), jnp.float32),
    )
    st2 = reseed(st, grid, sdf, vel, 0, min_ppc=0.5, target_ppc=1)
    alive = np.asarray(st2.alive)
    # the escapee's slot was either killed or recycled into a liquid cell
    pos2 = np.asarray(st2.pos)
    if alive[1] > 0:
        zc = pos2[1, 2]
        assert 0.3 * n - 1.5 < zc < 0.7 * n + 1.5, f"recycled slot outside liquid (z={zc})"


def test_flip_frame_integration():
    """Two FLIP frames on a small scene: runs jitted end-to-end, keeps
    velocities finite, keeps particles inside the domain, and the surface
    stays a plausible SDF (negative somewhere, positive somewhere)."""
    from polystokes_tpu import SolverParams
    from polystokes_tpu.flip import flip_frame, seed_particles
    from polystokes_tpu.scenes.builders import jelly_jam

    grid, scene = jelly_jam(n=16, dtype=jnp.float32)
    params = SolverParams(
        dtype=jnp.float32, do_reduced_regions=False, max_iterations=60,
        bicgstab_fallback=False, tolerance=1e-3, use_pallas=False,
    )
    state = seed_particles(grid, scene.surface_sdf, max_particles=1 << 13, seed=0)
    n_alive = float(jnp.sum(state.alive))
    assert n_alive > 100
    for _ in range(2):
        scene, state, stats = flip_frame(grid, scene, state, params, gravity=-9.8)
    for a in range(3):
        assert np.isfinite(np.asarray(scene.velocity[a])).all()
    pos = np.asarray(state.pos)
    assert (pos >= 0.0).all() and (pos <= 16.0).all()
    phi = np.asarray(scene.surface_sdf)
    assert (phi < 0).any() and (phi > 0).any()
    # gravity pulls the blob down: mean particle z decreases
    z0 = seed_particles(grid, jelly_jam(n=16, dtype=jnp.float32)[1].surface_sdf, 1 << 13, seed=0)
    alive = np.asarray(state.alive) > 0
    assert pos[alive, 2].mean() < np.asarray(z0.pos)[np.asarray(z0.alive) > 0, 2].mean() + 1e-3
