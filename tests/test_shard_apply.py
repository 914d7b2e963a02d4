"""shard_map'ed packed Pallas apply (parallel/shard_apply): the multi-chip
fast path must (a) be bit-exact against the single-device packed apply and
(b) carry a full sharded solve to the same answer as the single-device
step, with use_pallas KEPT (VERDICT r4 item 5: through round 4 the packed
kernels were gated off under any >1-device mesh)."""
import jax
import numpy as np
import pytest


def _params(reduced=True, **kw):
    import jax.numpy as jnp

    from polystokes_tpu import SolverParams

    return SolverParams(
        dtype=jnp.float64,
        do_reduced_regions=reduced,
        do_tile=True,
        tile_size=8,
        tile_padding=2,
        use_pallas=True,
        bicgstab_fallback=False,
        **kw,
    )


@pytest.mark.quick
def test_sharded_apply_matches_packed():
    """make_apply_packed_sharded == make_apply_packed, bitwise (the slab
    kernels see identical windows: ppermute halos == the zero pad at the
    domain ends, real neighbor planes inside)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from polystokes_tpu.parallel.shard_apply import make_apply_packed_sharded, shardable
    from polystokes_tpu.scenes.builders import jelly_jam
    from polystokes_tpu.solver import _setup, effective_max_regions, make_apply_packed

    for reduced in (False, True):
        params = _params(reduced=reduced, max_iterations=50)
        grid, scene = jelly_jam(n=32, dtype=jnp.float64)
        R = effective_max_regions(grid, params)
        cls, asm = jax.jit(_setup, static_argnames=("grid", "params"))(grid, scene, params)

        assert shardable(grid, params, 2)
        mesh = Mesh(np.asarray(jax.devices()[:2]), ("x",))

        rng = np.random.default_rng(0)
        xp = jnp.asarray(rng.standard_normal((7,) + grid.res))
        ref = np.asarray(jax.jit(make_apply_packed(grid, cls, asm, params, R))(xp))
        out = np.asarray(jax.jit(make_apply_packed_sharded(grid, cls, asm, params, R, mesh))(xp))
        np.testing.assert_array_equal(ref, out)


def test_sharded_step_keeps_pallas():
    """sharded_step on a shard-legal 1-D mesh keeps use_pallas (no gate
    warning) and matches the single-device Pallas step."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    import warnings

    import jax.numpy as jnp

    from polystokes_tpu import step
    from polystokes_tpu.parallel.sharding import (
        check_mesh_pallas,
        make_mesh,
        pallas_shardable,
        shard_scene,
        sharded_step,
    )
    from polystokes_tpu.scenes.builders import jelly_jam

    params = _params(tolerance=1e-7, max_iterations=800)
    grid, scene = jelly_jam(n=32, dtype=jnp.float64)
    mesh = make_mesh(jax.devices()[:2], axes=("x",))
    assert pallas_shardable(grid, params, mesh)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        kept = check_mesh_pallas(params, mesh, grid=grid)
    assert kept.use_pallas
    assert not any("shard_map" in str(wi.message) for wi in w)

    v1, valid1, s1 = jax.jit(lambda s: step(grid, s, params), static_argnames=())(scene)

    scene_sh = shard_scene(scene, mesh)
    v2, valid2, s2 = sharded_step(grid, params, mesh)(scene_sh)

    # same kernels, but cross-shard dot reductions reorder sums
    assert abs(int(s1["iterations"]) - int(s2["iterations"])) <= 2
    for a in range(3):
        np.testing.assert_allclose(np.asarray(v1[a]), np.asarray(v2[a]), atol=1e-6)
