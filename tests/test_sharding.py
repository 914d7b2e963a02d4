"""Multi-chip dry run on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest


def test_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_matches_single_device():
    """The sharded step must produce the same velocities as the
    single-device step (GSPMD inserts halo exchange; physics unchanged)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    import jax.numpy as jnp

    from polystokes_tpu import SolverParams, step
    from polystokes_tpu.parallel.sharding import make_mesh, shard_scene, sharded_step
    from polystokes_tpu.scenes.builders import jelly_jam

    params = SolverParams(
        dtype=jnp.float64,
        do_reduced_regions=True,
        do_tile=True,
        tile_size=8,
        tile_padding=2,
        tolerance=1e-7,
        max_iterations=800,
        bicgstab_fallback=False,
    )
    grid, scene = jelly_jam(n=16, dtype=jnp.float64)
    v1, valid1, s1 = jax.jit(lambda s: step(grid, s, params))(scene)

    mesh = make_mesh(jax.devices()[:4])
    scene_sh = shard_scene(scene, mesh)
    v2, valid2, s2 = sharded_step(grid, params, mesh)(scene_sh)

    # cross-shard reductions reorder floating-point sums, so agreement is
    # at solver-tolerance level, not bitwise
    assert abs(int(s1["iterations"]) - int(s2["iterations"])) <= 2
    for a in range(3):
        np.testing.assert_allclose(np.asarray(v1[a]), np.asarray(v2[a]), atol=1e-4)


def test_sharded_step_gates_pallas():
    """use_pallas under a >1-device mesh must be auto-disabled (the packed
    kernels are single-device; check_mesh_pallas) — the sharded solve runs
    the XLA apply and still matches the single-device result."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    import warnings

    import jax.numpy as jnp

    from polystokes_tpu import SolverParams, step
    from polystokes_tpu.parallel.sharding import check_mesh_pallas, make_mesh, shard_scene, sharded_step
    from polystokes_tpu.scenes.builders import jelly_jam

    params = SolverParams(
        dtype=jnp.float64,
        do_reduced_regions=True,
        do_tile=True,
        tile_size=8,
        tile_padding=2,
        tolerance=1e-7,
        max_iterations=800,
        bicgstab_fallback=False,
        use_pallas=True,
    )
    grid, scene = jelly_jam(n=16, dtype=jnp.float64)
    mesh = make_mesh(jax.devices()[:4])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        gated = check_mesh_pallas(params, mesh)
    assert not gated.use_pallas
    assert any("shard_map" in str(wi.message) for wi in w)

    v1, valid1, s1 = jax.jit(lambda s: step(grid, s, params.replace(use_pallas=False)))(scene)
    scene_sh = shard_scene(scene, mesh)
    v2, valid2, s2 = sharded_step(grid, params, mesh)(scene_sh)
    assert abs(int(s1["iterations"]) - int(s2["iterations"])) <= 2
    for a in range(3):
        np.testing.assert_allclose(np.asarray(v1[a]), np.asarray(v2[a]), atol=1e-4)
