"""Checkpoint round-trip, params JSON, CLI smoke, export, input weights."""
import json
import os

import jax.numpy as jnp
import numpy as np

from polystokes_tpu import Scene, SolverParams, step
from polystokes_tpu.config import BasisOrder, PreconditionerType
from polystokes_tpu.grid import Grid
from polystokes_tpu.io.checkpoint import (
    load_checkpoint,
    params_from_json,
    params_to_json,
    save_checkpoint,
)
from polystokes_tpu.scenes.builders import SCENES, jelly_jam


def test_params_json_roundtrip():
    p = SolverParams(dtype=jnp.float64, basis=BasisOrder.AFFINE, tile_size=8, preconditioner=PreconditionerType.DIAGONAL)
    q = params_from_json(params_to_json(p))
    assert q == p


def test_checkpoint_roundtrip(tmp_path):
    grid, scene = jelly_jam(n=12, dtype=jnp.float64)
    params = SolverParams(dtype=jnp.float64, tile_size=8)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, grid, scene, params, step_index=3, extra={"frame": np.asarray(7)})
    g2, s2, p2, k, extra = load_checkpoint(path)
    assert g2 == grid and p2 == params and k == 3
    assert int(extra["frame"]) == 7
    np.testing.assert_allclose(np.asarray(s2.velocity[1]), np.asarray(scene.velocity[1]))


def test_all_scene_builders_construct():
    for name, f in SCENES.items():
        grid, scene = f(n=12, dtype=jnp.float32)
        assert scene.surface_sdf.shape == grid.res, name


def test_cli_smoke(tmp_path, capsys):
    from polystokes_tpu.run import main

    ck = str(tmp_path / "ck.npz")
    main([
        "--scene", "jelly_jam", "--n", "12", "--steps", "1", "--fp64",
        "--tile-size", "6", "--max-iterations", "300", "--tolerance", "1e-4",
        "--checkpoint", ck,
    ])
    out = capsys.readouterr().out
    assert "step 0:" in out
    assert os.path.exists(ck)
    # resume
    main(["--resume", ck, "--steps", "1"])
    out = capsys.readouterr().out
    assert "step 1:" in out


def test_input_face_weights_passthrough():
    """Supplying external face weights must change the operator exactly
    like the reference's useInputSurfaceWeights path (floored at
    MINWEIGHT where positive)."""
    import dataclasses

    grid, scene = jelly_jam(n=12, dtype=jnp.float64)
    params = SolverParams(dtype=jnp.float64, do_reduced_regions=False, tolerance=1e-6, max_iterations=500, bicgstab_fallback=False)
    rng = np.random.default_rng(0)
    vel = tuple(jnp.asarray(rng.standard_normal(grid.face_shape(a))) for a in range(3))
    scene = dataclasses.replace(scene, velocity=vel)
    v1, _, s1 = step(grid, scene, params)

    sw = tuple(jnp.full(grid.face_shape(a), 0.5, jnp.float64) for a in range(3))
    scene2 = dataclasses.replace(scene, surface_weights=sw)
    v2, _, s2 = step(grid, scene2, params)
    diff = sum(float(jnp.abs(v1[a] - v2[a]).max()) for a in range(3))
    assert diff > 1e-8  # the override took effect
