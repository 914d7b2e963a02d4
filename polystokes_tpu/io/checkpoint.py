"""Scene / simulation state checkpointing.

The reference relies on Houdini's sim-cache files for frame resume
(SURVEY.md §5 — .gitignore'd scenes/*/checkpoints).  Here the analog is a
self-contained npz snapshot of the Scene plus arbitrary named state, and a
JSON round-trip for SolverParams.
"""
from __future__ import annotations

import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np

from ..config import BasisOrder, MatrixScheme, PreconditionerType, SolverParams, SolverType
from ..grid import Grid
from ..solver import Scene

_ENUMS = {
    "matrix_scheme": MatrixScheme,
    "solver_type": SolverType,
    "preconditioner": PreconditionerType,
    "basis": BasisOrder,
}


def params_to_json(params: SolverParams) -> str:
    d = dataclasses.asdict(params)
    for k, enum_t in _ENUMS.items():
        d[k] = d[k].name if hasattr(d[k], "name") else str(d[k])
    d["dtype"] = jnp.dtype(params.dtype).name
    return json.dumps(d, indent=2)


def params_from_json(s: str, base: SolverParams = None) -> SolverParams:
    """Decode SolverParams from JSON.  With `base`, the JSON is a partial
    override: only the keys present replace the base's fields (how the
    CLI's --params composes with other flags)."""
    d = json.loads(s)
    for k, enum_t in _ENUMS.items():
        if k in d and isinstance(d[k], str):
            d[k] = enum_t[d[k]]
    if "dtype" in d:
        d["dtype"] = jnp.dtype(d["dtype"]).type
    if base is not None:
        return dataclasses.replace(base, **d)
    return SolverParams(**d)


def save_checkpoint(path: str, grid: Grid, scene: Scene, params: SolverParams, step_index: int = 0, extra: dict = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "surface_sdf": np.asarray(scene.surface_sdf),
        "collision_sdf": np.asarray(scene.collision_sdf),
        "viscosity": np.asarray(scene.viscosity),
        "dt": np.asarray(scene.dt),
        "res": np.asarray(grid.res),
        "dx": np.asarray(grid.dx),
        "step_index": np.asarray(step_index),
    }
    for a in range(3):
        payload[f"velocity{a}"] = np.asarray(scene.velocity[a])
        payload[f"collision_velocity{a}"] = np.asarray(scene.collision_velocity[a])
    for k, v in (extra or {}).items():
        payload[f"extra_{k}"] = np.asarray(v)
    np.savez_compressed(path, params_json=params_to_json(params), **payload)


def load_checkpoint(path: str):
    d = np.load(path, allow_pickle=False)
    params = params_from_json(str(d["params_json"]))
    grid = Grid(res=tuple(int(x) for x in d["res"]), dx=float(d["dx"]))
    dtype = params.dtype
    scene = Scene(
        surface_sdf=jnp.asarray(d["surface_sdf"], dtype),
        collision_sdf=jnp.asarray(d["collision_sdf"], dtype),
        velocity=tuple(jnp.asarray(d[f"velocity{a}"], dtype) for a in range(3)),
        collision_velocity=tuple(jnp.asarray(d[f"collision_velocity{a}"], dtype) for a in range(3)),
        viscosity=jnp.asarray(d["viscosity"], dtype),
        dt=jnp.asarray(d["dt"], dtype),
    )
    extra = {k[6:]: d[k] for k in d.files if k.startswith("extra_")}
    return grid, scene, params, int(d["step_index"]), extra
