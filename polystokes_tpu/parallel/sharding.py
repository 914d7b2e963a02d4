"""Multi-chip scaling via jax.sharding + GSPMD.

The reference is single-node shared-memory (TBB/OpenMP; SURVEY.md §2.3 —
no distributed backend exists).  The TPU-native equivalent of its
intra-node parallelism is SPMD over a device mesh: every field is a dense
3-D array, so we shard the grid's leading axes over the mesh and let XLA
insert the halo exchanges (the stencils are pads/shifts) and reductions
(dots, segment sums) over ICI.  No solver code changes — the same jitted
step runs on 1 or N chips.

Sharding layout:
  * cell/face/edge fields: sharded over ('x', 'y') mesh axes on the first
    two grid dimensions (face/edge arrays have +1 extents; GSPMD handles
    the uneven remainder with internal padding)
  * per-region [R, D, D] tensors, COM, best-fit: replicated (tiny)
  * Krylov scalars: replicated (psum'd by XLA from sharded dots)
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axes=("x", "y")):
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    # factor n into a 2-D mesh as square as possible
    px = int(np.floor(np.sqrt(n)))
    while n % px:
        px -= 1
    shape = (px, n // px)
    return Mesh(np.asarray(devices).reshape(shape), axes)


def scene_shardings(mesh: Mesh):
    """NamedShardings for a Scene pytree.

    Cell fields shard over the first two grid axes; a face-axis array has
    an odd (n+1) extent along its own axis, so each face family shards
    over its two cell-like axes instead."""
    cell = NamedSharding(mesh, P("x", "y", None))
    face = (
        NamedSharding(mesh, P(None, "x", "y")),
        NamedSharding(mesh, P("x", None, "y")),
        NamedSharding(mesh, P("x", "y", None)),
    )
    repl = NamedSharding(mesh, P())
    from ..solver import Scene

    return Scene(
        surface_sdf=cell,
        collision_sdf=cell,
        velocity=face,
        collision_velocity=face,
        viscosity=cell,
        dt=repl,
    )


def shard_scene(scene, mesh: Mesh):
    sh = scene_shardings(mesh)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), scene, sh)


def check_mesh_pallas(params, mesh: Mesh):
    """The packed Pallas kernels are single-device programs (halo windows
    over a pre-padded whole-grid array); they are NOT shard_map'ed over a
    mesh.  Under a >1-device mesh, disable use_pallas with a warning so
    the solve runs the exact (GSPMD-partitionable) XLA apply instead of
    tracing a Pallas call into a partitioned program."""
    if params.use_pallas and mesh.size > 1:
        import warnings

        warnings.warn(
            f"use_pallas requested under a {mesh.size}-device mesh; the packed "
            "kernels are single-device (not shard_map'ed) — falling back to "
            "the XLA apply for the sharded solve",
            stacklevel=2,
        )
        return params.replace(use_pallas=False)
    return params


def sharded_step(grid, params, mesh: Mesh):
    """A jitted step whose inputs are sharded over the mesh.  XLA/GSPMD
    partitions the stencil work per shard and inserts ICI halo collectives
    for the +-1 shifts."""
    from ..solver import step

    params = check_mesh_pallas(params, mesh)
    sh = scene_shardings(mesh)
    return jax.jit(
        lambda scene: step(grid, scene, params),
        in_shardings=(sh,),
    )
