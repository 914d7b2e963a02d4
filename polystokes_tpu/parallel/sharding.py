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
    if len(axes) == 1:
        return Mesh(np.asarray(devices), axes)
    # factor n into a 2-D mesh as square as possible
    px = int(np.floor(np.sqrt(n)))
    while n % px:
        px -= 1
    shape = (px, n // px)
    return Mesh(np.asarray(devices).reshape(shape), axes)


def _data_axes(mesh: Mesh):
    """The mesh axes that actually partition data (size > 1)."""
    return [a for a in mesh.axis_names if mesh.shape[a] > 1]


def scene_shardings(mesh: Mesh):
    """NamedShardings for a Scene pytree.

    Cell fields shard over the first (1-D mesh) or first two (2-D mesh)
    grid axes; a face-axis array has an odd (n+1) extent along its own
    axis, so each face family shards over its cell-like axes instead."""
    ax = _data_axes(mesh)
    if len(ax) >= 2:
        x, y = ax[0], ax[1]
        cell = NamedSharding(mesh, P(x, y, None))
        face = (
            NamedSharding(mesh, P(None, x, y)),
            NamedSharding(mesh, P(x, None, y)),
            NamedSharding(mesh, P(x, y, None)),
        )
    elif len(ax) == 1:
        x = ax[0]
        cell = NamedSharding(mesh, P(x, None, None))
        face = (
            NamedSharding(mesh, P(None, x, None)),
            NamedSharding(mesh, P(x, None, None)),
            NamedSharding(mesh, P(x, None, None)),
        )
    else:
        cell = NamedSharding(mesh, P())
        face = (cell, cell, cell)
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


def pallas_shardable(grid, params, mesh: Mesh) -> bool:
    """Can this solve keep the packed Pallas kernels on this mesh (the
    shard_map'ed x-slab path, parallel/shard_apply)?  Requires a mesh
    whose data decomposition is 1-D, a slab-decomposable grid
    (shard_apply.shardable), and solver features whose kernels are
    per-shard local (the fused pAp/update kernels are skipped under a
    mesh inside _build_krylov_system; REGION_ARROW's Woodbury leg and
    deflation's probe applies route through single-device kernels, so
    they disqualify)."""
    from ..config import PreconditionerType
    from ..solver import _use_packed
    from .shard_apply import shardable

    if not params.use_pallas:
        return False
    ax = _data_axes(mesh)
    if len(ax) != 1:
        return False
    if params.deflation:
        return False
    if params.preconditioner not in (
        PreconditionerType.IDENTITY,
        PreconditionerType.DIAGONAL,
        PreconditionerType.CELL_ARROW,
    ):
        return False
    return _use_packed(grid, params) and shardable(grid, params, int(mesh.shape[ax[0]]))


def check_mesh_pallas(params, mesh: Mesh, grid=None):
    """Gate use_pallas under a >1-device mesh: keep it when the solve is
    shard_map-legal (pallas_shardable — pass `grid`), else disable it with
    a warning so the solve runs the exact (GSPMD-partitionable) XLA apply
    instead of tracing a single-device Pallas call into a partitioned
    program."""
    if params.use_pallas and mesh.size > 1:
        if grid is not None and pallas_shardable(grid, params, mesh):
            return params
        import warnings

        warnings.warn(
            f"use_pallas requested under a {mesh.size}-device mesh and the solve "
            "is not shard_map-legal (needs a 1-D data decomposition, x-extent "
            "divisible into pallas-compatible slabs with whole cubes per shard, "
            "and no deflation/REGION_ARROW) — falling back to the XLA apply "
            "for the sharded solve",
            stacklevel=2,
        )
        return params.replace(use_pallas=False)
    return params


def sharded_step(grid, params, mesh: Mesh):
    """A jitted step whose inputs are sharded over the mesh.

    When the packed Pallas path is shard_map-legal (pallas_shardable),
    the solve keeps the fused kernels: the apply runs as per-shard slab
    kernels with one ICI ring exchange per apply (parallel/shard_apply).
    Otherwise XLA/GSPMD partitions the exact XLA apply per shard and
    inserts the halo collectives for the +-1 shifts."""
    from ..solver import step

    if mesh.size > 1 and pallas_shardable(grid, params, mesh):
        axis = _data_axes(mesh)[0]
        sh = scene_shardings(mesh)
        return jax.jit(
            lambda scene: step(grid, scene, params, mesh=mesh, mesh_axis=axis),
            in_shardings=(sh,),
        )
    params = check_mesh_pallas(params, mesh)
    sh = scene_shardings(mesh)
    ax = _data_axes(mesh)

    def _fn(scene):
        if mesh.size > 1 and ax:
            # pin grid-shaped fields entering the cube-major reshapes to
            # the canonical slab sharding (avoids the SPMD partitioner's
            # involuntary-full-remat fallback on the moments leg)
            from ..reduced import gspmd_grid_spec

            with gspmd_grid_spec(mesh, ax):
                return step(grid, scene, params)
        return step(grid, scene, params)

    return jax.jit(_fn, in_shardings=(sh,))
