"""Solve-domain cropping: run the Stokes solve on the liquid's bounding
box instead of the full grid.

The reference receives its solve domain from the host app already fitted
to the liquid (Houdini hands HDK_PolyStokes a voxel range sized to the
surface field; the paper's armadillo numbers are on such fitted grids).
Our scene builders allocate a full box around the scene, and every dense
grid pass — the packed Pallas apply, the preconditioner, CG BLAS1 —
scales with the BOX volume, not the liquid volume (armadillo_melt at 256³
fills 11.5% of the box; its bounding box is 51% of it).  Cropping restores
the reference's domain-fitting and halves every grid pass at 256³.

Host-side by design: the crop shape is data-dependent, so it must be
chosen outside jit.  Extents are aligned to the packed-kernel block /
tile granularity so each cropped shape hits the same compiled kernels,
and rounded-out shapes recur across frames (the persistent compile cache
makes repeated shapes ~free).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .grid import Grid


def _align_for(params) -> int:
    """Crop offsets/extents must preserve (a) pallas block divisibility
    (16 along x/y) and (b) global tile anchoring: classify anchors tiles
    at index 0 of the grid, so the crop origin must sit on a tile
    boundary.  Tiles of 8/16 divide 16; larger tiles set the alignment."""
    t = params.tile_size if (
        params.do_reduced_regions and (params.do_tile or params.cube_regions)
    ) else 16
    return max(16, t)


@jax.jit
def _axis_activity(s):
    return tuple((s < 0).any(axis=ax) for ax in ((1, 2), (0, 2), (0, 1)))


def active_bbox(scene, params, margin: int = 4, min_saving: float = 0.10):
    """(lo, hi) cell-index bounds of the liquid bounding box, padded by
    `margin` cells and aligned to the solver's block granularity; None
    when there is no liquid or when cropping saves < `min_saving` of the
    domain volume (not worth a fresh compile).

    The weight stencils (2×2×2 supersampling, weights.py) and the packed
    halo reach at most 2 cells past the liquid surface, so margin >= 2
    keeps every active DOF strictly inside the crop; 4 adds slack for the
    packed layout's dropped index-0 boundary planes."""
    res = tuple(int(n) for n in scene.surface_sdf.shape)
    align = _align_for(params)
    if any(n % align for n in res):
        return None  # unaligned domain: cropping can't keep kernel shapes legal
    proj = _axis_activity(scene.surface_sdf)
    lo, hi = [], []
    for a in range(3):
        nzs = np.flatnonzero(np.asarray(proj[a]))
        if nzs.size == 0:
            return None
        l = max(int(nzs[0]) - margin, 0)
        h = min(int(nzs[-1]) + 1 + margin, res[a])
        lo.append((l // align) * align)
        hi.append(min(-(-h // align) * align, res[a]))
    if np.prod([h - l for l, h in zip(lo, hi)]) > (1.0 - min_saving) * np.prod(res):
        return None
    return tuple(lo), tuple(hi)


def _crop_center(arr, lo, hi):
    return arr[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]]


def _crop_face(arr, a, lo, hi):
    sl = [slice(lo[i], hi[i]) for i in range(3)]
    sl[a] = slice(lo[a], hi[a] + 1)  # face arrays carry the +1 extent
    return arr[tuple(sl)]


def _crop_faces(tup, lo, hi):
    return tuple(_crop_face(tup[a], a, lo, hi) for a in range(3))


def crop_scene(grid: Grid, scene, lo, hi) -> Tuple[Grid, "Scene"]:
    """The scene restricted to [lo, hi): same dx, sliced fields."""
    grid_c = Grid(res=tuple(hi[i] - lo[i] for i in range(3)), dx=grid.dx)
    rep = dict(
        surface_sdf=_crop_center(scene.surface_sdf, lo, hi),
        collision_sdf=_crop_center(scene.collision_sdf, lo, hi),
        viscosity=_crop_center(scene.viscosity, lo, hi),
        velocity=_crop_faces(scene.velocity, lo, hi),
        collision_velocity=_crop_faces(scene.collision_velocity, lo, hi),
    )
    if scene.surface_weights is not None:
        rep["surface_weights"] = _crop_faces(scene.surface_weights, lo, hi)
    if scene.collision_weights is not None:
        rep["collision_weights"] = _crop_faces(scene.collision_weights, lo, hi)
    if scene.density is not None:
        rep["density"] = _crop_center(scene.density, lo, hi)
    return grid_c, dataclasses.replace(scene, **rep)


def embed_face(full, sub, a, lo):
    """Paste a cropped face array back into the full-domain array."""
    return jax.lax.dynamic_update_slice(full, sub.astype(full.dtype), lo)


def bbox_contains(outer, inner) -> bool:
    """Whether crop `outer` covers crop `inner` (both (lo, hi) pairs)."""
    return all(outer[0][a] <= inner[0][a] and inner[1][a] <= outer[1][a] for a in range(3))


def solve_cropped(grid: Grid, scene, params, margin: int = 4, bbox=None, **kw):
    """solve_chunked on the liquid's bounding box, with the velocity and
    valid masks embedded back into full-domain arrays.  Faces outside the
    crop keep the input velocity (they are outside every active DOF's
    support, exactly as in the uncropped solve).  Falls back to the plain
    full-domain solve when cropping isn't worthwhile.

    Returns (new_velocity, valid, stats); stats gains "crop" with the
    chosen box.

    Semantics note vs the uncropped solve: inside the crop the operator,
    RHS and write-back are identical (every active DOF's stencil support
    lies strictly inside).  Outside it, the uncropped solve additionally
    stamps the collision velocity onto fully-solid faces and marks them
    valid (apply_solution_to_velocity) — values nothing downstream reads,
    since no liquid exists there.  The reference behaves like the cropped
    path: its host app hands it a domain already fitted to the surface
    field, and buildValidFaces only sees that domain.

    Pass `bbox` (a previous frame's (lo, hi), e.g. when it still contains
    this frame's tight box — see bbox_contains) to pin the crop: frame
    loops reuse one compiled shape across frames instead of recompiling
    as the liquid drifts.
    """
    from .solver import solve_chunked

    if bbox is None:
        bbox = active_bbox(scene, params, margin=margin)
    else:
        # caller-supplied (pinned) box: verify it still contains this
        # frame's liquid; a stale box would silently freeze the liquid
        # outside it.  min_saving=0 so "crop not worthwhile" doesn't mask
        # the containment check; None here means no liquid or an
        # unaligned domain, where falling back to the internal choice is
        # the safe behavior either way.
        tight = active_bbox(scene, params, margin=2, min_saving=0.0)
        if tight is None or not bbox_contains(bbox, tight):
            bbox = active_bbox(scene, params, margin=margin)
    if bbox is None:
        return solve_chunked(grid, scene, params, **kw)
    lo, hi = bbox
    grid_c, scene_c = crop_scene(grid, scene, lo, hi)
    vel_c, valid_c, stats = solve_chunked(grid_c, scene_c, params, **kw)
    new_vel = tuple(embed_face(scene.velocity[a], vel_c[a], a, lo) for a in range(3))
    valid = tuple(
        embed_face(jnp.zeros(grid.face_shape(a), valid_c[a].dtype), valid_c[a], a, lo)
        for a in range(3)
    )
    stats = dict(stats)
    stats["crop"] = {"lo": lo, "hi": hi, "res": grid_c.res}
    return new_vel, valid, stats
