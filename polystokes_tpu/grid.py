"""MAC-grid conventions for the TPU-native PolyStokes engine.

The staggered grid has 7 sampling families (reference:
exec/HDK_PolyStokesSolver.h:51-60): cell centers, 3 face types, 3 edge
types.  We use dense ``jnp`` arrays per family; unlike the reference's
Houdini tiled voxel fields, sparsity is expressed with masks.

Index/position convention (matches the reference's offset arithmetic, e.g.
exec/HDK_PolyStokesSolver.cpp:1380-1390 and
exec/HDK_PolyStokesSolver_ConstructMatrixBlocks.cpp:446-450):

* cell center ``(i,j,k)`` sits at position ``(i, j, k) * dx``
* x-face index ``(i,j,k)`` sits at ``(i - 1/2, j, k) * dx`` — it separates
  cells ``i-1`` and ``i`` along x; an axis-``a`` face array has ``n[a]+1``
  entries along ``a``
* the edge family ``(p, q)`` (offset axes) at index ``(i,j,k)`` sits at
  ``index - (e_p + e_q)/2``; it runs along the remaining axis ``r`` and
  carries the shear stress tau_pq

Neighbor maps (Houdini SIM::FieldUtils semantics used throughout the
reference's sweeps):

* ``faceToCell(face, a, dir)``   -> ``face[a] += dir - 1``
* ``cellToFace(cell, a, dir)``   -> ``face[a] += dir``
* ``faceToEdge(face, a, e, dir)``-> ``edge[t] += dir``   with ``t = 3-a-e``
* ``edgeToFace(edge, e, fa, dir)``-> ``face[t] += dir - 1`` with ``t = 3-e-fa``

where ``e`` is the axis the edge runs along (edge family axes: 0 -> YZ
edges / tau_yz, 1 -> XZ / tau_xz, 2 -> XY / tau_xy, matching
``edgeLabels(axis)`` in exec/HDK_PolyStokesSolver.h and ``edgeStressDOF``).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

Shape3 = Tuple[int, int, int]

# Edge family <-> offset axes.  Family index e = axis the edge runs along.
# Family 0 (runs along x): offsets in (y, z) -> tau_yz
# Family 1 (runs along y): offsets in (x, z) -> tau_xz
# Family 2 (runs along z): offsets in (x, y) -> tau_xy
EDGE_OFFSET_AXES = ((1, 2), (0, 2), (0, 1))


def face_shape(res: Shape3, axis: int) -> Shape3:
    s = list(res)
    s[axis] += 1
    return tuple(s)


def edge_shape(res: Shape3, edge_axis: int) -> Shape3:
    s = list(res)
    for a in EDGE_OFFSET_AXES[edge_axis]:
        s[a] += 1
    return tuple(s)


def face_offsets(axis: int) -> Tuple[float, float, float]:
    """Position offset (in cell units) of face index (0,0,0) from cell (0,0,0)."""
    off = [0.0, 0.0, 0.0]
    off[axis] = -0.5
    return tuple(off)


def edge_offsets(edge_axis: int) -> Tuple[float, float, float]:
    off = [0.0, 0.0, 0.0]
    for a in EDGE_OFFSET_AXES[edge_axis]:
        off[a] = -0.5
    return tuple(off)


def shift(a: jnp.ndarray, d: Tuple[int, int, int], fill=0):
    """Return array b with b[i] = a[i + d], out-of-range filled with `fill`.

    Replaces the reference's voxel-border handling (labels bordered with
    UNASSIGNED, weights with 0; exec/HDK_PolyStokesSolver.cpp:104-110).
    """
    out = a
    for ax, dd in enumerate(d):
        if dd == 0:
            continue
        n = out.shape[ax]
        if dd > 0:
            sl = [slice(None)] * out.ndim
            sl[ax] = slice(dd, n)
            pad = [(0, 0)] * out.ndim
            pad[ax] = (0, dd)
        else:
            sl = [slice(None)] * out.ndim
            sl[ax] = slice(0, n + dd)
            pad = [(0, 0)] * out.ndim
            pad[ax] = (-dd, 0)
        out = jnp.pad(out[tuple(sl)], pad, constant_values=fill)
    return out


def coord_grids(shape: Shape3, offset: Tuple[float, float, float], dtype):
    """Per-axis position arrays (cell units) for a sampling family.

    Returned broadcastable as (nx,1,1), (1,ny,1), (1,1,nz).
    """
    xs = jnp.arange(shape[0], dtype=dtype) + offset[0]
    ys = jnp.arange(shape[1], dtype=dtype) + offset[1]
    zs = jnp.arange(shape[2], dtype=dtype) + offset[2]
    return xs[:, None, None], ys[None, :, None], zs[None, None, :]


@dataclasses.dataclass(frozen=True)
class Grid:
    """Static description of the MAC grid."""

    res: Shape3
    dx: float

    @property
    def nx(self):
        return self.res[0]

    @property
    def ny(self):
        return self.res[1]

    @property
    def nz(self):
        return self.res[2]

    @property
    def center_shape(self) -> Shape3:
        return self.res

    def face_shape(self, axis: int) -> Shape3:
        return face_shape(self.res, axis)

    def edge_shape(self, edge_axis: int) -> Shape3:
        return edge_shape(self.res, edge_axis)
