"""Analytic signed-distance fields and SDF sampling utilities.

SDF convention throughout the engine: **negative inside**.  The scene
provides the liquid surface SDF and the solid collision SDF sampled at cell
centers; sub-voxel sampling is done by trilinear interpolation of those
center-sampled arrays (Houdini samples its center-sampled SDF fields the
same way in computeSDFWeightsSampled; reference:
exec/HDK_PolyStokesSolver.cpp:294-326).

Positions are in *cell units* (cell center (i,j,k) at (i,j,k); see
``polystokes_tpu.grid``).
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp

from .grid import coord_grids


# ---------------------------------------------------------------------------
# Analytic SDF builders (world-space callables: f(x, y, z) -> sdf)
# ---------------------------------------------------------------------------

def sphere(center, radius) -> Callable:
    cx, cy, cz = center

    def f(x, y, z):
        return jnp.sqrt((x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2) - radius

    return f


def box(lo, hi) -> Callable:
    """Axis-aligned box SDF (exact outside, exact inside)."""
    lo = jnp.asarray(lo)
    hi = jnp.asarray(hi)

    def f(x, y, z):
        p = jnp.stack(jnp.broadcast_arrays(x, y, z), axis=-1)
        c = (lo + hi) / 2.0
        b = (hi - lo) / 2.0
        q = jnp.abs(p - c) - b
        outside = jnp.sqrt(jnp.sum(jnp.maximum(q, 0.0) ** 2, axis=-1))
        inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
        return outside + inside

    return f


def plane(normal, offset) -> Callable:
    """Half-space: negative where dot(n, p) < offset."""
    n = jnp.asarray(normal, dtype=jnp.float64) if False else jnp.asarray(normal)
    n = n / jnp.linalg.norm(n)

    def f(x, y, z):
        return n[0] * x + n[1] * y + n[2] * z - offset

    return f


def capsule(a, b, radius) -> Callable:
    a = jnp.asarray(a)
    b = jnp.asarray(b)

    def f(x, y, z):
        p = jnp.stack(jnp.broadcast_arrays(x, y, z), axis=-1)
        pa = p - a
        ba = b - a
        h = jnp.clip(jnp.sum(pa * ba, axis=-1) / jnp.sum(ba * ba), 0.0, 1.0)
        return jnp.linalg.norm(pa - h[..., None] * ba, axis=-1) - radius

    return f


def torus(center, major_radius, minor_radius, axis: int = 1) -> Callable:
    """Torus around `axis` through `center` — the honey-coil emitter shape."""
    c = jnp.asarray(center)
    perp = [a for a in range(3) if a != axis]

    def f(x, y, z):
        p = jnp.stack(jnp.broadcast_arrays(x, y, z), axis=-1) - c
        q_r = jnp.sqrt(p[..., perp[0]] ** 2 + p[..., perp[1]] ** 2) - major_radius
        return jnp.sqrt(q_r**2 + p[..., axis] ** 2) - minor_radius

    return f


def union(*fs: Callable) -> Callable:
    def f(x, y, z):
        vals = [g(x, y, z) for g in fs]
        out = vals[0]
        for v in vals[1:]:
            out = jnp.minimum(out, v)
        return out

    return f


def intersection(*fs: Callable) -> Callable:
    def f(x, y, z):
        vals = [g(x, y, z) for g in fs]
        out = vals[0]
        for v in vals[1:]:
            out = jnp.maximum(out, v)
        return out

    return f


def complement(g: Callable) -> Callable:
    return lambda x, y, z: -g(x, y, z)


def constant(value: float) -> Callable:
    return lambda x, y, z: jnp.broadcast_to(jnp.asarray(value, x.dtype), jnp.broadcast_shapes(x.shape, y.shape, z.shape))


def sample_at_centers(f: Callable, res, dx: float, dtype=jnp.float32) -> jnp.ndarray:
    """Sample a world-space SDF callable at cell centers -> (nx,ny,nz) array."""
    xs, ys, zs = coord_grids(res, (0.0, 0.0, 0.0), dtype)
    return f(xs * dx, ys * dx, zs * dx).astype(dtype)
