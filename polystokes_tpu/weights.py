"""Cut-cell integration weights at the 7 MAC sampling families.

TPU-native equivalent of the reference's supersampled SDF volume fractions
(``buildIntegrationWeightsAlt`` -> ``computeSDFWeightsSampled`` with
``numberOfSamples = 2`` and no minimum-weight clamp; reference:
exec/HDK_PolyStokesSolver.cpp:239-326).

Semantics (comments at exec/HDK_PolyStokesSolver.cpp:161-167):
  * liquid weight: 1 deep inside the liquid (surface sdf < 0), 0 in air
  * fluid  weight: 1 in open fluid (collision sdf >= 0), 0 deep in solid

Each weight is the fraction of 2x2x2 supersample points (offsets of
+-0.25 cell units around the sample position) at which the trilinearly
interpolated center-sampled SDF is inside.  Because every supersample
position is a *constant* fractional offset from the lattice, the trilinear
interpolation reduces to fixed-coefficient shift stencils — no gathers, so
XLA fuses the whole computation into vector ops.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .grid import Grid, edge_offsets, face_offsets


def _interp_axis(a: jnp.ndarray, axis: int, family_off: float, sub: float) -> jnp.ndarray:
    """Interpolate a center-sampled array along `axis` to positions
    ``i + family_off + sub`` (family_off in {0, -0.5}, sub in {-0.25, +0.25}).

    Output length along `axis` is n (family_off == 0) or n + 1
    (family_off == -0.5).  Out-of-range source samples are edge-clamped,
    matching field border extrapolation of the reference's SDF sampling.
    """
    c = family_off + sub
    n = a.shape[axis]
    # pad by one on each side (edge mode)
    pad = [(0, 0)] * a.ndim
    pad[axis] = (1, 1)
    ap = jnp.pad(a, pad, mode="edge")  # ap[i] == a[i-1], length n+2

    def sl(start, length):
        s = [slice(None)] * a.ndim
        s[axis] = slice(start, start + length)
        return tuple(s)

    out_len = n + 1 if family_off == -0.5 else n
    # position q = i + c ; base = floor(c) relative to i ; frac = c - base
    base = -1 if c < 0 else 0
    frac = c - base
    # value = (1-frac) * a[i+base] + frac * a[i+base+1]
    lo = ap[sl(1 + base, out_len)]
    hi = ap[sl(2 + base, out_len)]
    return (1.0 - frac) * lo + frac * hi


def _supersampled_inside_fraction(
    sdf_c: jnp.ndarray, offsets: Tuple[float, float, float], inside_test, dtype
) -> jnp.ndarray:
    """Fraction of the 8 supersamples that pass `inside_test` (array -> bool)."""
    acc = None
    # Separable: interpolate x first (2 variants), then y (2), then z (2).
    for sx in (-0.25, 0.25):
        ax = _interp_axis(sdf_c, 0, offsets[0], sx)
        for sy in (-0.25, 0.25):
            axy = _interp_axis(ax, 1, offsets[1], sy)
            for sz in (-0.25, 0.25):
                val = _interp_axis(axy, 2, offsets[2], sz)
                ins = inside_test(val).astype(dtype)
                acc = ins if acc is None else acc + ins
    return acc * jnp.asarray(0.125, dtype)


def _family_offsets():
    offs = {"center": (0.0, 0.0, 0.0)}
    for a in range(3):
        offs[f"face{a}"] = face_offsets(a)
    for e in range(3):
        offs[f"edge{e}"] = edge_offsets(e)
    return offs


def compute_weights(grid: Grid, surface_sdf: jnp.ndarray, collision_sdf: jnp.ndarray, dtype=jnp.float32):
    """Compute liquid and fluid weights at all 7 sampling families.

    Args:
      surface_sdf:   (nx,ny,nz) liquid surface SDF at cell centers (<0 inside)
      collision_sdf: (nx,ny,nz) solid SDF at cell centers (<0 inside solid)

    Returns:
      (liquid, fluid): two dicts with keys
        'center', 'face0'..'face2', 'edge0'..'edge2'.
    """
    offs = _family_offsets()
    liquid = {}
    fluid = {}
    s = surface_sdf.astype(dtype)
    c = collision_sdf.astype(dtype)
    for name, off in offs.items():
        liquid[name] = _supersampled_inside_fraction(s, off, lambda v: v < 0, dtype)
        fluid[name] = _supersampled_inside_fraction(c, off, lambda v: v >= 0, dtype)
    return liquid, fluid
