"""Divergence-free polynomial reduction bases.

The heart of the model reduction: each reduced region's velocity field is
one divergence-free polynomial.  ``conversion_coefficients(offset, axis)``
returns the coefficient vector c such that ``u_axis(x) = c . w`` for region
coefficient vector w, where ``offset = x - COM(region)``.

Quadratic basis: 26 DOFs — vx, vy are full quadratics (10 coeffs each) and
vz has 6 free coefficients, the rest determined so that div(u) == 0 exactly
(reference: exec/HDK_PolyStokesSolver.cpp:2107-2149).  Affine variant: 11
DOFs (reference: exec/HDK_PolyStokesSolver.cpp:2153-2182).

Coefficient layout (quadratic), with o = (x, y, z) = offset:
  vx = w0  + w3 x + w4 y + w5 z + w6 x^2 + w7 xy + w8 xz + w9 y^2
       + w10 yz + w11 z^2
  vy = w1  + w12 x + w13 y + w14 z + w15 x^2 + w16 xy + w17 xz + w18 y^2
       + w19 yz + w20 z^2
  vz = w2  - w3 z - 2 w6 xz - w7 yz - (1/2) w8 z^2 - w13 z - w16 xz
       - 2 w18 yz - (1/2) w19 z^2 + w21 x + w22 y + w23 x^2 + w24 xy
       + w25 y^2
so that d(vx)/dx + d(vy)/dy + d(vz)/dz == 0 identically.

NOTE on scaling: the engine evaluates the basis at offsets measured in
*cell units* (offset / dx).  This is a pure diagonal re-parameterization of
the region coefficients; every Galerkin product J^T B^{-1} J that enters
the (p, tau) system is exactly invariant under it, while the 26x26 blocks
become well-conditioned in fp32 (offsets O(tile) instead of O(tile*dx)).
"""
from __future__ import annotations

import jax.numpy as jnp

from .config import BasisOrder

QUADRATIC_DOF = 26
AFFINE_DOF = 11


def conversion_coefficients(offset: jnp.ndarray, axis: int, basis: BasisOrder = BasisOrder.QUADRATIC, stack_axis: int = -1) -> jnp.ndarray:
    """Basis row for a velocity sample.

    Args:
      offset: (..., 3) offsets from the region center of mass (cell units).
      axis: velocity component (0, 1, 2).
      stack_axis: where the D axis goes.  TPU NOTE: trailing tiny axes pad
        to the 128-lane tile; for big grids prefer stack_axis=0 (leading D
        batches cleanly).

    Returns:
      coefficient vectors with the D axis at `stack_axis`.
    """
    return conversion_coefficients_xyz(
        offset[..., 0], offset[..., 1], offset[..., 2], axis, basis, stack_axis
    )


def conversion_coefficients_xyz(x, y, z, axis: int, basis: BasisOrder = BasisOrder.QUADRATIC, stack_axis: int = -1) -> jnp.ndarray:
    """Like conversion_coefficients but with separate coordinate arrays
    (avoids materializing a (..., 3) tensor, which TPU tiling pads 42x)."""
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)

    if basis == BasisOrder.QUADRATIC:
        if axis == 0:
            cols = [one, zero, zero,
                    x, y, z,
                    x * x, x * y, x * z, y * y, y * z, z * z] + [zero] * 14
        elif axis == 1:
            cols = [zero, one, zero] + [zero] * 9 + [
                x, y, z,
                x * x, x * y, x * z, y * y, y * z, z * z] + [zero] * 5
        else:
            cols = [zero, zero, one,
                    -z, zero, zero,
                    -2.0 * x * z, -y * z, -0.5 * z * z,
                    zero, zero, zero,
                    zero, -z, zero,
                    zero, -x * z, zero,
                    -2.0 * y * z, -0.5 * z * z, zero,
                    x, y, x * x,
                    x * y, y * y]
    else:  # AFFINE
        if axis == 0:
            cols = [one, zero, zero, x, y, z] + [zero] * 5
        elif axis == 1:
            cols = [zero, one, zero, zero, zero, zero, x, y, z, zero, zero]
        else:
            cols = [zero, zero, one, -z, zero, zero, zero, -z, zero, x, y]

    return jnp.stack(cols, axis=stack_axis)


QUADRATIC_MONOMIALS = 10  # [1, x, y, z, x^2, xy, xz, y^2, yz, z^2]
AFFINE_MONOMIALS = 4  # [1, x, y, z]


def monomials_xyz(x, y, z, basis: BasisOrder = BasisOrder.QUADRATIC):
    """The monomial list spanning every basis row (cheap to recompute on
    the fly — used so the hot loop never materializes [.., D] tensors)."""
    if basis == BasisOrder.QUADRATIC:
        one = jnp.ones_like(x)
        return [one, x, y, z, x * x, x * y, x * z, y * y, y * z, z * z]
    return [jnp.ones_like(x), x, y, z]


def n_monomials(basis: BasisOrder = BasisOrder.QUADRATIC) -> int:
    return 10 if basis == BasisOrder.QUADRATIC else 4


def monomial_shift_matrix(cx, cy, cz, basis: BasisOrder = BasisOrder.QUADRATIC):
    """S with m_k(p - c) = sum_j S[.., k, j] * m_j(p), for batched offset
    component arrays cx/cy/cz of any shape (returns [.., K, K]).

    Used by the Pallas moments path: the kernel accumulates moments about
    each cube's origin; S(com - origin) converts them to the COM-relative
    moments that the basis algebra expects."""
    zero = jnp.zeros_like(cx)
    one = jnp.ones_like(cx)

    def row(entries):
        return jnp.stack(entries, axis=-1)

    if basis == BasisOrder.AFFINE:
        rows = [
            row([one, zero, zero, zero]),
            row([-cx, one, zero, zero]),
            row([-cy, zero, one, zero]),
            row([-cz, zero, zero, one]),
        ]
        return jnp.stack(rows, axis=-2)

    # monomial order: [1, x, y, z, x^2, xy, xz, y^2, yz, z^2]
    rows = [
        row([one, zero, zero, zero, zero, zero, zero, zero, zero, zero]),
        row([-cx, one, zero, zero, zero, zero, zero, zero, zero, zero]),
        row([-cy, zero, one, zero, zero, zero, zero, zero, zero, zero]),
        row([-cz, zero, zero, one, zero, zero, zero, zero, zero, zero]),
        row([cx * cx, -2 * cx, zero, zero, one, zero, zero, zero, zero, zero]),
        row([cx * cy, -cy, -cx, zero, zero, one, zero, zero, zero, zero]),
        row([cx * cz, -cz, zero, -cx, zero, zero, one, zero, zero, zero]),
        row([cy * cy, zero, -2 * cy, zero, zero, zero, zero, one, zero, zero]),
        row([cy * cz, zero, -cz, -cy, zero, zero, zero, zero, one, zero]),
        row([cz * cz, zero, zero, -2 * cz, zero, zero, zero, zero, zero, one]),
    ]
    return jnp.stack(rows, axis=-2)


def monomial_matrix(axis: int, basis: BasisOrder = BasisOrder.QUADRATIC):
    """Constant [D, K] combination matrix A with
    conversion_coefficients(o, axis)[d] == sum_k A[d, k] * m_k(o)."""
    import numpy as np

    if basis == BasisOrder.QUADRATIC:
        A = np.zeros((QUADRATIC_DOF, QUADRATIC_MONOMIALS))
        if axis == 0:
            A[0, 0] = 1.0
            for i in range(9):
                A[3 + i, 1 + i] = 1.0
        elif axis == 1:
            A[1, 0] = 1.0
            for i in range(9):
                A[12 + i, 1 + i] = 1.0
        else:
            A[2, 0] = 1.0
            A[3, 3] = -1.0
            A[6, 6] = -2.0
            A[7, 8] = -1.0
            A[8, 9] = -0.5
            A[13, 3] = -1.0
            A[16, 6] = -1.0
            A[18, 8] = -2.0
            A[19, 9] = -0.5
            A[21, 1] = 1.0
            A[22, 2] = 1.0
            A[23, 4] = 1.0
            A[24, 5] = 1.0
            A[25, 7] = 1.0
        return A
    A = np.zeros((AFFINE_DOF, AFFINE_MONOMIALS))
    if axis == 0:
        A[0, 0] = 1.0
        A[3, 1] = 1.0
        A[4, 2] = 1.0
        A[5, 3] = 1.0
    elif axis == 1:
        A[1, 0] = 1.0
        A[6, 1] = 1.0
        A[7, 2] = 1.0
        A[8, 3] = 1.0
    else:
        A[2, 0] = 1.0
        A[3, 3] = -1.0
        A[7, 3] = -1.0
        A[9, 1] = 1.0
        A[10, 2] = 1.0
    return A


def evaluate_velocity(offset: jnp.ndarray, axis: int, w: jnp.ndarray, basis: BasisOrder = BasisOrder.QUADRATIC) -> jnp.ndarray:
    """u_axis at `offset` for region coefficients w (..., REDUCED_DOF)."""
    c = conversion_coefficients(offset, axis, basis)
    return jnp.sum(c * w, axis=-1)


def divergence(offset: jnp.ndarray, w: jnp.ndarray, basis: BasisOrder = BasisOrder.QUADRATIC) -> jnp.ndarray:
    """Analytic divergence of the polynomial field at `offset` (for tests)."""
    x = offset[..., 0]
    y = offset[..., 1]
    z = offset[..., 2]
    if basis == BasisOrder.QUADRATIC:
        dvx_dx = w[..., 3] + 2 * w[..., 6] * x + w[..., 7] * y + w[..., 8] * z
        dvy_dy = w[..., 13] + w[..., 16] * x + 2 * w[..., 18] * y + w[..., 19] * z
        dvz_dz = (-w[..., 3] - 2 * w[..., 6] * x - w[..., 7] * y - w[..., 8] * z
                  - w[..., 13] - w[..., 16] * x - 2 * w[..., 18] * y - w[..., 19] * z)
    else:
        dvx_dx = w[..., 3]
        dvy_dy = w[..., 7]
        dvz_dz = -w[..., 3] - w[..., 7]
    return dvx_dx + dvy_dy + dvz_dz
