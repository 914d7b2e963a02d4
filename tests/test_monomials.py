"""The monomial factorization C = A M must reproduce the basis exactly."""
import jax.numpy as jnp
import numpy as np
import pytest

from polystokes_tpu.basis import (
    conversion_coefficients_xyz,
    monomial_matrix,
    monomials_xyz,
)
from polystokes_tpu.config import BasisOrder


@pytest.mark.parametrize("basis", [BasisOrder.QUADRATIC, BasisOrder.AFFINE])
@pytest.mark.parametrize("axis", [0, 1, 2])
def test_monomial_factorization(basis, axis):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(64))
    y = jnp.asarray(rng.standard_normal(64))
    z = jnp.asarray(rng.standard_normal(64))
    C = np.asarray(conversion_coefficients_xyz(x, y, z, axis, basis, stack_axis=0))  # [D, N]
    A = monomial_matrix(axis, basis)  # [D, K]
    M = np.stack([np.asarray(m) for m in monomials_xyz(x, y, z, basis)])  # [K, N]
    np.testing.assert_allclose(C, A @ M, atol=1e-12)
