"""Property tests for the divergence-free polynomial basis
(reference: exec/HDK_PolyStokesSolver.cpp:2107-2182)."""
import jax.numpy as jnp
import numpy as np
import pytest

from polystokes_tpu.basis import (
    AFFINE_DOF,
    QUADRATIC_DOF,
    conversion_coefficients,
    divergence,
    evaluate_velocity,
)
from polystokes_tpu.config import BasisOrder


@pytest.mark.parametrize("basis,dof", [(BasisOrder.QUADRATIC, QUADRATIC_DOF), (BasisOrder.AFFINE, AFFINE_DOF)])
def test_shapes(basis, dof):
    off = jnp.zeros((5, 3))
    for axis in range(3):
        c = conversion_coefficients(off, axis, basis)
        assert c.shape == (5, dof)


@pytest.mark.parametrize("basis", [BasisOrder.QUADRATIC, BasisOrder.AFFINE])
def test_divergence_free_numerically(basis):
    """Central finite differences of the evaluated field must have zero
    divergence for random coefficients at random points."""
    rng = np.random.default_rng(0)
    dof = basis.value
    w = jnp.asarray(rng.standard_normal((dof,)))
    pts = jnp.asarray(rng.standard_normal((64, 3)))
    h = 1e-5

    div = jnp.zeros((64,))
    for axis in range(3):
        e = jnp.zeros((3,)).at[axis].set(h)
        up = evaluate_velocity(pts + e, axis, w, basis)
        dn = evaluate_velocity(pts - e, axis, w, basis)
        div = div + (up - dn) / (2 * h)
    np.testing.assert_allclose(np.asarray(div), 0.0, atol=1e-8)


@pytest.mark.parametrize("basis", [BasisOrder.QUADRATIC, BasisOrder.AFFINE])
def test_divergence_free_analytically(basis):
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((8, basis.value)))
    pts = jnp.asarray(rng.standard_normal((8, 3)))
    d = divergence(pts, w, basis)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-12)


def test_constant_and_rigid_fields_representable():
    """Constant translations and rigid rotations are divergence-free and
    must be exactly representable by the quadratic basis."""
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.standard_normal((32, 3)))

    # translation (1, 2, 3)
    w = jnp.zeros((QUADRATIC_DOF,)).at[0].set(1.0).at[1].set(2.0).at[2].set(3.0)
    for axis, expect in [(0, 1.0), (1, 2.0), (2, 3.0)]:
        v = evaluate_velocity(pts, axis, w, BasisOrder.QUADRATIC)
        np.testing.assert_allclose(np.asarray(v), expect, atol=1e-12)

    # rotation omega x r with omega = (0, 0, 1): u = (-y, x, 0)
    w = jnp.zeros((QUADRATIC_DOF,)).at[4].set(-1.0).at[12].set(1.0)
    vx = evaluate_velocity(pts, 0, w, BasisOrder.QUADRATIC)
    vy = evaluate_velocity(pts, 1, w, BasisOrder.QUADRATIC)
    vz = evaluate_velocity(pts, 2, w, BasisOrder.QUADRATIC)
    np.testing.assert_allclose(np.asarray(vx), -np.asarray(pts[:, 1]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(vy), np.asarray(pts[:, 0]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(vz), 0.0, atol=1e-12)


def test_reference_layout_spotchecks():
    """Pin the exact coefficient layout of the reference
    (exec/HDK_PolyStokesSolver.cpp:2107-2149): a handful of hand-computed
    entries at offset (2, 3, 5)."""
    off = jnp.asarray([[2.0, 3.0, 5.0]])
    cx = np.asarray(conversion_coefficients(off, 0))[0]
    cy = np.asarray(conversion_coefficients(off, 1))[0]
    cz = np.asarray(conversion_coefficients(off, 2))[0]

    # vx row: [1,0,0, x,y,z, x^2,xy,xz, y^2,yz,z^2, 0...]
    np.testing.assert_allclose(cx[:12], [1, 0, 0, 2, 3, 5, 4, 6, 10, 9, 15, 25])
    assert np.all(cx[12:] == 0)
    # vy row
    np.testing.assert_allclose(cy[12:21], [2, 3, 5, 4, 6, 10, 9, 15, 25])
    assert cy[1] == 1 and np.all(cy[2:12] == 0) and np.all(cy[21:] == 0)
    # vz row: [0,0,1, -z,0,0, -2xz,-yz,-z^2/2, 0,0,0, 0,-z,0, 0,-xz,0,
    #          -2yz,-z^2/2,0, x,y,x^2, xy,y^2]
    np.testing.assert_allclose(
        cz,
        [0, 0, 1, -5, 0, 0, -20, -15, -12.5, 0, 0, 0, 0, -5, 0, 0, -10, 0, -30, -12.5, 0, 2, 3, 4, 6, 9],
    )
