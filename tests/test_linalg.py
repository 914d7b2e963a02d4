"""Batched SPD Cholesky (linalg.py) vs numpy, incl. the f64 pathway that
replaces the TPU-unsupported batched LU."""
import pytest
import numpy as np

import jax.numpy as jnp

from polystokes_tpu.linalg import cholesky_batched, cholesky_solve, inv_spd, solve_spd


def _random_spd(rng, R, D, dtype):
    M = rng.standard_normal((R, D, D))
    A = np.einsum("rik,rjk->rij", M, M) + 0.1 * np.eye(D)
    return jnp.asarray(A, dtype)


def test_cholesky_matches_numpy():
    rng = np.random.default_rng(0)
    A = _random_spd(rng, 5, 26, jnp.float64)
    L = np.asarray(cholesky_batched(A))
    np.testing.assert_allclose(np.einsum("rik,rjk->rij", L, L), np.asarray(A), atol=1e-10)
    assert np.allclose(np.triu(L, 1), 0.0)


def test_cholesky_solve_matrix_and_vector():
    rng = np.random.default_rng(1)
    A = _random_spd(rng, 4, 11, jnp.float64)
    L = cholesky_batched(A)
    b = jnp.asarray(rng.standard_normal((4, 11)))
    x = np.asarray(cholesky_solve(L, b))
    np.testing.assert_allclose(np.einsum("rij,rj->ri", np.asarray(A), x), np.asarray(b), atol=1e-9)
    B = jnp.asarray(rng.standard_normal((4, 11, 3)))
    X = np.asarray(cholesky_solve(L, B))
    np.testing.assert_allclose(np.einsum("rij,rjk->rik", np.asarray(A), X), np.asarray(B), atol=1e-9)


def test_solve_and_inv_dispatch():
    rng = np.random.default_rng(2)
    A = _random_spd(rng, 3, 26, jnp.float64)
    X = np.asarray(solve_spd(A, jnp.eye(26, dtype=jnp.float64)[None].repeat(3, 0)))
    np.testing.assert_allclose(X, np.linalg.inv(np.asarray(A)), atol=1e-8)
    np.testing.assert_allclose(np.asarray(inv_spd(A)), np.linalg.inv(np.asarray(A)), atol=1e-8)


@pytest.mark.quick
def test_chunked_large_batch(monkeypatch):
    """Batches past _CHUNK_REGIONS run through lax.map chunks (the
    [65536, 26, 26] batched-LU path that faults the TPU device at 256^3
    tile 8) and must match the direct solve/inverse, including the
    padded remainder chunk."""
    import polystokes_tpu.linalg as pl_

    monkeypatch.setattr(pl_, "_CHUNK_REGIONS", 8)
    rng = np.random.default_rng(7)
    A = _random_spd(rng, 21, 5, jnp.float32)  # 21 = 2 full chunks + 5 remainder
    B = jnp.asarray(rng.standard_normal((21, 5, 2)), jnp.float32)
    X = np.asarray(pl_.solve_spd(A, B))
    np.testing.assert_allclose(X, np.linalg.solve(np.asarray(A), np.asarray(B)), atol=1e-4)
    Inv = np.asarray(pl_.inv_spd(A))
    np.testing.assert_allclose(Inv, np.linalg.inv(np.asarray(A)), atol=1e-4)
