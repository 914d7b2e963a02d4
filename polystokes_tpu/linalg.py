"""Batched small-matrix SPD linear algebra in pure jnp.

The reduced-region algebra needs batched [R, D, D] factorizations
(D = 26 quadratic / 11 affine): the least-squares fits (reference
fullPivLu, Solver.cpp:415) and inv(Mr/dt + 2Vr) (AssembleBlocks.cpp:
196-244).  XLA:TPU has no f64 batched LU, which blocked fp64 end-to-end
on device (round-1 review item).  Both matrices are symmetric positive
(semi-)definite, so an unrolled Cholesky built from elementwise ops and
small matvecs — all of which the TPU backend supports in f64 — replaces
the LU.  The D-step loops unroll at trace time (D is static).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cholesky_batched(A: jnp.ndarray, jitter: float = 0.0) -> jnp.ndarray:
    """Lower Cholesky factor of a batch of SPD matrices [..., D, D]
    (Cholesky-Crout, unrolled over the static D).  `jitter` is added to
    the diagonal; non-positive pivots are floored so semidefinite inputs
    produce a usable factor instead of NaNs."""
    D = A.shape[-1]
    dtype = A.dtype
    eps = jnp.asarray(jitter, dtype)
    cols = []  # cols[j]: [..., D] column j of L (zeros above the diagonal)
    for j in range(D):
        s = A[..., j, j] + eps
        rest = A[..., :, j]
        for k in range(j):
            lk = cols[k]
            s = s - lk[..., j] * lk[..., j]
            rest = rest - lk[..., j][..., None] * lk
        ljj = jnp.sqrt(jnp.maximum(s, jnp.asarray(1e-30, dtype)))
        col = rest / ljj[..., None]
        # zero the entries above the diagonal
        mask = (jnp.arange(D) >= j).astype(dtype)
        col = col * mask
        col = col.at[..., j].set(ljj)
        cols.append(col)
    return jnp.stack(cols, axis=-1)


def cholesky_solve(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L^T) X = B for batched lower-triangular L [..., D, D] and
    B [..., D] or [..., D, M] (unrolled forward/back substitution)."""
    D = L.shape[-1]
    vec = B.ndim == L.ndim - 1
    if vec:
        B = B[..., None]
    # forward: L Y = B
    ys = []
    for j in range(D):
        acc = B[..., j, :]
        for k in range(j):
            acc = acc - L[..., j, k][..., None] * ys[k]
        ys.append(acc / L[..., j, j][..., None])
    # backward: L^T X = Y
    xs = [None] * D
    for j in reversed(range(D)):
        acc = ys[j]
        for k in range(j + 1, D):
            acc = acc - L[..., k, j][..., None] * xs[k]
        xs[j] = acc / L[..., j, j][..., None]
    X = jnp.stack(xs, axis=-2)
    return X[..., 0] if vec else X


# above this batch count, factorizations run chunked through lax.map:
# one [65536, 26, 26] batched LU faults the TPU device at runtime
# (256^3 tile-8 production config; ROADMAP round-2 known issue), while
# 8k-region chunks are the same shapes the 128^3 configs run fine at
_CHUNK_REGIONS = 8192


def _map_chunked(fn, A, B=None):
    """Apply fn over the leading batch dim in _CHUNK_REGIONS blocks
    (lax.scan over chunks — bounds the live working set and sidesteps the
    huge-batch LU fault).  Shapes are static: pad R up to a multiple."""
    R = A.shape[0]
    n_chunks = -(-R // _CHUNK_REGIONS)
    Rp = n_chunks * _CHUNK_REGIONS
    eyepad = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), (Rp - R,) + A.shape[1:])
    Ap = jnp.concatenate([A, eyepad], 0).reshape((n_chunks, _CHUNK_REGIONS) + A.shape[1:])
    if B is None:
        out = jax.lax.map(fn, Ap)
    else:
        Bp = jnp.concatenate([B, jnp.zeros((Rp - R,) + B.shape[1:], B.dtype)], 0)
        Bp = Bp.reshape((n_chunks, _CHUNK_REGIONS) + B.shape[1:])
        out = jax.lax.map(lambda ab: fn(*ab), (Ap, Bp))
    return out.reshape((Rp,) + out.shape[2:])[:R]


def solve_spd(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """A^{-1} B for batched SPD A; uses Cholesky when the backend cannot
    do a batched LU at this dtype (f64 on TPU), jnp.linalg.solve else.
    Batches beyond _CHUNK_REGIONS run chunked (see _map_chunked)."""
    if _needs_cholesky(A.dtype):
        return cholesky_solve(cholesky_batched(A), B)
    if A.ndim == 3 and A.shape[0] > _CHUNK_REGIONS:
        return _map_chunked(jnp.linalg.solve, A, B)
    return jnp.linalg.solve(A, B)


def inv_spd(A: jnp.ndarray) -> jnp.ndarray:
    """Batched SPD inverse (see solve_spd)."""
    if _needs_cholesky(A.dtype):
        D = A.shape[-1]
        eye = jnp.broadcast_to(jnp.eye(D, dtype=A.dtype), A.shape)
        return cholesky_solve(cholesky_batched(A), eye)
    if A.ndim == 3 and A.shape[0] > _CHUNK_REGIONS:
        return _map_chunked(jnp.linalg.inv, A)
    return jnp.linalg.inv(A)


def _needs_cholesky(dtype) -> bool:
    return jnp.dtype(dtype).itemsize == 8 and jax.default_backend() == "tpu"
