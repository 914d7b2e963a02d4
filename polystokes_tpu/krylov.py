"""Matrix-free Krylov solvers as on-device `lax.while_loop`s.

Re-implements the reference's hand-rolled templates (lib/include/pcg.h):
  * pcg_external_matrix_A (pcg.h:269-340)  — the default CG, including its
    convergence test  rre = min(||r||^2, ||r||^2 / ||x||^2) < tol^2
  * bicgstab_external_matrix_A (pcg.h:135-200) — the non-convergence
    fallback
  * minres_external_matrix_A (pcg.h:203-263)

The whole iteration runs on device: one operator application per
iteration, no host round-trips (the reference's per-iteration Eigen SpMV
loop becomes a fused XLA stencil program).

Vectors are arbitrary pytrees; dots reduce over every leaf.  Entries
outside the DOF masks must be zero in b and in the operator's output, so
the pytree dot equals the packed-DOF dot and iteration counts match the
reference exactly.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


def tree_dot(a, b):
    leaves = jax.tree.leaves(jax.tree.map(lambda x, y: jnp.vdot(x, y), a, b))
    return sum(leaves)


def tree_axpy(alpha, x, y):
    return jax.tree.map(lambda xi, yi: alpha * xi + yi, x, y)


def tree_scale(alpha, x):
    return jax.tree.map(lambda xi: alpha * xi, x)


class KrylovResult(NamedTuple):
    x: object
    iterations: jnp.ndarray
    error: jnp.ndarray  # the reference's `rre` (already sqrt-ed on exit)
    converged: jnp.ndarray


class PCGCarry(NamedTuple):
    """On-device PCG state, carried across jitted segments (the chunked
    solve loop: solver.solve_chunked).  Checkpointable as a flat pytree."""

    x: object
    r: object
    p: object
    rsold: jnp.ndarray
    k: jnp.ndarray
    rre: jnp.ndarray
    done: jnp.ndarray


def _rre(rsnew, xmag):
    # reference: rre = rsnew; if (rsnew/xmag < rre) rre = rsnew/xmag
    # (xmag == x.x; guard against xmag == 0)
    ratio = jnp.where(xmag > 0, rsnew / jnp.where(xmag > 0, xmag, 1.0), rsnew)
    return jnp.minimum(rsnew, ratio)


def pcg_init(apply_A: Callable, b, x0, precond: Callable = None) -> PCGCarry:
    """Initial PCG state (the pre-loop section of pcg_external_matrix_A)."""
    if precond is None:
        precond = lambda r: r
    r = jax.tree.map(jnp.subtract, b, apply_A(x0))
    z = precond(r)
    p = z
    rsold = tree_dot(r, z)
    # a zero right-hand side (e.g. fluid at rest) is already converged;
    # entering the loop would produce 0/0
    trivially_done = tree_dot(r, r) == 0
    rre0 = jnp.where(
        trivially_done,
        jnp.asarray(0.0, jnp.result_type(rsold)),
        jnp.asarray(jnp.inf, jnp.result_type(rsold)),
    )
    return PCGCarry(x=x0, r=r, p=p, rsold=rsold, k=jnp.int32(0), rre=rre0, done=trivially_done)


def pcg_segment(apply_A: Callable, carry: PCGCarry, precond: Callable = None, tol: float = 1e-3, max_iters: int = 5000, segment_iters: int = None, apply_dot: Callable = None, fused_update: Callable = None) -> PCGCarry:
    """Run at most `segment_iters` PCG iterations (all of them if None),
    stopping early on convergence or at `max_iters` total.  Chaining
    segments is bit-identical to one monolithic loop (the loop body is
    unchanged; only the stopping bound differs).

    `apply_dot(p) -> (A p, <p, A p>)`, when given, replaces the separate
    apply + tree_dot — the fused Pallas apply emits the pAp partials from
    its own blocks, removing one full-vector read per iteration.

    `fused_update(x, r, p, Ap, alpha) -> (x', r', z, <r',r'>, <x',x'>,
    <r',z>)`, when given, replaces the two axpys, the preconditioner
    application, and the three loop dots with one pointwise kernel
    (pallas_apply.cg_update_packed); `precond` is then unused inside the
    loop (the kernel owns it)."""
    if precond is None:
        precond = lambda r: r
    if segment_iters is None:
        k_end = jnp.int32(max_iters)
    else:
        k_end = jnp.minimum(carry.k + jnp.int32(segment_iters), jnp.int32(max_iters))

    def cond(st: PCGCarry):
        return (~st.done) & (st.k < k_end)

    def body(st: PCGCarry):
        x, r, p, rsold = st.x, st.r, st.p, st.rsold
        if apply_dot is not None:
            Ap, pAp = apply_dot(p)
        else:
            Ap = apply_A(p)
            pAp = tree_dot(p, Ap)
        alpha = rsold / jnp.where(pAp != 0, pAp, 1.0)
        if fused_update is not None:
            x, r, z, rsnew_rr, xmag, rs = fused_update(x, r, p, Ap, alpha)
        else:
            x = tree_axpy(alpha, p, x)
            r = tree_axpy(-alpha, Ap, r)
            rsnew_rr = tree_dot(r, r)
            xmag = tree_dot(x, x)
            z = precond(r)
            rs = tree_dot(r, z)
        rre = _rre(rsnew_rr, xmag)
        done = rre < tol * tol
        beta = rs / rsold
        p = tree_axpy(beta, p, z)
        return PCGCarry(x=x, r=r, p=p, rsold=rs, k=st.k + 1, rre=rre, done=done)

    return jax.lax.while_loop(cond, body, carry)


def pcg_result(carry: PCGCarry) -> KrylovResult:
    iters = jnp.where(carry.done, jnp.maximum(carry.k - 1, 0), carry.k)
    return KrylovResult(x=carry.x, iterations=iters, error=jnp.sqrt(carry.rre), converged=carry.done)


def pcg(apply_A: Callable, b, x0, precond: Callable = None, tol: float = 1e-3, max_iters: int = 5000, apply_dot: Callable = None, fused_update: Callable = None):
    """Preconditioned CG, semantics of pcg_external_matrix_A (pcg.h:269-340).

    Returns iteration index at convergence (0-based, like the reference's
    `return i`), or max_iters when not converged.
    """
    carry = pcg_init(apply_A, b, x0, precond)
    carry = pcg_segment(apply_A, carry, precond, tol=tol, max_iters=max_iters, apply_dot=apply_dot, fused_update=fused_update)
    return pcg_result(carry)


def flex_pcg(apply_A: Callable, b, x0, precond: Callable = None, tol: float = 1e-3, max_iters: int = 5000):
    """Flexible PCG with the Polak-Ribiere beta (flex_pcg, pcg.h:81-132):
    tolerates nonstationary preconditioners (e.g. inner smoother sweeps).
    NOTE: this variant's convergence test uses rre = min(||r||^2,
    ||r||^2/||x||) < tol, matching the reference literally."""
    if precond is None:
        precond = lambda r: r

    r = jax.tree.map(jnp.subtract, b, apply_A(x0))
    z = precond(r)
    p = z
    trivially_done = tree_dot(r, r) == 0

    def cond(st):
        x, r, p, zold, rold, k, rre, done = st
        return (~done) & (k < max_iters)

    def body(st):
        x, r, p, zold, rold, k, _, _ = st
        Ap = apply_A(p)
        pAp = tree_dot(p, Ap)
        alpha = tree_dot(rold, zold) / jnp.where(pAp != 0, pAp, 1.0)
        x = tree_axpy(alpha, p, x)
        r = tree_axpy(-alpha, Ap, r)
        rsnew = tree_dot(r, r)
        xmag = jnp.sqrt(tree_dot(x, x))
        rre = jnp.minimum(rsnew, jnp.where(xmag > 0, rsnew / jnp.where(xmag > 0, xmag, 1.0), rsnew))
        done = rre < tol
        z = precond(r)
        beta = tree_dot(r, jax.tree.map(jnp.subtract, z, zold)) / tree_dot(rold, zold)
        p = tree_axpy(beta, p, z)
        return x, r, p, z, r, k + 1, rre, done

    dt = jnp.result_type(tree_dot(b, b))
    rre0 = jnp.where(trivially_done, jnp.asarray(0.0, dt), jnp.asarray(jnp.inf, dt))
    st = jax.lax.while_loop(cond, body, (x0, r, p, z, r, jnp.int32(0), rre0, trivially_done))
    x, r, p, z, rold, k, rre, done = st
    iters = jnp.where(done, jnp.maximum(k - 1, 0), k)
    return KrylovResult(x=x, iterations=iters, error=jnp.sqrt(jnp.maximum(rre, 0.0)), converged=done)


def bicgstab(apply_A: Callable, b, x0, tol: float = 1e-3, max_iters: int = 5000):
    """BiCGStab fallback, semantics of bicgstab_external_matrix_A
    (pcg.h:135-200) — including its explicit-residual convergence check
    (err = b - A x each iteration; rre = min(||err||^2, ||err|| / ||x||))."""
    r = jax.tree.map(jnp.subtract, b, apply_A(x0))
    rhat = r
    zeros = jax.tree.map(jnp.zeros_like, b)
    dt = jnp.result_type(tree_dot(b, b))
    one = jnp.asarray(1.0, dt)

    def cond(st):
        x, r, p, v, rho, alpha, omega, k, rre, done = st
        return (~done) & (k < max_iters)

    def body(st):
        x, r, p, v, rho_old, alpha, omega, k, _, _ = st
        rho = tree_dot(rhat, r)
        beta = (rho / rho_old) * (alpha / omega)
        p = tree_axpy(beta, tree_axpy(-omega, v, p), r)
        v = apply_A(p)
        alpha = rho / tree_dot(rhat, v)
        h = tree_axpy(alpha, p, x)
        s = tree_axpy(-alpha, v, r)
        t = apply_A(s)
        omega = tree_dot(t, s) / tree_dot(t, t)
        x = tree_axpy(omega, s, h)
        xmag = jnp.sqrt(tree_dot(x, x))
        err = jax.tree.map(jnp.subtract, b, apply_A(x))
        rsnew = tree_dot(err, err)
        rre = jnp.minimum(rsnew, jnp.where(xmag > 0, jnp.sqrt(rsnew) / jnp.where(xmag > 0, xmag, 1.0), rsnew))
        done = rre < tol
        r = tree_axpy(-omega, t, s)
        return x, r, p, v, rho, alpha, omega, k + 1, rre, done

    st = (x0, r, zeros, zeros, one, one, one, jnp.int32(0), jnp.asarray(jnp.inf, dt), jnp.bool_(False))
    x, r, p, v, rho, alpha, omega, k, rre, done = jax.lax.while_loop(cond, body, st)
    iters = jnp.where(done, k - 1, k)
    return KrylovResult(x=x, iterations=iters, error=rre, converged=done)


def minres(apply_A: Callable, b, x0, tol: float = 1e-3, max_iters: int = 5000):
    """MINRES variant of minres_external_matrix_A (pcg.h:203-263)."""
    r = jax.tree.map(jnp.subtract, b, apply_A(x0))
    p1 = r
    s1 = apply_A(p1)
    dt = jnp.result_type(tree_dot(b, b))

    def cond(st):
        x, r, p0, s0, p1, s1, k, rre, done = st
        return (~done) & (k < max_iters)

    def body(st):
        x, r, p0_prev, s0_prev, p1_, s1_, k, _, _ = st
        p2, s2 = p1_, s1_
        p1n, s1n = p0_prev, s0_prev
        alpha = tree_dot(r, s1n) / tree_dot(s1n, s1n)
        x = tree_axpy(alpha, p1n, x)
        r = tree_axpy(-alpha, s1n, r)
        xmag = jnp.sqrt(tree_dot(x, x))
        rsnew = tree_dot(r, r)
        rre = jnp.minimum(rsnew, jnp.where(xmag > 0, jnp.sqrt(rsnew) / jnp.where(xmag > 0, xmag, 1.0), rsnew))
        done = rre < tol
        p0 = s1n
        s0 = apply_A(s1n)
        beta1 = tree_dot(s0, s1n) / tree_dot(s1n, s1n)
        p0 = tree_axpy(-beta1, p1n, p0)
        s0 = tree_axpy(-beta1, s1n, s0)
        beta2 = jnp.where(k > 1, tree_dot(s0, s2) / tree_dot(s2, s2), jnp.asarray(0.0, dt))
        p0 = tree_axpy(-beta2, p2, p0)
        s0 = tree_axpy(-beta2, s2, s0)
        return x, r, p0, s0, p1n, s1n, k + 1, rre, done

    st = (x0, r, p1, s1, p1, s1, jnp.int32(0), jnp.asarray(jnp.inf, dt), jnp.bool_(False))
    x = jax.lax.while_loop(cond, body, st)
    return KrylovResult(x=x[0], iterations=x[6], error=x[7], converged=x[8])
