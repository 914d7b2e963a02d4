"""Preconditioners for the pressure-stress Schur system.

The reference hardcodes the identity preconditioner
(constructPreconditioner, exec/HDK_PolyStokesSolver_Preconditioners.cpp:4-9)
with block-GS / Eq-14 alternatives implemented but disabled
(lib/src/Preconditioner.cpp).  Here:

  * IDENTITY — exact parity with the reference default.
  * DIAGONAL — Jacobi on |diag(A)|, computed matrix-free from the stencil
    coefficient fields: the grid part of the diagonal is exact
    (dt * sum_f coeff^2 * McInv over adjacent faces, plus 0.5 * uInv); the
    reduced J^T BInv J contribution is folded in per-face as
    coeff^2 * (c^T BInv c) via a gathered quadratic form.  Since A is
    symmetric negative definite, CG preconditions with the positive
    diagonal |diag(A)|.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .classify import REDUCED
from .config import PreconditionerType, SolverParams
from .operators import Assembled, PTau, coeff_fields, face_at_cell, scatter_face_to_edge
from .reduced import _face_basis_leading, gather_com


def _diag_quadratic_form(grid, cls, asm, params, a):
    """q_f = c_f^T BInv[r_f] c_f per face of axis a (0 on non-reduced)."""
    reg = cls.face_region[a]
    red = (cls.face_labels[a] == REDUCED) & (reg >= 0)
    C = _face_basis_leading(cls, asm.com, a, params)
    safe = jnp.clip(reg, 0, asm.binv.shape[0] - 1)

    shape = reg.shape
    D = C.shape[0]
    Cf = C.reshape(D, -1).T
    rf = safe.reshape(-1)
    # chunked gather of BInv so the [N, D, D] intermediate stays small
    chunk = 1 << 15
    N = Cf.shape[0]
    pad = (-N) % chunk
    Cf = jnp.pad(Cf, ((0, pad), (0, 0)))
    rf = jnp.pad(rf, (0, pad))

    def body(args):
        c, r = args
        B = asm.binv[r]
        return jnp.einsum("ni,nij,nj->n", c, B, c)

    q = jax.lax.map(body, (Cf.reshape(-1, chunk, D), rf.reshape(-1, chunk)))
    q = q.reshape(-1)[:N].reshape(shape)
    return jnp.where(red, q, 0.0)


def schur_diagonal(grid, cls, asm: Assembled, params: SolverParams) -> PTau:
    """|diag(A)| as a PTau (positive on DOFs, zero elsewhere)."""
    dt = asm.dt
    p_d = jnp.zeros_like(asm.clw_s)
    tc_d = [jnp.zeros_like(asm.uinv_c) for _ in range(3)]
    te_d = [jnp.zeros_like(asm.uinv_e[e]) for e in range(3)]
    for a in range(3):
        c_lo, c_hi, erow = coeff_fields(asm, a)
        q = _diag_quadratic_form(grid, cls, asm, params, a) if params.do_reduced_regions else 0.0
        wgt = dt * asm.mc_inv[a] + q  # per-face scalar weight of coeff^2
        # pressure / center-stress diagonal: coeff^2 over the 2 faces
        lo = face_at_cell(c_hi**2 * wgt, a, 0)
        hi = face_at_cell(c_lo**2 * wgt, a, 1)
        p_d = p_d + lo + hi
        tc_d[a] = tc_d[a] + lo + hi
        for e in range(3):
            if e == a:
                continue
            elo, ehi = erow[e]
            te_d[e] = te_d[e] + scatter_face_to_edge(elo**2 * wgt, a, e, 0) + scatter_face_to_edge(ehi**2 * wgt, a, e, 1)
    tc = tuple(tc_d[a] + 0.5 * asm.uinv_c for a in range(3))
    te = tuple(te_d[e] + 0.5 * asm.uinv_e[e] for e in range(3))
    return PTau(p=p_d, tc=tc, te=te)


def make_preconditioner(grid, cls, asm: Assembled, params: SolverParams):
    if params.preconditioner == PreconditionerType.IDENTITY:
        return None
    d = schur_diagonal(grid, cls, asm, params)
    inv = jax.tree.map(lambda x: jnp.where(x > 0, 1.0 / jnp.where(x > 0, x, 1.0), 0.0), d)

    def solve(r: PTau) -> PTau:
        return jax.tree.map(jnp.multiply, inv, r)

    return solve
