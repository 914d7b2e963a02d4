"""Preconditioners for the pressure-stress Schur system.

The reference hardcodes the identity preconditioner
(constructPreconditioner, exec/HDK_PolyStokesSolver_Preconditioners.cpp:4-9)
with block-GS / Eq-14 alternatives implemented but disabled
(lib/src/Preconditioner.cpp; those operate on the velocity/pressure
explicit layout and are ported in export.py's host path).  Device-side:

  * IDENTITY — exact parity with the reference default.
  * DIAGONAL — Jacobi on |diag(A)|, computed matrix-free from the stencil
    coefficient fields: the grid part of the diagonal is exact
    (dt * sum_f coeff^2 * McInv over adjacent faces, plus 0.5 * uInv); the
    reduced J^T BInv J contribution is folded in per-face as
    coeff^2 * (c^T BInv c) via a gathered quadratic form.  Since A is
    symmetric negative definite, CG preconditions with the positive
    diagonal |diag(A)|.
  * CELL_ARROW — per-cell 4x4 block Jacobi over (p, tau_xx, tau_yy,
    tau_zz) with scalar Jacobi on the edge stresses.  TPU-native design
    point (no reference equivalent): the Schur stencil reads pressure and
    normal stress ONLY through g_a = clw * (p - tau_aa) per axis
    (operators.forward_face_values), so any state with p == tau_xx ==
    tau_yy == tau_zz makes every face value vanish and A degenerates to
    the tiny 0.5*uInv mass term there.  With large viscosity (uInv -> 0)
    this gives a huge cluster of near-zero eigenvalues — the reason
    identity-PCG needs ~10k iterations on viscous scenes.  The cell's
    exact 4x4 restriction of -A is the arrow matrix

        [ sum_a k_a   -k_x          -k_y          -k_z        ]
        [ -k_x         k_x + h       0             0          ]
        [ -k_y         0             k_y + h       0          ]
        [ -k_z         0             0             k_z + h    ],

    k_a = sum over the cell's two a-faces of coeff^2 * (dt*McInv + q_red),
    h = 0.5*uInv; it contains the degenerate (1,1,1,1) direction exactly
    and inverts in closed form via the scalar Schur complement
    s = sum_a k_a * h / (k_a + h).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .classify import REDUCED
from .config import PreconditionerType, SolverParams
from .operators import Assembled, PTau, coeff_fields, face_at_cell, scatter_face_to_edge
from .reduced import expand_J, gather_com, reduce_J


def _diag_quadratic_form(grid, cls, asm, params, a):
    """q_f = c_f^T BInv[r_f] c_f per face of axis a (0 on non-reduced).

    Monomial-factored: with c = A m(off), q = sum_{kl} G[r][k,l] m_k m_l
    where G = A^T BInv A is a tiny per-region [K, K] matrix — so only
    scalar per-face gathers and K(K+1)/2 elementwise passes run on the
    grid (a [26, grid] basis tensor is 1.75 GB at 256^3)."""
    from .basis import monomial_matrix, monomials_xyz, n_monomials
    from .grid import face_offsets
    from .reduced import _coord_axis, gather_com_xyz

    dtype = params.dtype
    reg = cls.face_region[a]
    red = (cls.face_labels[a] == REDUCED) & (reg >= 0)
    A = jnp.asarray(monomial_matrix(a, params.basis), dtype)
    G = jnp.einsum("dk,rde,el->rkl", A, asm.binv, A)  # [R, K, K]
    K = n_monomials(params.basis)
    shape = reg.shape

    from .reduced import _use_tiled

    if _use_tiled(params):
        # cube-major: gather G and COM per CUBE (tiny) and broadcast over
        # cells — the per-face [grid]-sized table gathers below cost whole
        # seconds per K^2 pass at 128^3+
        from .reduced import _face_offset_grids, block_broadcast

        T = params.tile_size
        cs = tuple(-(-n // T) for n in cls.cell_labels.shape)
        roc = cls.region_of_cube
        safe_c = jnp.clip(roc, 0, G.shape[0] - 1)
        ok = (roc >= 0).astype(dtype)
        px, py, pz = _face_offset_grids(cls, asm.com, a, params, T, cs)
        mono = monomials_xyz(px, py, pz, params.basis)
        q = jnp.zeros(shape, dtype)
        for k in range(K):
            for l in range(k, K):
                gc = jnp.where(roc >= 0, G[safe_c, k, l], 0.0)
                gkl = block_broadcast(gc, (a,), T, cs, shape)
                scale = 1.0 if k == l else 2.0
                q = q + scale * gkl * mono[k] * mono[l]
        return jnp.where(red, q, 0.0)

    safe = jnp.clip(reg, 0, asm.binv.shape[0] - 1)
    cx, cy, cz = gather_com_xyz(asm.com, reg)
    off = face_offsets(a)
    px = _coord_axis(shape, 0, dtype) + off[0] - cx
    py = _coord_axis(shape, 1, dtype) + off[1] - cy
    pz = _coord_axis(shape, 2, dtype) + off[2] - cz
    mono = monomials_xyz(px, py, pz, params.basis)
    q = jnp.zeros(shape, dtype)
    for k in range(K):
        for l in range(k, K):
            gkl = G[:, k, l][safe]
            scale = 1.0 if k == l else 2.0
            q = q + scale * gkl * mono[k] * mono[l]
    return jnp.where(red, q, 0.0)


def _axis_cell_k_and_edge_diag(grid, cls, asm: Assembled, params: SolverParams, include_reduced_q: bool = True):
    """Per-axis cell coefficients k_a = sum_{f in faces_a(cell)} coeff^2*wgt
    and the edge-stress diagonals (both halves of |diag(A)| sans the uInv
    mass terms).  `include_reduced_q=False` omits the reduced J^T BInv J
    diagonal probe — used when that term is handled exactly elsewhere
    (REGION_ARROW's Woodbury block)."""
    dt = asm.dt
    k = []
    te_d = [jnp.zeros_like(asm.uinv_e[e]) for e in range(3)]
    for a in range(3):
        c_lo, c_hi, erow = coeff_fields(asm, a)
        q = (
            _diag_quadratic_form(grid, cls, asm, params, a)
            if (params.do_reduced_regions and include_reduced_q)
            else 0.0
        )
        wgt = dt * asm.mc_inv[a] + q  # per-face scalar weight of coeff^2
        # cell's lower face carries the c_hi coefficient, upper face c_lo
        k.append(face_at_cell(c_hi**2 * wgt, a, 0) + face_at_cell(c_lo**2 * wgt, a, 1))
        for e in range(3):
            if e == a:
                continue
            elo, ehi = erow[e]
            te_d[e] = te_d[e] + scatter_face_to_edge(elo**2 * wgt, a, e, 0) + scatter_face_to_edge(ehi**2 * wgt, a, e, 1)
    return k, te_d


def schur_diagonal(grid, cls, asm: Assembled, params: SolverParams) -> PTau:
    """|diag(A)| as a PTau (positive on DOFs, zero elsewhere)."""
    k, te_d = _axis_cell_k_and_edge_diag(grid, cls, asm, params)
    tc = tuple(k[a] + 0.5 * asm.uinv_c for a in range(3))
    te = tuple(te_d[e] + 0.5 * asm.uinv_e[e] for e in range(3))
    return PTau(p=k[0] + k[1] + k[2], tc=tc, te=te)


def _safe_inv(x):
    return jnp.where(x > 0, 1.0 / jnp.where(x > 0, x, 1.0), 0.0)


def cell_arrow_factors(grid, cls, asm: Assembled, params: SolverParams, include_reduced_q: bool = True):
    """The arrow-block inverse factors (k, inv_d, kd, inv_schur, te_inv)."""
    k, te_d = _axis_cell_k_and_edge_diag(grid, cls, asm, params, include_reduced_q)
    h = 0.5 * asm.uinv_c
    inv_d = [_safe_inv(k[a] + h) for a in range(3)]
    # Schur complement of the p row: sum_a k_a - k_a^2/(k_a+h) = sum k_a*h/(k_a+h)
    schur = sum(k[a] * h * inv_d[a] for a in range(3))
    inv_schur = _safe_inv(schur)
    kd = [k[a] * inv_d[a] for a in range(3)]
    te_inv = tuple(_safe_inv(te_d[e] + 0.5 * asm.uinv_e[e]) for e in range(3))
    return k, inv_d, kd, inv_schur, te_inv


def _arrow_solve_from(k, inv_d, kd, inv_schur, te_inv):
    def solve(r: PTau) -> PTau:
        z_p = (r.p + sum(kd[a] * r.tc[a] for a in range(3))) * inv_schur
        z_tc = tuple((r.tc[a] + k[a] * z_p) * inv_d[a] for a in range(3))
        z_te = tuple(r.te[e] * te_inv[e] for e in range(3))
        return PTau(p=z_p, tc=z_tc, te=z_te)

    return solve


def make_cell_arrow(grid, cls, asm: Assembled, params: SolverParams, include_reduced_q: bool = True):
    """Closed-form inverse of the per-cell 4x4 arrow block (module doc)."""
    return _arrow_solve_from(*cell_arrow_factors(grid, cls, asm, params, include_reduced_q))


def region_schur_inv(grid, cls, asm: Assembled, params: SolverParams, R: int, arrow_solve):
    """inv(S) with S_r = B_r + (U M0^-1 U^T)_rr — the Woodbury capacitance
    of the REGION_ARROW preconditioner (U = J chi F: ptau -> region
    coefficients; M0 = the arrow block).  Built by D probes: column d of
    U M0^-1 U^T for EVERY region at once is reduce_J(F M0^-1 F^T chi J^T e_d)
    (regions' stencil footprints are disjoint by the boundary-separation
    hygiene, fixReducedRegionBoundaries — Classifier.cpp:1074-1172 — so the
    capacitance is block-diagonal per region).  One lax.scan over the D
    probes keeps the compiled program size constant."""
    from .linalg import inv_spd
    from .operators import forward_face_values, transpose_from_faces

    D = params.reduced_dof
    dtype = params.dtype
    eyeD = jnp.eye(D, dtype=dtype)

    def probe(_, d):
        w = jnp.broadcast_to(eyeD[d][None, :], (R, D))
        u = expand_J(grid, cls, asm.com, w, params)  # chi J^T e_d rows
        g = transpose_from_faces(asm, u)  # F^T
        y = arrow_solve(g)  # M0^-1
        s = forward_face_values(asm, y)  # F
        col = reduce_J(grid, cls, asm.com, s, params, R)  # J chi
        return None, col

    _, cols = jax.lax.scan(probe, None, jnp.arange(D))
    C = jnp.transpose(cols, (1, 2, 0))  # [R, D, D], cols[d] -> column d
    C = 0.5 * (C + jnp.transpose(C, (0, 2, 1)))
    B = asm.mr / asm.dt + 2.0 * asm.vr
    valid = asm.region_valid
    S = jnp.where(valid[:, None, None], B + C, eyeD)
    sinv = inv_spd(S)
    return jnp.where(valid[:, None, None], sinv, 0.0)


def make_region_arrow(grid, cls, asm: Assembled, params: SolverParams):
    """REGION_ARROW: the arrow block plus the exact per-region boundary
    restriction of J^T BInv J, applied via the Woodbury identity

      M = M0 + U^T BInv U,
      M^-1 r = y - M0^-1 U^T S^-1 U y,   y = M0^-1 r,
      S = B + U M0^-1 U^T  (per-region [D, D], see region_schur_inv).

    M0 here EXCLUDES the reduced-diagonal probe (include_reduced_q=False):
    the Woodbury term carries the whole reduced coupling, so the arrow
    approximates only the grid branch + mass terms."""
    from .operators import forward_face_values, transpose_from_faces

    if not params.do_reduced_regions:
        return make_cell_arrow(grid, cls, asm, params)
    R = asm.binv.shape[0]
    arrow = make_cell_arrow(grid, cls, asm, params, include_reduced_q=False)
    sinv = region_schur_inv(grid, cls, asm, params, R, arrow)

    def solve(r: PTau) -> PTau:
        y = arrow(r)
        s = forward_face_values(asm, y)
        m = reduce_J(grid, cls, asm.com, s, params, R)  # U y
        w = jnp.einsum("rij,rj->ri", sinv, m)
        u = expand_J(grid, cls, asm.com, w, params)  # chi J^T w
        g = transpose_from_faces(asm, u)
        return y - arrow(g)

    return solve


def make_preconditioner(grid, cls, asm: Assembled, params: SolverParams):
    if params.preconditioner == PreconditionerType.IDENTITY:
        return None
    if params.preconditioner == PreconditionerType.CELL_ARROW:
        return make_cell_arrow(grid, cls, asm, params)
    if params.preconditioner == PreconditionerType.REGION_ARROW:
        return make_region_arrow(grid, cls, asm, params)
    if params.preconditioner == PreconditionerType.MULTIGRID:
        from .multigrid import make_multigrid

        return make_multigrid(grid, cls, asm, params)
    d = schur_diagonal(grid, cls, asm, params)
    inv = jax.tree.map(_safe_inv, d)

    def solve(r: PTau) -> PTau:
        return jax.tree.map(jnp.multiply, inv, r)

    return solve
