"""ALL_DOFS_EXPLICIT_INTERIOR_STRESS scheme parity
(assembleSystemExplicitInternalStresses, AssembleSystem.cpp:199-281, with
uRed/uInvRed/JDtRed from ConstructMatrixBlocks.cpp:530-548/600-635/713-867).

Oracle: a literal loop re-derivation of JDtRed and the aggregate stress
diagonals on a small grid, plus structural checks (symmetry; reduction to
the ALL_DOFS system when no reduced regions exist; internal-stress
consistency tau_red = 2 uRed^{-1} JDtRed^T w of the exact solution)."""
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax.numpy as jnp

from polystokes_tpu.basis import conversion_coefficients
from polystokes_tpu.classify import BOUNDARY, REDUCED
from polystokes_tpu.export import ExplicitOperators
from polystokes_tpu.grid import face_offsets

from test_operators import build_all, make_case


@pytest.fixture(scope="module")
def case():
    grid, params, scene = make_case(reduced=True, solid=True)
    R, lw, fw, cls, asm, rd, orc = build_all(grid, params, scene)
    ops = ExplicitOperators(grid, cls, asm, params, weights=(lw, fw), viscosity=scene.viscosity)
    return grid, params, scene, cls, asm, ops


def _loop_jdtred(grid, cls, asm, ops):
    """Literal per-face loop oracle for JDtRed."""
    D = ops.D
    R = ops.R
    inv_dx = 1.0 / grid.dx
    com = np.asarray(asm.com)
    rows, cols, vals = [], [], []
    cell_lbl = np.asarray(cls.cell_labels)
    cell_reg = np.asarray(cls.cell_region)
    for a in range(3):
        fl = np.asarray(cls.face_labels[a])
        freg = np.asarray(cls.face_region[a])
        off = np.asarray(face_offsets(a))
        for idx in np.argwhere((fl == REDUCED) & (freg >= 0)):
            i, j, k = idx
            r = freg[i, j, k]
            pos = np.array([i, j, k], float) + off
            C = np.asarray(conversion_coefficients(jnp.asarray(pos - com[r]), a, ops.params.basis))
            # adjacent cells: lower (d=0, index-1 along a, sign +), upper (-)
            for d, s in ((0, 1.0), (1, -1.0)):
                c = idx.copy()
                c[a] += d - 1
                if c[a] < 0 or c[a] >= grid.res[a]:
                    continue
                if cell_lbl[tuple(c)] == REDUCED and cell_reg[tuple(c)] >= 0:
                    for n in range(D):
                        rows.append(r * D + n)
                        cols.append(cell_reg[tuple(c)] + a * R)
                        vals.append(s * inv_dx * C[n])
            # adjacent edges of each other axis along t = 3 - a - e
            for e in range(3):
                if e == a:
                    continue
                el = np.asarray(cls.edge_labels[e])
                ereg = np.asarray(cls.edge_region[e])
                t = 3 - a - e
                for d, s in ((0, 1.0), (1, -1.0)):
                    ee = idx.copy()
                    ee[t] += d
                    if ee[t] >= el.shape[t]:
                        continue
                    lbl = el[tuple(ee)]
                    if (lbl == REDUCED or lbl == BOUNDARY) and ereg[tuple(ee)] >= 0:
                        for n in range(D):
                            rows.append(r * D + n)
                            cols.append(ereg[tuple(ee)] + (3 + e) * R)
                            vals.append(s * inv_dx * C[n])
    return sp.coo_matrix((vals, (rows, cols)), shape=(R * D, 6 * R)).tocsr()


def test_jdtred_matches_loop_oracle(case):
    grid, params, scene, cls, asm, ops = case
    J = ops.JDtRed()
    Jo = _loop_jdtred(grid, cls, asm, ops)
    diff = (J - Jo)
    assert J.nnz > 0
    assert np.abs(diff.toarray()).max() < 1e-10 * max(np.abs(Jo.toarray()).max(), 1.0)


def test_reduced_stress_diags_match_loop(case):
    grid, params, scene, cls, asm, ops = case
    u_d, uinv_d = ops._reduced_stress_diags()
    # independent loop for the center XX aggregate
    from polystokes_tpu.config import MINWEIGHT

    lw, fw = ops.weights
    visc = np.asarray(scene.viscosity, float)
    vw = np.clip(np.asarray(fw["center"], float), MINWEIGHT, 1.0) * np.asarray(lw["center"], float)
    cell_lbl = np.asarray(cls.cell_labels)
    cell_reg = np.asarray(cls.cell_region)
    expect = np.zeros(ops.R)
    for idx in np.argwhere((cell_lbl == REDUCED) & (cell_reg >= 0)):
        i, j, k = idx
        expect[cell_reg[i, j, k]] += visc[i, j, k] * np.clip(
            (1.0 / max(vw[i, j, k], 1e-30)) if vw[i, j, k] > 0 else 1e2, 0.0, 1e2
        )
    np.testing.assert_allclose(u_d[: ops.R], expect, rtol=1e-12)
    assert np.all(uinv_d >= 0)


def test_scheme4_symmetric_and_consistent(case):
    grid, params, scene, cls, asm, ops = case
    A = ops.kkt_explicit_interior_stress_matrix()
    asym = abs(A - A.T)
    assert asym.max() < 1e-10
    b = ops.kkt_explicit_interior_stress_rhs()
    x = spla.spsolve(A.tocsc(), b)
    assert np.all(np.isfinite(x))
    # internal-stress rows: JDtRed^T w - 0.5 uRed tau_red = 0
    w = x[ops.nV : ops.nV + ops.nW]
    tau_red = x[ops.nV + ops.nW + ops.nP + ops.nS :]
    u_d, _ = ops._reduced_stress_diags()
    valid = np.asarray(asm.region_valid)
    u_d = np.where(np.tile(valid, 6), np.where(u_d == 0, 1.0, u_d), 1.0)
    res = ops.JDtRed().T @ w - 0.5 * u_d * tau_red
    assert np.abs(res).max() < 1e-8 * max(np.abs(tau_red).max(), 1.0)


def test_scheme4_reduces_to_all_dofs_without_regions():
    """With no reduced cells every region slot is invalid: the uniform
    blocks coincide with ALL_DOFS, JDtRed is empty, and the reduced-stress
    rows are inert unit diagonals."""
    grid, params, scene = make_case(reduced=False, solid=False)
    R, lw, fw, cls, asm, rd, orc = build_all(grid, params, scene)
    ops = ExplicitOperators(grid, cls, asm, params, weights=(lw, fw), viscosity=scene.viscosity)
    A4 = ops.kkt_explicit_interior_stress_matrix().tocsr()
    AK = ops.kkt_matrix().tocsr()
    n = AK.shape[0]
    assert A4.shape[0] == n + 6 * ops.R
    # uniform (non-reduced-slot) rows coincide except the w-block, where
    # ALL_DOFS stamps B = Mr/dt + 2V (identity for invalid slots) and
    # scheme 4 stamps Mr (also identity for invalid slots)
    diff = abs(A4[:n, :n] - AK)
    assert diff.max() < 1e-12
    assert abs(A4[n:, :n]).max() < 1e-12
    tail = A4[n:, n:].toarray()
    np.testing.assert_allclose(tail, -0.5 * np.eye(6 * ops.R), atol=1e-12)
