"""Cross-scheme consistency: the ALL_DOFS KKT system and the
PRESSURE_VELOCITY system must give the same physics as the default
pressure-stress Schur solve (reference: the 4 MatrixSchemes in
AssembleSystem.cpp dispatch, all eliminating the same KKT system)."""
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from polystokes_tpu.export import ExplicitOperators

from test_operators import build_all, make_case


@pytest.fixture(scope="module")
def case():
    grid, params, scene = make_case(reduced=True, solid=True)
    R, lw, fw, cls, asm, rd, orc = build_all(grid, params, scene)
    ops = ExplicitOperators(grid, cls, asm, params)
    return grid, params, scene, asm, ops


def test_kkt_matches_schur(case):
    grid, params, scene, asm, ops = case
    dt = float(asm.dt)

    K = ops.kkt_matrix()
    bk = ops.kkt_rhs()
    xk = spla.spsolve(K.tocsc(), bk)
    vK = xk[: ops.nV]
    wK = xk[ops.nV : ops.nV + ops.nW]
    pK = xk[ops.nV + ops.nW : ops.nV + ops.nW + ops.nP]
    tK = xk[ops.nV + ops.nW + ops.nP :]

    A = ops.schur_matrix()
    v = ops.vectors()
    McInv = ops.McInv()
    G, Dt, JG, JDt = ops.G(), ops.Dt(), ops.JG(), ops.JDt()
    BInv = ops.BInv()
    z = BInv @ v["reducedRHS"] / dt
    b1 = -(G.T @ (McInv @ v["activeRHS"])) + v["pressureRHS"] - JG.T @ z
    b2 = -(Dt.T @ (McInv @ v["activeRHS"])) + v["stressRHS"] - JDt.T @ z
    xs = spla.spsolve(A.tocsc(), np.concatenate([b1, b2]))
    pS = xs[: ops.nP]
    tS = xs[ops.nP :]

    scale = max(np.abs(pK).max(), 1.0)
    np.testing.assert_allclose(pK, pS, atol=1e-6 * scale, rtol=1e-6)
    np.testing.assert_allclose(tK, tS, atol=1e-6 * max(np.abs(tK).max(), 1.0), rtol=1e-6)

    # velocities recovered from the Schur solution equal the KKT velocities
    vS = McInv @ v["activeRHS"] - dt * (McInv @ (G @ pS + Dt @ tS))
    np.testing.assert_allclose(vS, vK, atol=1e-6 * max(np.abs(vK).max(), 1.0))
    wS = BInv @ (v["reducedRHS"] / dt - JG @ pS - JDt @ tS)
    np.testing.assert_allclose(wS, wK, atol=1e-5 * max(np.abs(wK).max(), 1.0))


def test_pressure_velocity_matches_kkt(case):
    grid, params, scene, asm, ops = case
    dt = float(asm.dt)

    K = ops.kkt_matrix()
    bk = ops.kkt_rhs()
    xk = spla.spsolve(K.tocsc(), bk)
    vK = xk[: ops.nV]
    wK = xk[ops.nV : ops.nV + ops.nW]
    pK = xk[ops.nV + ops.nW : ops.nV + ops.nW + ops.nP]
    tK = xk[ops.nV + ops.nW + ops.nP :]

    # NOTE: the pressure-velocity elimination assumes the stress rows have
    # zero RHS (tau = 2 u (Dt^T v + JDt^T w) exactly); the reference's
    # velocity-pressure scheme likewise drops the stress RHS
    # (AssembleSystem.cpp:329-336).  Compare only when stressRHS == 0 by
    # rebuilding the KKT rhs without it.
    v = ops.vectors()
    bk0 = np.concatenate([
        v["activeRHS"] / dt,
        v["reducedRHS"] / dt,
        v["pressureRHS"],
        np.zeros(ops.nS),
    ])
    xk0 = spla.spsolve(K.tocsc(), bk0)

    PV = ops.pressure_velocity_matrix()
    bpv = np.concatenate([v["activeRHS"] / dt, v["reducedRHS"] / dt, v["pressureRHS"]])
    xpv = spla.spsolve(PV.tocsc(), bpv)
    vP = xpv[: ops.nV]
    wP = xpv[ops.nV : ops.nV + ops.nW]
    pP = xpv[ops.nV + ops.nW :]

    np.testing.assert_allclose(vP, xk0[: ops.nV], atol=1e-6 * max(np.abs(vP).max(), 1.0))
    np.testing.assert_allclose(wP, xk0[ops.nV : ops.nV + ops.nW], atol=1e-5 * max(np.abs(wP).max(), 1.0))
    np.testing.assert_allclose(pP, xk0[ops.nV + ops.nW : ops.nV + ops.nW + ops.nP], atol=1e-6 * max(np.abs(pP).max(), 1.0))


def test_guess_vectors_shapes(case):
    grid, params, scene, asm, ops = case
    v, w, p, t = ops.guess_vectors()
    assert v.shape == (ops.nV,)
    assert w.shape == (ops.nW,)
    assert p.shape == (ops.nP,)
    assert t.shape == (ops.nS,)
    assert np.all(np.isfinite(v)) and np.all(np.isfinite(p)) and np.all(np.isfinite(t))
