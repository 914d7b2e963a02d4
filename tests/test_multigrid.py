"""Multigrid preconditioner tests: transfer adjointness, SPD symmetry of
the V-cycle operator, and end-to-end solution equality with fewer
iterations than identity-PCG."""
import numpy as np
import pytest

import jax.numpy as jnp

from polystokes_tpu import SolverParams, step
from polystokes_tpu.config import PreconditionerType
from polystokes_tpu.operators import PTau

from test_operators import build_all, make_case


@pytest.fixture(scope="module")
def case():
    grid, params, scene = make_case(reduced=True, solid=True)
    R, lw, fw, cls, asm, rd, orc = build_all(grid, params, scene)
    return grid, params, scene, cls, asm


def test_transfers_are_adjoint():
    """R == (1/2^d) P^T on both lattice types (random-vector identity
    <R x, y>_c == (1/2^d) <x, P y>_f)."""
    from polystokes_tpu.multigrid import (
        _cell_prolong_axis, _cell_restrict_axis, _node_prolong_axis, _node_restrict_axis,
    )

    rng = np.random.default_rng(0)
    # cells, one axis: R = (1/2) P^T
    n = 10
    x = jnp.asarray(rng.standard_normal((n, 4, 4)))
    yc = jnp.asarray(rng.standard_normal((5, 4, 4)))
    lhs = float(np.vdot(np.asarray(_cell_restrict_axis(x, 0)), yc))
    rhs = 0.5 * float(np.vdot(np.asarray(x), np.asarray(_cell_prolong_axis(yc, 0, n))))
    assert abs(lhs - rhs) < 1e-12

    # nodes, one axis (size n+1): R = (1/2) P^T for linear P
    xn = jnp.asarray(rng.standard_normal((n + 1, 4, 4)))
    ycn = jnp.asarray(rng.standard_normal((6, 4, 4)))  # nc+1 = 6
    lhs = float(np.vdot(np.asarray(_node_restrict_axis(xn, 0, 6)), ycn))
    rhs = 0.5 * float(np.vdot(np.asarray(xn), np.asarray(_node_prolong_axis(ycn, 0, n + 1))))
    assert abs(lhs - rhs) < 1e-12


def _cheap_mg(params):
    """Small-footprint MG settings for CPU tests (functionality, not perf)."""
    return params.replace(mg_levels=2, mg_smooth_degree=2, mg_coarse_iters=2)


def test_vcycle_is_symmetric(case):
    grid, params, scene, cls, asm = case
    from polystokes_tpu.multigrid import make_multigrid

    solve = make_multigrid(grid, cls, asm, _cheap_mg(params))
    rng = np.random.default_rng(5)

    def rand_ptau():
        return PTau(
            p=jnp.asarray(rng.standard_normal(grid.center_shape)),
            tc=tuple(jnp.asarray(rng.standard_normal(grid.center_shape)) for _ in range(3)),
            te=tuple(jnp.asarray(rng.standard_normal(np.asarray(asm.uinv_e[e]).shape)) for e in range(3)),
        )

    r, s = rand_ptau(), rand_ptau()
    lhs = float(r.dot(solve(s)))
    rhs = float(s.dot(solve(r)))
    assert abs(lhs - rhs) < 1e-8 * max(abs(lhs), 1.0)


def test_multigrid_step_matches_direct(case):
    from polystokes_tpu.host_solve import solve_host

    grid, params, scene, cls, asm = case
    base = _cheap_mg(params.replace(max_iterations=2000, bicgstab_fallback=False, tolerance=1e-5))
    v_direct, _, _ = solve_host(grid, scene, base, method="direct")
    v1, _, s1 = step(grid, scene, base.replace(preconditioner=PreconditionerType.MULTIGRID))
    assert bool(s1["converged"])
    _, _, s0 = step(grid, scene, base)
    assert int(s1["iterations"]) < int(s0["iterations"])
    scale = max(float(jnp.max(jnp.abs(v_direct[0]))), 1.0)
    for a in range(3):
        np.testing.assert_allclose(np.asarray(v1[a]), np.asarray(v_direct[a]), atol=1e-3 * scale)
