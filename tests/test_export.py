"""Export-path coverage: component matrices, grid dumps, stats, and the
host solve_explicit (EIGEN-analog) driver."""
import json
import os

import numpy as np
import scipy.sparse.linalg as spla

from polystokes_tpu.export import (
    ExplicitOperators,
    export_component_matrices,
    export_grids,
    export_solution,
    export_stats,
    load_solution,
    solve_explicit,
)

from test_operators import build_all, make_case, pack


def _case():
    grid, params, scene = make_case(reduced=True, solid=True)
    R, lw, fw, cls, asm, rd, orc = build_all(grid, params, scene)
    return grid, params, scene, cls, asm, lw, fw, orc


def test_component_export_npz_and_mtx(tmp_path):
    grid, params, scene, cls, asm, lw, fw, orc = _case()
    ops = ExplicitOperators(grid, cls, asm, params)
    prefix = str(tmp_path / "run.")
    export_component_matrices(prefix, ops, fmt="npz")
    d = np.load(prefix + "components.npz")
    assert "G_val" in d and "Vec_activeRHS" in d
    # G round-trips
    import scipy.sparse as sp

    G = sp.coo_matrix((d["G_val"], (d["G_row"], d["G_col"])), shape=tuple(d["G_shape"]))
    np.testing.assert_allclose(G.toarray(), ops.G().toarray(), atol=1e-14)

    export_component_matrices(prefix, ops, fmt="mtx")
    import scipy.io

    G2 = scipy.io.mmread(prefix + "Mat_G.mtx")
    np.testing.assert_allclose(np.asarray(G2.todense()), ops.G().toarray(), atol=1e-12)

    export_grids(prefix, cls, lw, fw)
    g = np.load(prefix + "grids.npz")
    assert g["cell_labels"].shape == grid.res

    export_stats(prefix, {"iterations": 12, "error": 1e-4})
    with open(prefix + "stats.json") as f:
        st = json.load(f)
    assert st["iterations"] == 12


def test_solution_export_roundtrip(tmp_path):
    grid, params, scene, cls, asm, lw, fw, orc = _case()
    ops = ExplicitOperators(grid, cls, asm, params)
    import jax.numpy as jnp

    from polystokes_tpu.operators import PTau

    x = PTau(
        p=jnp.ones(grid.res),
        tc=tuple(jnp.full(grid.res, 2.0) for _ in range(3)),
        te=tuple(jnp.full(cls.edge_labels[e].shape, 3.0) for e in range(3)),
    )
    prefix = str(tmp_path / "sol.")
    export_solution(prefix, x, ops)
    p, s = load_solution(prefix)
    assert p.shape == (ops.nP,) and s.shape == (ops.nS,)
    np.testing.assert_allclose(p, 1.0)


def test_solve_explicit_matches_direct():
    grid, params, scene, cls, asm, lw, fw, orc = _case()
    params = params.replace(tolerance=1e-10, max_iterations=6000)
    from polystokes_tpu.classify import effective_max_regions

    R = effective_max_regions(grid, params)
    x, ops, info = solve_explicit(grid, cls, asm, params, scheme="pressure_stress")
    A = ops.schur_matrix()
    # compare against a direct solve of the same system
    com = np.asarray(asm.com)
    A2, b2, mats = orc.schur_system(com)
    xd = spla.spsolve(A2.tocsc(), b2)
    scale = max(np.abs(xd).max(), 1.0)
    np.testing.assert_allclose(x, xd, atol=2e-4 * scale)
