"""Round-3 parity/robustness fixes:

  * density field input (HDK_PolyStokes.C:290-304: validate, reject
    variable density, sample the constant)
  * load_solution wired into a warm start (readInWarmStart parity,
    Solver.cpp:621-642): export -> reload -> resolve in far fewer
    iterations
  * connected_components honors its max_iters bound on a long-diameter
    untiled domain
"""
import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from polystokes_tpu.solver import sample_density, step
from polystokes_tpu.scenes.builders import honey_coil


def test_density_constant_field_matches_param():
    from polystokes_tpu import SolverParams

    params = SolverParams(constant_density=1.0)
    grid, scene = honey_coil(n=16, dtype=jnp.float64)
    dense = dataclasses.replace(scene, density=jnp.full(grid.res, 2.5))
    p2 = sample_density(dense, params)
    assert p2.constant_density == 2.5
    # a scene without a density field is a no-op
    assert sample_density(scene, params) is params
    # clamped into [min_density, max_density] via effective_density
    p3 = sample_density(dataclasses.replace(scene, density=jnp.full(grid.res, 0.25)), params)
    assert p3.effective_density == params.min_density


def test_density_variable_field_rejected():
    from polystokes_tpu import SolverParams

    params = SolverParams()
    grid, scene = honey_coil(n=16, dtype=jnp.float64)
    var = np.full(grid.res, 1.0)
    var[0, 0, 0] = 2.0
    with pytest.raises(ValueError, match="variable density"):
        sample_density(dataclasses.replace(scene, density=jnp.asarray(var)), params)


def test_density_constant_field_solve_matches_paramless():
    """A constant density field produces the identical solve as setting
    constant_density directly (the field is only a validated source for
    the constant)."""
    from polystokes_tpu import SolverParams

    grid, scene = honey_coil(n=16, dtype=jnp.float64)
    base = SolverParams(
        dtype=jnp.float64, max_iterations=40, do_reduced_regions=True,
        do_tile=True, tile_size=8, tile_padding=2, bicgstab_fallback=False,
        constant_density=2.0,
    )
    vel_a, _, _ = step(grid, scene, base)
    with_field = sample_density(
        dataclasses.replace(scene, density=jnp.full(grid.res, 2.0)),
        SolverParams(
            dtype=jnp.float64, max_iterations=40, do_reduced_regions=True,
            do_tile=True, tile_size=8, tile_padding=2, bicgstab_fallback=False,
        ),
    )
    assert with_field.constant_density == 2.0
    vel_b, _, _ = step(grid, scene, with_field)
    for a in range(3):
        np.testing.assert_array_equal(np.asarray(vel_a[a]), np.asarray(vel_b[a]))


def test_exported_solution_warm_starts_device_step(tmp_path):
    """export -> solution_guess_ptau -> step(initial_guess=...) converges
    in far fewer iterations than the cold solve (readInWarmStart +
    solveWithGuess parity)."""
    from polystokes_tpu import SolverParams
    from polystokes_tpu.classify import classify, effective_max_regions
    from polystokes_tpu.export import (
        ExplicitOperators,
        export_solution,
        load_solution_guess,
        solution_guess_ptau,
        solve_explicit,
    )
    from polystokes_tpu.solver import assemble
    from polystokes_tpu.weights import compute_weights

    grid, scene = honey_coil(n=16, dtype=jnp.float64)
    from polystokes_tpu.config import PreconditionerType

    params = SolverParams(
        dtype=jnp.float64, max_iterations=3000, do_reduced_regions=True,
        do_tile=True, tile_size=8, tile_padding=2, bicgstab_fallback=False,
        tolerance=1e-3, preconditioner=PreconditionerType.CELL_ARROW,
    )
    vel, valid, stats = step(grid, scene, params)
    cold_iters = int(stats["iterations"])
    assert bool(stats["converged"])

    # reconstruct the solved (p, tau) on the host and export it
    R = effective_max_regions(grid, params)
    lw, fw = compute_weights(grid, scene.surface_sdf, scene.collision_sdf, params.dtype)
    cls = classify(grid, lw, fw, params)
    asm, _ = assemble(grid, scene, cls, lw, fw, params, R)
    ops = ExplicitOperators(grid, cls, asm, params)
    x, ops2, info = solve_explicit(grid, cls, asm, params, tol=1e-10, warm_start=False)
    prefix = str(tmp_path / "ws.")
    import jax

    from polystokes_tpu.operators import PTau

    # pack the explicit solution back into a PTau for export_solution
    p_arr = np.zeros(grid.res)
    p_arr[np.asarray(ops.cell_idx >= 0)] = x[: ops.nP]
    s = x[ops.nP:]
    tc = []
    off = 0
    nC = int(np.asarray(ops.cell_idx >= 0).sum())
    for a in range(3):
        arr = np.zeros(grid.res)
        arr[np.asarray(ops.cell_idx >= 0)] = s[off: off + nC]
        tc.append(jnp.asarray(arr))
        off += nC
    te = []
    for e in range(3):
        m = np.asarray(ops.edge_idx[e] >= 0)
        arr = np.zeros(m.shape)
        ne = int(m.sum())
        arr[m] = s[off: off + ne]
        te.append(jnp.asarray(arr))
        off += ne
    sol = PTau(p=jnp.asarray(p_arr), tc=tuple(tc), te=tuple(te))
    export_solution(prefix, sol, ops)

    # explicit-path warm start: packed vector guess
    x0 = load_solution_guess(prefix, ops)
    iters = [0]
    x2, _, info2 = solve_explicit(
        grid, cls, asm, params, warm_start=False, x0=x0,
        callback=lambda _x: iters.__setitem__(0, iters[0] + 1),
    )
    assert info2 == 0

    # device-path warm start: PTau guess
    guess = solution_guess_ptau(prefix, ops, params.dtype)
    vel2, valid2, stats2 = step(grid, scene, params, initial_guess=guess)
    warm_iters = int(stats2["iterations"])
    assert bool(stats2["converged"])
    assert warm_iters < max(cold_iters // 4, 2), (warm_iters, cold_iters)


def test_cc_host_callback_matches_device_partition():
    """The untiled classify with cc_host_callback=True produces the same
    region PARTITION (up to relabeling) as the on-device propagation."""
    from polystokes_tpu import SolverParams
    from polystokes_tpu.classify import classify
    from polystokes_tpu.weights import compute_weights

    grid, scene = honey_coil(n=16, dtype=jnp.float64)
    base = dict(
        dtype=jnp.float64, do_reduced_regions=True, do_tile=False, max_regions=64,
    )
    pa = SolverParams(**base)
    pb = SolverParams(**base, cc_host_callback=True)
    lw, fw = compute_weights(grid, scene.surface_sdf, scene.collision_sdf, jnp.float64)
    ca = classify(grid, lw, fw, pa)
    cb = classify(grid, lw, fw, pb)
    ra, rb = np.asarray(ca.cell_region), np.asarray(cb.cell_region)
    assert int(ca.n_regions) == int(cb.n_regions)
    assert (ra >= 0).sum() == (rb >= 0).sum() > 0
    # same partition up to relabeling: the joint labeling is a bijection
    pairs = set(zip(ra[ra >= 0].ravel(), rb[ra >= 0].ravel()))
    assert len(pairs) == int(ca.n_regions)
    np.testing.assert_array_equal(np.asarray(ca.cell_labels), np.asarray(cb.cell_labels))


def test_connected_components_bounded_on_long_domain():
    """An untiled snake-like domain with diameter >> max_iters: the loop
    must terminate at the bound (previously it conditioned only on
    `changed`), splitting the long component instead of hanging."""
    from polystokes_tpu.classify import REDUCED, UNSOLVED, connected_components

    n = 48
    labels = np.full((n, 4, 4), UNSOLVED, dtype=np.int8)
    labels[:, 1, 1] = REDUCED  # a 48-cell-long line
    lw = {
        "face0": jnp.ones((n + 1, 4, 4)),
        "face1": jnp.ones((n, 5, 4)),
        "face2": jnp.ones((n, 4, 5)),
    }
    comp_bounded = connected_components(jnp.asarray(labels), lw, max_iters=5)
    comp_full = connected_components(jnp.asarray(labels), lw, max_iters=10 * n)
    cb = np.asarray(comp_bounded)[:, 1, 1]
    cf = np.asarray(comp_full)[:, 1, 1]
    # full run merges the line into one component
    assert len(np.unique(cf)) == 1
    # bounded run terminated (didn't hang) and produced valid per-cell labels
    assert (cb >= 0).all()
    assert len(np.unique(cb)) > 1  # the bound split the long component


def test_chunked_solve_matches_step_and_resumes(tmp_path):
    """solve_chunked in 13-iteration segments is bit-identical to the
    monolithic step; a killed run resumes from the persisted Krylov state
    and finishes with the same answer."""
    from polystokes_tpu import SolverParams
    from polystokes_tpu.config import PreconditionerType
    from polystokes_tpu.solver import solve_chunked

    params = SolverParams(
        dtype=jnp.float64, max_iterations=60, do_reduced_regions=True,
        do_tile=True, tile_size=8, tile_padding=2, bicgstab_fallback=False,
        preconditioner=PreconditionerType.CELL_ARROW,
    )
    grid, scene = honey_coil(n=16, dtype=jnp.float64)
    vel, valid, stats = step(grid, scene, params)
    vel2, valid2, st2 = solve_chunked(grid, scene, params, segment_iters=13)
    assert int(st2["iterations"]) == int(stats["iterations"])
    for a in range(3):
        np.testing.assert_array_equal(np.asarray(vel[a]), np.asarray(vel2[a]))

    # simulate a kill after 2 segments, then resume from the saved state
    sp = str(tmp_path / "pcg_state.npz")
    segs = [0]

    def stop_after_two(s):
        segs[0] += 1
        return segs[0] >= 2

    vel3, _, st3 = solve_chunked(
        grid, scene, params, segment_iters=13, callback=stop_after_two, state_path=sp
    )
    assert st3["interrupted"] and int(st3["iterations"]) == 26
    vel4, _, st4 = solve_chunked(
        grid, scene, params, segment_iters=13, state_path=sp, resume=True
    )
    assert not st4["interrupted"]
    assert int(st4["iterations"]) == int(stats["iterations"])
    for a in range(3):
        np.testing.assert_array_equal(np.asarray(vel[a]), np.asarray(vel4[a]))


def test_chunked_max_seconds_partial():
    """A zero time budget returns after one segment with a partial,
    non-converged result (keep_non_converged semantics preserved)."""
    from polystokes_tpu import SolverParams
    from polystokes_tpu.solver import solve_chunked

    params = SolverParams(
        dtype=jnp.float64, max_iterations=200, do_reduced_regions=True,
        do_tile=True, tile_size=8, tile_padding=2, bicgstab_fallback=False,
    )
    grid, scene = honey_coil(n=16, dtype=jnp.float64)
    vel, valid, st = solve_chunked(grid, scene, params, segment_iters=5, max_seconds=0.0)
    assert st["interrupted"]
    assert int(st["iterations"]) == 5
    assert not bool(st["converged"])
