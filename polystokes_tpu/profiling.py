"""Per-stage instrumentation and solve statistics.

Parity with the reference's observability (SURVEY.md §5): per-stage
Houdini perf-monitor scopes (UT_PerfMonAutoSolveEvent, 16 instances in
exec/HDK_PolyStokes.C:350-568), setup/solve CPU+wall clocks
(setupClockStart/End, Solver.cpp:920-935) and printStats
(Solver.cpp:608-619).  TPU-native: each stage is jitted separately and
timed with block_until_ready; jax.profiler traces can be layered on top.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax
import jax.numpy as jnp

from . import krylov
from .classify import classify, effective_max_regions
from .config import SolverParams
from .grid import Grid
from .operators import PTau
from .solver import (
    Scene,
    apply_solution_to_velocity,
    assemble,
    build_rhs,
    make_apply,
    recover_velocity,
)
from .weights import compute_weights


@contextlib.contextmanager
def trace(name: str, timings: Dict[str, float]):
    """Named stage scope: wall-clock timing + a jax.profiler annotation."""
    with jax.profiler.TraceAnnotation(name):
        t0 = time.perf_counter()
        yield
        timings[name] = timings.get(name, 0.0) + (time.perf_counter() - t0)


def step_instrumented(grid: Grid, scene: Scene, params: SolverParams):
    """The same pipeline as solver.step, one jitted stage at a time, with
    wall-clock per stage.  Returns (velocity, valid, stats) where stats
    includes the reference's printed fields plus the per-stage breakdown."""
    R = effective_max_regions(grid, params)
    t: Dict[str, float] = {}
    setup0 = time.perf_counter()

    with trace("build_integration_weights", t):
        lw, fw = jax.jit(lambda s, c: compute_weights(grid, s, c, params.dtype))(scene.surface_sdf, scene.collision_sdf)
        jax.block_until_ready(lw["center"])
    with trace("classify", t):
        cls = jax.jit(lambda lw, fw: classify(grid, lw, fw, params))(lw, fw)
        jax.block_until_ready(cls.cell_labels)
    with trace("assemble", t):
        asm, rd = jax.jit(lambda sc, cl, l, f: assemble(grid, sc, cl, l, f, params, R))(scene, cls, lw, fw)
        jax.block_until_ready(asm.mc[0])
    with trace("build_rhs", t):
        b = jax.jit(lambda cl, a: build_rhs(grid, cl, a, params, R))(cls, asm)
        jax.block_until_ready(b.p)
    setup_s = time.perf_counter() - setup0

    apply_A = make_apply(grid, cls, asm, params, R)
    x0 = PTau.zeros_like(b)
    solve0 = time.perf_counter()
    with trace("solve", t):
        res = jax.jit(
            lambda b, x0: krylov.pcg(apply_A, b, x0, tol=params.tolerance, max_iters=params.max_iterations)
        )(b, x0)
        jax.block_until_ready(res.x)
    solve_s = time.perf_counter() - solve0

    with trace("recover_velocity", t):
        v, w = jax.jit(lambda cl, a, x: recover_velocity(grid, cl, a, x, params, R))(cls, asm, res.x)
        jax.block_until_ready(v[0])
    with trace("apply_solution", t):
        vel, valid = jax.jit(lambda cl, a, sc, v, w: apply_solution_to_velocity(grid, cl, a, sc, v, w, params))(cls, asm, scene, v, w)
        jax.block_until_ready(vel[0])

    iters = int(res.iterations)
    stats = {
        "iterations": iters,
        "error": float(res.error),
        "converged": bool(res.converged),
        "n_regions": int(cls.n_regions),
        "setup_wall_s": setup_s,
        "solve_wall_s": solve_s,
        "solve_s_per_iteration": solve_s / max(iters, 1),
        "stage_wall_s": t,
    }
    return vel, valid, stats


def print_stats(stats: dict):
    """printStats parity (Solver.cpp:608-619)."""
    print(f"Setup wall time: {stats['setup_wall_s']*1e3:.1f} ms")
    print(f"Solve wall time: {stats['solve_wall_s']*1e3:.1f} ms")
    print(f"Solve iterations: {stats['iterations']}")
    print(f"Solve error: {stats['error']:.3e}")
    for k, v in stats.get("stage_wall_s", {}).items():
        print(f"  {k}: {v*1e3:.1f} ms")
