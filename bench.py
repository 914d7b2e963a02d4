#!/usr/bin/env python
"""Benchmark: one tiled-reduced Stokes step on the honey_coil scene at
128^3 (the BASELINE.json north-star metric), on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "...", "vs_baseline": N, ...}

vs_baseline compares against a reference-equivalent CPU solve: the same
pressure-stress system assembled explicitly (scipy CSR, like the
reference's Eigen path with EIGEN_DONT_VECTORIZE) driven by the same CG,
timed per-iteration and extrapolated to the TPU run's iteration count.
The CPU baseline is computed once and cached in .bench_cpu_baseline.json.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    n = int(os.environ.get("BENCH_N", "128"))
    import jax
    import jax.numpy as jnp

    from polystokes_tpu import SolverParams, step
    from polystokes_tpu.scenes.builders import honey_coil

    params = SolverParams(
        dtype=jnp.float32,
        do_reduced_regions=True,
        do_tile=True,
        tile_size=16,
        tile_padding=2,
        tolerance=1e-3,  # reference default; criterion rre < tol^2
        max_iterations=2000,
        bicgstab_fallback=False,
    )
    grid, scene = honey_coil(n=n, dtype=jnp.float32)

    fn = jax.jit(lambda s: step(grid, s, params))
    # warm-up / compile
    t0 = time.perf_counter()
    vel, valid, stats = fn(scene)
    jax.block_until_ready(vel)
    compile_and_first = time.perf_counter() - t0

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        vel, valid, stats = fn(scene)
        jax.block_until_ready(vel)
        times.append(time.perf_counter() - t0)
    step_time = min(times)
    iters = int(stats["iterations"])
    err = float(stats["error"])

    vs_baseline = _cpu_baseline(n, grid, scene, params, iters) / step_time

    out = {
        "metric": f"honey_coil {n}^3 tiled-reduced Stokes step wall-clock",
        "value": round(step_time, 4),
        "unit": "s",
        "vs_baseline": round(vs_baseline, 2),
        "iterations": iters,
        "error": err,
        "n_regions": int(stats["n_regions"]),
        "compile_s": round(compile_and_first, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


def _cpu_baseline(n, grid, scene, params, tpu_iters):
    """Reference-equivalent CPU wall-clock for the same step (cached)."""
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cpu_baseline.json")
    key = f"honey_coil_{n}"
    if os.path.exists(cache):
        with open(cache) as f:
            data = json.load(f)
        if key in data:
            return data[key]
    else:
        data = {}

    try:
        t = _measure_cpu(n, grid, scene, params, tpu_iters)
    except Exception as e:  # noqa: BLE001
        print(f"cpu baseline failed: {e}", file=sys.stderr)
        t = float("nan")
    data[key] = t
    with open(cache, "w") as f:
        json.dump(data, f)
    return t


def _measure_cpu(n, grid, scene, params, tpu_iters):
    import time as _t

    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    import jax.numpy as jnp

    from polystokes_tpu.classify import classify, effective_max_regions
    from polystokes_tpu.export import ExplicitOperators
    from polystokes_tpu.solver import assemble, build_rhs
    from polystokes_tpu.weights import compute_weights

    R = effective_max_regions(grid, params)
    t_setup0 = _t.perf_counter()
    lw, fw = compute_weights(grid, scene.surface_sdf, scene.collision_sdf, params.dtype)
    cls = classify(grid, lw, fw, params)
    asm, rd = assemble(grid, scene, cls, lw, fw, params, R)
    ops = ExplicitOperators(grid, cls, asm, params)
    A = ops.schur_matrix()
    t_setup = _t.perf_counter() - t_setup0

    x = np.random.default_rng(0).standard_normal(A.shape[0]).astype(np.float64)
    # time the CG hot loop: 1 SpMV + ~5 BLAS1 per iteration
    niter_sample = 25
    t0 = _t.perf_counter()
    r = x.copy()
    p = x.copy()
    for _ in range(niter_sample):
        Ap = A @ p
        alpha = r.dot(p) / max(p.dot(Ap), 1e-30)
        xn = x + alpha * p
        r = r - alpha * Ap
        rs = r.dot(r)
        p = r + (rs / max(rs, 1e-30)) * p
    per_iter = (_t.perf_counter() - t0) / niter_sample
    return t_setup + per_iter * max(tpu_iters, 1)


if __name__ == "__main__":
    main()
