#!/usr/bin/env python
"""Benchmark: one reduced Stokes step on the honey_coil scene at 128^3
(the BASELINE.json north-star metric), on the real TPU chip.

The measured configuration is the framework's best reduced mode for this
scene: UNTILED reduced regions (do_tile off, packed path via cube-aligned
general regions) — the configuration BENCH.md recommends and the analog
of the reference's reduced-without-tiling mode.  Until round 3 this
script pinned the tiled-16 config instead; set BENCH_CONFIG=tiled to
reproduce that series (the round-over-round r01-r03 values).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "...", "vs_baseline": N, ...}

vs_baseline compares against a reference-equivalent CPU solve: the same
component operators assembled as scipy CSR and applied in the reference's
factored matrix-free form (ApplyPressureStressMatrix.h:102-179 — three
SpMV groups per CG iteration), timed per-iteration and extrapolated to the
TPU run's iteration count, plus the measured CPU setup (weights ->
classify -> assemble -> explicit blocks).  Cached in
.bench_cpu_baseline.json.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    n = int(os.environ.get("BENCH_N", "128"))
    iters_cap = int(os.environ.get("BENCH_MAX_ITERS", "12000"))
    import jax

    cache_dir = os.environ.get("POLYSTOKES_COMPILE_CACHE", os.path.expanduser("~/.cache/polystokes_xla"))
    try:
        # honor JAX_PLATFORMS even when sitecustomize preloaded jax with the
        # axon platform list (see run.py)
        import os as _os

        if _os.environ.get("JAX_PLATFORMS"):
            jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
    import jax.numpy as jnp

    from polystokes_tpu import SolverParams, step
    from polystokes_tpu.config import PreconditionerType
    from polystokes_tpu.scenes.builders import honey_coil

    config = os.environ.get("BENCH_CONFIG", "single")  # single (untiled) | tiled
    tiled = config == "tiled"
    params = SolverParams(
        dtype=jnp.float32,
        do_reduced_regions=True,
        do_tile=tiled,
        tile_size=16,
        tile_padding=2,
        **({} if tiled else {"max_regions": 64}),
        tolerance=1e-3,  # reference default; criterion rre < tol^2
        max_iterations=iters_cap,
        bicgstab_fallback=False,
        preconditioner=PreconditionerType(os.environ.get("BENCH_PRECOND", "cell_arrow")),
        use_pallas=os.environ.get("BENCH_PALLAS", "1") == "1",
    )
    grid, scene = honey_coil(n=n, dtype=jnp.float32)
    from polystokes_tpu.solver import check_pallas

    params = check_pallas(grid, scene, params)

    fn = jax.jit(lambda s: step(grid, s, params))

    def drain(leaf):
        # axon: block_until_ready can return before execution has drained;
        # a host scalar fetch forces the producing executable to finish
        return float(jnp.sum(leaf[0]))

    t0 = time.perf_counter()
    vel, valid, stats = fn(scene)
    drain(vel)
    compile_and_first = time.perf_counter() - t0
    print(f"compile+first: {compile_and_first:.1f}s", file=sys.stderr, flush=True)

    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        vel, valid, stats = fn(scene)
        drain(vel)
        times.append(time.perf_counter() - t0)
    step_time = min(times)
    iters = int(stats["iterations"])
    err = float(stats["error"])
    print(f"tpu step: {step_time:.3f}s iters={iters} err={err:.3e}", file=sys.stderr, flush=True)

    cpu_s = _cpu_baseline(n, grid, scene, params, iters, config)
    vs_baseline = cpu_s / step_time if np.isfinite(cpu_s) else float("nan")

    kind = "tiled-reduced" if tiled else "untiled-reduced"
    out = {
        "metric": f"honey_coil {n}^3 {kind} Stokes step wall-clock",
        "value": round(step_time, 4),
        "unit": "s",
        "vs_baseline": round(vs_baseline, 2),
        "iterations": iters,
        "error": err,
        "n_regions": int(stats["n_regions"]),
        "cpu_baseline_s": round(cpu_s, 2) if np.isfinite(cpu_s) else None,
        "baseline_kind": "single-core CPU equivalent (scipy CSR factored apply); the reference runs TBB/OpenMP multi-core — divide by ~8-16x for a multi-core estimate",
        "compile_s": round(compile_and_first, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


def _cpu_baseline(n, grid, scene, params, tpu_iters, config="tiled"):
    """Cache the CPU setup time and per-iteration cost (iteration-count
    independent); extrapolate to this run's iteration count at read time."""
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cpu_baseline.json")
    key = f"honey_coil_{n}" if config == "tiled" else f"honey_coil_{n}_{config}"
    data = {}
    if os.path.exists(cache):
        with open(cache) as f:
            data = json.load(f)
    rec = data.get(key)
    if not isinstance(rec, dict):
        try:
            rec = _measure_cpu(n, grid, scene, params)
        except Exception as e:  # noqa: BLE001
            print(f"cpu baseline failed: {e}", file=sys.stderr, flush=True)
            rec = {"setup_s": float("nan"), "per_iter_s": float("nan")}
        data[key] = rec
        with open(cache, "w") as f:
            json.dump(data, f)
    return rec["setup_s"] + rec["per_iter_s"] * max(tpu_iters, 1)


def _measure_cpu(n, grid, scene, params):
    """Reference-equivalent CPU costs: setup (weights -> classify ->
    assemble -> sparse blocks) and per-iteration factored matrix-free
    apply (the reference's hot kernel)."""
    import time as _t

    import scipy.sparse as sp

    from polystokes_tpu.classify import classify, effective_max_regions
    from polystokes_tpu.export import ExplicitOperators
    from polystokes_tpu.solver import assemble
    from polystokes_tpu.weights import compute_weights

    R = effective_max_regions(grid, params)
    t0 = _t.perf_counter()
    lw, fw = compute_weights(grid, scene.surface_sdf, scene.collision_sdf, params.dtype)
    cls = classify(grid, lw, fw, params)
    asm, rd = assemble(grid, scene, cls, lw, fw, params, R)
    ops = ExplicitOperators(grid, cls, asm, params)
    G, Dt, JG, JDt = ops.G(), ops.Dt(), ops.JG(), ops.JDt()
    Gt, Dtt, JGt, JDtt = (G.T.tocsr(), Dt.T.tocsr(), JG.T.tocsr(), JDt.T.tocsr())
    mcinv = ops.McInv().diagonal()
    uinv = ops.uInv().diagonal()
    binv = np.asarray(asm.binv)
    dt = float(asm.dt)
    t_setup = _t.perf_counter() - t0
    print(f"cpu setup: {t_setup:.1f}s", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    p = rng.standard_normal(ops.nP)
    tau = rng.standard_normal(ops.nS)
    D = ops.D

    def apply_ps(p, tau):
        s = G @ p + Dt @ tau
        ms = mcinv * s
        out_p = -dt * (Gt @ ms)
        out_t = -dt * (Dtt @ ms) - 0.5 * uinv * tau
        y = (JG @ p + JDt @ tau).reshape(-1, D)
        w = np.einsum("rij,rj->ri", binv, y).reshape(-1)
        out_p -= JGt @ w
        out_t -= JDtt @ w
        return out_p, out_t

    niter = 20
    t0 = _t.perf_counter()
    for _ in range(niter):
        op, ot = apply_ps(p, tau)
        # BLAS1 work of a CG iteration (x/r/p updates + 3 dots)
        alpha = (p @ op + tau @ ot) or 1.0
        p = p + 1e-3 * op / alpha
        tau = tau + 1e-3 * ot / alpha
    per_iter = (_t.perf_counter() - t0) / niter
    print(f"cpu per-iter: {per_iter*1e3:.1f}ms", file=sys.stderr, flush=True)
    return {"setup_s": t_setup, "per_iter_s": per_iter}


if __name__ == "__main__":
    main()
