#!/usr/bin/env python
"""One-off: tiled honey_coil 128^3 (headline config) on TPU, deflation
on/off, fused-pap apply path — iterations + wall-clock.

    python benchmarks/defl_128.py [--deflation] [--n 128] [--segment 500]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--deflation", action="store_true")
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--scene", default="honey_coil",
                    help="any scenes.builders name (jelly_jam / armadillo_melt / "
                    "honey_coil ... — the reference's A/B scenes)")
    ap.add_argument("--uniform", action="store_true", help="reduced regions OFF (A/B baseline)")
    ap.add_argument("--single", action="store_true",
                    help="do_tile OFF: one large region per connected interior "
                    "(the reference's untiled mode — fewest grid DOFs, best "
                    "iteration counts; runs the general-region XLA path)")
    ap.add_argument("--warm", action="store_true",
                    help="reference-default warm start (useWarmStart is ON by default "
                    "in the reference, HDK_PolyStokes.C:194; guess p = -G^T v - JG^T w "
                    "from the input velocity, Solver.cpp:521-531)")
    ap.add_argument("--tile", type=int, default=16)
    ap.add_argument("--segment", type=int, default=2000)
    ap.add_argument("--max-iters", type=int, default=20000)
    ap.add_argument("--no-fuse-pap", action="store_true")
    ap.add_argument("--fuse-update", action="store_true")
    ap.add_argument("--coeff-bf16", action="store_true")
    ap.add_argument("--precond", default="cell_arrow")
    args = ap.parse_args()

    import faulthandler

    faulthandler.dump_traceback_later(300, repeat=True)  # stall diagnosis

    import jax

    cache = os.environ.get("POLYSTOKES_COMPILE_CACHE", os.path.expanduser("~/.cache/polystokes_xla"))
    # honor JAX_PLATFORMS even when sitecustomize preloaded jax with the
    # axon platform list (see run.py)
    import os as _os

    if _os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from polystokes_tpu import SolverParams
    from polystokes_tpu.config import PreconditionerType
    from polystokes_tpu.scenes import builders
    from polystokes_tpu.solver import check_pallas, solve_chunked

    kw = {"max_regions": 64} if args.single else {}
    params = SolverParams(
        do_reduced_regions=not args.uniform, do_tile=not args.single,
        tile_size=args.tile, tile_padding=2, **kw,
        preconditioner=PreconditionerType(args.precond), use_pallas=True,
        tolerance=1e-3, max_iterations=args.max_iters, bicgstab_fallback=False,
        deflation=args.deflation, fuse_pap=not args.no_fuse_pap,
        fuse_update=args.fuse_update, coeff_bf16=args.coeff_bf16,
        use_warm_start=args.warm, device_warm_start=args.warm,
    )
    grid, scene = getattr(builders, args.scene)(n=args.n, dtype=jnp.float32)
    from polystokes_tpu.solver import sample_density

    params = sample_density(scene, params)
    params = check_pallas(grid, scene, params)

    # warm-up/compile pass (chunked so each device call stays bounded)
    t0 = time.perf_counter()
    vel, valid, stats = solve_chunked(grid, scene, params, segment_iters=args.segment)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    vel, valid, stats = solve_chunked(grid, scene, params, segment_iters=args.segment)
    step_s = time.perf_counter() - t0
    it = int(stats["iterations"])
    print(json.dumps({
        "config": f"{args.scene}_n{args.n}_{'uni' if args.uniform else ('single' if args.single else f'tile{args.tile}')}_defl{int(args.deflation)}{'_warm' if args.warm else ''}",
        "iterations": it,
        "error": float(stats["error"]),
        "converged": bool(stats["converged"]),
        "step_s": round(step_s, 3),
        "s_per_iteration": round(step_s / max(it, 1), 6),
        "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
