#!/usr/bin/env python
"""Frame-loop A/B benchmark — the reference's own methodology.

The reference's headline timing figures (results/figures/
Timings_ArmadilloDrop*.png) plot PER-FRAME solve runtime and CG
iterations over a running simulation, with useWarmStart ON by default
(HDK_PolyStokes.C:194): every frame's solve starts from the guess built
off the advected velocity field (constructGuessVectors,
Solver.cpp:521-531).  A single cold solve from a zero guess (what
benchmarks/suite.py measures) is NOT what those figures show.

This script reproduces the reference posture: run N frames of a scene
through the sim loop (gravity -> Stokes solve -> advection), warm start
on, and report per-frame iterations and solve wall-clock for the uniform
and tiled-reduced configurations.

    python benchmarks/frames_ab.py [--scene honey_coil] [--n 128]
        [--frames 6] [--tile 16] [--configs uniform,tiled] [--out FILE]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_config(name, builder, args, reduced, single=False):
    import dataclasses as dc
    from functools import partial

    import jax
    import jax.numpy as jnp

    from polystokes_tpu import SolverParams
    from polystokes_tpu.config import PreconditionerType
    from polystokes_tpu.solver import check_pallas, solve_chunked

    if args.crop:
        # crop with hysteresis: grow the margin and keep the previous
        # frame's box while it still contains the tight one, so the frame
        # loop reuses ONE compiled shape instead of recompiling as the
        # liquid drifts
        from polystokes_tpu.domain import active_bbox, bbox_contains, solve_cropped

        _prev = [None]

        def solve_chunked(grid, scene, params, **kw):  # noqa: F811
            tight = active_bbox(scene, params, margin=4)
            if tight is None:
                # liquid spread past the worthwhile-crop threshold (or no
                # liquid): drop the pinned box so we never freeze liquid
                # outside a stale crop — full-domain solve this frame
                _prev[0] = None
            elif _prev[0] is None or not bbox_contains(_prev[0], tight):
                _prev[0] = active_bbox(scene, params, margin=12)
            return solve_cropped(grid, scene, params, bbox=_prev[0], **kw)

    kw = {"max_regions": 64} if single else {}
    params = SolverParams(
        do_reduced_regions=reduced, do_tile=not single, tile_size=args.tile, tile_padding=2, **kw,
        preconditioner=PreconditionerType(args.precond), use_pallas=True,
        tolerance=1e-3, max_iterations=args.max_iters, bicgstab_fallback=False,
        fuse_update=args.fuse_update, coeff_bf16=args.bf16_coeffs,
        use_warm_start=not args.cold, device_warm_start=not args.cold,
    )
    grid, scene = builder(n=args.n, dtype=jnp.float32)
    from polystokes_tpu.solver import sample_density

    params = sample_density(scene, params)
    params = check_pallas(grid, scene, params)

    @partial(jax.jit, static_argnames=("g", "ax"))
    def add_gravity(vel, dt, g=-9.8, ax=2):
        vel = list(vel)
        vel[ax] = vel[ax] + jnp.asarray(g, params.dtype) * dt
        return tuple(vel)

    @jax.jit
    def advect(new_vel, surf, dt, substeps=1):
        from polystokes_tpu.grid import face_offsets
        from polystokes_tpu.sim import advect_field

        dt_over_dx = dt / jnp.asarray(grid.dx, params.dtype)
        adv_vel = tuple(
            advect_field(new_vel[a], new_vel, dt_over_dx, face_offsets(a), substeps=substeps)
            for a in range(3)
        )
        return adv_vel, advect_field(surf.astype(params.dtype), new_vel, dt_over_dx, (0.0, 0.0, 0.0), substeps=substeps)

    def drain(leaf):
        # axon: block_until_ready can return before execution has drained;
        # a host scalar fetch forces the producing executable to finish
        return float(jnp.sum(leaf))

    frames = []
    for k in range(args.frames):
        t0 = time.perf_counter()
        scene = dc.replace(scene, velocity=add_gravity(scene.velocity, scene.dt))
        new_vel, valid, stats = solve_chunked(grid, scene, params, segment_iters=2000)
        drain(new_vel[0])
        solve_wall = time.perf_counter() - t0
        from polystokes_tpu.sim import cfl_substeps

        substeps = cfl_substeps(new_vel, float(scene.dt) / grid.dx)
        adv_vel, surf = advect(new_vel, scene.surface_sdf, scene.dt, substeps=substeps)
        scene = dc.replace(scene, velocity=adv_vel, surface_sdf=surf)
        drain(surf)
        wall = time.perf_counter() - t0
        rec = {
            "frame": k,
            "iterations": int(stats["iterations"]),
            "error": float(stats["error"]),
            "converged": bool(stats["converged"]),
            "solve_wall_s": round(solve_wall, 3),
            "wall_s": round(wall, 3),
        }
        print(f"  {name} frame {k}: {rec}", flush=True)
        frames.append(rec)

    steady = frames[2:] or frames
    return {
        "config": name + ("_crop" if args.crop else ""),
        "n": args.n,
        "tile": args.tile if reduced else None,
        "frames": frames,
        "steady_mean_iterations": round(sum(f["iterations"] for f in steady) / len(steady), 1),
        "steady_mean_solve_wall_s": round(sum(f["solve_wall_s"] for f in steady) / len(steady), 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="honey_coil")
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--tile", type=int, default=16)
    ap.add_argument("--max-iters", type=int, default=20000)
    ap.add_argument("--precond", default="cell_arrow")
    ap.add_argument("--fuse-update", action="store_true")
    ap.add_argument("--bf16-coeffs", action="store_true",
                    help="store the packed coefficient stack in bf16 (halves its HBM traffic)")
    ap.add_argument("--cold", action="store_true", help="zero guess every frame (warm start OFF)")
    ap.add_argument("--crop", action="store_true",
                    help="solve each frame on the liquid's bounding box (domain.solve_cropped)")
    ap.add_argument("--configs", default="uniform,tiled")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    cache = os.environ.get("POLYSTOKES_COMPILE_CACHE", os.path.expanduser("~/.cache/polystokes_xla"))
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from polystokes_tpu.scenes import builders

    builder = getattr(builders, args.scene)
    want = set(args.configs.split(","))
    records = []
    if "uniform" in want:
        records.append(run_config(f"frames_{args.scene}_{args.n}_uniform", builder, args, reduced=False))
    if "tiled" in want:
        records.append(run_config(f"frames_{args.scene}_{args.n}_tile{args.tile}", builder, args, reduced=True))
    if "single" in want:
        # the untiled single-region reduced mode (packed via cube regions)
        records.append(run_config(f"frames_{args.scene}_{args.n}_single", builder, args, reduced=True, single=True))

    for r in records:
        print(json.dumps(r), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(records, f, indent=1)


if __name__ == "__main__":
    main()
