"""bf16-coefficient A/B at the reference's SI parameters: does halving
the 17-channel coefficient-stack HBM traffic survive the iteration-count
test in the regime the reference actually runs (lambda ~ 3e2-1.4e3)?

The round-3 "+21% iterations" non-win was measured on the toy-stiffness
honey_coil (lambda ~ 1e4), where the f32 arrow preconditioner mismatches
the bf16-rounded operator hardest.  This measures cold solves at SI.

    python benchmarks/bf16_ab.py [--scene jelly_jam_si] [--n 128] [--configs uniform,single,tiled]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
_cache = os.environ.get("POLYSTOKES_COMPILE_CACHE", os.path.expanduser("~/.cache/polystokes_xla"))
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from polystokes_tpu import SolverParams
from polystokes_tpu.config import PreconditionerType
from polystokes_tpu.scenes import builders
from polystokes_tpu.solver import check_pallas, sample_density, solve_chunked


def base_params(config):
    kw = dict(
        dtype=jnp.float32, tolerance=1e-3, max_iterations=20000,
        bicgstab_fallback=False, use_pallas=True,
        preconditioner=PreconditionerType.CELL_ARROW,
    )
    if config == "uniform":
        return SolverParams(do_reduced_regions=False, **kw)
    if config == "single":
        return SolverParams(
            do_reduced_regions=True, do_tile=False, max_regions=64,
            tile_size=16, tile_padding=2, **kw,
        )
    return SolverParams(
        do_reduced_regions=True, do_tile=True, tile_size=16, tile_padding=2, **kw,
    )


def run_one(grid, scene, params):
    t0 = time.perf_counter()
    _, _, stats = solve_chunked(grid, scene, params, segment_iters=2000)
    wall = time.perf_counter() - t0
    return dict(
        iterations=int(stats["iterations"]), error=float(stats["error"]),
        converged=bool(stats["converged"]), wall_s=round(wall, 3),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="jelly_jam_si")
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--configs", default="uniform,single,tiled")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    grid, scene = getattr(builders, args.scene)(n=args.n, dtype=jnp.float32)
    # frames_ab methodology: every solve sees the +g*dt gravity kick (the
    # raw jelly_jam_si state already satisfies the tolerance -> 0 iterations)
    import dataclasses as dc

    vel = list(scene.velocity)
    vel[2] = vel[2] + jnp.asarray(-9.8, jnp.float32) * scene.dt
    scene = dc.replace(scene, velocity=tuple(vel))
    records = []
    for config in args.configs.split(","):
        for bf16 in (False, True):
            params = sample_density(scene, base_params(config).replace(coeff_bf16=bf16))
            params = check_pallas(grid, scene, params)
            # warm the compile cache, then measure the steady call
            rec = run_one(grid, scene, params)
            rec2 = run_one(grid, scene, params)
            rec["wall_warm_s"] = rec2["wall_s"]
            rec.update(config=config, bf16=bf16, scene=args.scene, n=args.n)
            records.append(rec)
            print(json.dumps(rec), flush=True)
    if args.out:
        json.dump(records, open(args.out, "w"), indent=1)


if __name__ == "__main__":
    main()
