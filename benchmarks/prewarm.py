#!/usr/bin/env python
"""Pre-warm the persistent XLA compile cache for the suite shapes.

Runs a 1-iteration chunked solve for each suite config so every jit unit
(setup / precond factors / init / segment / finalize) lands in
~/.cache/polystokes_xla; subsequent bench/suite runs skip the cold
compile entirely.  Each config is one bounded device execution.

    python benchmarks/prewarm.py [--configs 1,2,3,4,5,6]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4,5,6")
    ap.add_argument("--precond", default="cell_arrow")
    args = ap.parse_args()
    want = {int(c) for c in args.configs.split(",")}

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    cache = os.environ.get("POLYSTOKES_COMPILE_CACHE", os.path.expanduser("~/.cache/polystokes_xla"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from polystokes_tpu import SolverParams
    from polystokes_tpu.config import PreconditionerType
    from polystokes_tpu.scenes.builders import armadillo_melt, conveyor_belt, honey_coil, viscous_beam
    from polystokes_tpu.solver import check_pallas, solve_chunked

    base = dict(
        dtype=jnp.float32, max_iterations=1, bicgstab_fallback=False,
        tolerance=1e-3, preconditioner=PreconditionerType(args.precond),
        use_pallas=True,
    )
    cfgs = {
        1: ("viscous_beam 64 uniform", lambda: (viscous_beam(n=64, dtype=jnp.float32), dict(do_reduced_regions=False))),
        2: ("honey_coil 64 single-region", lambda: (honey_coil(n=64, dtype=jnp.float32), dict(do_reduced_regions=True, do_tile=False, max_regions=64))),
        3: ("honey_coil 128 tiled", lambda: (honey_coil(n=128, dtype=jnp.float32), dict(do_reduced_regions=True, do_tile=True, tile_size=16, tile_padding=2))),
        4: ("conveyor_belt 64 tiled", lambda: (conveyor_belt(n=64, dtype=jnp.float32), dict(do_reduced_regions=True, do_tile=True, tile_size=16, tile_padding=2))),
        5: ("armadillo 256 tiled", lambda: (armadillo_melt(n=256, dtype=jnp.float32), dict(do_reduced_regions=True, do_tile=True, tile_size=16, tile_padding=2))),
        6: ("honey_coil 128 uniform", lambda: (honey_coil(n=128, dtype=jnp.float32), dict(do_reduced_regions=False))),
    }
    for c in sorted(want):
        name, mk = cfgs[c]
        (grid, scene), extra = mk()
        params = check_pallas(grid, scene, SolverParams(**base, **extra))
        t0 = time.perf_counter()
        _, _, stats = solve_chunked(grid, scene, params, segment_iters=1)
        jax.block_until_ready(stats["error"]) if hasattr(stats["error"], "block_until_ready") else None
        print(f"config {c} ({name}): warmed in {time.perf_counter()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
