"""Per-stage wall-time profile of one solve (the reference's per-frame
cost structure: weights+classify+assemble setup, preconditioner factors,
chunked-CG init / segments / finalize).

The reference rebuilds its sparse system every frame in ~ms on CPU
(SURVEY.md §6); this script shows where our per-solve device time goes so
the frame loop (benchmarks/frames_ab.py) stays setup-light.

    python benchmarks/profile_frame.py --scene jelly_jam_si --n 128 --tile 16
    python benchmarks/profile_frame.py --scene armadillo_melt_si --n 256 --untiled
"""
import argparse
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
from polystokes_tpu.solver import (
    _chunk_init,
    _chunk_finalize,
    _chunk_segment,
    _setup,
    check_pallas,
    precond_factors_packed,
    sample_density,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="jelly_jam_si")
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--tile", type=int, default=16)
    ap.add_argument("--untiled", action="store_true")
    ap.add_argument("--segment-iters", type=int, default=2000)
    args = ap.parse_args()

    grid, scene = getattr(builders, args.scene)(n=args.n, dtype=jnp.float32)
    params = SolverParams(
        dtype=jnp.float32, max_iterations=20000, bicgstab_fallback=False,
        tolerance=1e-3, preconditioner=PreconditionerType.CELL_ARROW,
        use_pallas=True, do_reduced_regions=True,
        do_tile=not args.untiled, tile_size=args.tile, tile_padding=2,
        **({"max_regions": 64} if args.untiled else {}),
    )
    t0 = time.time()
    params = sample_density(scene, params)
    print(f"sample_density: {time.time() - t0:.3f}s", flush=True)
    t0 = time.time()
    params = check_pallas(grid, scene, params)
    print(f"check_pallas: {time.time() - t0:.3f}s", flush=True)

    f_setup = jax.jit(_setup, static_argnames=("grid", "params"))
    f_pfac = jax.jit(precond_factors_packed, static_argnames=("grid", "params"))

    def drain(out):
        # axon remote platform: block_until_ready can return before the
        # execution has drained — a host scalar fetch of one output leaf
        # forces the producing executable to complete (all outputs of one
        # executable finish together)
        leaf = next(l for l in jax.tree.leaves(out) if hasattr(l, "dtype"))
        return float(jnp.sum(leaf.astype(jnp.float32)))

    def timed(label, fn, *a, repeats=3):
        out = fn(*a)
        drain(out)
        ts = []
        for _ in range(repeats):
            t1 = time.perf_counter()
            out = fn(*a)
            drain(out)
            ts.append(time.perf_counter() - t1)
        print(f"{label}: {min(ts):.3f}s", flush=True)
        return out

    cls, asm = timed("setup (weights+classify+assemble)", f_setup, grid, scene, params)
    pfac = timed("precond factors", f_pfac, grid, cls, asm, params)
    carry = timed("chunk init", _chunk_init, grid, scene, params, cls, asm, None, None, pfac)

    # the segment donates its carry — rebuild it per timing rep
    seg_fn = lambda c: _chunk_segment(grid, params, cls, asm, c, args.segment_iters, None, pfac)
    seg = seg_fn(carry)
    drain(seg)
    ts = []
    for _ in range(2):
        c2 = _chunk_init(grid, scene, params, cls, asm, None, None, pfac)
        drain(c2)
        t1 = time.perf_counter()
        seg = seg_fn(c2)
        drain(seg)
        ts.append(time.perf_counter() - t1)
    k = int(seg.k)
    print(f"segment ({args.segment_iters} iters cap): {min(ts):.3f}s  "
          f"k={k} rre={float(seg.rre):.2e}  "
          f"({min(ts) / max(k, 1) * 1e3:.3f} ms/iter)", flush=True)
    # finalize does not donate its carry — warm-time it like the others
    out = _chunk_finalize(grid, scene, params, cls, asm, seg)
    drain(out)
    ts = []
    for _ in range(3):
        t1 = time.perf_counter()
        out = _chunk_finalize(grid, scene, params, cls, asm, seg)
        drain(out)
        ts.append(time.perf_counter() - t1)
    print(f"finalize: {min(ts):.3f}s", flush=True)


if __name__ == "__main__":
    main()
