#!/usr/bin/env python
"""Where does the cold compile go?  Per-jit-unit breakdown of the chunked
solve at a given resolution: Python trace + StableHLO lowering time and
module size (backend-independent), and — when run on the TPU backend —
the XLA/Mosaic backend compile time per unit.

    JAX_PLATFORMS=cpu python benchmarks/compile_budget.py 128   # trace/lower only
    python benchmarks/compile_budget.py 128 --backend           # + backend compile
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", type=int, nargs="?", default=128)
    ap.add_argument("--tile", type=int, default=16)
    ap.add_argument("--backend", action="store_true", help="run backend compile too")
    ap.add_argument("--segment", type=int, default=2000)
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    # NO persistent cache here: we want true cold numbers

    import jax.numpy as jnp

    from polystokes_tpu import SolverParams
    from polystokes_tpu.config import PreconditionerType
    from polystokes_tpu.scenes.builders import honey_coil
    from polystokes_tpu import solver as S

    params = SolverParams(
        do_reduced_regions=True, do_tile=True, tile_size=args.tile, tile_padding=2,
        preconditioner=PreconditionerType.CELL_ARROW, use_pallas=True,
        tolerance=1e-3, max_iterations=20000, bicgstab_fallback=False,
    )
    grid, scene = honey_coil(n=args.n, dtype=jnp.float32)
    params = S.check_pallas(grid, scene, params)

    report = []

    def unit(name, fn, *a, **kw):
        t0 = time.perf_counter()
        lowered = jax.jit(fn, **kw).lower(*a)
        t_lower = time.perf_counter() - t0
        text = lowered.as_text()
        rec = {"unit": name, "trace_lower_s": round(t_lower, 2), "stablehlo_mb": round(len(text) / 1e6, 2)}
        if args.backend:
            t0 = time.perf_counter()
            compiled = lowered.compile()
            rec["backend_compile_s"] = round(time.perf_counter() - t0, 2)
            del compiled
        report.append(rec)
        print(json.dumps(rec), flush=True)
        return lowered

    # the five jit units of solve_chunked, with abstract inputs threaded
    # through evaluated shapes
    unit("setup", S._setup, grid, scene, params, static_argnames=("grid", "params"))
    cls, asm = jax.eval_shape(lambda s: S._setup(grid, s, params), scene)
    cls = jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), cls)
    asm = jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), asm)

    unit(
        "precond_factors",
        lambda c, a: S.precond_factors_packed(grid, c, a, params),
        cls, asm,
    )
    pfac = jax.eval_shape(lambda c, a: S.precond_factors_packed(grid, c, a, params), cls, asm)
    pfac = jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), pfac)

    unit(
        "chunk_init",
        lambda s, c, a: S._chunk_init.__wrapped__(grid, s, params, c, a),
        scene, cls, asm,
    )
    carry = jax.eval_shape(lambda s, c, a: S._chunk_init.__wrapped__(grid, s, params, c, a), scene, cls, asm)
    carry = jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), carry)

    unit(
        "chunk_segment",
        lambda c, a, cr, pf: S._chunk_segment.__wrapped__(grid, params, c, a, cr, args.segment, None, pf),
        cls, asm, carry, pfac,
    )
    unit(
        "chunk_finalize",
        lambda s, c, a, cr: S._chunk_finalize.__wrapped__(grid, s, params, c, a, cr),
        scene, cls, asm, carry,
    )
    total = sum(r["trace_lower_s"] for r in report)
    print(json.dumps({"total_trace_lower_s": round(total, 2)}), flush=True)


if __name__ == "__main__":
    main()
