"""Microbenchmark: the matrix-free Schur apply alone (the CG hot kernel).

Times one apply_A per variant (uniform / tiled-reduced) at a given
resolution on the current jax default device, plus the achieved HBM
bandwidth estimate.  Compare against the reference hot kernel
ApplyPressureStressMatrix::apply (lib/include/ApplyPressureStressMatrix.h:
102-179).

    python benchmarks/bench_apply.py [N] [--pallas]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.environ.get("POLYSTOKES_COMPILE_CACHE", os.path.expanduser("~/.cache/polystokes_xla"))
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from polystokes_tpu import SolverParams
from polystokes_tpu.classify import classify, effective_max_regions
from polystokes_tpu.operators import PTau
from polystokes_tpu.scenes.builders import honey_coil
from polystokes_tpu.solver import assemble, make_apply
from polystokes_tpu.weights import compute_weights


def bench_apply(n=128, reduced=True, tile=16, iters=50, use_pallas=None):
    params = SolverParams(
        do_reduced_regions=reduced, do_tile=True, tile_size=tile, tile_padding=2,
    )
    if use_pallas is not None:
        params = params.replace(use_pallas=use_pallas)
    grid, scene = honey_coil(n=n, dtype=jnp.float32)
    R = effective_max_regions(grid, params)
    lw, fw = compute_weights(grid, scene.surface_sdf, scene.collision_sdf, params.dtype)
    cls = classify(grid, lw, fw, params)
    asm, _ = assemble(grid, scene, cls, lw, fw, params, R)
    apply_A = make_apply(grid, cls, asm, params, R)

    rng = np.random.default_rng(0)
    x = PTau(
        p=jnp.asarray(rng.standard_normal(grid.center_shape), jnp.float32),
        tc=tuple(jnp.asarray(rng.standard_normal(grid.center_shape), jnp.float32) for _ in range(3)),
        te=tuple(jnp.asarray(rng.standard_normal(np.asarray(asm.uinv_e[e]).shape), jnp.float32) for e in range(3)),
    )

    def many(x):
        def body(i, acc):
            y = apply_A(acc)
            # keep the chain data-dependent so XLA can't batch/skip
            return jax.tree.map(lambda a: a * (1.0 / (1.0 + 1e-30)), y)

        return jax.lax.fori_loop(0, iters, body, x)

    f = jax.jit(many)
    t0 = time.time()
    y = f(x)
    jax.block_until_ready(y)
    compile_s = time.time() - t0
    t0 = time.time()
    y = f(x)
    jax.block_until_ready(y)
    per_iter_ms = (time.time() - t0) / iters * 1e3

    # HBM traffic estimate: read x(7) + coeff fields(14) + write out(7)
    nbytes = sum(np.asarray(l).nbytes for l in jax.tree.leaves(x))
    traffic = nbytes * (2 + 2)  # x + out + ~14 coeff fields of same scale
    print(
        f"n={n} reduced={reduced} tile={tile}: {per_iter_ms:.3f} ms/apply "
        f"(compile {compile_s:.1f}s, ~{traffic/1e6:.0f}MB/apply -> "
        f"{traffic/per_iter_ms*1e3/1e9:.0f} GB/s)",
        flush=True,
    )
    return per_iter_ms


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 128
    kw = {}
    if "--pallas" in sys.argv:
        kw["use_pallas"] = True
    if "--no-pallas" in sys.argv:
        kw["use_pallas"] = False
    bench_apply(n=n, reduced=False, **kw)
    bench_apply(n=n, reduced=True, tile=16, **kw)
    bench_apply(n=n, reduced=True, tile=8, **kw)
