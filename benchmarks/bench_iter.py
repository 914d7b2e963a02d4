"""Per-iteration cost breakdown of the packed CG loop on device.

Times, at a given resolution (tiled-reduced honey_coil, packed Pallas
path): the fused apply alone, the arrow preconditioner + CG BLAS1 work
alone, and a full PCG iteration — so the fusion work targets the real
bottleneck.

    python benchmarks/bench_iter.py [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.environ.get("POLYSTOKES_COMPILE_CACHE", os.path.expanduser("~/.cache/polystokes_xla"))
# honor JAX_PLATFORMS even when sitecustomize preloaded jax with the
# axon platform list (see run.py)
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from polystokes_tpu import SolverParams
from polystokes_tpu.classify import classify, effective_max_regions
from polystokes_tpu.config import PreconditionerType
from polystokes_tpu.scenes.builders import honey_coil
from polystokes_tpu.solver import (
    assemble,
    make_apply_packed,
    make_apply_packed_pap,
    make_preconditioner_packed,
    precond_factors_packed,
)
from polystokes_tpu.weights import compute_weights
from polystokes_tpu import krylov


def main(n=128, iters=100, untiled=False):
    kw = {"do_tile": False, "max_regions": 64} if untiled else {"do_tile": True}
    params = SolverParams(
        do_reduced_regions=True, tile_size=16, tile_padding=2, **kw,
        preconditioner=PreconditionerType.CELL_ARROW, use_pallas=True,
    )
    grid, scene = honey_coil(n=n, dtype=jnp.float32)
    R = effective_max_regions(grid, params)
    lw, fw = compute_weights(grid, scene.surface_sdf, scene.collision_sdf, params.dtype)
    cls = classify(grid, lw, fw, params)
    asm, _ = assemble(grid, scene, cls, lw, fw, params, R)
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.standard_normal((7,) + tuple(grid.res)), jnp.float32)

    def timeit(name, fn, *args):
        # cls/asm passed as jit args so the coefficient arrays are inputs,
        # not giant HLO constants (the remote compile service rejects those)
        from polystokes_tpu.precision import precise_matmul

        # a scalar host fetch forces the full device round trip (on the
        # axon remote platform block_until_ready alone can return before
        # the execution has drained)
        def reduced(*a):
            out = fn(*a)
            return jax.tree.map(lambda t: jnp.sum(t), out)

        f = jax.jit(precise_matmul(reduced))
        _ = jax.tree.map(float, f(cls, asm, *args))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = jax.tree.map(float, f(cls, asm, *args))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:28s} {best/iters*1e3:7.3f} ms/iter   ({best:.3f}s / {iters})", flush=True)
        return best / iters

    def chain_apply(cls, asm, x):
        fn = make_apply_packed(grid, cls, asm, params, R)

        def body(i, acc):
            return fn(acc)

        return jax.lax.fori_loop(0, iters, body, x)

    timeit("apply (fused pallas)", chain_apply, xp)

    # reduced-branch stage breakdown: one grid_mom_pap pass, the tiny
    # region algebra, the polynomial expand, and the finish pass — the
    # deltas vs uniform's single fused pass
    if params.do_reduced_regions:
        from polystokes_tpu.pallas_apply import (
            _pad_halo,
            expand_packed,
            finish_packed,
            grid_mom_pap_packed,
            pack_coeffs,
        )
        from polystokes_tpu.solver import _region_algebra_packed

        T = params.tile_size

        def chain_grid_mom(cls, asm, x):
            coeffs = pack_coeffs(asm, cls)

            def body(i, acc):
                out, mom, pap = grid_mom_pap_packed(_pad_halo(acc), coeffs, grid.res, T, params.basis)
                return out + 1e-30 * jnp.sum(mom) + 1e-30 * jnp.sum(pap)

            return jax.lax.fori_loop(0, iters, body, x)

        timeit("  grid+mom+pap pass", chain_grid_mom, xp)

        def chain_expand(cls, asm, x):
            coeffs = pack_coeffs(asm, cls)
            algebra, red_packed = _region_algebra_packed(grid, cls, asm, params, R)
            _, mom0, _ = grid_mom_pap_packed(_pad_halo(x), coeffs, grid.res, T, params.basis)

            def body(i, carry):
                mom = mom0 + 1e-30 * i
                v_arr = algebra(mom)
                up = expand_packed(v_arr, red_packed, grid.res, T, params.basis)
                return carry + 1e-30 * jnp.sum(up)

            return jax.lax.fori_loop(0, iters, body, jnp.zeros((), x.dtype))

        timeit("  algebra+expand", chain_expand, xp)

        def chain_finish(cls, asm, x):
            coeffs = pack_coeffs(asm, cls)
            out0, mom0, _ = grid_mom_pap_packed(_pad_halo(x), coeffs, grid.res, T, params.basis)
            algebra, red_packed = _region_algebra_packed(grid, cls, asm, params, R)
            up0 = expand_packed(algebra(mom0), red_packed, grid.res, T, params.basis)

            def body(i, acc):
                return finish_packed(coeffs, out0, up0 + 1e-30 * acc[:3], grid.res)

            return jax.lax.fori_loop(0, iters, body, x)

        timeit("  finish pass", chain_finish, xp)

    def chain_apply_dot(cls, asm, x):
        fn = make_apply_packed_pap(grid, cls, asm, params, R)

        def body(i, acc):
            out, pap = fn(acc)
            return out + 1e-30 * pap

        return jax.lax.fori_loop(0, iters, body, x)

    timeit("apply+dot (fused pap)", chain_apply_dot, xp)

    # factor setup timed separately from per-application cost: the factors
    # include the reduced-diagonal probe (whole seconds of device work),
    # hoisted to setup-once in solve_chunked
    t0 = time.perf_counter()
    pfac = jax.jit(lambda c, a: precond_factors_packed(grid, c, a, params))(cls, asm)
    jax.block_until_ready(pfac)
    print(f"{'arrow factor setup (once)':28s} {time.perf_counter()-t0:7.3f} s  (incl. compile)", flush=True)

    def chain_precond(cls, asm, pf, x):
        fn = make_preconditioner_packed(grid, cls, asm, params, factors=pf)

        def body(i, acc):
            return fn(acc)

        return jax.lax.fori_loop(0, iters, body, x)

    timeit("arrow precond", chain_precond, pfac, xp)

    def blas1(cls, asm, x):
        def body(i, st):
            xx, r, p = st
            d1 = krylov.tree_dot(p, r)
            a = d1 / (1.0 + d1 * 1e-30)
            xx = krylov.tree_axpy(a, p, xx)
            r = krylov.tree_axpy(-a, p, r)
            d2 = krylov.tree_dot(r, r)
            d3 = krylov.tree_dot(xx, xx)
            beta = d2 / jnp.where(d3 != 0, d3, 1.0)
            p = krylov.tree_axpy(beta, p, r)
            return xx, r, p

        return jax.lax.fori_loop(0, iters, body, (x, x + 1.0, x + 2.0))

    timeit("CG BLAS1 (3 dots + 3 axpy)", blas1, xp)

    def full(cls, asm, pf, x, p2=None):
        p2 = p2 or params
        apply_K = make_apply_packed(grid, cls, asm, p2, R)
        apply_dot = make_apply_packed_pap(grid, cls, asm, p2, R)
        precond = make_preconditioner_packed(grid, cls, asm, p2, factors=pf)
        res = krylov.pcg(apply_K, x, jnp.zeros_like(x), precond=precond, tol=0.0, max_iters=iters, apply_dot=apply_dot)
        return res.x

    timeit("full PCG iteration", full, pfac, xp)

    def full_bf16(cls, asm, pf, x):
        # bf16 coefficient storage on the PRODUCTION (unfused-update) loop:
        # halves the 17-channel coeff read in pass 1 + the finish re-read
        return full(cls, asm, pf, x, p2=params.replace(coeff_bf16=True))

    timeit("full PCG iteration (bf16)", full_bf16, pfac, xp)

    def full_fused(cls, asm, pf, x, p2=None):
        from polystokes_tpu.solver import make_fused_update

        p2 = p2 or params.replace(fuse_update=True)
        apply_K = make_apply_packed(grid, cls, asm, p2, R)
        fused_update = make_fused_update(grid, p2, pf, cls=cls, asm=asm)
        apply_dot = make_apply_packed_pap(grid, cls, asm, p2, R, defer_finish=True)
        res = krylov.pcg(apply_K, x, jnp.zeros_like(x), tol=0.0, max_iters=iters, apply_dot=apply_dot, fused_update=fused_update)
        return res.x

    timeit("full PCG iter (fused upd)", full_fused, pfac, xp)

    def full_fused_noexp(cls, asm, pf, x):
        # the materialized-up fused path (expand kernel + halo pad + finish
        # re-read) — the pre-round-5 fused-update baseline
        return full_fused(cls, asm, pf, x, p2=params.replace(fuse_update=True, fuse_expand=False))

    timeit("full PCG iter (fused, no exp)", full_fused_noexp, pfac, xp)

    def full_fused_bf16(cls, asm, pf, x):
        return full_fused(cls, asm, pf, x, p2=params.replace(fuse_update=True, coeff_bf16=True))

    timeit("full PCG iter (fused+bf16)", full_fused_bf16, pfac, xp)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(int(args[0]) if args else 128, untiled="--untiled" in sys.argv)
