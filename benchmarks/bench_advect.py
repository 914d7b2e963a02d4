"""Micro-benchmark of semi-Lagrangian advection strategies on TPU.

The frame loop's non-solve overhead (VERDICT r4 weak #2: ~5.3 s/frame at
128^3, ~90% of each warm frame) is the advection pass: the original
_trilinear used 3-D advanced indexing (a general XLA gather per corner),
and the first velocity sample was a gather even though its positions are
the static MAC lattice.  This script times the candidates:

  orig     3-D advanced-indexing trilinear (the round-4 code)
  linear   flattened 1-D linear-index take per corner
  final    sim.advect_field at head (static-lattice first sample +
           1-D takes for the true gathers)

    python benchmarks/bench_advect.py [--n 128]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("POLYSTOKES_COMPILE_CACHE", os.path.expanduser("~/.cache/polystokes_xla")))

from polystokes_tpu.grid import coord_grids, face_offsets


def trilinear_orig(field, x, y, z):
    shape = field.shape
    x = jnp.clip(x, 0.0, shape[0] - 1.0)
    y = jnp.clip(y, 0.0, shape[1] - 1.0)
    z = jnp.clip(z, 0.0, shape[2] - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, shape[0] - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, shape[1] - 2)
    z0 = jnp.clip(jnp.floor(z).astype(jnp.int32), 0, shape[2] - 2)
    fx, fy, fz = x - x0, y - y0, z - z0

    def g(i, j, k):
        return field[x0 + i, y0 + j, z0 + k]

    c00 = g(0, 0, 0) * (1 - fz) + g(0, 0, 1) * fz
    c01 = g(0, 1, 0) * (1 - fz) + g(0, 1, 1) * fz
    c10 = g(1, 0, 0) * (1 - fz) + g(1, 0, 1) * fz
    c11 = g(1, 1, 0) * (1 - fz) + g(1, 1, 1) * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


def trilinear_linear(field, x, y, z):
    shape = field.shape
    x = jnp.clip(x, 0.0, shape[0] - 1.0)
    y = jnp.clip(y, 0.0, shape[1] - 1.0)
    z = jnp.clip(z, 0.0, shape[2] - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, shape[0] - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, shape[1] - 2)
    z0 = jnp.clip(jnp.floor(z).astype(jnp.int32), 0, shape[2] - 2)
    fx, fy, fz = x - x0, y - y0, z - z0
    sy, sz = shape[1] * shape[2], shape[2]
    base = x0 * sy + y0 * sz + z0
    flat = field.ravel()

    def g(i, j, k):
        return jnp.take(flat, base + (i * sy + j * sz + k), mode="clip")

    c00 = g(0, 0, 0) * (1 - fz) + g(0, 0, 1) * fz
    c01 = g(0, 1, 0) * (1 - fz) + g(0, 1, 1) * fz
    c10 = g(1, 0, 0) * (1 - fz) + g(1, 0, 1) * fz
    c11 = g(1, 1, 0) * (1 - fz) + g(1, 1, 1) * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


def make_advect(trilinear):
    def velocity_at(vel, px, py, pz):
        out = []
        for a, v in enumerate(vel):
            off = [0.0, 0.0, 0.0]
            off[a] = 0.5
            out.append(trilinear(v, px + off[0], py + off[1], pz + off[2]))
        return out

    def advect(field, vel, dt_over_dx, offsets):
        dtype = field.dtype
        xs, ys, zs = coord_grids(field.shape, offsets, dtype)
        px = jnp.broadcast_to(xs, field.shape)
        py = jnp.broadcast_to(ys, field.shape)
        pz = jnp.broadcast_to(zs, field.shape)
        u = velocity_at(vel, px, py, pz)
        mx = px - 0.5 * dt_over_dx * u[0]
        my = py - 0.5 * dt_over_dx * u[1]
        mz = pz - 0.5 * dt_over_dx * u[2]
        um = velocity_at(vel, mx, my, mz)
        bx = px - dt_over_dx * um[0]
        by = py - dt_over_dx * um[1]
        bz = pz - dt_over_dx * um[2]
        return trilinear(field, bx, by, bz)

    return advect


def frame(advect, vel, surf, dt_over_dx):
    adv_vel = tuple(advect(vel[a], vel, dt_over_dx, face_offsets(a)) for a in range(3))
    return adv_vel, advect(surf, vel, dt_over_dx, (0.0, 0.0, 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--variants", default="orig,linear,gather,window")
    args = ap.parse_args()
    n = args.n
    import numpy as np

    rng = np.random.default_rng(0)
    res = (n, n, n)
    vel = tuple(
        jnp.asarray(rng.standard_normal((n + (a == 0), n + (a == 1), n + (a == 2))), jnp.float32)
        for a in range(3)
    )
    surf = jnp.asarray(rng.standard_normal(res), jnp.float32)
    dt_over_dx = jnp.float32(0.5)

    fns = {}
    if "orig" in args.variants:
        fns["orig"] = jax.jit(lambda v, s, d: frame(make_advect(trilinear_orig), v, s, d))
    if "linear" in args.variants:
        fns["linear"] = jax.jit(lambda v, s, d: frame(make_advect(trilinear_linear), v, s, d))
    if "final" in args.variants or "gather" in args.variants:
        from polystokes_tpu.sim import advect_field_gather

        fns["gather"] = jax.jit(lambda v, s, d: frame(advect_field_gather, v, s, d))
    if "window" in args.variants:
        from polystokes_tpu.sim import advect_field

        for sub in (1, 2, 4):
            fns[f"window{sub}"] = jax.jit(
                lambda v, s, d, _sub=sub: frame(
                    lambda f, vv, dd, off: advect_field(f, vv, dd, off, substeps=_sub), v, s, d
                )
            )

    ref = None
    for name, fn in fns.items():
        # on the axon remote platform block_until_ready alone can return
        # before the execution has drained (see bench_iter.timeit) — jit a
        # scalar checksum of the frame and fetch it to host per rep
        chk = jax.jit(lambda v, s, d: jax.tree.map(jnp.sum, fn(v, s, d)))
        cs = jax.tree.map(float, chk(vel, surf, dt_over_dx))  # compile + drain
        ts = []
        for k in range(5):
            t0 = time.perf_counter()
            cs = jax.tree.map(float, chk(vel, surf, dt_over_dx))
            ts.append(time.perf_counter() - t0)
        out = fn(vel, surf, dt_over_dx)
        jax.block_until_ready(out)
        err = ""
        if ref is None:
            ref = out
        else:
            d = max(
                float(jnp.max(jnp.abs(out[0][a] - ref[0][a]))) for a in range(3)
            )
            err = f"  max|Δvel| vs first variant = {d:.2e}"
        print(f"{name:8s} n={n}: {min(ts) * 1e3:8.1f} ms/frame{err}", flush=True)


if __name__ == "__main__":
    main()
