"""Empirical probe of pl.Element(size, padding=(lo,hi)) window semantics.

Questions answered (on whatever backend runs this):
  1. Does Mosaic accept element windows with padding on the x/y dims of a
     [C, nx, ny, nz] layout (our packed-kernel shape)?
  2. Are index maps in padded coordinates (window start i*bx covers
     unpadded [i*bx - lo, ...)) as in the HLO interpreter?
  3. What do the out-of-bounds pad cells contain (zero / garbage / NaN)?

The interior-copy check (case `copy`) validates 1+2; the `pad_probe`
outputs reveal 3.  Run on TPU once the tunnel is free:

    python benchmarks/probe_elempad.py            # real device
    JAX_PLATFORMS=cpu python benchmarks/probe_elempad.py   # interpret
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

HX, HY = 2, 4


def main():
    interpret = jax.devices()[0].platform == "cpu"
    print("platform:", jax.devices()[0].platform, "interpret:", interpret)
    C, nx, ny, nz = 3, 32, 16, 128
    bx, by = 16, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((C, nx, ny, nz)), jnp.float32)

    wx, wy = bx + 2 * HX, by + 2 * HY

    def kernel(xr, out_ref, absr, nanr):
        # interior copy: window[HX:HX+bx, HY:HY+by] should equal the block
        for c in range(C):
            out_ref[c] = xr[c, HX : HX + bx, HY : HY + by, :]
        # pad-cell content: |sum| and NaN count over the WHOLE window
        w = xr[...]
        absr[pl.program_id(0), pl.program_id(1)] = jnp.sum(jnp.abs(w))
        nanr[pl.program_id(0), pl.program_id(1)] = jnp.sum(
            jnp.isnan(w).astype(jnp.float32)
        )

    in_spec = pl.BlockSpec(
        (
            pl.Element(C, (0, 0)),
            pl.Element(wx, (HX, HX)),
            pl.Element(wy, (HY, HY)),
            pl.Element(nz, (0, 0)),
        ),
        lambda i, j: (0, i * bx, j * by, 0),
        memory_space=None if interpret else pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (C, bx, by, nz), lambda i, j: (0, i, j, 0),
        memory_space=None if interpret else pltpu.VMEM,
    )
    gx, gy = nx // bx, ny // by
    scal_spec = pl.BlockSpec(
        (gx, gy), lambda i, j: (0, 0),
        memory_space=None if interpret else pltpu.SMEM,
    )
    out, absw, nanw = pl.pallas_call(
        kernel,
        grid=(gx, gy),
        in_specs=[in_spec],
        out_specs=[out_spec, scal_spec, scal_spec],
        out_shape=[
            jax.ShapeDtypeStruct((C, nx, ny, nz), jnp.float32),
            jax.ShapeDtypeStruct((gx, gy), jnp.float32),
            jax.ShapeDtypeStruct((gx, gy), jnp.float32),
        ],
        interpret=interpret,
    )(x)
    out, absw, nanw = jax.device_get((out, absw, nanw))
    xh = jax.device_get(x)
    copy_ok = bool(np.array_equal(out, xh))
    print("interior copy exact:", copy_ok)

    # expected |sum| if pads read zero: per block, |x| over the in-bounds
    # part of the window
    xpad = np.pad(xh, ((0, 0), (HX, HX), (HY, HY), (0, 0)))
    exp_zero = np.zeros((gx, gy), np.float32)
    for i in range(gx):
        for j in range(gy):
            exp_zero[i, j] = np.abs(
                xpad[:, i * bx : i * bx + wx, j * by : j * by + wy, :]
            ).sum()
    pads_zero = bool(np.allclose(absw, exp_zero, rtol=1e-5))
    print("pad cells read as zero:", pads_zero)
    print("NaNs seen in windows:", float(nanw.sum()))
    if not pads_zero:
        print("  |sum| deltas (garbage magnitude):", np.abs(absw - exp_zero).max())
    print("PROBE", {"copy_ok": copy_ok, "pads_zero": pads_zero, "nan": float(nanw.sum())})


if __name__ == "__main__":
    main()
