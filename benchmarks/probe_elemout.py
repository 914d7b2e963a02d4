"""Probe: Element windows on pallas OUTPUTS + input_output_aliases.

The padded-carry CG design (vectors stored with a permanent zero halo
ring) needs:
  1. out_specs with pl.Element dims at an offset index map (write the
     interior of a padded buffer, ring untouched) — Mosaic support?
  2. input_output_aliases so the untouched ring keeps the (zero) contents
     of the donated input buffer.

    python benchmarks/probe_elemout.py            # real device
    JAX_PLATFORMS=cpu python benchmarks/probe_elemout.py   # interpret
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

HX, HY = 2, 8


def main():
    interpret = jax.devices()[0].platform == "cpu"
    print("platform:", jax.devices()[0].platform, "interpret:", interpret)
    C, nx, ny, nz = 3, 32, 16, 128
    bx, by = 16, 8
    px, py = nx + 2 * HX, ny + 2 * HY
    rng = np.random.default_rng(0)
    # donated buffer: zero ring, sentinel interior
    buf = np.zeros((C, px, py, nz), np.float32)
    buf[:, HX : HX + nx, HY : HY + ny, :] = -1.0
    buf = jnp.asarray(buf)
    x = jnp.asarray(rng.standard_normal((C, nx, ny, nz)), jnp.float32)

    def kernel(xr, br, out_ref):
        # write interior = 2*x block; ring region never written
        for c in range(C):
            out_ref[c] = 2.0 * xr[c]

    in_spec = pl.BlockSpec(
        (C, bx, by, nz), lambda i, j: (0, i, j, 0),
        memory_space=None if interpret else pltpu.VMEM,
    )
    # dummy spec for the donated buffer input (read nothing useful)
    buf_spec = pl.BlockSpec(
        (
            pl.Element(C), pl.Element(bx), pl.Element(by), pl.Element(nz),
        ),
        lambda i, j: (0, i * bx, j * by, 0),
        memory_space=None if interpret else pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (
            pl.Element(C), pl.Element(bx), pl.Element(by), pl.Element(nz),
        ),
        lambda i, j: (0, HX + i * bx, (j + 1) * by, 0),
        memory_space=None if interpret else pltpu.VMEM,
    )
    gx, gy = nx // bx, ny // by
    f = pl.pallas_call(
        kernel,
        grid=(gx, gy),
        in_specs=[in_spec, buf_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((C, px, py, nz), jnp.float32),
        input_output_aliases={1: 0},
        interpret=interpret,
    )
    out = jax.device_get(jax.jit(f, donate_argnums=(1,))(x, buf))
    xh = jax.device_get(x)
    interior_ok = bool(np.allclose(out[:, HX : HX + nx, HY : HY + ny, :], 2.0 * xh))
    ring = out.copy()
    ring[:, HX : HX + nx, HY : HY + ny, :] = 0.0
    ring_zero = bool(np.all(ring == 0.0))
    print("interior == 2x:", interior_ok)
    print("ring stayed zero:", ring_zero)
    print("PROBE", {"interior_ok": interior_ok, "ring_zero": ring_zero})


if __name__ == "__main__":
    main()
