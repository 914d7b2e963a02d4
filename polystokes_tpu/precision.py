"""Full-f32 matmul precision for the solve path.

On TPU, jax's DEFAULT matmul precision truncates f32 operands to
bfloat16 on the MXU (~0.4% relative error per product).  The reduced
J coupling is computed as a moments -> region-algebra -> expand chain
of matmuls; independent truncation on the J side and the J^T side makes
the assembled operator measurably asymmetric, which breaks the CG
theory outright: on jelly_jam 32^3 (tile 8, identity preconditioner,
f32) the PCG residual after 10 iterations is rre = 0.77 at DEFAULT
precision vs 1.6e-9 at HIGHEST — the difference between never
converging (and the BiCGStab fallback diverging on the packed path)
and converging in a handful of iterations.

The reference computes everything in CPU double precision
(lib/include/units.h:21, SolveReal = double; its CUDA submodules are
vestigial and commented out of the build), so full-precision f32
multiplies (HIGHEST, no bf16 passes) is the closest parity setting
this side of the fp64 verification path.  The wall-clock cost is negligible: the big
FLOPs in the apply are elementwise stencils, and the matmuls this
slows (per-cube moment dots, [R,26,26] region algebra) are small.

`precise_matmul` wraps a function so everything traced inside it —
including Pallas kernel bodies, which trace during the outer trace —
emits HIGHEST-precision dots.  Apply it UNDER jax.jit (the context must
be live at trace time).
"""
from __future__ import annotations

import functools

import jax


def precise_matmul(fn):
    """Trace `fn` under jax.default_matmul_precision('highest')."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
