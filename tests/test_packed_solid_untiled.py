"""Packed Pallas apply == XLA apply on scenes WITH solid-cut faces, and
for UNTILED (general) regions through the cube-aligned map.

Regression tests for two round-3 findings:

  * the packed transpose was missing its second ffw face factor
    (G^T carries the same face weight as G, transpose_from_faces,
    operators.py:260) — invisible on the solid-free scenes the original
    parity tests used, wrong (and asymmetric) at every solid-cut face.
  * general (do_tile=False) regions now run the cube-major reduction /
    packed J-coupling paths via classify's cube-alignment hygiene
    (enforce_one_region_per_cube at tile_size granularity + the
    foreign-slot-cube face demotion).
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from polystokes_tpu import sdf
from polystokes_tpu.classify import classify, effective_max_regions
from polystokes_tpu.operators import PTau
from polystokes_tpu.pallas_apply import pack_ptau, unpack_ptau
from polystokes_tpu.solver import assemble, make_apply, make_apply_packed
from polystokes_tpu.weights import compute_weights

from test_operators import make_case


def _solid_case(res=(16, 16, 16), tile=8, do_tile=True, reduced=True):
    """Liquid slab resting on a solid floor that CUTS cells (ffw < 1 at
    faces near z=0.19*nz), liquid strictly inside the domain box."""
    grid, params, scene = make_case(res=res, tile=tile, reduced=reduced, solid=False)
    params = params.replace(
        dtype=jnp.float64, use_pallas=False, tile_padding=2, do_tile=do_tile,
        tile_size=tile, max_regions=64,
    )
    inner = sdf.box((0.10, 0.10, 0.10), (0.90, 0.90, 0.90))
    floor = sdf.plane((0.15, 0.1, 1.0), 0.23)  # tilted: cuts faces of every family
    surface = sdf.sample_at_centers(inner, grid.res, grid.dx, params.dtype)
    coll = sdf.sample_at_centers(floor, grid.res, grid.dx, params.dtype)
    scene = dataclasses.replace(scene, surface_sdf=surface, collision_sdf=coll)
    R = effective_max_regions(grid, params)
    lw, fw = compute_weights(grid, scene.surface_sdf, scene.collision_sdf, params.dtype)
    cls = classify(grid, lw, fw, params)
    asm, rd = assemble(grid, scene, cls, lw, fw, params, R)
    # the scenario only regresses anything if solid-cut faces exist
    assert float(jnp.sum((asm.ffw[2] > 0) & (asm.ffw[2] < 1))) > 0
    return grid, params, scene, cls, asm, R


def _rand_ptau(grid, dtype, seed=1):
    key = jax.random.PRNGKey(seed)
    return PTau(
        p=jax.random.normal(key, grid.center_shape, dtype),
        tc=tuple(jax.random.normal(jax.random.fold_in(key, a), grid.center_shape, dtype) for a in range(3)),
        te=tuple(jax.random.normal(jax.random.fold_in(key, 5 + e), grid.edge_shape(e), dtype) for e in range(3)),
    )


def _apply_diff(grid, cls, asm, params, R):
    x = _rand_ptau(grid, params.dtype)
    y1 = make_apply(grid, cls, asm, params.replace(use_pallas=False), R)(x)
    y2 = unpack_ptau(make_apply_packed(grid, cls, asm, params.replace(use_pallas=True), R)(pack_ptau(x)))
    return max(
        [float(jnp.max(jnp.abs(y1.p - y2.p)))]
        + [float(jnp.max(jnp.abs(y1.tc[i] - y2.tc[i]))) for i in range(3)]
        + [float(jnp.max(jnp.abs(y1.te[i] - y2.te[i]))) for i in range(3)]
    )


@pytest.mark.quick
@pytest.mark.parametrize("reduced", [False, True], ids=["uniform", "reduced"])
def test_packed_apply_matches_xla_with_solid_cut_faces(reduced):
    grid, params, scene, cls, asm, R = _solid_case(reduced=reduced)
    d = _apply_diff(grid, cls, asm, params, R)
    assert d < 1e-10, f"packed apply deviates at solid-cut faces: {d}"


@pytest.mark.quick
def test_packed_apply_matches_general_untiled():
    """Untiled (general-region) scenes run the packed kernels through the
    cube-aligned region map; the operator must equal the general segment
    path built from the SAME classification."""
    grid, params, scene, cls, asm, R = _solid_case(do_tile=False, tile=8)
    assert int(cls.n_regions) >= 1
    x = _rand_ptau(grid, params.dtype)
    gen = params.replace(use_pallas=False, cube_regions=False)  # segment path
    y1 = make_apply(grid, cls, asm, gen, R)(x)
    y2 = unpack_ptau(make_apply_packed(grid, cls, asm, params.replace(use_pallas=True), R)(pack_ptau(x)))
    d = max(
        [float(jnp.max(jnp.abs(y1.p - y2.p)))]
        + [float(jnp.max(jnp.abs(y1.tc[i] - y2.tc[i]))) for i in range(3)]
        + [float(jnp.max(jnp.abs(y1.te[i] - y2.te[i]))) for i in range(3)]
    )
    assert d < 1e-10, f"untiled packed apply deviates from segment path: {d}"


@pytest.mark.quick
def test_untiled_cube_reductions_match_segment():
    """Setup reductions (Mr, Vr, best-fit, COM) through the cube-major
    accumulator equal the segment path on the same untiled classification."""
    grid, params, scene, cls, asm, R = _solid_case(do_tile=False, tile=8)
    lw, fw = compute_weights(grid, scene.surface_sdf, scene.collision_sdf, params.dtype)
    asm_gen, _ = assemble(grid, scene, cls, lw, fw, params.replace(cube_regions=False), R)
    for name in ("mr", "vr", "best_fit", "com", "b_w", "binv"):
        a, b = getattr(asm, name), getattr(asm_gen, name)
        scale = float(jnp.max(jnp.abs(b))) + 1e-30
        d = float(jnp.max(jnp.abs(a - b)))
        assert d <= 1e-9 * scale, f"{name}: cube path deviates {d} (scale {scale})"


def test_packed_transpose_symmetry_at_solid():
    """<y, A x> == <x, A y> through the packed apply on a solid-cut scene
    (the missing-ffw bug made A asymmetric exactly there)."""
    grid, params, scene, cls, asm, R = _solid_case(reduced=True)
    ap = make_apply_packed(grid, cls, asm, params.replace(use_pallas=True), R)
    x = pack_ptau(_rand_ptau(grid, params.dtype, seed=2))
    y = pack_ptau(_rand_ptau(grid, params.dtype, seed=3))
    xy = float(jnp.sum(y * ap(x)))
    yx = float(jnp.sum(x * ap(y)))
    assert abs(xy - yx) <= 1e-9 * max(abs(xy), 1.0), (xy, yx)
