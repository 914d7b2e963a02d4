"""Per-stage wall-time profile of _setup (weights / classify / assemble)
plus a breakdown of classify's region stages — finds where the per-solve
setup time goes at 256^3 (VERDICT r5: single-region SI setup ~8-27 s for a
22-iteration solve; the reference's host classify is ~ms, SURVEY.md §6).

    python benchmarks/profile_setup.py --scene armadillo_melt_si --n 256 --untiled
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="armadillo_melt_si")
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--tile", type=int, default=16)
    ap.add_argument("--untiled", action="store_true")
    args = ap.parse_args()

    grid, scene = getattr(builders, args.scene)(n=args.n, dtype=jnp.float32)
    params = SolverParams(
        dtype=jnp.float32, max_iterations=20000, bicgstab_fallback=False,
        tolerance=1e-3, preconditioner=PreconditionerType.CELL_ARROW,
        use_pallas=True, do_reduced_regions=True,
        do_tile=not args.untiled, tile_size=args.tile, tile_padding=2,
        **({"max_regions": 64} if args.untiled else {}),
    )

    def drain(out):
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

    from polystokes_tpu import classify as C
    from polystokes_tpu.solver import _apply_input_weights, assemble, effective_max_regions
    from polystokes_tpu.weights import compute_weights

    R = effective_max_regions(grid, params)
    max_regions = R

    @jax.jit
    def f_weights(scene):
        lw, fw = compute_weights(grid, scene.surface_sdf, scene.collision_sdf, params.dtype)
        return _apply_input_weights(lw, fw, scene, params.dtype)

    lw, fw = timed("weights", f_weights, scene)

    f_classify = jax.jit(lambda lw, fw: C.classify(grid, lw, fw, params))
    cls = timed("classify (all)", f_classify, lw, fw)

    # classify sub-stages
    @jax.jit
    def f_labels(lw, fw):
        cl = C.classify_cells(lw, fw)
        cl = C.construct_reduced_regions(cl, lw, params)
        return cl

    cell_labels = timed("  cell labels+bands", f_labels, lw, fw)

    cc_iters = 4 * params.tile_size if params.do_tile else sum(grid.res)
    f_cc = jax.jit(lambda cl, lw: C.connected_components(cl, lw, cc_iters))
    comp = timed("  connected_components (device)", f_cc, cell_labels, lw)

    f_cpt = jax.jit(lambda comp: C.compact_regions(comp, max_regions))
    _ = timed("  compact_regions", f_cpt, comp)

    cell_region, region_valid, n_regions, overflow = f_cpt(comp)
    f_fixb = jax.jit(lambda cl, cr: C.fix_region_boundaries(cl, cr, params.region_fix_max_iters))
    _ = timed("  fix_region_boundaries", f_fixb, cell_labels, cell_region)

    cell_labels2, cell_region2 = f_fixb(cell_labels, cell_region)
    f_small = jax.jit(lambda cl, cr, rv: C.fix_small_regions(cl, cr, rv, max_regions))
    _ = timed("  fix_small_regions", f_small, cell_labels2, cell_region2, region_valid)
    cell_labels3, cell_region3, region_valid3 = f_small(cell_labels2, cell_region2, region_valid)

    if params.do_tile or params.cube_regions:
        f_cube = jax.jit(
            lambda cl, cr, rv: C.enforce_one_region_per_cube(cl, cr, rv, params.tile_size, max_regions)
        )
        _ = timed("  enforce_one_region_per_cube", f_cube, cell_labels3, cell_region3, region_valid3)

    f_faces = jax.jit(lambda lw, fw: [C.classify_faces(lw, fw, a) for a in range(3)])
    _ = timed("  classify_faces(3)", f_faces, lw, fw)
    f_edges = jax.jit(lambda lw, fw: [C.classify_edges(lw, fw, e) for e in range(3)])
    _ = timed("  classify_edges(3)", f_edges, lw, fw)

    face_labels = f_faces(lw, fw)
    f_fri = jax.jit(
        lambda cl, cr, fls: [C.face_reduced_indices(cl, cr, fls[a], a) for a in range(3)]
    )
    _ = timed("  face_reduced_indices(3)", f_fri, cell_labels3, cell_region3, face_labels)

    f_asm = jax.jit(lambda scene, cls, lw, fw: assemble(grid, scene, cls, lw, fw, params, R))
    timed("assemble", f_asm, scene, cls, lw, fw)


if __name__ == "__main__":
    main()
