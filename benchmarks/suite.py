#!/usr/bin/env python
"""Benchmark suite over the BASELINE.json comparison configs:

  1. uniform 64^3 viscous_beam (reduced off), tol 1e-6 criterion
  2. single large reduced region (do_tile off), honey_coil 64^3
  3. tiled reduced honey_coil 128^3 (tile 16 pad 2) — the headline
  4. solid-coupled conveyor_belt 64^3 (moving collider)
  5. 256^3 tiled reduced armadillo_melt (production scale)
  6. uniform honey_coil 128^3 (A/B partner for 3/7)
  7. single-region reduced honey_coil 128^3 (untiled packed path —
     beats uniform on TPU wall-clock)
  8. uniform armadillo 256^3 (A/B partner for 5/9)
  9. single-region reduced armadillo 256^3
  10. tiled honey_coil 128^3, tile 32
  11. tiled honey_coil 128^3, tile 64
  12. tiled armadillo 256^3, tile 64 (the reference's best published tile,
      results/figures/Timings_ArmadilloDrop.png dark-blue curve)
  13. tiled armadillo 256^3, tile 128
  14. uniform armadillo_si 256^3 (SI parameters: the reference's own
      stiffness regime, lambda ~1.1e3 — configs 5/8/9 run at lambda
      ~2.7e4, 25x stiffer than any reference scene)
  15. single-region reduced armadillo_si 256^3
  16. tiled armadillo_si 256^3, tile 16
  17. tiled armadillo_si 256^3, tile 64
  18. tiled armadillo_si 256^3, tile 8 (the round-2 batched-LU-chunking
      record: 32^3 = 32768 cubes of [26, 26] through linalg._map_chunked)
  19. fp64 single-region honey_coil 64^3 (reference precision parity,
      units.h:21; XLA apply path + unrolled SPD Cholesky)
  20. tiled armadillo 256^3, tile 8 (toy-stiffness partner of 18)
  21-23. cropped armadillo_si 256^3 (uniform / single-region / tiled 16):
      the solve runs on the liquid's bounding box (domain.solve_cropped,
      ~208^3 of 256^3 — the domain fitting the reference's host app does)
  24-25. cropped toy armadillo 256^3 (single-region / uniform)

Runs with --precond other than cell_arrow record under a suffixed config
name so A/B preconditioner studies never overwrite the default records.

Writes BENCH_SUITE.json (list of per-config records) — the analog of the
reference's armadillo timing figures (results/figures/Timings_*.png).

Usage: python benchmarks/suite.py [--configs 1,2,3,4] [--iters-cap N]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_NAME_SUFFIX = ""  # set by main() for non-default preconditioner runs


def run_config(name, grid, scene, params, segment_iters=1000, crop=False):
    import jax

    from polystokes_tpu.solver import check_pallas, sample_density, solve_chunked

    if crop:
        from polystokes_tpu.domain import solve_cropped as solve_chunked  # noqa: F811

    name = name + _NAME_SUFFIX
    params = sample_density(scene, params)
    params = check_pallas(grid, scene, params)

    # chunked solve: every device execution stays bounded (the remote
    # tunnel kills single calls past ~4 minutes — a converged 256^3 run
    # only finishes as segments), and Ctrl-C between segments keeps the
    # partial record
    def call():
        import jax.numpy as jnp

        out = solve_chunked(grid, scene, params, segment_iters=segment_iters)
        # axon: block_until_ready can return before execution has drained;
        # a host scalar fetch forces the final executable to finish
        float(jnp.sum(out[0][0]))
        return out

    t0 = time.perf_counter()
    vel, valid, stats = call()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    vel, valid, stats = call()
    step_s = time.perf_counter() - t0
    iters = int(stats["iterations"])
    rec = {
        "config": name,
        "res": list(grid.res),
        "step_s": round(step_s, 4),
        "s_per_iteration": round(step_s / max(iters, 1), 6),
        "iterations": iters,
        "error": float(stats["error"]),
        "converged": bool(stats["converged"]),
        "n_regions": int(stats["n_regions"]),
        "n_pressures": int(stats["n_pressures"]),
        "n_active_velocities": int(stats["n_active_velocities"]),
        "n_stresses": int(stats["n_stresses"]),
        "compile_s": round(compile_s, 1),
    }
    if "crop" in stats:
        rec["crop_res"] = list(stats["crop"]["res"])
    print(json.dumps(rec), flush=True)
    # merge into BENCH_SUITE.json immediately — a crash in a later config
    # must not lose completed records
    _merge_records([rec])
    return rec


def _merge_records(records):
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_SUITE.json")
    existing = []
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    names = {r["config"] for r in records}
    existing = [r for r in existing if r.get("config") not in names]
    with open(out, "w") as f:
        json.dump(existing + records, f, indent=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4,5,6,7,8,9")
    ap.add_argument("--iters-cap", type=int, default=20000)
    ap.add_argument("--precond", default="cell_arrow")
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--deflation", action="store_true")
    ap.add_argument("--deflation-tile", type=int, default=0)
    args = ap.parse_args()
    want = {int(c) for c in args.configs.split(",")}

    import jax

    if 19 in want:
        # x64 is process-global: mixing config 19 with f32 configs would
        # silently change dtype promotion (and timings) of whatever runs
        # after it.  Run it alone (the queue scripts already do).
        assert want == {19}, "config 19 (fp64) must run in its own process: --configs 19"
        jax.config.update("jax_enable_x64", True)

    cache_dir = os.environ.get("POLYSTOKES_COMPILE_CACHE", os.path.expanduser("~/.cache/polystokes_xla"))
    try:
        # honor JAX_PLATFORMS even when sitecustomize preloaded jax with the
        # axon platform list (see run.py)
        import os as _os

        if _os.environ.get("JAX_PLATFORMS"):
            jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

    import jax.numpy as jnp

    from polystokes_tpu import SolverParams
    from polystokes_tpu.scenes.builders import armadillo_melt, conveyor_belt, honey_coil, viscous_beam

    from polystokes_tpu.config import PreconditionerType

    base = dict(
        dtype=jnp.float32, max_iterations=args.iters_cap, bicgstab_fallback=False,
        tolerance=1e-3, preconditioner=PreconditionerType(args.precond),
        use_pallas=not args.no_pallas,
        deflation=args.deflation, deflation_tile=args.deflation_tile,
    )
    records = []

    if args.precond != "cell_arrow":
        global _NAME_SUFFIX
        _NAME_SUFFIX = "_" + args.precond

    if 1 in want:
        grid, scene = viscous_beam(n=64, dtype=jnp.float32)
        p = SolverParams(**base, do_reduced_regions=False)
        records.append(run_config("uniform_viscous_beam_64", grid, scene, p))
    if 2 in want:
        grid, scene = honey_coil(n=64, dtype=jnp.float32)
        p = SolverParams(**base, do_reduced_regions=True, do_tile=False, max_regions=64)
        records.append(run_config("single_region_honey_coil_64", grid, scene, p))
    if 3 in want:
        grid, scene = honey_coil(n=128, dtype=jnp.float32)
        p = SolverParams(**base, do_reduced_regions=True, do_tile=True, tile_size=16, tile_padding=2)
        records.append(run_config("tiled_honey_coil_128", grid, scene, p))
    if 4 in want:
        grid, scene = conveyor_belt(n=64, dtype=jnp.float32)
        p = SolverParams(**base, do_reduced_regions=True, do_tile=True, tile_size=16, tile_padding=2)
        records.append(run_config("solid_coupled_conveyor_64", grid, scene, p))
    if 5 in want:
        # tile 16 at 256^3 runs the packed kernels with 16x8 blocks
        # (partial-cube y moments, pallas_apply._mom_block); the former
        # tile-8 [65536, 26, 26] batched-LU device fault is chunked away
        # in linalg._map_chunked
        grid, scene = armadillo_melt(n=256, dtype=jnp.float32)
        p = SolverParams(**base, do_reduced_regions=True, do_tile=True, tile_size=16, tile_padding=2)
        records.append(run_config("tiled_armadillo_256", grid, scene, p))
    if 6 in want:
        # uniform vs reduced on the same scene — the analog of the
        # reference's Timings_ArmadilloDrop uniform/reduced comparison
        grid, scene = honey_coil(n=128, dtype=jnp.float32)
        p = SolverParams(**base, do_reduced_regions=False)
        records.append(run_config("uniform_honey_coil_128", grid, scene, p))
    if 7 in want:
        # single-region reduced at the headline resolution: the untiled
        # packed path (cube-aligned general regions).  This is the
        # reduced configuration that beats uniform on TPU wall-clock.
        grid, scene = honey_coil(n=128, dtype=jnp.float32)
        p = SolverParams(**base, do_reduced_regions=True, do_tile=False, max_regions=64)
        records.append(run_config("single_region_honey_coil_128", grid, scene, p))
    if 8 in want:
        # production-scale A/B partner for config 5: uniform armadillo 256^3
        grid, scene = armadillo_melt(n=256, dtype=jnp.float32)
        p = SolverParams(**base, do_reduced_regions=False)
        records.append(run_config("uniform_armadillo_256", grid, scene, p))
    if 9 in want:
        # single-region reduced at production scale
        grid, scene = armadillo_melt(n=256, dtype=jnp.float32)
        p = SolverParams(**base, do_reduced_regions=True, do_tile=False, max_regions=64)
        records.append(run_config("single_region_armadillo_256", grid, scene, p))
    if 10 in want:
        grid, scene = honey_coil(n=128, dtype=jnp.float32)
        p = SolverParams(**base, do_reduced_regions=True, do_tile=True, tile_size=32, tile_padding=2)
        records.append(run_config("tiled_honey_coil_128_t32", grid, scene, p))
    if 11 in want:
        grid, scene = honey_coil(n=128, dtype=jnp.float32)
        p = SolverParams(**base, do_reduced_regions=True, do_tile=True, tile_size=64, tile_padding=2)
        records.append(run_config("tiled_honey_coil_128_t64", grid, scene, p))
    if 12 in want:
        # the reference's best published tile size (Timings_ArmadilloDrop)
        grid, scene = armadillo_melt(n=256, dtype=jnp.float32)
        p = SolverParams(**base, do_reduced_regions=True, do_tile=True, tile_size=64, tile_padding=2)
        records.append(run_config("tiled_armadillo_256_t64", grid, scene, p))
    if 13 in want:
        grid, scene = armadillo_melt(n=256, dtype=jnp.float32)
        p = SolverParams(**base, do_reduced_regions=True, do_tile=True, tile_size=128, tile_padding=2)
        records.append(run_config("tiled_armadillo_256_t128", grid, scene, p))
    if want & {14, 15, 16, 17, 18}:
        from polystokes_tpu.scenes.builders import armadillo_melt_si

        grid_si, scene_si = armadillo_melt_si(n=256, dtype=jnp.float32)
        if 14 in want:
            p = SolverParams(**base, do_reduced_regions=False)
            records.append(run_config("uniform_armadillo_si_256", grid_si, scene_si, p))
        if 15 in want:
            p = SolverParams(**base, do_reduced_regions=True, do_tile=False, max_regions=64)
            records.append(run_config("single_region_armadillo_si_256", grid_si, scene_si, p))
        if 16 in want:
            p = SolverParams(**base, do_reduced_regions=True, do_tile=True, tile_size=16, tile_padding=2)
            records.append(run_config("tiled_armadillo_si_256", grid_si, scene_si, p))
        if 17 in want:
            p = SolverParams(**base, do_reduced_regions=True, do_tile=True, tile_size=64, tile_padding=2)
            records.append(run_config("tiled_armadillo_si_256_t64", grid_si, scene_si, p))
        if 18 in want:
            p = SolverParams(**base, do_reduced_regions=True, do_tile=True, tile_size=8, tile_padding=2)
            records.append(run_config("tiled_armadillo_si_256_t8", grid_si, scene_si, p))
    if 19 in want:
        # fp64 end-to-end record (the reference runs double everywhere,
        # lib/include/units.h:21).  XLA apply path — the Pallas kernels are
        # f32; f64 batched factorization runs the unrolled SPD Cholesky
        # (linalg.solve_spd) on TPU's emulated doubles.
        grid, scene = honey_coil(n=64, dtype=jnp.float64)
        p = SolverParams(**{**base, "dtype": jnp.float64, "use_pallas": False},
                         do_reduced_regions=True, do_tile=False, max_regions=64)
        records.append(run_config("single_region_honey_coil_64_f64", grid, scene, p))
    if want & {21, 22, 23}:
        from polystokes_tpu.scenes.builders import armadillo_melt_si

        grid_si, scene_si = armadillo_melt_si(n=256, dtype=jnp.float32)
        if 21 in want:
            p = SolverParams(**base, do_reduced_regions=False)
            records.append(run_config("crop_uniform_armadillo_si_256", grid_si, scene_si, p, crop=True))
        if 22 in want:
            p = SolverParams(**base, do_reduced_regions=True, do_tile=False, max_regions=64)
            records.append(run_config("crop_single_region_armadillo_si_256", grid_si, scene_si, p, crop=True))
        if 23 in want:
            p = SolverParams(**base, do_reduced_regions=True, do_tile=True, tile_size=16, tile_padding=2)
            records.append(run_config("crop_tiled_armadillo_si_256", grid_si, scene_si, p, crop=True))
    if want & {24, 25}:
        if 24 in want:
            grid, scene = armadillo_melt(n=256, dtype=jnp.float32)
            p = SolverParams(**base, do_reduced_regions=True, do_tile=False, max_regions=64)
            records.append(run_config("crop_single_region_armadillo_256", grid, scene, p, crop=True))
        if 25 in want:
            grid, scene = armadillo_melt(n=256, dtype=jnp.float32)
            p = SolverParams(**base, do_reduced_regions=False)
            records.append(run_config("crop_uniform_armadillo_256", grid, scene, p, crop=True))
    if 20 in want:
        # tile-8 at production scale (round-2 ask): 32^3 = 32768 cubes of
        # [26, 26] through linalg._map_chunked
        grid, scene = armadillo_melt(n=256, dtype=jnp.float32)
        p = SolverParams(**base, do_reduced_regions=True, do_tile=True, tile_size=8, tile_padding=2)
        records.append(run_config("tiled_armadillo_256_t8", grid, scene, p))

    _merge_records(records)
    print("wrote BENCH_SUITE.json", flush=True)


if __name__ == "__main__":
    main()
