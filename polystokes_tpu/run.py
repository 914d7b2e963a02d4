"""CLI driver: run one or more Stokes solves on a built-in scene.

    python -m polystokes_tpu.run --scene honey_coil --n 64 --steps 1 \
        --tile-size 16 --tile-padding 2 --tolerance 1e-3 \
        [--uniform] [--params params.json] [--export-prefix out/run.] \
        [--checkpoint out/ck.npz] [--resume out/ck.npz] [--profile]

The analog of driving the reference node from a Houdini scene: the same
knobs (exec/HDK_PolyStokes.C:86-220) exposed as flags, stats printed per
step (printStats parity), optional operator/grid export and checkpointing.
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", default="honey_coil", help="scene builder name")
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--steps", type=int, default=1)
    p.add_argument("--viscosity", type=float, default=None)
    p.add_argument("--dt", type=float, default=None)
    p.add_argument("--tile-size", type=int, default=16)
    p.add_argument("--tile-padding", type=int, default=2)
    p.add_argument("--liquid-band", type=int, default=2)
    p.add_argument("--solid-band", type=int, default=2)
    p.add_argument("--tolerance", type=float, default=1e-3)
    p.add_argument("--max-iterations", type=int, default=5000)
    p.add_argument("--uniform", action="store_true", help="disable reduced regions")
    p.add_argument("--no-tile", action="store_true")
    p.add_argument("--affine", action="store_true", help="11-DOF affine basis")
    p.add_argument("--fp64", action="store_true")
    p.add_argument("--precond", default="identity",
                   choices=["identity", "diagonal", "cell_arrow", "multigrid", "region_arrow"],
                   help="device preconditioner (PreconditionerType)")
    p.add_argument("--diag-precond", action="store_true", help="alias for --precond diagonal")
    p.add_argument("--deflation", action="store_true",
                   help="A-DEF2 two-level deflation on top of the preconditioner")
    p.add_argument("--deflation-tile", type=int, default=0,
                   help="coarse cube size for --deflation (0 = tile size)")
    p.add_argument("--solver", default="pcg", choices=["pcg", "eigen"],
                   help="pcg = device matrix-free; eigen = host explicit path")
    p.add_argument("--scheme", default="pressure_stress",
                   choices=["pressure_stress", "all_dofs", "pressure_velocity",
                            "all_dofs_explicit_interior_stress"],
                   help="matrix scheme for --solver eigen")
    p.add_argument("--pallas", action="store_true",
                   help="fused Pallas apply (pre-flight checked; falls back to XLA if the scene touches the domain box)")
    p.add_argument("--fuse-update", action="store_true",
                   help="fused CG update kernels (packed path; measured slower than XLA's BLAS1 fusion on v5e — see BENCH.md fusion study)")
    p.add_argument("--bf16-coeffs", action="store_true",
                   help="store the loop-constant coefficient stack in bfloat16 (kernel math stays f32; ~0.4%% operator rounding)")
    p.add_argument("--params", help="JSON file overriding SolverParams")
    p.add_argument("--export-prefix", help="export grids/components/stats with this prefix")
    p.add_argument("--export-mtx", action="store_true", help="MatrixMarket instead of npz")
    p.add_argument("--viz", action="store_true",
                   help="render exported grids to PNG slice maps (viz.py)")
    p.add_argument("--checkpoint", help="write a checkpoint npz after the run")
    p.add_argument("--resume", help="resume from a checkpoint npz")
    p.add_argument("--profile", action="store_true", help="per-stage instrumented run")
    p.add_argument("--sim", action="store_true",
                   help="frame loop: gravity + solve + grid semi-Lagrangian advection (sim.py)")
    p.add_argument("--flip", type=int, default=0, metavar="P",
                   help="frame loop with a P-particle FLIP transfer (flip.py; "
                   "the TPU-native stand-in for the reference's Houdini FLIP host loop)")
    p.add_argument("--gravity", type=float, default=-9.8)
    p.add_argument("--crop", action="store_true",
                   help="solve on the liquid's bounding box (domain.solve_cropped); implies --chunked")
    p.add_argument("--chunked", action="store_true",
                   help="chunked solve loop: K-iteration device segments with host "
                   "checks between (cancellable with Ctrl-C, reference opInterrupt parity)")
    p.add_argument("--segment-iters", type=int, default=500, help="iterations per chunk")
    p.add_argument("--max-seconds", type=float, default=None,
                   help="wall-clock budget for the chunked solve (partial result after)")
    p.add_argument("--solver-state", help="persist the Krylov state here after each segment")
    p.add_argument("--resume-solver", action="store_true",
                   help="resume the chunked solve from --solver-state")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import os

    import jax

    # honor JAX_PLATFORMS even when a sitecustomize preloaded jax and
    # forced its own platform list (the axon remote-TPU shim sets
    # "axon,cpu", which would initialize the remote backend — and hang
    # the CLI outright when the tunnel is down — despite the user asking
    # for cpu)
    env_plat = os.environ.get("JAX_PLATFORMS")
    if env_plat:
        jax.config.update("jax_platforms", env_plat)

    # persistent compilation cache: repeat CLI invocations skip the
    # (minutes-long) XLA compile
    cache_dir = os.environ.get("POLYSTOKES_COMPILE_CACHE", os.path.expanduser("~/.cache/polystokes_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - older jax
        pass
    if args.fp64:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from . import SolverParams, step
    from .config import BasisOrder, MatrixScheme, PreconditionerType, SolverType
    from .io.checkpoint import load_checkpoint, params_from_json, save_checkpoint
    from .scenes.builders import SCENES

    if args.resume:
        if not os.path.exists(args.resume):
            sys.exit(f"error: checkpoint not found: {args.resume}")
        # peek at the stored params to enable x64 before any conversion
        import numpy as np

        peek = params_from_json(str(np.load(args.resume)["params_json"]))
        if jnp.dtype(peek.dtype).itemsize == 8:
            jax.config.update("jax_enable_x64", True)
        grid, scene, params, start, _ = load_checkpoint(args.resume)
    else:
        dtype = jnp.float64 if args.fp64 else jnp.float32
        params = SolverParams(
            dtype=dtype,
            do_reduced_regions=not args.uniform,
            do_tile=not args.no_tile,
            tile_size=args.tile_size,
            tile_padding=args.tile_padding,
            liquid_boundary_layer_size=args.liquid_band,
            solid_boundary_layer_size=args.solid_band,
            tolerance=args.tolerance,
            max_iterations=args.max_iterations,
            basis=BasisOrder.AFFINE if args.affine else BasisOrder.QUADRATIC,
            preconditioner=PreconditionerType.DIAGONAL if args.diag_precond else PreconditionerType(args.precond),
            solver_type=SolverType.EIGEN if args.solver == "eigen" else SolverType.PCG_MATRIX_VECTOR_PRODUCTS,
            matrix_scheme=MatrixScheme(args.scheme),
            use_pallas=args.pallas,
            fuse_update=args.fuse_update,
            coeff_bf16=args.bf16_coeffs,
            deflation=args.deflation,
            deflation_tile=args.deflation_tile,
        )
        if args.params:
            with open(args.params) as f:
                params = params_from_json(f.read(), base=params)
        kw = {}
        if args.viscosity is not None:
            kw["viscosity"] = args.viscosity
        if args.dt is not None:
            kw["dt"] = args.dt
        if args.scene not in SCENES:
            sys.exit(f"error: unknown scene '{args.scene}' (available: {', '.join(sorted(SCENES))})")
        grid, scene = SCENES[args.scene](n=args.n, dtype=params.dtype, **kw)
        start = 0

    import dataclasses

    import jax

    from .solver import check_pallas, sample_density

    params = sample_density(scene, params)  # HDK_PolyStokes.C:290-304 parity
    params = check_pallas(grid, scene, params)

    if args.profile:
        from .profiling import print_stats, step_instrumented

        for k in range(start, start + args.steps):
            vel, valid, stats = step_instrumented(grid, scene, params)
            print(f"step {k}:")
            print_stats(stats)
            scene = dataclasses.replace(scene, velocity=vel)
    elif args.chunked or args.crop:
        from .solver import solve_chunked

        if args.crop:
            from .domain import solve_cropped as solve_chunked  # noqa: F811

        for k in range(start, start + args.steps):
            t0 = time.perf_counter()

            def progress(s):
                print(f"  segment done: iters={s['iterations']}  rre={s['rre']:.3e}", flush=True)
                return False

            vel, valid, stats = solve_chunked(
                grid, scene, params,
                segment_iters=args.segment_iters,
                max_seconds=args.max_seconds,
                callback=progress,
                state_path=args.solver_state,
                resume=args.resume_solver,
            )
            import jax as _jax

            _jax.block_until_ready(vel)
            print(
                f"step {k}: {time.perf_counter()-t0:.3f}s  iters={int(stats['iterations'])}"
                f"  err={float(stats['error']):.3e}  converged={bool(stats['converged'])}"
                f"  interrupted={stats['interrupted']}  regions={int(stats['n_regions'])}"
            )
            scene = dataclasses.replace(scene, velocity=vel)
    elif params.solver_type == SolverType.EIGEN:
        from .host_solve import solve_host

        for k in range(start, start + args.steps):
            t0 = time.perf_counter()
            vel, valid, stats = solve_host(grid, scene, params)
            print(
                f"step {k}: {time.perf_counter()-t0:.3f}s  scheme={stats['scheme']}"
                f"  converged={bool(stats['converged'])}  regions={int(stats['n_regions'])}"
            )
            scene = dataclasses.replace(scene, velocity=vel)
    elif args.flip:
        from .flip import seed_particles, flip_frame

        state = seed_particles(grid, scene.surface_sdf, args.flip, dtype=params.dtype)
        print(f"seeded {int(jnp.sum(state.alive))} / {args.flip} particles")
        for k in range(start, start + args.steps):
            t0 = time.perf_counter()
            scene, state, stats = flip_frame(grid, scene, state, params, gravity=args.gravity)
            jax.block_until_ready(scene.velocity[0])
            print(
                f"frame {k}: {time.perf_counter()-t0:.3f}s  iters={int(stats['iterations'])}"
                f"  err={float(stats['error']):.3e}  converged={bool(stats['converged'])}"
                f"  regions={int(stats['n_regions'])}"
            )
    elif args.sim:
        from .sim import cfl_substeps, simulate_frame

        for k in range(start, start + args.steps):
            t0 = time.perf_counter()
            substeps = cfl_substeps(scene.velocity, float(scene.dt) / grid.dx)
            scene, stats = simulate_frame(grid, scene, params, gravity=args.gravity, substeps=substeps)
            jax.block_until_ready(scene.velocity[0])
            print(
                f"frame {k}: {time.perf_counter()-t0:.3f}s  iters={int(stats['iterations'])}"
                f"  err={float(stats['error']):.3e}  converged={bool(stats['converged'])}"
                f"  regions={int(stats['n_regions'])}"
            )
    else:
        fn = jax.jit(lambda s: step(grid, s, params))
        for k in range(start, start + args.steps):
            t0 = time.perf_counter()
            vel, valid, stats = fn(scene)
            jax.block_until_ready(vel)
            print(
                f"step {k}: {time.perf_counter()-t0:.3f}s  iters={int(stats['iterations'])}"
                f"  err={float(stats['error']):.3e}  converged={bool(stats['converged'])}"
                f"  regions={int(stats['n_regions'])}"
            )
            scene = dataclasses.replace(scene, velocity=vel)

    # exports: the CLI flag takes precedence, otherwise the SolverParams
    # export knobs drive what gets written (exportMatrices /
    # exportComponentMatrices / exportStats toggles, HDK_PolyStokes.C:189-206)
    want_any = args.export_prefix or params.export_matrices or params.export_component_matrices or params.export_stats
    if want_any:
        prefix = args.export_prefix or params.export_prefix
        from .classify import classify, effective_max_regions
        from .export import ExplicitOperators, export_component_matrices, export_grids, export_stats
        from .solver import assemble
        from .weights import compute_weights

        R = effective_max_regions(grid, params)
        lw, fw = compute_weights(grid, scene.surface_sdf, scene.collision_sdf, params.dtype)
        cls = classify(grid, lw, fw, params)
        asm, _ = assemble(grid, scene, cls, lw, fw, params, R)
        ops = ExplicitOperators(grid, cls, asm, params, weights=(lw, fw), viscosity=scene.viscosity)
        fmt = "mtx" if args.export_mtx else "npz"
        if args.export_prefix or params.export_matrices:
            export_grids(prefix, cls, lw, fw)
        if args.export_prefix or params.export_component_matrices:
            export_component_matrices(prefix, ops, fmt=fmt)
        if args.export_prefix or params.export_stats:
            export_stats(prefix, {k: v for k, v in stats.items()})
        print(f"exported to {prefix}*")
        if args.viz:
            from .viz import render_npz

            for f in render_npz(prefix + "grids.npz"):
                print(f"rendered {f}")

    if args.checkpoint:
        save_checkpoint(args.checkpoint, grid, scene, params, start + args.steps)
        print(f"checkpoint written to {args.checkpoint}")


if __name__ == "__main__":
    main()
