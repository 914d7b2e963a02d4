"""On-hardware Pallas numerics artifact (VERDICT r2 item 6).

Compares, on the real TPU backend (no interpret mode), the packed Pallas
apply kernels against the XLA reference apply on random PTau vectors:

  * apply_packed  (moments + expand + combine kernels)   vs XLA make_apply
  * apply_packed_pap (fused grid+mom+pap, finish+pap)    vs the same
  * the pAp partial sums                                 vs <x, Ax>
  * uniform variants (reduced off)

Writes TPU_PARITY.json at the repo root:
  {"device": ..., "cases": [{..., "max_rel_diff": ..., "pap_rel": ...}]}

Usage: python benchmarks/tpu_parity.py [--n 64] [--scene honey_coil]
"""
import argparse
import json
import os
import sys

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


def run_case(scene_name, n, tile, reduced, fused_check=False, untiled=False):
    from polystokes_tpu import SolverParams
    from polystokes_tpu.classify import classify, effective_max_regions
    from polystokes_tpu.pallas_apply import pack_ptau, unpack_ptau
    from polystokes_tpu.scenes import builders
    from polystokes_tpu.solver import (
        assemble,
        check_pallas,
        make_apply,
        make_apply_packed,
        make_apply_packed_pap,
    )
    from polystokes_tpu.weights import compute_weights

    params = SolverParams(
        do_reduced_regions=reduced, do_tile=not untiled, tile_size=tile, tile_padding=2,
        use_pallas=True, dtype=jnp.float32,
        **({"max_regions": 64} if untiled else {}),
    )
    grid, scene = getattr(builders, scene_name)(n=n, dtype=jnp.float32)
    params = check_pallas(grid, scene, params)
    if not params.use_pallas:
        return {"scene": scene_name, "n": n, "reduced": reduced, "skipped": "check_pallas fallback"}
    R = effective_max_regions(grid, params)
    lw, fw = compute_weights(grid, scene.surface_sdf, scene.collision_sdf, params.dtype)
    cls = classify(grid, lw, fw, params)
    asm, _ = assemble(grid, scene, cls, lw, fw, params, R)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((7,) + tuple(grid.res)), jnp.float32)
    from polystokes_tpu.deflation import packed_masks

    x = x * packed_masks(grid, cls, params.dtype)

    from polystokes_tpu.precision import precise_matmul

    apply_xla = jax.jit(precise_matmul(lambda c, a, v: pack_ptau(make_apply(grid, c, a, params, R)(unpack_ptau(v)))))
    apply_pk = jax.jit(precise_matmul(lambda c, a, v: make_apply_packed(grid, c, a, params, R)(v)))
    apply_pap = jax.jit(precise_matmul(lambda c, a, v: make_apply_packed_pap(grid, c, a, params, R)(v)))

    y_ref = np.asarray(apply_xla(cls, asm, x))
    y_pk = np.asarray(apply_pk(cls, asm, x))
    y_fused, pap = apply_pap(cls, asm, x)
    y_fused = np.asarray(y_fused)
    scale = max(float(np.max(np.abs(y_ref))), 1e-30)
    pap_ref = float(np.sum(np.asarray(x) * y_ref))
    rec = {
        "scene": scene_name, "n": n, "tile": tile, "reduced": reduced, "untiled": untiled,
        "apply_scale": scale,
        "packed_vs_xla_max_rel": float(np.max(np.abs(y_pk - y_ref))) / scale,
        "fused_pap_vs_xla_max_rel": float(np.max(np.abs(y_fused - y_ref))) / scale,
        "pap_rel_err": abs(float(pap) - pap_ref) / max(abs(pap_ref), 1e-30),
    }

    if fused_check:
        # end-to-end fused finish+update path: a 25-iteration capped solve
        # with fuse_update on vs off must agree on hardware (exercises
        # finish_update_packed / cg_update_packed incl. the -sum(mom*v)
        # pAp identity inside the live CG loop).  Wrapped in its own try
        # so a flake here never discards the already-measured apply parity
        # above (an infra failure becomes fused_update_skipped).
        try:
            from polystokes_tpu import step
            from polystokes_tpu.config import PreconditionerType

            pc = params.replace(
                max_iterations=25, bicgstab_fallback=False, keep_non_converged=True,
                preconditioner=PreconditionerType.CELL_ARROW,
            )
            v0, _, s0 = step(grid, scene, pc.replace(fuse_update=False))
            v1, _, s1 = step(grid, scene, pc.replace(fuse_update=True))
            vs = max(float(np.max(np.abs(np.asarray(v0[0])))), 1e-30)
            rec["fused_update_vel_max_rel"] = max(
                float(np.max(np.abs(np.asarray(v1[a]) - np.asarray(v0[a])))) for a in range(3)
            ) / vs
            e0, e1 = float(s0["error"]), float(s1["error"])
            rec["fused_update_err_rel"] = abs(e1 - e0) / max(e0, 1e-30)
        except Exception as e:  # noqa: BLE001
            if not _is_infra_error(e):
                raise
            rec["fused_update_skipped"] = f"{type(e).__name__}: {e}"[:200]
    return rec


def _is_infra_error(e: Exception) -> bool:
    """Identifiable remote-tunnel / compile-service flakes (retryable infra,
    not numerics): anything else should surface as a real failure."""
    msg = f"{type(e).__name__}: {e}".lower()
    return any(
        s in msg
        for s in (
            "remote_compile", "compile service", "deadline exceeded",
            "unavailable", "socket", "connection", "grpc", "tunnel",
            # NOTE: deliberately NOT 'internal: ' / 'resource exhausted' —
            # a genuine XLA INTERNAL compile bug or on-device OOM is a
            # real failure, not a retryable tunnel flake
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "TPU_PARITY.json"))
    args = ap.parse_args()

    dev = jax.devices()[0]
    cases = []
    for scene, n, tile, reduced, fused_check, untiled in [
        ("honey_coil", args.n, 8, True, True, False),
        ("honey_coil", args.n, 8, False, False, False),
        ("jelly_jam", 32, 8, True, False, False),
        ("honey_coil", 128, 16, True, True, False),
        # round-3 operator changes, verified on hardware: the untiled
        # cube-aligned packed path and the solid-cut ffw transpose fix
        ("honey_coil", args.n, 16, True, False, True),
        ("conveyor_belt", args.n, 16, True, False, False),
    ]:
        print(f"case {scene} n={n} tile={tile} reduced={reduced} untiled={untiled} ...", flush=True)
        try:
            rec = run_case(scene, n, tile, reduced, fused_check=fused_check, untiled=untiled)
        except Exception as e:  # noqa: BLE001
            # only identifiable infra flakes become "skipped"; a genuine
            # operator crash or numerics failure must fail the artifact
            tag = "skipped" if _is_infra_error(e) else "error"
            rec = {"scene": scene, "n": n, "tile": tile, "reduced": reduced, "untiled": untiled,
                   tag: f"{type(e).__name__}: {e}"[:200]}
        print("  ", rec, flush=True)
        cases.append(rec)

    measured = [c for c in cases if "packed_vs_xla_max_rel" in c]
    skipped = [c for c in cases if "skipped" in c]
    errored = [c for c in cases if "error" in c]
    # ok requires at least one measured case: all-skipped must not read
    # as a vacuous pass
    ok = not errored and len(measured) > 0 and all(
        c["packed_vs_xla_max_rel"] < 1e-4
        and c["fused_pap_vs_xla_max_rel"] < 1e-4
        and c["pap_rel_err"] < 1e-3
        and c.get("fused_update_vel_max_rel", 0.0) < 5e-3
        for c in measured
    )
    notes = []
    if skipped:
        notes.append(f"{len(skipped)} case(s) skipped on identifiable infra flakes (see 'skipped' fields)")
    for c in measured:
        if "fused_update_skipped" in c:
            notes.append(f"fused_update check skipped for {c['scene']} n={c['n']} (infra flake); apply parity measured")
    payload = {
        "device": str(dev), "backend": jax.default_backend(), "ok": ok,
        "measured_count": len(measured), "skipped_count": len(skipped), "error_count": len(errored),
        "notes": notes, "cases": cases,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"ok": ok, "out": args.out}))


if __name__ == "__main__":
    main()
