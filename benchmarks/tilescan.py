import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json, os, sys, time
import jax
cache_dir = os.path.expanduser("~/.cache/polystokes_xla")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from polystokes_tpu import SolverParams, step
from polystokes_tpu.config import PreconditionerType
from polystokes_tpu.scenes.builders import honey_coil

tile = int(sys.argv[1])
cap = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
pallas = os.environ.get("PALLAS", "0") == "1"
params = SolverParams(
    dtype=jnp.float32, do_reduced_regions=True, do_tile=True,
    tile_size=tile, tile_padding=2, tolerance=1e-3, max_iterations=cap,
    bicgstab_fallback=False, preconditioner=PreconditionerType.CELL_ARROW,
    use_pallas=pallas,
)
grid, scene = honey_coil(n=128, dtype=jnp.float32)
fn = jax.jit(lambda s: step(grid, s, params))
t0 = time.perf_counter()
vel, valid, stats = fn(scene); jax.block_until_ready(vel)
c = time.perf_counter() - t0
t0 = time.perf_counter()
vel, valid, stats = fn(scene); jax.block_until_ready(vel)
t = time.perf_counter() - t0
print(json.dumps({"tile": tile, "iters": int(stats["iterations"]), "err": float(stats["error"]),
                  "converged": bool(stats["converged"]), "regions": int(stats["n_regions"]),
                  "step_s": round(t, 3), "compile_s": round(c, 1),
                  "n_p": int(stats["n_pressures"]), "n_tau": int(stats["n_stresses"])}))
