"""Test harness: force the CPU backend (8 virtual devices) with fp64.

The container's sitecustomize imports jax at interpreter start with
JAX_PLATFORMS=axon (remote TPU compile), so setting os.environ here is too
late for the env-var path — use jax.config.update, which takes effect as
long as no backend has been initialized yet.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# XLA:CPU's optimization pipeline takes minutes on the full-step graph;
# tests check numerics, not speed (exact arithmetic either way).  Set
# POLYSTOKES_TEST_FULL_OPT=1 to run with the full pipeline.
if os.environ.get("POLYSTOKES_TEST_FULL_OPT") != "1":
    try:
        jax.config.update("jax_disable_most_optimizations", True)
    except Exception:  # noqa: BLE001 - older jax
        pass


# ---------------------------------------------------------------------------
# Quick tier: `pytest -m quick` runs one small case per oracle family in a
# few minutes (the full suite is ~75 min serial on the 1-core container).
# ---------------------------------------------------------------------------

_QUICK = (
    "test_basis.py",
    "test_monomials.py",
    "test_linalg.py",
    "test_weights.py",
    "test_classify.py",
    "test_one_region_per_cube.py",
    "test_native.py",
    "test_io_cli.py::test_checkpoint_roundtrip",
    "test_operators.py::test_apply_and_rhs_match_oracle[reduced]",
    "test_step.py::test_step_smoke_and_stats",
    "test_precond.py::test_cell_arrow_is_symmetric",
)


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        nid = item.nodeid.split("/")[-1]
        if any((("::" in q and nid == q) or ("::" not in q and nid.startswith(q + "::"))) for q in _QUICK):
            item.add_marker(pytest.mark.quick)
