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
