"""Test harness configuration.

Tests run CPU-only with 8 virtual XLA devices so multi-chip sharding paths
(parallel/) compile and execute without TPU hardware.  Must set env vars
before the first jax import.
"""

import os
import sys

# Force CPU even when a TPU platform is configured in the ambient env:
# tests must be fast, deterministic, and hardware-independent.
os.environ["JAX_PLATFORMS"] = "cpu"

# Single-threaded BLAS/OpenMP: this box exposes 1 CPU and torch's OpenMP
# pool deadlocks against XLA's thread pool otherwise.
os.environ["OMP_NUM_THREADS"] = "1"
os.environ["MKL_NUM_THREADS"] = "1"

try:
    import torch

    torch.set_num_threads(1)
except ImportError:
    pass

# XLA:CPU's async dispatch intermittently deadlocks against torch's thread
# pool on single-CPU machines (jax.Array.__array__ blocks forever in
# _value).  Synchronous dispatch avoids it; tests are tiny anyway.
import jax

jax.config.update("jax_cpu_enable_async_dispatch", False)

# The jaxtyping pytest plugin imports jax BEFORE this conftest executes, so
# JAX_PLATFORMS from os.environ came too late for jax.config — force the
# platform through the config (backends are still uninitialized here).
jax.config.update("jax_platforms", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_LIB = "/root/reference/lib"


def add_reference_to_path():
    """Make the upstream PyTorch reference importable for golden-value
    parity tests (read-only; used purely as a numerical oracle)."""
    if not os.path.isdir(REFERENCE_LIB):
        return False
    if REFERENCE_LIB not in sys.path:
        sys.path.insert(0, REFERENCE_LIB)
    # the reference imports json_tricks, absent here; a plain-json shim
    # suffices for the calibration files the tests touch
    if "json_tricks" not in sys.modules:
        import json
        import types

        shim = types.ModuleType("json_tricks")
        shim.load = json.load
        shim.loads = json.loads
        shim.dump = json.dump
        shim.dumps = json.dumps
        sys.modules["json_tricks"] = shim
    return True
