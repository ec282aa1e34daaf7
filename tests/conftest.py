"""Test harness configuration.

Tests run on the JAX CPU backend with 8 virtual devices so the sharded
(shard_map / all-gather) paths are exercised without a TPU slice
(SURVEY.md §4.3).  Must run before any ``import jax`` in the test tree.
Benchmarks (bench.py) do NOT import this and use the real TPU.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize (TPU tunnel) calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start,
# clobbering JAX_PLATFORMS from the environment — override it back and drop
# any backends it may have initialized, otherwise the whole test suite
# silently runs on the single tunneled TPU chip.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends

    from jax._src import xla_bridge as _xb
    if _xb.backends_are_initialized():
        clear_backends()
except Exception:
    pass

assert jax.device_count() == 8, f"expected 8 virtual CPU devices, got {jax.devices()}"

# make the repo root importable regardless of pytest rootdir
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running (multi-process) tests")
