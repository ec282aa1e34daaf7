"""Test harness configuration.

Tests run on the JAX CPU backend with 8 virtual devices so the sharded
(shard_map / all-gather) paths are exercised without a TPU slice
(SURVEY.md §4.3).  Must run before any ``import jax`` in the test tree.
Benchmarks (bench.py) do NOT import this and use the real TPU.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# make the repo root importable regardless of pytest rootdir
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
