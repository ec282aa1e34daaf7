"""BASELINE config 5: sharded-BWT paired search at scale with the
all-gather/psum interval merge across N>=2 index shards.

On real multi-host slices this runs unchanged after
``hsa_tpu.dist.init_multihost``; in this single-chip environment it
executes on a virtual 8-device CPU mesh (JAX_PLATFORMS=cpu +
xla_force_host_platform_device_count=8) to exercise the full sharded
path, and reports scaling vs a 1-shard run of the same workload on the
same backend.
"""

import os

# must precede jax import
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import numpy as np
from common import cached_index, report, sample_reads, setup_jax, timeit

N = int(os.environ.get("HSA_BENCH_C5_MBP", "32")) * 1_000_000
B = int(os.environ.get("HSA_BENCH_PAIRS", "256"))
L = 150
W = 32


def main():
    jax = setup_jax(platform="cpu")
    import jax.numpy as jnp
    from hsa_tpu.config import AlnOpt
    from hsa_tpu.dist.mesh import ShardedIndex, make_mesh

    di, text = cached_index(f"c5_{N // 1_000_000}M", N)
    opt = AlnOpt(max_diff=2)
    fwd = sample_reads(text, 2 * B, L, n_mm=2)
    lens = np.full(2 * B, L, np.int32)
    md = np.full(2 * B, 2, np.int32)
    args = (jnp.asarray(fwd), jnp.asarray(lens), jnp.asarray(md))

    results = {}
    for n_shard in (1, 2, 4):
        n_data = min(2, 8 // n_shard)
        mesh = make_mesh(n_data, n_shard)
        sidx = ShardedIndex(di, mesh)
        width, beam = sidx.width_fn(), sidx.beam_fn(opt, beam_width=W, max_hits=8)

        def step(rf, ln, md):
            return beam(rf, ln, width(rf, ln), md)

        dt, res = timeit(step, *args, iters=2)
        results[n_shard] = dt
    base = results[1]
    report("sharded_pairs_per_s", B / results[4], "pairs/s",
           vs_baseline=base / results[4],
           genome_mbp=N // 1_000_000, pairs=B, backend="cpu-virtual-8dev",
           t_shard1_ms=round(results[1] * 1e3, 1),
           t_shard2_ms=round(results[2] * 1e3, 1),
           t_shard4_ms=round(results[4] * 1e3, 1))


if __name__ == "__main__":
    main()
