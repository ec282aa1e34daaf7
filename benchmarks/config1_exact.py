"""BASELINE config 1: exact-match backward search, 100bp reads vs E. coli
K-12 scale (4.6 Mbp), replicated FM-index, single chip."""

import os
import numpy as np
from common import cached_index, report, sample_reads, setup_jax, timeit

N = int(os.environ.get("HSA_BENCH_C1_MBP", "4600000"))
B = int(os.environ.get("HSA_BENCH_BATCH", "16384"))
L = 100


def main():
    jax = setup_jax()
    import jax.numpy as jnp
    from hsa_tpu.search.exact import exact_search, locate_all

    di, text = cached_index("ecoli_4M6", N, with_reverse=False)
    dev = di.as_jax()
    fwd = sample_reads(text, B, L)
    reads_rev = fwd[:, ::-1].copy()
    lens = np.full(B, L, np.int32)

    from hsa_tpu.search.jitcache import jit_over_idx

    def _step(ix, rr, ln):
        k, l, m = exact_search(ix, rr, ln)
        pos, cnt = locate_all(ix, k, l, m, cap=1)
        return k, l, m, pos

    step = jit_over_idx(dev, _step)

    dt, (k, l, m, pos) = timeit(step, jnp.asarray(reads_rev), jnp.asarray(lens))
    report("exact_reads_per_s", B / dt, "reads/s",
           genome_mbp=N // 1_000_000, batch=B,
           matched_frac=round(float(np.asarray(m).mean()), 4),
           batch_ms=round(dt * 1e3, 1))


if __name__ == "__main__":
    main()
