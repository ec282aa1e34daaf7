"""BASELINE config 3: full gapped inexact search (mismatch+indel budget) vs
human chr21 scale (46 Mbp), 1 host."""

import os
import numpy as np
from common import cached_index, report, sample_reads, setup_jax, timeit

N = int(os.environ.get("HSA_BENCH_C3_BP", "46700000"))
B = int(os.environ.get("HSA_BENCH_BATCH", "8192"))
L = 100
W = int(os.environ.get("HSA_BENCH_BEAM_W", "64"))


def main():
    jax = setup_jax()
    import jax.numpy as jnp
    from hsa_tpu.config import AlnOpt
    from hsa_tpu.search.beam import beam_search
    from hsa_tpu.search.widths import cal_width_device

    di, text = cached_index("chr21_46M", N)
    dev = di.as_jax()
    opt = AlnOpt()  # fnr budgets, gaps enabled (defaults)
    fwd = sample_reads(text, B, L, n_mm=2, indel=True)
    lens = np.full(B, L, np.int32)
    md = np.full(B, opt.diff_budget(L), np.int32)

    from hsa_tpu.search.jitcache import jit_over_idx

    def _step(ix, rf, ln, md):
        D = cal_width_device(ix, rf, ln)
        return beam_search(ix, rf, ln, D, md, opt, beam_width=W, max_hits=16)

    step = jit_over_idx(dev, _step)

    dt, res = timeit(step, jnp.asarray(fwd), jnp.asarray(lens), jnp.asarray(md))
    from hsa_tpu.search.adaptive import finalize_any
    res = finalize_any(res, opt.s_mm)
    mapped = float(np.asarray(res.hit_valid).any(axis=1).mean())
    report("gapped_reads_per_s", B / dt, "reads/s",
           genome_mbp=round(N / 1e6, 1), batch=B, beam_width=W,
           max_diff=int(md[0]), mapped_frac=round(mapped, 4),
           batch_ms=round(dt * 1e3, 1))


if __name__ == "__main__":
    main()
