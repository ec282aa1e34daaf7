"""BASELINE config 2: 1-mismatch inexact search, 100bp reads vs phiX +
E. coli scale (5.4 Mbp), batched beam width 8."""

import os
import numpy as np
from common import cached_index, report, sample_reads, setup_jax, timeit

N = int(os.environ.get("HSA_BENCH_C2_BP", "5386000"))
B = int(os.environ.get("HSA_BENCH_BATCH", "16384"))
L = 100
W = 8


def main():
    jax = setup_jax()
    import jax.numpy as jnp
    from hsa_tpu.config import AlnOpt
    from hsa_tpu.search.beam import beam_search
    from hsa_tpu.search.widths import cal_width_device

    di, text = cached_index("phix_ecoli_5M4", N)
    dev = di.as_jax()
    opt = AlnOpt(max_diff=1, max_gapo=0)
    fwd = sample_reads(text, B, L, n_mm=1)
    lens = np.full(B, L, np.int32)
    md = np.full(B, 1, np.int32)

    from hsa_tpu.search.jitcache import jit_over_idx

    def _step(ix, rf, ln, md):
        D = cal_width_device(ix, rf, ln)
        return beam_search(ix, rf, ln, D, md, opt, beam_width=W, max_hits=8)

    step = jit_over_idx(dev, _step)

    dt, res = timeit(step, jnp.asarray(fwd), jnp.asarray(lens), jnp.asarray(md))
    from hsa_tpu.search.adaptive import finalize_any
    res = finalize_any(res, opt.s_mm)
    mapped = float(np.asarray(res.hit_valid).any(axis=1).mean())
    report("onemm_reads_per_s", B / dt, "reads/s",
           genome_mbp=round(N / 1e6, 1), batch=B, beam_width=W,
           mapped_frac=round(mapped, 4), batch_ms=round(dt * 1e3, 1),
           overflow_reads=int((np.asarray(res.n_live_dropped) > 0).sum()))


if __name__ == "__main__":
    main()
