"""BASELINE config 3: full gapped inexact search (mismatch+indel budget) vs
human chr21 scale (46 Mbp), 1 host.

Round 3: runs the PRODUCTION path end-to-end — the pigeon engine with
one-run gapped device verify (fnr budget 5 -> 6 segments, gap runs up to
5) plus the beam ladder for structural fallbacks, through
Aligner.align_stream (pipelined host/device overlap), records included.
Round 2 ran the beam only at 7.8K reads/s; the gapped pigeon path is the
round-3 headline fix for this config.
"""

import os
import time
import numpy as np
from common import cached_index, report, sample_reads, setup_jax

N = int(os.environ.get("HSA_BENCH_C3_BP", "46700000"))
B = int(os.environ.get("HSA_BENCH_BATCH", "16384"))
L = 100
ITERS = int(os.environ.get("HSA_BENCH_ITERS", "4"))


def main():
    setup_jax()
    from hsa_tpu.config import AlnOpt
    from hsa_tpu.pipeline import Aligner, ReadBatch

    di, text = cached_index("chr21_46M", N)
    text = np.asarray(text, np.int8)
    opt = AlnOpt()  # fnr budgets, gaps enabled (defaults): md=5 at 100bp
    kdir = os.path.join(os.path.expanduser("~/.cache/hsa_tpu_bench"),
                        "idxdir_chr21_46M")
    os.makedirs(kdir, exist_ok=True)
    al = Aligner.from_arrays(di, text, opt=opt, ladder=[8, 64],
                             engine="auto", index_dir=kdir)
    fwd = sample_reads(text, B, L, n_mm=2, indel=True)
    reads = ReadBatch(fwd, np.full(B, L, np.int32))

    recs = al.align(reads, read_offset=0)   # warm/compile
    mapped = sum(1 for r in recs if not (r.flag & 4)) / len(recs)

    def batches():
        for it in range(ITERS):
            yield it * B, None, reads, None

    t0 = time.time()
    for _s, recs in al.align_stream(batches()):
        sam = "\n".join(r.to_sam() for r in recs)
        assert sam
    dt = (time.time() - t0) / ITERS
    report("gapped_reads_per_s", B / dt, "reads/s",
           genome_mbp=round(N / 1e6, 1), batch=B, engine="pigeon+gapped",
           scope="e2e 2-strand: pack+search+resolve+SAM",
           max_diff=int(opt.diff_budget(L)),
           mapped_frac=round(mapped, 4),
           fallback_frac=round(getattr(al, "last_fallback_frac", 0.0), 4),
           batch_ms=round(dt * 1e3, 1))


if __name__ == "__main__":
    main()
