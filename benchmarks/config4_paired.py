"""BASELINE config 4: paired-end 150bp reads vs whole-human-scale genome,
FM-index sharded across 1 host.

"Whole human" is approximated at HSA_BENCH_C4_MBP (default 250 Mbp — a
chr1-scale synthetic genome; a 3.1 Gbp build is a one-time ~20 min SA-IS
run and can be enabled by env var when the round budget allows).  The
index is sharded over every local chip (shard axis = all devices, data=1
on a single-chip host).
"""

import os
import numpy as np
from common import cached_index, report, sample_reads, setup_jax, timeit

N = int(os.environ.get("HSA_BENCH_C4_MBP", "250")) * 1_000_000
B = int(os.environ.get("HSA_BENCH_PAIRS", "2048"))  # pairs
L = 150
W = int(os.environ.get("HSA_BENCH_BEAM_W", "64"))


def main():
    jax = setup_jax()
    import jax.numpy as jnp
    from hsa_tpu import alphabet
    from hsa_tpu.config import AlnOpt
    from hsa_tpu.dist.mesh import ShardedIndex, make_mesh

    di, text = cached_index(f"human_{N // 1_000_000}M", N)
    nd = len(jax.devices())
    mesh = make_mesh(1, nd)
    sidx = ShardedIndex(di, mesh)
    opt = AlnOpt(max_diff=2)

    rs = np.random.RandomState(3)
    isize = 400
    r1 = np.empty((B, L), np.uint8)
    r2 = np.empty((B, L), np.uint8)
    for j in range(B):
        p = rs.randint(0, N - isize - 1)
        frag = np.asarray(text[p:p + isize])
        r1[j] = frag[:L]
        r2[j] = alphabet.revcomp(frag[-L:].astype(np.int8))
    # both ends on both strands, as the real pipeline searches them
    rc1 = np.stack([alphabet.revcomp(r.astype(np.int8)) for r in r1]).astype(np.uint8)
    rc2 = np.stack([alphabet.revcomp(r.astype(np.int8)) for r in r2]).astype(np.uint8)
    fwd = np.concatenate([r1, r2, rc1, rc2], axis=0)
    lens = np.full(4 * B, L, np.int32)
    md = np.full(4 * B, 2, np.int32)

    width = sidx.width_fn()
    beam = sidx.beam_fn(opt, beam_width=W, max_hits=16)

    def step(rf, ln, md):
        D = width(rf, ln)
        return beam(rf, ln, D, md)

    dt, res = timeit(step, jnp.asarray(fwd), jnp.asarray(lens), jnp.asarray(md))
    from hsa_tpu.search.adaptive import finalize_any
    res = finalize_any(res, opt.s_mm)
    hv = np.asarray(res.hit_valid).any(axis=1)
    # an end is mapped if either its forward or revcomp search hit
    end_mapped = (hv[:2 * B] | hv[2 * B:]).mean()
    report("paired_pairs_per_s", B / dt, "pairs/s",
           genome_mbp=N // 1_000_000, pairs=B, read_len=L,
           n_shards=nd, mapped_end_frac=round(float(end_mapped), 4),
           batch_ms=round(dt * 1e3, 1))


if __name__ == "__main__":
    main()
