"""Headline benchmark: reads/s/chip, k=2 mismatches, 100bp reads.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Configuration mirrors the BASELINE north-star metric ("reads/s/chip at k=2
mismatches on human ref").  The environment has no network, so the genome
is synthetic i.i.d. random sequence (size below); random sequence has no
repeat structure, which makes it slightly *harder* than real genome for the
occ-gather path (no cache reuse) and slightly easier for the beam (fewer
multi-hits) — treated as a stand-in until a real reference is mountable.

Measurement discipline (docs/TPU_NOTES.md, round-2 honest re-baseline):
- ONE tiny device->host readback happens before any dispatch (a fresh
  process that queues work before its first readback executes that work
  ~10,000x slow);
- the whole per-batch step (width pass + adaptive ladder + locate) is ONE
  jitted function, so a batch costs one dispatch;
- timed iterations are chained by a data dependence through the previous
  iteration's output and the loop ends in a readback, so the reported wall
  time covers every queued execution honestly (block_until_ready lies on
  this backend; readbacks do not).

``vs_baseline``: BASELINE.json carries no published numbers (empty mount —
see BASELINE.md); the denominator is the documented stand-in constant
BASELINE_READS_PER_S = 2000 (single-threaded CPU lineage-class throughput
estimate for this config), so the ratio tracks round-over-round progress
against a fixed yardstick.
"""

import json
import os
import sys
import time

import numpy as np

GENOME_MBP = int(os.environ.get("HSA_BENCH_GENOME_MBP", "64"))
GENOME_MODEL = os.environ.get("HSA_BENCH_GENOME_MODEL", "iid")
SA_INTV = int(os.environ.get("HSA_BENCH_SA_INTV", "8"))
BATCH = int(os.environ.get("HSA_BENCH_BATCH", "32768"))
READ_LEN = 100
BEAM_W = int(os.environ.get("HSA_BENCH_BEAM_W", "64"))
# adaptive escalation ladder (same output quality as flat BEAM_W: reads
# that overflow a narrow beam re-run wider; "" disables)
LADDER = tuple(int(x) for x in os.environ.get("HSA_BENCH_LADDER", "8,64").split(",") if x)
ESC_FRAC = float(os.environ.get("HSA_BENCH_ESC", "0.34"))
MAX_HITS = 16
ITERS = int(os.environ.get("HSA_BENCH_ITERS", "8"))
BASELINE_READS_PER_S = 2000.0
CACHE = os.path.expanduser("~/.cache/hsa_tpu_bench")


def get_index():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from hsa_tpu.index.layout import DeviceIndex, build_device_index

    os.makedirs(CACHE, exist_ok=True)
    tag = "" if GENOME_MODEL == "iid" else f"_{GENOME_MODEL}"
    idx_path = os.path.join(CACHE, f"idx_{GENOME_MBP}M{tag}_v4b_s{SA_INTV}.npz")
    txt_path = os.path.join(CACHE, f"txt_{GENOME_MBP}M{tag}.npy")
    if os.path.exists(idx_path) and os.path.exists(txt_path):
        try:
            return DeviceIndex.load(idx_path), np.load(txt_path, mmap_mode="r")
        except ValueError:
            pass  # stale layout version: rebuild below
    n = GENOME_MBP * 1_000_000
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "benchmarks"))
    from common import synth_genome
    t = synth_genome(n, GENOME_MODEL)
    di = build_device_index(t, sa_intv=SA_INTV, with_reverse=True)
    di.save(idx_path)
    np.save(txt_path, t)
    return di, t


def main():
    import jax
    import jax.numpy as jnp

    os.makedirs(os.path.join(CACHE, "xla"), exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hsa_tpu.config import AlnOpt
    from hsa_tpu.search.widths import cal_width_device
    from hsa_tpu.search import fm
    from hsa_tpu.search.adaptive import ladder_core, primary_ranks
    from hsa_tpu.search.jitcache import split_idx, join_idx
    from hsa_tpu.pipeline import force_sync_mode

    force_sync_mode()  # MUST precede any dispatch (docs/TPU_NOTES.md)

    t0 = time.time()
    di, text = get_index()
    dev = di.as_jax()
    build_s = time.time() - t0

    rs = np.random.RandomState(1)
    n = di.n
    fwd = np.empty((BATCH, READ_LEN), np.uint8)
    for j in range(BATCH):
        p = rs.randint(0, n - READ_LEN)
        r = np.asarray(text[p:p + READ_LEN]).copy()
        for _ in range(2):  # k=2 planted mismatches
            q = rs.randint(0, READ_LEN)
            r[q] = (r[q] + rs.randint(1, 4)) % 4
        fwd[j] = r
    lens = np.full(BATCH, READ_LEN, np.int32)
    opt = AlnOpt(max_diff=2)
    fwd_j, lens_j = jnp.asarray(fwd), jnp.asarray(lens)
    md_j = jnp.full(BATCH, 2, jnp.int32)

    ladder = LADDER or (BEAM_W,)
    ESC = max(int(BATCH * ESC_FRAC), 1)
    arrays, meta_ = split_idx(dev)
    ENGINE = os.environ.get("HSA_BENCH_ENGINE", "pigeon")

    if ENGINE == "pigeon":
        from hsa_tpu.search import pigeon as pg
        from hsa_tpu.search.exact import kmer_table
        CC = 16
        KMER = int(os.environ.get("HSA_BENCH_KMER", "12"))
        FBCAP = max(BATCH // 64, 8)   # beam-fallback sub-batch capacity
        trows = jnp.asarray(pg.pack_text_rows(np.asarray(text)))
        kt_path = os.path.join(CACHE, f"kmer{KMER}_{GENOME_MBP}M_s{SA_INTV}.npz")
        if os.path.exists(kt_path):
            z = np.load(kt_path)
            tk, tl = jnp.asarray(z["tk"]), jnp.asarray(z["tl"])
        else:
            tk, tl = kmer_table(dev, KMER)
            np.savez(kt_path, tk=np.asarray(tk), tl=np.asarray(tl))
        TAIL = int(os.environ.get("HSA_BENCH_TAIL", "0")) or \
            pg.auto_anchor_tail(int(n), KMER)
        batch_np = pg.pack_pigeon_batch(list(fwd), n_seg=3,
                                        seed_len=opt.seed_len, kmer_k=KMER,
                                        anchor_tail=TAIL)
        pig_args = tuple(jnp.asarray(batch_np[k]) for k in
                         ("segs_rev", "seg_lens", "seg_off", "rw", "nmask",
                          "vmask", "seedmask", "lens"))
        seed_args = (tk, tl) + tuple(jnp.asarray(batch_np[k]) for k in
                                     ("kmer", "kmer_ok", "seg_short"))

        @jax.jit
        def aln_step(arrs, trows, segs_rev, seg_lens, seg_off, rw, nmask,
                     vmask, seedmask, plens, fwd, lens, md,
                     tk, tl, kmer, kmer_ok, seg_short):
            """Pigeonhole search + beam-ladder fallback, one dispatch."""
            idx = join_idx(meta_, arrs)
            res = pg.pigeon_search(idx, trows, segs_rev, seg_lens, seg_off,
                                   rw, nmask, vmask, seedmask, plens, md,
                                   opt, n_seg=3, cand_cap=CC,
                                   kmer_seed=(tk, tl, kmer, kmer_ok,
                                              seg_short))
            v2 = res.valid.reshape(BATCH, CC)
            nm2 = jnp.where(v2, res.nmm.reshape(BATCH, CC), 999)
            any_hit = v2.any(axis=1)
            best = nm2.min(axis=1) * opt.s_mm
            fb = res.fallback
            if opt.max_gapo > 0:  # gapped-window rule (single-strand bench)
                fb = fb | ~any_hit | (opt.s_gapo <= best + opt.s_mm)
            # beam-ladder fallback on the flagged sub-batch
            n_fb = fb.sum()
            sub = jnp.nonzero(fb, size=FBCAP, fill_value=BATCH)[0]
            sv = jnp.arange(FBCAP) < n_fb
            subf, subl = fwd[sub], jnp.where(sv, lens[sub], 0)
            D = cal_width_device(idx, subf, subl)
            lres = ladder_core(idx, subf, subl, D, md[sub], opt, ladder,
                               MAX_HITS, max(FBCAP // 4, 1), FBCAP)
            bpos = fm.locate(idx, primary_ranks(lres, n))
            braw = lres.raws[0]
            bmapped = braw.best_raw < jnp.uint32(0x10000)
            for raw, eidx, evalid in zip(lres.raws[1:], lres.esc_idx,
                                         lres.esc_valid):
                m2 = raw.best_raw < jnp.uint32(0x10000)
                bmapped = bmapped.at[eidx].set(jnp.where(evalid, m2,
                                                         bmapped[eidx]))
            # primary position: first valid pigeon slot, else beam locate
            slot = jnp.argmax(v2, axis=1)
            ppos = jnp.take_along_axis(res.pos.reshape(BATCH, CC),
                                       slot[:, None], axis=1)[:, 0]
            pos = ppos.at[sub].set(jnp.where(sv, bpos, ppos[sub]))
            mapped = (any_hit & ~fb).at[sub].set(
                jnp.where(sv, bmapped, (any_hit & ~fb)[sub]))
            lost = fb.at[sub].set(jnp.where(sv, False, fb[sub]))
            return pos, mapped, lost, n_fb

        step_args = (arrays, trows) + pig_args + (fwd_j, lens_j, md_j) + seed_args
        t0 = time.time()
        pos, mapped_v, lost_v, n_fb = aln_step(*step_args)
        _ = np.asarray(pos[:8])
        compile_s = time.time() - t0
    else:
        @jax.jit
        def aln_step(arrs, fwd, lens, md):
            """ONE dispatch per batch: width -> adaptive ladder -> locate."""
            idx = join_idx(meta_, arrs)
            D = cal_width_device(idx, fwd, lens)
            res = ladder_core(idx, fwd, lens, D, md, opt, ladder, MAX_HITS,
                              ESC, BATCH)
            pos = fm.locate(idx, primary_ranks(res, n))
            return res, pos

        t0 = time.time()
        res, pos = aln_step(arrays, fwd_j, lens_j, md_j)
        _ = np.asarray(pos[:8])
        compile_s = time.time() - t0

    # occ-gather microbench (chained scan; rate of the hot primitive)
    from jax import lax

    @jax.jit
    def occ_chain(arrs, p):
        idx = join_idx(meta_, arrs)

        def body(p, _):
            o = fm.occ_lt4_flat(idx, p)
            return (o[0] ^ o[3]) & jnp.uint32((1 << 25) - 1), None
        p, _ = lax.scan(body, p, None, length=32)
        return p

    Q = 1 << 20
    qs = jnp.asarray(np.random.RandomState(3).randint(0, n, Q).astype(np.uint32))
    o = occ_chain(arrays, qs)
    _ = np.asarray(o[:2])
    t0 = time.time()
    o = occ_chain(arrays, o)
    _ = np.asarray(o[:2])
    occ_dt = (time.time() - t0) / 32
    occ_qps = Q / occ_dt
    occ_gbps = Q * 36 / occ_dt / 1e9  # 32B row gather + 4B index read / query

    prof_dir = os.environ.get("HSA_BENCH_PROFILE")

    # timed loop: each iteration ends in a tiny readback (measured: queued
    # chaining of large steps runs ~45% SLOWER than per-call sync on this
    # backend; the ~28 ms readback RTT is the cheaper honest mode)
    if ENGINE == "pigeon":
        if prof_dir:
            with jax.profiler.trace(prof_dir):
                pos, mapped_v, lost_v, n_fb = aln_step(*step_args)
                _ = np.asarray(pos[:8])
        t0 = time.time()
        for _ in range(ITERS):
            pos, mapped_v, lost_v, n_fb = aln_step(*step_args)
            _ = np.asarray(pos[:8])
        dt = (time.time() - t0) / ITERS
        mapped = float(np.asarray(mapped_v).mean())
        overflow = float(np.asarray(lost_v).mean())
    else:
        if prof_dir:
            with jax.profiler.trace(prof_dir):
                res, pos = aln_step(arrays, fwd_j, lens_j, md_j)
                _ = np.asarray(pos[:8])
        t0 = time.time()
        for _ in range(ITERS):
            res, pos = aln_step(arrays, fwd_j, lens_j, md_j)
            _ = np.asarray(pos[:8])
        dt = (time.time() - t0) / ITERS

        from hsa_tpu.search.adaptive import finalize_any, LadderRawResult
        fin = finalize_any(LadderRawResult(*res) if not hasattr(res, "raws")
                           else res, opt.s_mm)
        mapped = float(np.asarray(fin.hit_valid).any(axis=1).mean())
        overflow = float((np.asarray(fin.n_live_dropped) > 0).mean())
    reads_per_s = BATCH / dt
    print(json.dumps({
        "metric": "reads_per_s_per_chip_k2_100bp",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 3),
        "genome_mbp": GENOME_MBP,
        "genome_model": GENOME_MODEL,
        "batch": BATCH,
        "engine": ENGINE,
        "beam_width": BEAM_W,
        "ladder": list(ladder),
        "esc_frac": ESC_FRAC,
        "mapped_frac": round(mapped, 4),
        "overflow_frac": round(overflow, 4),
        "batch_ms": round(dt * 1e3, 1),
        "occ_mqueries_per_s": round(occ_qps / 1e6, 1),
        "occ_effective_gbps": round(occ_gbps, 2),
        "compile_s": round(compile_s, 1),
        "index_load_s": round(build_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
