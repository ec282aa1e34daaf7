"""Pigeonhole seed-and-verify engine vs the branch-and-bound oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from hsa_tpu import alphabet
from hsa_tpu.config import AlnOpt
from hsa_tpu.fmcore import FMIndex, cal_width
from hsa_tpu.index.layout import build_device_index
from hsa_tpu.oracle.bnb import match_gap
from hsa_tpu.search.pigeon import (pack_pigeon_batch, pack_text_rows,
                                   pigeon_search, pigeon_occurrences,
                                   PigeonResult)


def make(n=20000, seed=11, sa_intv=8):
    t = np.random.RandomState(seed).randint(0, 4, size=n).astype(np.int8)
    ref = FMIndex.build(t, sa_intv=sa_intv)
    dev = build_device_index(t, sa_intv=sa_intv).as_jax()
    return t, ref, dev


T, REF, DEV = make()
TEXT_ROWS = jnp.asarray(pack_text_rows(T))


def reads_with_planted(rs, n_reads, L=60, k=2, with_n=0):
    reads, poss = [], []
    for _ in range(n_reads):
        p = rs.randint(0, len(T) - L)
        r = T[p:p + L].copy()
        for _ in range(rs.randint(0, k + 1)):
            q = rs.randint(0, L)
            r[q] = (r[q] + rs.randint(1, 4)) % 4
        for _ in range(with_n):
            r[rs.randint(0, L)] = 4
        reads.append(r)
        poss.append(p)
    return reads, poss


def run_pigeon(reads, opt, md_val=2, n_seg=3):
    rc = [alphabet.revcomp(r) for r in reads]
    both = list(reads) + rc
    batch = pack_pigeon_batch(both, n_seg=n_seg, seed_len=opt.seed_len)
    md = np.full(len(both), md_val, np.int32)
    res = pigeon_search(
        DEV, TEXT_ROWS, jnp.asarray(batch["segs_rev"]),
        jnp.asarray(batch["seg_lens"]), jnp.asarray(batch["seg_off"]),
        jnp.asarray(batch["rw"]), jnp.asarray(batch["nmask"]),
        jnp.asarray(batch["vmask"]), jnp.asarray(batch["seedmask"]),
        jnp.asarray(batch["lens"]), jnp.asarray(md), opt, n_seg=n_seg,
        cand_cap=32, gpool=4 * len(both))
    return pigeon_occurrences(res, len(reads), opt, 32)[:2]


def oracle_occ_set(read, opt, md_val, strand):
    """(pos, strand, nmm) triples of the oracle hit set, window-filtered."""
    rev = FMIndex.build(np.asarray(T[::-1]).copy(), sa_intv=8)
    D = cal_width(rev, read)
    hits = match_gap(REF, read, D, opt, max_diff=md_val)
    out = {}
    for h in hits:
        for r in range(h.k, h.l + 1):
            p = REF.locate(r)
            key = (p, strand)
            if key not in out or out[key][0] > h.score:
                out[key] = (h.score, h.nmm)
    return out


OPT_MM = AlnOpt(max_diff=2, max_gapo=0)


def test_pigeon_matches_oracle_mismatch_only():
    rs = np.random.RandomState(0)
    reads, _ = reads_with_planted(rs, 40, L=60, k=2)
    occs, fb = run_pigeon(reads, OPT_MM, md_val=2)
    n_checked = 0
    for j, read in enumerate(reads):
        if fb[j]:
            continue
        # oracle over both strands, window-filtered identically to resolve
        o = oracle_occ_set(read, OPT_MM, 2, 0)
        o.update(oracle_occ_set(alphabet.revcomp(read), OPT_MM, 2, 1))
        if o:
            best = min(v[0] for v in o.values())
            o = {k: v for k, v in o.items() if v[0] <= best + OPT_MM.s_mm}
        got_all = {(x.pos, x.strand): (x.score, x.nmm) for x in occs[j]}
        if got_all:
            bestg = min(v[0] for v in got_all.values())
            got = {k: v for k, v in got_all.items()
                   if v[0] <= bestg + OPT_MM.s_mm}
        else:
            got = {}
        assert got == o, (j, sorted(got.items()), sorted(o.items()))
        n_checked += 1
    assert n_checked >= 30  # fallback must be rare on random genomes


def test_pigeon_reads_with_n():
    rs = np.random.RandomState(5)
    reads, _ = reads_with_planted(rs, 12, L=60, k=1, with_n=1)
    occs, fb = run_pigeon(reads, OPT_MM, md_val=2)
    for j, read in enumerate(reads):
        if fb[j]:
            continue
        o = oracle_occ_set(read, OPT_MM, 2, 0)
        o.update(oracle_occ_set(alphabet.revcomp(read), OPT_MM, 2, 1))
        if o:
            best = min(v[0] for v in o.values())
            o = {k: v for k, v in o.items() if v[0] <= best + OPT_MM.s_mm}
        got_all = {(x.pos, x.strand): (x.score, x.nmm) for x in occs[j]}
        if got_all:
            bestg = min(v[0] for v in got_all.values())
            got = {k: v for k, v in got_all.items()
                   if v[0] <= bestg + OPT_MM.s_mm}
        else:
            got = {}
        assert got == o, (j, sorted(got.items()), sorted(o.items()))


def reads_with_indels(rs, n_reads, L=60, k=1, maxg=2):
    """Reads extracted from the genome with one planted indel (length
    <= maxg) plus up to k mismatches."""
    reads = []
    for _ in range(n_reads):
        p = rs.randint(0, len(T) - L - maxg - 1)
        g = rs.randint(1, maxg + 1)
        t = rs.randint(8, L - 8 - g)
        if rs.randint(2):   # deletion: skip g genome bases at t
            r = np.concatenate([T[p:p + t], T[p + t + g:p + L + g]])
        else:               # insertion: g random bases at t
            ins = rs.randint(0, 4, g).astype(np.int8)
            r = np.concatenate([T[p:p + t], ins, T[p + t:p + L - g]])
        r = r.copy()
        for _ in range(rs.randint(0, k + 1)):
            q = rs.randint(0, L)
            r[q] = (r[q] + rs.randint(1, 4)) % 4
        reads.append(r.astype(np.int8))
    return reads


def _window_sets(occs_j, oracle_map, s_mm):
    """Score-window-filtered (pos,strand)->score maps for got vs oracle."""
    o = dict(oracle_map)
    if o:
        best = min(v[0] for v in o.values())
        o = {k: v[0] for k, v in o.items() if v[0] <= best + s_mm}
    got_all = {(x.pos, x.strand): x.score for x in occs_j}
    if got_all:
        bestg = min(got_all.values())
        got = {k: v for k, v in got_all.items() if v <= bestg + s_mm}
    else:
        got = {}
    return got, o


def test_gapped_pigeon_matches_oracle():
    """One-run-gap verify: pigeon occurrences == oracle hit set on reads
    with planted indels + mismatches (max_gapo=1)."""
    opt = AlnOpt(max_diff=3, max_gapo=1)
    rs = np.random.RandomState(7)
    reads = reads_with_indels(rs, 24, L=60, k=1, maxg=2)
    reads += reads_with_planted(rs, 8, L=60, k=2)[0]
    # an unalignable read: random sequence not from the genome
    junk = rs.randint(0, 4, 60).astype(np.int8)
    reads.append(junk)
    occs, fb = run_pigeon(reads, opt, md_val=3, n_seg=4)
    n_checked = 0
    for j, read in enumerate(reads):
        if fb[j]:
            continue
        o = oracle_occ_set(read, opt, 3, 0)
        o.update(oracle_occ_set(alphabet.revcomp(read), opt, 3, 1))
        got, ow = _window_sets(occs[j], o, opt.s_mm)
        assert got == ow, (j, sorted(got.items()), sorted(ow.items()))
        n_checked += 1
    assert n_checked >= 25
    assert not fb[-1] and occs[-1] == [], \
        "junk read resolves as unmapped on the pigeon path (no fallback)"


def test_gapped_pigeon_150bp():
    """150bp reads (3-row window) with indels, budget 4 (5 segments)."""
    opt = AlnOpt(max_diff=4, max_gapo=1)
    rs = np.random.RandomState(17)
    reads = reads_with_indels(rs, 16, L=150, k=2, maxg=3)
    occs, fb = run_pigeon(reads, opt, md_val=4, n_seg=5)
    n_checked = 0
    for j, read in enumerate(reads):
        if fb[j]:
            continue
        o = oracle_occ_set(read, opt, 4, 0)
        o.update(oracle_occ_set(alphabet.revcomp(read), opt, 4, 1))
        got, ow = _window_sets(occs[j], o, opt.s_mm)
        assert got == ow, (j, sorted(got.items()), sorted(ow.items()))
        n_checked += 1
    assert n_checked >= 12


def test_mismatch_150bp_matches_oracle():
    """150bp mismatch-only reads exercise the widened (3-row) window."""
    opt = AlnOpt(max_diff=3, max_gapo=0)
    rs = np.random.RandomState(19)
    reads, _ = reads_with_planted(rs, 16, L=150, k=3)
    occs, fb = run_pigeon(reads, opt, md_val=3, n_seg=4)
    n_checked = 0
    for j, read in enumerate(reads):
        if fb[j]:
            continue
        o = oracle_occ_set(read, opt, 3, 0)
        o.update(oracle_occ_set(alphabet.revcomp(read), opt, 3, 1))
        got, ow = _window_sets(occs[j], o, opt.s_mm)
        assert got == ow, (j, sorted(got.items()), sorted(ow.items()))
        n_checked += 1
    assert n_checked >= 12


def test_budget_above_segments_falls_back():
    rs = np.random.RandomState(9)
    reads, _ = reads_with_planted(rs, 4, L=60, k=0)
    occs, fb = run_pigeon(reads, OPT_MM, md_val=3)   # 3 > n_seg-1
    assert fb.all()


def test_four_segments_budget_three():
    opt = AlnOpt(max_diff=3, max_gapo=0)
    rs = np.random.RandomState(13)
    reads, poss = reads_with_planted(rs, 20, L=80, k=3)
    occs, fb = run_pigeon(reads, opt, md_val=3, n_seg=4)
    n_checked = 0
    for j, read in enumerate(reads):
        if fb[j]:
            continue
        o = oracle_occ_set(read, opt, 3, 0)
        o.update(oracle_occ_set(alphabet.revcomp(read), opt, 3, 1))
        if o:
            best = min(v[0] for v in o.values())
            o = {k: v for k, v in o.items() if v[0] <= best + opt.s_mm}
        got_all = {(x.pos, x.strand): (x.score, x.nmm) for x in occs[j]}
        if got_all:
            bestg = min(v[0] for v in got_all.values())
            got = {k: v for k, v in got_all.items() if v[0] <= bestg + opt.s_mm}
        else:
            got = {}
        assert got == o, (j, sorted(got.items()), sorted(o.items()))
        n_checked += 1
    assert n_checked >= 15


def test_kmer_table_matches_exact_intervals():
    from hsa_tpu.search.exact import kmer_table
    K = 6
    tk, tl = kmer_table(DEV, K)
    tk, tl = np.asarray(tk), np.asarray(tl)
    rs = np.random.RandomState(3)
    for _ in range(50):
        pat = rs.randint(0, 4, K)
        # index: consumption order is rightmost char first
        p = int(sum(int(c) * 4 ** (K - 1 - t) for t, c in enumerate(pat[::-1])))
        ek, el = REF.exact_interval(pat)
        if ek <= el:
            assert (tk[p], tl[p]) == (ek, el)
        else:
            assert tk[p] > tl[p]


def test_pigeon_kmer_seeding_equivalent():
    from hsa_tpu.search.exact import kmer_table
    K = 6
    tk, tl = kmer_table(DEV, K)
    rs = np.random.RandomState(21)
    reads, _ = reads_with_planted(rs, 30, L=60, k=2)
    reads.append(np.concatenate([reads[0][:20], [4], reads[0][21:]]).astype(np.int8))
    rc = [alphabet.revcomp(r) for r in reads]
    both = list(reads) + rc
    md = np.full(len(both), 2, np.int32)

    b0 = pack_pigeon_batch(both, n_seg=3, seed_len=OPT_MM.seed_len)
    r0 = pigeon_search(DEV, TEXT_ROWS, jnp.asarray(b0["segs_rev"]),
                       jnp.asarray(b0["seg_lens"]), jnp.asarray(b0["seg_off"]),
                       jnp.asarray(b0["rw"]), jnp.asarray(b0["nmask"]),
                       jnp.asarray(b0["vmask"]), jnp.asarray(b0["seedmask"]),
                       jnp.asarray(b0["lens"]), jnp.asarray(md), OPT_MM,
                       n_seg=3, cand_cap=32)
    o0, f0, _m0 = pigeon_occurrences(r0, len(reads), OPT_MM, 32)

    b1 = pack_pigeon_batch(both, n_seg=3, seed_len=OPT_MM.seed_len, kmer_k=K)
    r1 = pigeon_search(DEV, TEXT_ROWS, jnp.asarray(b1["segs_rev"]),
                       jnp.asarray(b1["seg_lens"]), jnp.asarray(b1["seg_off"]),
                       jnp.asarray(b1["rw"]), jnp.asarray(b1["nmask"]),
                       jnp.asarray(b1["vmask"]), jnp.asarray(b1["seedmask"]),
                       jnp.asarray(b1["lens"]), jnp.asarray(md), OPT_MM,
                       n_seg=3, cand_cap=32,
                       kmer_seed=(tk, tl, jnp.asarray(b1["kmer"]),
                                  jnp.asarray(b1["kmer_ok"]),
                                  jnp.asarray(b1["seg_short"])))
    o1, f1, _m1 = pigeon_occurrences(r1, len(reads), OPT_MM, 32)
    assert (f0 == f1).all()
    for a, b in zip(o0, o1):
        assert [(x.pos, x.strand, x.score) for x in a] == \
               [(x.pos, x.strand, x.score) for x in b]


def test_gapped_pigeon_budget5_six_segments():
    """The config-3 shape: fnr-style budget 5, n_seg=6, G=5 — oracle
    parity on reads with indel runs up to 4 plus mismatches."""
    opt = AlnOpt(max_diff=5, max_gapo=1)
    rs = np.random.RandomState(29)
    reads = reads_with_indels(rs, 14, L=100, k=2, maxg=4)
    reads += reads_with_planted(rs, 6, L=100, k=5)[0]
    occs, fb = run_pigeon(reads, opt, md_val=5, n_seg=6)
    n_checked = 0
    for j, read in enumerate(reads):
        if fb[j]:
            continue
        o = oracle_occ_set(read, opt, 5, 0)
        o.update(oracle_occ_set(alphabet.revcomp(read), opt, 5, 1))
        got, ow = _window_sets(occs[j], o, opt.s_mm)
        assert got == ow, (j, sorted(got.items()), sorted(ow.items()))
        n_checked += 1
    assert n_checked >= 14
