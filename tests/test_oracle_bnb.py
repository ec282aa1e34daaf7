"""Oracle branch-and-bound vs brute force on small random genomes."""

import numpy as np
import pytest

from hsa_tpu.config import AlnOpt
from hsa_tpu.fmcore import FMIndex, cal_width
from hsa_tpu.oracle.bnb import match_gap, align_read


def build(n=4000, seed=42):
    t = np.random.RandomState(seed).randint(0, 4, size=n).astype(np.int8)
    return t, FMIndex.build(t), FMIndex.build(t[::-1].copy())


def located_positions(fm, hits):
    """dict position -> best score over all hits covering it."""
    out = {}
    for h in hits:
        for r in range(h.k, h.l + 1):
            p = fm.locate(r)
            if p not in out or out[p] > h.score:
                out[p] = h.score
    return out


T, FM, FMR = build()


def hamming_scan(t, read):
    L = len(read)
    w = np.lib.stride_tricks.sliding_window_view(t, L)
    return np.sum(w != read, axis=1)


def test_exact_read_found():
    opt = AlnOpt(max_diff=2)
    rs = np.random.RandomState(1)
    for _ in range(10):
        p = rs.randint(0, len(T) - 50)
        read = T[p:p + 50].copy()
        hits = match_gap(FM, read, np.zeros(50, np.int32), opt)
        pos = located_positions(FM, hits)
        assert pos.get(p) == 0
        # every reported position within window of brute-force best
        dists = hamming_scan(T, read)
        best = int(dists.min()) * opt.s_mm
        for q, s in pos.items():
            assert s <= best + opt.s_mm


@pytest.mark.parametrize("nmm", [1, 2])
def test_mismatch_reads_match_bruteforce(nmm):
    opt = AlnOpt(max_diff=2, max_gapo=0)  # substitutions only
    rs = np.random.RandomState(nmm * 7)
    for _ in range(10):
        p = rs.randint(0, len(T) - 60)
        read = T[p:p + 60].copy()
        # plant nmm mismatches away from nothing in particular
        idx = rs.choice(60, size=nmm, replace=False)
        read[idx] = (read[idx] + rs.randint(1, 4, size=nmm)) % 4
        hits = match_gap(FM, read, cal_width(FMR, read), opt)
        pos = located_positions(FM, hits)

        dists = hamming_scan(T, read)
        best_mm = int(dists.min())
        assert best_mm <= nmm
        window_mm = [m for m in range(0, opt.max_diff + 1)
                     if m * opt.s_mm <= best_mm * opt.s_mm + opt.s_mm]
        expect = {int(q): int(dists[q]) * opt.s_mm
                  for q in np.nonzero(np.isin(dists, window_mm))[0]}
        assert pos == expect


def test_planted_deletion_found():
    # read skips one genome base -> CIGAR D, one gap open
    opt = AlnOpt(max_diff=2)
    rs = np.random.RandomState(99)
    for _ in range(5):
        p = rs.randint(0, len(T) - 61)
        window = T[p:p + 61]
        cut = rs.randint(10, 50)
        read = np.concatenate([window[:cut], window[cut + 1:]])  # length 60
        hits = match_gap(FM, read, cal_width(FMR, read), opt)
        pos = located_positions(FM, hits)
        assert p in pos
        assert pos[p] <= opt.s_gapo  # found via the single gap-open (or better)


def test_planted_insertion_found():
    # read contains one extra base -> CIGAR I
    opt = AlnOpt(max_diff=2)
    rs = np.random.RandomState(123)
    for _ in range(5):
        p = rs.randint(0, len(T) - 59)
        window = T[p:p + 59]
        cut = rs.randint(10, 49)
        read = np.concatenate([window[:cut], [rs.randint(0, 4)], window[cut:]]).astype(np.int8)
        hits = match_gap(FM, read, cal_width(FMR, read), opt)
        pos = located_positions(FM, hits)
        assert p in pos


def test_width_pruning_preserves_hit_set():
    opt = AlnOpt(max_diff=2)
    rs = np.random.RandomState(5)
    for _ in range(10):
        p = rs.randint(0, len(T) - 40)
        read = T[p:p + 40].copy()
        read[20] = (read[20] + 1) % 4
        h_nod = match_gap(FM, read, np.zeros(40, np.int32), opt)
        h_d = match_gap(FM, read, cal_width(FMR, read), opt)
        assert h_nod == h_d


def test_n_in_read_is_mismatch():
    opt = AlnOpt(max_diff=1, max_gapo=0)
    p = 100
    read = T[p:p + 40].copy()
    read[15] = 4  # N
    hits = match_gap(FM, read, np.zeros(40, np.int32), opt)
    pos = located_positions(FM, hits)
    assert pos.get(p) == opt.s_mm  # matched with the N charged as one mismatch


def test_unalignable_read_returns_empty():
    opt = AlnOpt(max_diff=0, max_gapo=0)
    read = np.full(40, 4, dtype=np.int8)
    assert match_gap(FM, read, np.zeros(40, np.int32), opt) == []


def test_seed_constraint_blocks_seedy_mismatches():
    # 3 mismatches in the seed (3' end) exceed max_seed_diff=2
    opt = AlnOpt(max_diff=4, max_gapo=0, seed_len=20, max_seed_diff=2)
    rs = np.random.RandomState(17)
    p = rs.randint(0, len(T) - 60)
    read = T[p:p + 60].copy()
    for j in (50, 54, 58):  # inside last 20bp = seed
        read[j] = (read[j] + 1) % 4
    hits = match_gap(FM, read, np.zeros(60, np.int32), opt)
    assert p not in located_positions(FM, hits)
    # same mismatches outside the seed are fine
    read2 = T[p:p + 60].copy()
    for j in (5, 15, 30):
        read2[j] = (read2[j] + 1) % 4
    hits2 = match_gap(FM, read2, np.zeros(60, np.int32), opt)
    assert located_positions(FM, hits2).get(p) == 3 * opt.s_mm


def test_align_read_skips_hopeless():
    opt = AlnOpt(max_diff=1, max_gapo=0)
    rs = np.random.RandomState(31)
    read = rs.randint(0, 4, size=60).astype(np.int8)  # random, almost surely >1 diff
    hits = align_read(FM, FMR, read, opt)
    dists = hamming_scan(T, read)
    if dists.min() > 1:
        assert hits == []
