"""Beam-search engine vs the branch-and-bound oracle: exact hit-set parity.

This is the core parity gate (SURVEY.md §7.3.1): with no beam/hit-buffer
overflow, the beam engine must produce the *identical* deduplicated,
window-filtered hit set as the oracle for every read.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hsa_tpu.config import AlnOpt
from hsa_tpu.fmcore import FMIndex, cal_width
from hsa_tpu.index.layout import build_device_index
from hsa_tpu.oracle.bnb import match_gap
from hsa_tpu.search.beam import align_batch
from hsa_tpu.search.widths import cal_width_device


def build(n=4000, seed=42):
    t = np.random.RandomState(seed).randint(0, 4, size=n).astype(np.int8)
    return (t, FMIndex.build(t), FMIndex.build(t[::-1].copy()),
            build_device_index(t).as_jax())


T, FM, FMR, DEV = build()


def oracle_hits(read, opt):
    D = cal_width(FMR, read)
    md = opt.diff_budget(len(read))
    if D[-1] > md:
        return []
    return match_gap(FM, read, D, opt, md)


def make_reads(rs, n_reads, L, n_mm=0, indel=None):
    reads = []
    for _ in range(n_reads):
        p = rs.randint(0, len(T) - L - 2)
        r = T[p:p + L + (1 if indel == "del" else 0)].copy()
        if indel == "del":
            cut = rs.randint(8, L - 8)
            r = np.concatenate([r[:cut], r[cut + 1:]])
        elif indel == "ins":
            cut = rs.randint(8, L - 8)
            r = np.concatenate([r[:cut], [rs.randint(0, 4)], r[cut:]])[:L]
        idx = rs.choice(L, size=n_mm, replace=False)
        r = r.copy()
        r[idx] = (r[idx] + rs.randint(1, 4, size=n_mm)) % 4
        reads.append(r.astype(np.int8))
    return reads


def assert_parity(reads, opt, beam_width=512, max_hits=48):
    got, res = align_batch(DEV, reads, opt, beam_width=beam_width, max_hits=max_hits)
    assert int(np.asarray(res.n_live_dropped).sum()) == 0, "beam overflow"
    assert int(np.asarray(res.n_hits_dropped).sum()) == 0, "hit buffer overflow"
    for j, r in enumerate(reads):
        exp = oracle_hits(r, opt)
        assert got[j] == exp, (j, got[j], exp)


def test_parity_exactish_reads():
    rs = np.random.RandomState(0)
    assert_parity(make_reads(rs, 16, 50), AlnOpt(max_diff=2))


def test_parity_one_mismatch():
    rs = np.random.RandomState(1)
    assert_parity(make_reads(rs, 16, 50, n_mm=1), AlnOpt(max_diff=1, max_gapo=0))


def test_parity_two_mismatches():
    rs = np.random.RandomState(2)
    assert_parity(make_reads(rs, 12, 60, n_mm=2), AlnOpt(max_diff=2, max_gapo=0))


def test_parity_gapped_deletion():
    rs = np.random.RandomState(3)
    assert_parity(make_reads(rs, 10, 50, indel="del"), AlnOpt(max_diff=2))


def test_parity_gapped_insertion():
    rs = np.random.RandomState(4)
    assert_parity(make_reads(rs, 10, 50, indel="ins"), AlnOpt(max_diff=2))


def test_parity_mixed_batch_varied_lengths():
    rs = np.random.RandomState(5)
    reads = (make_reads(rs, 5, 40) + make_reads(rs, 5, 72, n_mm=1)
             + make_reads(rs, 4, 100, n_mm=2) + make_reads(rs, 4, 64, indel="del"))
    # unalignable junk read too
    reads.append(rs.randint(0, 4, 55).astype(np.int8))
    reads.append(np.full(48, 4, dtype=np.int8))  # all N
    assert_parity(reads, AlnOpt(max_diff=2))


def test_parity_fnr_budget_mode():
    rs = np.random.RandomState(6)
    opt = AlnOpt()  # fnr mode: budget from read length
    assert_parity(make_reads(rs, 8, 80, n_mm=2), opt)


def test_parity_seed_constraint():
    rs = np.random.RandomState(7)
    opt = AlnOpt(max_diff=4, seed_len=20, max_seed_diff=1)
    reads = make_reads(rs, 8, 60, n_mm=2)
    # plant extra seed-region mismatches on some reads
    for r in reads[:4]:
        r[55] = (r[55] + 1) % 4
        r[58] = (r[58] + 2) % 4
    assert_parity(reads, opt)


def test_parity_with_n_bases():
    rs = np.random.RandomState(8)
    reads = make_reads(rs, 8, 50)
    for r in reads[:4]:
        r[rs.randint(10, 40)] = 4
    assert_parity(reads, AlnOpt(max_diff=1, max_gapo=0))


def test_overflow_counters_fire_on_tiny_beam():
    rs = np.random.RandomState(9)
    # repetitive text stresses the beam
    t = np.tile(np.random.RandomState(10).randint(0, 4, 200), 25).astype(np.int8)
    dev = build_device_index(t).as_jax()
    reads = [t[p:p + 40].copy() for p in rs.randint(0, len(t) - 40, 8)]
    for r in reads:
        r[20] = (r[20] + 1) % 4
    _, res = align_batch(dev, reads, AlnOpt(max_diff=2), beam_width=2, max_hits=2)
    assert (int(np.asarray(res.n_live_dropped).sum()) > 0
            or int(np.asarray(res.n_hits_dropped).sum()) > 0)


def test_device_width_matches_reference():
    rs = np.random.RandomState(11)
    reads = make_reads(rs, 12, 60, n_mm=2)
    B, Lmax = len(reads), 60
    fwd = np.full((B, Lmax), 5, np.uint8)
    for j, r in enumerate(reads):
        fwd[j, :len(r)] = r
    D = np.asarray(cal_width_device(DEV, jnp.asarray(fwd),
                                    jnp.asarray([len(r) for r in reads], np.int32)))
    for j, r in enumerate(reads):
        np.testing.assert_array_equal(D[j, :len(r)], cal_width(FMR, r))
