"""Vectorized finalization/resolution twins vs the loop reference path.

The array-based fast path (pigeon_occ_arrays + resolve_from_occ_arrays)
must be record-equal to the loop implementations it replaces
(pigeon_occurrences + resolve_from_occurrences).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hsa_tpu import alphabet
from hsa_tpu.config import AlnOpt, SamseOpt
from hsa_tpu.io.fastx import RefMeta
from hsa_tpu.index.layout import build_device_index
from hsa_tpu.resolve.samse import (resolve_from_occurrences,
                                   resolve_from_occ_arrays)
from hsa_tpu.search.pigeon import (pack_pigeon_batch, pack_text_rows,
                                   pigeon_search, pigeon_occurrences,
                                   pigeon_occ_arrays, occ_lists_to_arrays)


def make(n=20000, seed=31, sa_intv=8):
    t = np.random.RandomState(seed).randint(0, 4, size=n).astype(np.int8)
    dev = build_device_index(t, sa_intv=sa_intv).as_jax()
    return t, dev


T, DEV = make()
TEXT_ROWS = jnp.asarray(pack_text_rows(T))
META = RefMeta(names=["c1", "c2"], starts=np.asarray([0, 12000], np.int64),
               lengths=np.asarray([12000, 8000], np.int64),
               amb_runs=[(500, 7), (15000, 3)], total=20000)


def make_reads(rs, n_reads, L=72, k=2, with_indel=True, with_n=1):
    reads = []
    for i in range(n_reads):
        p = rs.randint(0, len(T) - L - 4)
        r = T[p:p + L].copy()
        if with_indel and i % 3 == 0:
            g = rs.randint(1, 3)
            tt = rs.randint(8, L - 8 - g)
            if rs.randint(2):
                r = np.concatenate([T[p:p + tt], T[p + tt + g:p + L + g]])
            else:
                ins = rs.randint(0, 4, g).astype(np.int8)
                r = np.concatenate([T[p:p + tt], ins, T[p + tt:p + L - g]])
            r = r.copy()
        for _ in range(rs.randint(0, k + 1)):
            q = rs.randint(0, L)
            r[q] = (r[q] + rs.randint(1, 4)) % 4
        if with_n and i % 5 == 0:
            r[rs.randint(0, L)] = 4
        reads.append(r.astype(np.int8))
    # one junk (unmapped) read
    reads.append(rs.randint(0, 4, L).astype(np.int8))
    return reads


def run_both(reads, opt, md_val, n_seg):
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
    lists, fb_l, m_l = pigeon_occurrences(res, len(reads), opt, 32)
    arrs, fb_a, m_a = pigeon_occ_arrays(res, len(reads), opt, 32)
    assert (m_l == m_a).all()
    return lists, fb_l, arrs, fb_a


OPT = AlnOpt(max_diff=3, max_gapo=1)


def test_occ_arrays_match_lists():
    rs = np.random.RandomState(2)
    reads = make_reads(rs, 30)
    lists, fb_l, arrs, fb_a = run_both(reads, OPT, 3, 4)
    assert (fb_l == fb_a).all()
    ref = occ_lists_to_arrays(
        [lst if not fb_l[j] else [] for j, lst in enumerate(lists)])
    for k in ref:
        assert np.array_equal(ref[k], arrs[k]), (k, ref[k], arrs[k])


def test_resolver_twins_record_equal():
    rs = np.random.RandomState(5)
    reads = make_reads(rs, 40)
    lists, fb_l, arrs, fb_a = run_both(reads, OPT, 3, 4)
    B = len(reads)
    names = [f"r{i}" for i in range(B)]
    quals = ["I" * len(r) for r in reads]
    trunc = [False] * B
    # drop fallback reads from both paths the same way
    lists = [lst if not fb_l[j] else [] for j, lst in enumerate(lists)]
    recs_loop = resolve_from_occurrences(T, META, reads, names, quals,
                                         lists, trunc, OPT, SamseOpt(),
                                         read_offset=7)
    recs_vec = resolve_from_occ_arrays(T, META, reads, names, quals,
                                       arrs, trunc, OPT, SamseOpt(),
                                       read_offset=7)
    assert len(recs_loop) == len(recs_vec)
    for a, b in zip(recs_loop, recs_vec):
        assert a.to_sam() == b.to_sam(), (a.to_sam(), b.to_sam())


def test_resolver_twins_no_quals_and_offsets():
    rs = np.random.RandomState(9)
    reads = make_reads(rs, 12, L=60, with_indel=False)
    lists, fb_l, arrs, fb_a = run_both(reads, AlnOpt(max_diff=2, max_gapo=0),
                                       2, 3)
    B = len(reads)
    names = [f"q{i}" for i in range(B)]
    lists = [lst if not fb_l[j] else [] for j, lst in enumerate(lists)]
    opt = AlnOpt(max_diff=2, max_gapo=0)
    recs_loop = resolve_from_occurrences(T, META, reads, names, None,
                                         lists, [False] * B, opt, None,
                                         read_offset=123)
    recs_vec = resolve_from_occ_arrays(T, META, reads, names, None,
                                       arrs, [False] * B, opt, None,
                                       read_offset=123)
    for a, b in zip(recs_loop, recs_vec):
        assert a.to_sam() == b.to_sam(), (a.to_sam(), b.to_sam())


def test_truncated_flag_suppresses_x1():
    rs = np.random.RandomState(11)
    reads = make_reads(rs, 6, with_indel=False)
    lists, fb_l, arrs, fb_a = run_both(reads, AlnOpt(max_diff=2, max_gapo=0),
                                       2, 3)
    B = len(reads)
    names = [f"t{i}" for i in range(B)]
    lists = [lst if not fb_l[j] else [] for j, lst in enumerate(lists)]
    opt = AlnOpt(max_diff=2, max_gapo=0)
    trunc = [True] * B
    recs_loop = resolve_from_occurrences(T, META, reads, names, None,
                                         lists, trunc, opt, None)
    recs_vec = resolve_from_occ_arrays(T, META, reads, names, None,
                                       arrs, trunc, opt, None)
    for a, b in zip(recs_loop, recs_vec):
        assert a.to_sam() == b.to_sam()
        assert "X1" not in a.tags or a.flag == 4


def test_sam_emission_matches_records():
    """emit='sam' lines are byte-equal to records-mode to_sam()."""
    rs = np.random.RandomState(23)
    reads = make_reads(rs, 30)
    lists, fb_l, arrs, fb_a = run_both(reads, OPT, 3, 4)
    B = len(reads)
    names = [f"s{i}" for i in range(B)]
    quals = ["J" * len(r) for r in reads]
    trunc = [False] * B
    recs = resolve_from_occ_arrays(T, META, reads, names, quals, arrs,
                                   trunc, OPT, SamseOpt(), read_offset=3)
    lines, flags = resolve_from_occ_arrays(T, META, reads, names, quals,
                                           arrs, trunc, OPT, SamseOpt(),
                                           read_offset=3, emit="sam")
    assert [r.to_sam() for r in recs] == lines
    assert [r.flag for r in recs] == list(flags)
