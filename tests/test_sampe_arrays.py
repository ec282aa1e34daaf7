"""Parity of the round-5 array-native paired resolver.

``resolve_pe_from_occ_arrays`` must be record-equal to the loop twin
``resolve_pe_from_occurrences`` fed the same occurrences — across proper
pairs, multi-mapping windows, gapped picks, one-end rescue, discordant
pairs, truncation flags, and both emit modes (lineage scope:
``bwape.c``; SURVEY.md §3.4).
"""

import numpy as np

from hsa_tpu import alphabet
from hsa_tpu.config import AlnOpt, PEOpt
from hsa_tpu.fmcore import FMIndex
from hsa_tpu.io.fastx import RefMeta
from hsa_tpu.oracle.bnb import align_read
from hsa_tpu.resolve.samse import collect_occurrences
from hsa_tpu.resolve.sampe import (resolve_pe_from_occ_arrays,
                                   resolve_pe_from_occurrences)
from hsa_tpu.search.pigeon import occ_lists_to_arrays


def build_env(seed=11, n=6000, two_chrom=True):
    rs = np.random.RandomState(seed)
    text = rs.randint(0, 4, n).astype(np.int8)
    # a dispersed repeat family for multi-mapping windows
    unit = rs.randint(0, 4, 120).astype(np.int8)
    for p in (500, 1500, 2500, 4200):
        text[p:p + 120] = unit
    if two_chrom:
        meta = RefMeta(names=["c1", "c2"],
                       starts=np.asarray([0, n // 2], np.int64),
                       lengths=np.asarray([n // 2, n - n // 2], np.int64),
                       total=n)
    else:
        meta = RefMeta(names=["c1"], starts=np.zeros(1, np.int64),
                       lengths=np.asarray([n], np.int64), total=n)
    fm_f = FMIndex.build(text)
    fm_r = FMIndex.build(text[::-1].copy())

    def occs_for(reads, opt):
        hf, hr = [], []
        for r in reads:
            hf.append(align_read(fm_f, fm_r, np.asarray(r, np.int8), opt))
            hr.append(align_read(fm_f, fm_r,
                                 alphabet.revcomp(np.asarray(r, np.int8)),
                                 opt))

        def locate_fn(ranks):
            return np.array([fm_f.locate(int(x)) for x in ranks], np.int64)
        return collect_occurrences(hf, hr, locate_fn)

    return text, meta, occs_for


def make_pairs(text, rs, n_pairs=14, L=60, isize=260):
    n = len(text)
    reads1, reads2, names, q1, q2 = [], [], [], [], []
    for j in range(n_pairs):
        p = rs.randint(0, n - isize - 10)
        r1 = np.asarray(text[p:p + L], np.int8).copy()
        r2 = alphabet.revcomp(np.asarray(text[p + isize - L:p + isize],
                                         np.int8))
        kind = j % 5
        if kind == 1:            # mismatches on end 1
            for _ in range(2):
                q = rs.randint(0, L)
                r1[q] = (r1[q] + rs.randint(1, 4)) % 4
        elif kind == 2:          # 1bp deletion in end 2 (gapped pick)
            w = np.asarray(text[p + isize - L - 1:p + isize], np.int8)
            r2 = alphabet.revcomp(np.delete(w, L // 2))
        elif kind == 3:          # 5-mismatch end 2: over the search
            # budget (unmapped) but inside the SW rescue acceptance
            w = np.asarray(text[p + isize - L:p + isize], np.int8).copy()
            for qq in rs.choice(L, 5, replace=False):
                w[qq] = (w[qq] + rs.randint(1, 4)) % 4
            r2 = alphabet.revcomp(w)
        elif kind == 4:          # repeat-family end 1 (multi-map window)
            c = [500, 1500, 2500, 4200][j % 4]
            r1 = np.asarray(text[c + 10:c + 10 + L], np.int8).copy()
        reads1.append(r1)
        reads2.append(r2)
        names.append(f"p{j}")
        q1.append("I" * L)
        q2.append("J" * L)
    # one fully-unmapped pair
    reads1.append(rs.randint(0, 4, L).astype(np.int8))
    reads2.append(rs.randint(0, 4, L).astype(np.int8))
    names.append("junkpair")
    q1.append("I" * L)
    q2.append("J" * L)
    return reads1, reads2, names, q1, q2


def _compare(text, meta, occs_for, reads1, reads2, names, q1, q2, opt,
             peopt, read_offset=0, trunc1=None, trunc2=None, c2x1=None,
             c2x2=None):
    B = len(reads1)
    occs1, tr1 = occs_for(reads1, opt)
    occs2, tr2 = occs_for(reads2, opt)
    trunc1 = trunc1 if trunc1 is not None else tr1
    trunc2 = trunc2 if trunc2 is not None else tr2
    twin = resolve_pe_from_occurrences(
        text, meta, reads1, reads2, names, q1, q2, occs1, occs2, opt,
        peopt, read_offset=read_offset, trunc1=trunc1, trunc2=trunc2,
        c2x1=c2x1, c2x2=c2x2)
    occ = occ_lists_to_arrays(occs1 + occs2)
    trunc = np.asarray(list(trunc1) + list(trunc2), bool)
    c2x = np.concatenate([
        np.asarray(c2x1 if c2x1 is not None else np.zeros(B), np.int64),
        np.asarray(c2x2 if c2x2 is not None else np.zeros(B), np.int64)])
    arr = resolve_pe_from_occ_arrays(
        text, meta, reads1, reads2, names, q1, q2, occ, opt, peopt,
        read_offset=read_offset, trunc=trunc, c2x=c2x)
    assert len(twin) == len(arr)
    for t_, a_ in zip(twin, arr):
        assert t_.to_sam() == a_.to_sam(), (t_.to_sam(), a_.to_sam())
    lines, flags = resolve_pe_from_occ_arrays(
        text, meta, reads1, reads2, names, q1, q2, occ, opt, peopt,
        read_offset=read_offset, trunc=trunc, c2x=c2x, emit="sam")
    assert lines == [r.to_sam() for r in twin]
    assert flags == [r.flag for r in twin]
    return twin


def test_pe_array_resolver_record_parity_gapped():
    text, meta, occs_for = build_env()
    rs = np.random.RandomState(3)
    opt = AlnOpt(max_diff=2, max_gapo=1)
    reads1, reads2, names, q1, q2 = make_pairs(text, rs)
    recs = _compare(text, meta, occs_for, reads1, reads2, names, q1, q2,
                    opt, PEOpt())
    # the scenario mix actually exercised what it claims
    assert any(r.flag & 0x2 for r in recs)            # proper pairs
    assert any(r.flag & 0x4 for r in recs)            # unmapped ends
    assert any("I" in r.cigar or "D" in r.cigar
               for r in recs if r.cigar != "*")       # gapped picks
    assert any(r.tags.get("XT") == "M" for r in recs) # a rescue happened
    assert any(r.tags.get("X0", 1) > 1 for r in recs) # multi-map window


def test_pe_array_resolver_parity_no_rescue_sw_off():
    text, meta, occs_for = build_env(seed=21)
    rs = np.random.RandomState(5)
    opt = AlnOpt(max_diff=2, max_gapo=1)
    reads1, reads2, names, q1, q2 = make_pairs(text, rs, n_pairs=10)
    _compare(text, meta, occs_for, reads1, reads2, names, q1, q2,
             opt, PEOpt(is_sw=False), read_offset=37)


def test_pe_array_resolver_parity_trunc_c2x():
    text, meta, occs_for = build_env(seed=31, two_chrom=False)
    rs = np.random.RandomState(7)
    opt = AlnOpt(max_diff=1, max_gapo=0)
    reads1, reads2, names, q1, q2 = make_pairs(text, rs, n_pairs=8)
    B = len(reads1)
    tr1 = [j % 2 == 0 for j in range(B)]
    tr2 = [False] * B
    c2x1 = np.where(np.arange(B) % 2 == 0, 17, 0).astype(np.int64)
    c2x2 = np.zeros(B, np.int64)
    _compare(text, meta, occs_for, reads1, reads2, names, q1, q2,
             opt, PEOpt(), trunc1=tr1, trunc2=tr2, c2x1=c2x1, c2x2=c2x2)


def test_pe_array_resolver_parity_small_isize_no_stats():
    """< 8 unique-unique pairs: no insert stats (limit = max_isize)."""
    text, meta, occs_for = build_env(seed=41)
    rs = np.random.RandomState(9)
    opt = AlnOpt(max_diff=1, max_gapo=0)
    reads1, reads2, names, q1, q2 = make_pairs(text, rs, n_pairs=4)
    _compare(text, meta, occs_for, reads1, reads2, names, q1, q2,
             opt, PEOpt())


def test_pe_array_resolver_parity_fuzz():
    """Randomized campaigns across seeds/options."""
    for seed in (51, 61, 71):
        text, meta, occs_for = build_env(seed=seed,
                                         two_chrom=(seed % 2 == 1))
        rs = np.random.RandomState(seed)
        opt = AlnOpt(max_diff=2, max_gapo=seed % 2)
        reads1, reads2, names, q1, q2 = make_pairs(
            text, rs, n_pairs=12, isize=200 + 20 * (seed % 3))
        _compare(text, meta, occs_for, reads1, reads2, names, q1, q2,
                 opt, PEOpt(), read_offset=seed)


def test_align_pe_stream_pooled_matches_align_pe():
    """Round-5 PE stream: pooled retry/beam escalations yield records
    identical to per-batch align_pe, in input order — including batches
    with capacity-fallback (divergent repeat family) and beam-routed
    reads."""
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from hsa_tpu.index.layout import build_device_index
    from hsa_tpu.pipeline import Aligner
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_pigeon_repeats import build_divergent_family
    text, starts = build_divergent_family()
    di = build_device_index(text, sa_intv=8)
    opt = AlnOpt(max_diff=2, max_gapo=1)
    al = Aligner.from_arrays(di, text, opt=opt)
    al._PIGEON_SEG_CAP = 4            # force capacity misses + retries
    al._PIGEON_CAND_CAP = 8
    al._PIGEON_REPEAT_THRESH = 10.0   # pin base profile (determinism
    # across flows: the upshift would land after different batch counts)
    rs = np.random.RandomState(19)
    L, isize = 70, 200

    def mk_batch(seed):
        r2 = np.random.RandomState(seed)
        rr1, rr2 = [], []
        for i in range(8):
            if i < 3:          # pairs inside the divergent family
                p = int(starts[r2.randint(len(starts))])
            else:
                p = r2.randint(0, len(text) - isize - 1)
            frag = text[p:p + isize].copy()
            for _ in range(2):
                q = r2.randint(0, isize)
                frag[q] = (frag[q] + r2.randint(1, 4)) % 4
            rr1.append(frag[:L].astype(np.int8))
            rr2.append(alphabet.revcomp(frag[-L:].astype(np.int8)))
        return rr1, rr2

    batches = [mk_batch(s) for s in (1, 2, 3)]
    ref = []
    for i, (r1, r2) in enumerate(batches):
        ref.append(al.align_pe(r1, r2, read_offset=100 * i))

    al2 = Aligner.from_arrays(di, text, opt=opt)
    al2._PIGEON_SEG_CAP = 4
    al2._PIGEON_CAND_CAP = 8
    al2._PIGEON_REPEAT_THRESH = 10.0

    def gen():
        for i, (r1, r2) in enumerate(batches):
            yield 100 * i, None, r1, None, r2, None

    got = list(al2.align_pe_stream(gen(), fb_group=3, fb_flush=10_000))
    assert [s for s, _ in got] == [0, 100, 200]
    for (s, recs), rrecs in zip(got, ref):
        assert [r.to_sam() for r in recs] == [r.to_sam() for r in rrecs], s
