"""Repeat tolerance of the pigeon engine (round-4 capability).

The lineage engine bounds repetitive work in-engine (``bwtgap.c``'s
max_entries cap, SURVEY.md §2 inexact-core row); the pigeon analog is:
(a) wide anchors extend backward through their own segment until the
interval narrows (completeness: an exact segment has every suffix
exact), (b) segments still wide after full extension enumerate a capped
occurrence sample and report the shortfall in ``n_missed`` instead of
falling back to the beam, and (c) truncated reads get conservatively
capped MAPQ (docs/PARITY.md #14).
"""

import numpy as np

import jax.numpy as jnp

from hsa_tpu import alphabet
from hsa_tpu.config import AlnOpt
from hsa_tpu.index.layout import build_device_index
from hsa_tpu.search.pigeon import (pack_pigeon_batch, pack_text_rows,
                                   pigeon_search, pigeon_occurrences)
from hsa_tpu.search.exact import kmer_table

OPT = AlnOpt(max_diff=2, max_gapo=1)
SEG_CAP = 8      # small cap so modest copy numbers exercise the paths


def build_repeat_genome(seed=5, n=60_000, unit_len=300, copies=40):
    """iid background + one exact high-copy repeat family.

    Returns (text, copy_starts).  Every copy is EXACT so a read inside
    the family maps equally to every copy.
    """
    rs = np.random.RandomState(seed)
    g = rs.randint(0, 4, n).astype(np.int8)
    unit = rs.randint(0, 4, unit_len).astype(np.int8)
    starts = []
    step = (n // 2) // (copies + 2)   # copies confined to the first half
    for i in range(copies):
        p = (i + 1) * step
        g[p:p + unit_len] = unit
        starts.append(p)
    return g, np.asarray(starts)


TEXT, COPIES = build_repeat_genome()
DEV = build_device_index(TEXT, sa_intv=8).as_jax()
TEXT_ROWS = jnp.asarray(pack_text_rows(TEXT))


def run(reads, opt=OPT, md_val=2, n_seg=3, kmer_k=0, anchor_tail=6,
        seg_cap=SEG_CAP, cand_cap=16):
    rc = [alphabet.revcomp(r) for r in reads]
    both = list(reads) + rc
    batch = pack_pigeon_batch(both, n_seg=n_seg, seed_len=opt.seed_len,
                              kmer_k=kmer_k, anchor_tail=anchor_tail)
    md = np.full(len(both), md_val, np.int32)
    seed = None
    if kmer_k:
        tk, tl = kmer_table(DEV, kmer_k)
        seed = (tk, tl, jnp.asarray(batch["kmer"]),
                jnp.asarray(batch["kmer_ok"]),
                jnp.asarray(batch["seg_short"]))
    res = pigeon_search(
        DEV, TEXT_ROWS, jnp.asarray(batch["segs_rev"]),
        jnp.asarray(batch["seg_lens"]), jnp.asarray(batch["seg_off"]),
        jnp.asarray(batch["rw"]), jnp.asarray(batch["nmask"]),
        jnp.asarray(batch["vmask"]), jnp.asarray(batch["seedmask"]),
        jnp.asarray(batch["lens"]), jnp.asarray(md), opt, n_seg=n_seg,
        cand_cap=cand_cap, seg_cap=seg_cap, kmer_seed=seed)
    return pigeon_occurrences(res, len(reads), opt, cand_cap)


def test_in_repeat_read_truncates_not_fallback():
    """A read fully inside a 40-copy exact repeat: capped enumeration,
    missed > 0, NOT a beam fallback, and the found subset verifies."""
    L = 90
    read = TEXT[COPIES[3] + 50:COPIES[3] + 50 + L].copy()
    occs, fb, missed = run([read])
    assert not fb[0]
    assert missed[0] > 0          # 40 copies >> seg_cap=8
    assert len(occs[0]) >= 2      # a verified multi-mapping subset
    # every reported position is a genuine exact placement
    for o in occs[0]:
        assert o.nmm == 0 and o.strand == 0
        assert np.array_equal(TEXT[o.pos:o.pos + L], read)


def test_straddle_read_found_via_unique_flank():
    """A read straddling the repeat boundary keeps its true position:
    the flank segment is unique even when repeat segments are wide."""
    L = 90
    p = COPIES[5] - 40            # 40bp unique flank + 50bp repeat
    read = TEXT[p:p + L].copy()
    occs, fb, missed = run([read])
    assert not fb[0]
    assert any(o.pos == p and o.nmm == 0 for o in occs[0]), \
        [(o.pos, o.nmm) for o in occs[0]]


def test_wide_anchor_extension_recovers_uniqueness():
    """K-mer-seeded anchors that are repetitive at tail length but
    unique over the full segment: the extension loop must narrow them
    (missed == 0, exact occurrence set)."""
    L = 90
    # read inside iid background, but plant its 3' 16-mer (the K+tail
    # anchor of the last segment) at many other locations
    rs = np.random.RandomState(17)
    text = TEXT.copy()
    p = 1000
    read = text[p:p + L].copy()
    K, tail = 12, 4
    anchor = read[L - (K + tail):L]
    spots = []
    for i in range(30):
        q = 30_000 + i * 600
        if abs(q - p) > 200:
            text[q:q + K + tail] = anchor
            spots.append(q)
    dev = build_device_index(text, sa_intv=8).as_jax()
    trows = jnp.asarray(pack_text_rows(text))
    tk, tl = kmer_table(dev, K)
    rc = [alphabet.revcomp(read)]
    both = [read] + rc
    batch = pack_pigeon_batch(both, n_seg=3, seed_len=OPT.seed_len,
                              kmer_k=K, anchor_tail=tail)
    md = np.full(2, 2, np.int32)
    res = pigeon_search(
        dev, trows, jnp.asarray(batch["segs_rev"]),
        jnp.asarray(batch["seg_lens"]), jnp.asarray(batch["seg_off"]),
        jnp.asarray(batch["rw"]), jnp.asarray(batch["nmask"]),
        jnp.asarray(batch["vmask"]), jnp.asarray(batch["seedmask"]),
        jnp.asarray(batch["lens"]), jnp.asarray(md), OPT, n_seg=3,
        cand_cap=16, seg_cap=SEG_CAP,
        kmer_seed=(tk, tl, jnp.asarray(batch["kmer"]),
                   jnp.asarray(batch["kmer_ok"]),
                   jnp.asarray(batch["seg_short"])))
    occs, fb, missed = pigeon_occurrences(res, 1, OPT, 16)
    assert not fb[0]
    # the wide 16-mer anchor extended to the unique full segment:
    # no truncation, and the true position is found
    assert missed[0] == 0, missed
    assert any(o.pos == p and o.nmm == 0 for o in occs[0])


def test_extension_empty_interval_drops_segment():
    """If extending a wide anchor empties the interval, the full segment
    occurs nowhere — the segment contributes nothing, but OTHER exact
    segments still find the read (completeness preserved)."""
    L = 90
    # chimeric read: first 2 segments from position p, last segment's
    # (K+tail)-anchor planted widely BUT its full segment is chimeric
    # (occurs nowhere): extension must empty and drop it
    K, tail = 12, 4
    rs = np.random.RandomState(23)
    text = TEXT.copy()
    p = 2000
    read = text[p:p + L].copy()
    # make the final segment alien except its planted anchor
    alien = rs.randint(0, 4, 30).astype(np.int8)
    read[60:90] = alien
    anchor = read[L - (K + tail):L]
    for i in range(30):
        q = 31_000 + i * 700
        text[q:q + K + tail] = anchor
    dev = build_device_index(text, sa_intv=8).as_jax()
    trows = jnp.asarray(pack_text_rows(text))
    tk, tl = kmer_table(dev, K)
    both = [read, alphabet.revcomp(read)]
    batch = pack_pigeon_batch(both, n_seg=3, seed_len=OPT.seed_len,
                              kmer_k=K, anchor_tail=tail)
    md = np.full(2, 2, np.int32)
    res = pigeon_search(
        dev, trows, jnp.asarray(batch["segs_rev"]),
        jnp.asarray(batch["seg_lens"]), jnp.asarray(batch["seg_off"]),
        jnp.asarray(batch["rw"]), jnp.asarray(batch["nmask"]),
        jnp.asarray(batch["vmask"]), jnp.asarray(batch["seedmask"]),
        jnp.asarray(batch["lens"]), jnp.asarray(md), OPT, n_seg=3,
        cand_cap=16, seg_cap=SEG_CAP,
        kmer_seed=(tk, tl, jnp.asarray(batch["kmer"]),
                   jnp.asarray(batch["kmer_ok"]),
                   jnp.asarray(batch["seg_short"])))
    occs, fb, missed = pigeon_occurrences(res, 1, OPT, 16)
    assert not fb[0]
    assert missed[0] == 0, missed   # wide anchor dropped, not truncated
    # read has ~30 alien mismatches: no alignment within budget exists
    assert occs[0] == []


def test_over_extension_narrows_through_unique_flank():
    """All exact segments wide (in-repeat) and the mismatches confined
    to the unique 5' flank: phase-2 over-extension crosses the segment
    boundary, narrows on the unique flank, and the TRUE locus is among
    the enumerated candidates (round-4 repeat tolerance — without it
    the capped sample of 40 identical copies usually misses the true
    one and the read re-ran on the ~40x-slower beam)."""
    L = 90
    p = COPIES[7] - 10              # 10bp unique flank + 80bp repeat
    read = TEXT[p:p + L].copy()
    read[2] = (read[2] + 1) % 4     # both mismatches in the flank, so
    read[6] = (read[6] + 2) % 4     # segments 1/2 are exact but wide
    occs, fb, missed = run([read])
    assert not fb[0]
    assert any(o.pos == p and o.nmm == 2 for o in occs[0]), \
        [(o.pos, o.nmm) for o in occs[0]]
    assert missed[0] > 0            # excluded copies stay accounted


def test_trunc_mapq_suppressed_end_to_end():
    """Aligner.align on in-repeat reads: records map with LOW mapq
    (multi-mapping or truncation-capped), never confidently."""
    from hsa_tpu.pipeline import Aligner
    di = build_device_index(TEXT, sa_intv=8)
    al = Aligner.from_arrays(di, TEXT, opt=OPT)
    al._PIGEON_SEG_CAP = SEG_CAP
    al._pigeon_jit = {}
    L = 90
    reads = [TEXT[c + 30:c + 30 + L].copy() for c in COPIES[:6]]
    recs = al.align(reads)
    assert al.last_fallback_frac == 0.0
    for r in recs:
        assert not (r.flag & 4), "in-repeat read must still map"
        assert r.mapq < 20, (r.mapq, r.tags)
    # X1 suppressed on truncated reads (lineage truncation semantics)
    trunc_frac = getattr(al, "last_trunc_frac", 0.0)
    assert trunc_frac > 0.0


def test_unique_reads_unaffected():
    """iid-background reads: no truncation, exact behavior as before."""
    rs = np.random.RandomState(31)
    L = 90
    reads = []
    poss = []
    for _ in range(12):
        p = rs.randint(45_000, 59_000 - L)   # past the repeat region
        r = TEXT[p:p + L].copy()
        for _ in range(rs.randint(0, 3)):
            q = rs.randint(0, L)
            r[q] = (r[q] + rs.randint(1, 4)) % 4
        reads.append(r)
        poss.append(p)
    occs, fb, missed = run(reads)
    assert not fb.any()
    assert (missed == 0).all()
    for j, p in enumerate(poss):
        assert any(o.pos == p for o in occs[j]), j


def test_seg_phase_partition_finds_reads():
    """Half-shifted partition (the repeat-retry variant): completeness
    holds for any partition of the read — planted reads are found at
    their true positions under seg_phase=True."""
    rs = np.random.RandomState(41)
    L = 90
    reads, poss = [], []
    for _ in range(8):
        p = rs.randint(45_000, 59_000 - L)
        r = TEXT[p:p + L].copy()
        for _ in range(2):
            q = rs.randint(0, L)
            r[q] = (r[q] + rs.randint(1, 4)) % 4
        reads.append(r)
        poss.append(p)
    rc = [alphabet.revcomp(r) for r in reads]
    both = list(reads) + rc
    batch = pack_pigeon_batch(both, n_seg=3, seed_len=OPT.seed_len,
                              seg_phase=True)
    md = np.full(len(both), 2, np.int32)
    res = pigeon_search(
        DEV, TEXT_ROWS, jnp.asarray(batch["segs_rev"]),
        jnp.asarray(batch["seg_lens"]), jnp.asarray(batch["seg_off"]),
        jnp.asarray(batch["rw"]), jnp.asarray(batch["nmask"]),
        jnp.asarray(batch["vmask"]), jnp.asarray(batch["seedmask"]),
        jnp.asarray(batch["lens"]), jnp.asarray(md), OPT, n_seg=3,
        cand_cap=16, seg_cap=SEG_CAP, seg_phase=True)
    occs, fb, missed = pigeon_occurrences(res, len(reads), OPT, 16)
    assert not fb.any()
    for j, p in enumerate(poss):
        assert any(o.pos == p for o in occs[j]), j


def test_adaptive_repeat_profile_upshift():
    """A repeat-heavy batch (fallback+trunc > threshold) flips the
    Aligner to the repeat capacity profile — sticky — and the wider
    caps eliminate the truncation on the next batch."""
    from hsa_tpu.pipeline import Aligner
    di = build_device_index(TEXT, sa_intv=8)
    al = Aligner.from_arrays(di, TEXT, opt=OPT)
    al._PIGEON_SEG_CAP = SEG_CAP          # 8: 40-copy family truncates
    al._PIGEON_REPEAT_CAPS = (64, 160, 64)  # caps AND pool fit 3x40
    # copies per lane (pool = pm*B2 and this test has only 12 lanes)
    al._pigeon_jit = {}
    L = 90
    reads = [TEXT[c + 30:c + 30 + L].copy() for c in COPIES[:6]]
    assert al._pigeon_profile == "base"
    al.align(reads)
    assert al.last_trunc_frac > 0.10
    assert al._pigeon_profile == "repeat"   # sticky upshift
    recs = al.align(reads)                  # now runs the wide caps
    assert al.last_trunc_frac == 0.0        # 40 copies fit seg_cap=64
    assert al.last_fallback_frac == 0.0
    for r in recs:
        assert not (r.flag & 4)
        assert r.mapq == 0                  # true multi-mapping, X0=40


def test_align_stream_grouped_fallback_matches_align():
    """align_stream with cross-batch fallback pooling yields the SAME
    records, in input order, as per-batch Aligner.align — including
    batches that stage because they carry fallback reads (here: long
    reads over MAX_READ_LEN that route to the beam per-read)."""
    from hsa_tpu.pipeline import Aligner
    from hsa_tpu.search.pigeon import MAX_READ_LEN
    rs = np.random.RandomState(53)
    di = build_device_index(TEXT, sa_intv=8)
    al = Aligner.from_arrays(di, TEXT, opt=OPT)
    al._PIGEON_SEG_CAP = SEG_CAP
    al._PIGEON_REPEAT_THRESH = 10.0   # pin the capacity profile: the
    # adaptive upshift lands after different batch counts in the two
    # flows, which legitimately changes truncation on repeat reads

    def mk_batch(seed):
        r2 = np.random.RandomState(seed)
        out = []
        for i in range(6):
            if i == 2:      # beam-routed read (too long for the engine)
                L = MAX_READ_LEN + 20
            else:
                L = 80
            p = r2.randint(0, len(TEXT) - L)
            r = TEXT[p:p + L].copy()
            q = r2.randint(0, L)
            r[q] = (r[q] + 1) % 4
            out.append(r)
        return out

    batches = [mk_batch(s) for s in (1, 2, 3)]

    # reference: per-batch align (immediate per-batch beam re-run)
    ref = [al.align(b, read_offset=100 * i) for i, b in enumerate(batches)]

    def gen():
        for i, b in enumerate(batches):
            yield 100 * i, None, b, None

    got = list(al.align_stream(gen(), fb_group=3, fb_flush=1000))
    assert [s for s, _ in got] == [0, 100, 200]   # input order
    for (s, recs), rrecs in zip(got, ref):
        assert [r.to_sam() for r in recs] == [r.to_sam() for r in rrecs], s


def build_divergent_family(seed=9, n=60_000, unit_len=300, copies=40,
                           div=0.04):
    """iid background + one DIVERGED repeat family: copies carry ~div
    per-base differences from the consensus, so a read from copy X
    verifies ONLY at X under a 2-diff budget — the capped anchor
    enumeration can miss X entirely (truncated, no verified candidate)."""
    rs = np.random.RandomState(seed)
    g = rs.randint(0, 4, n).astype(np.int8)
    unit = rs.randint(0, 4, unit_len).astype(np.int8)
    starts = []
    step = (n // 2) // (copies + 2)
    for i in range(copies):
        u = unit.copy()
        m = rs.rand(unit_len) < div
        u[m] = (u[m] + rs.randint(1, 4, int(m.sum()))) % 4
        p = (i + 1) * step
        g[p:p + unit_len] = u
        starts.append(p)
    return g, np.asarray(starts)


def test_seg_phase_retry_absorbs_capacity_fallbacks():
    """Round-5 escalation order: a read whose pass-1 enumeration was
    capacity-truncated with no verified candidate re-runs on the
    half-shifted partition at wide caps (one small pigeon pass) instead
    of the beam; the retry finds the true locus and the read never
    falls back."""
    from hsa_tpu.pipeline import Aligner
    text, starts = build_divergent_family()
    di = build_device_index(text, sa_intv=8)
    al = Aligner.from_arrays(di, text, opt=OPT)
    al._PIGEON_SEG_CAP = 4           # tiny caps force pass-1 misses
    al._PIGEON_CAND_CAP = 8
    al._PIGEON_REPEAT_THRESH = 10.0  # pin base profile (isolate retry)
    L = 90
    rs = np.random.RandomState(17)
    reads, poss = [], []
    for c in starts[:8]:
        p = int(c) + 40
        r = text[p:p + L].copy()
        for _ in range(2):
            q = rs.randint(0, L)
            r[q] = (r[q] + rs.randint(1, 4)) % 4
        reads.append(r)
        poss.append(p)
    recs = al.align(reads)
    assert al.last_retry_frac > 0.0          # the retry pass actually ran
    assert al.last_fallback_frac == 0.0      # and absorbed every miss
    for j, p in enumerate(poss):
        rec = recs[j]
        assert not (rec.flag & 4), j
        # true locus found (1-based SAM pos on the single sequence)
        assert rec.pos == p + 1, (j, rec.pos, p + 1)

    # retry OFF: same reads still resolve (beam fallback), same positions
    al2 = Aligner.from_arrays(di, text, opt=OPT)
    al2._PIGEON_SEG_CAP = 4
    al2._PIGEON_CAND_CAP = 8
    al2._PIGEON_REPEAT_THRESH = 10.0
    al2._PIGEON_RETRY = False
    recs2 = al2.align(reads)
    assert al2.last_fallback_frac > 0.0
    for r1, r2 in zip(recs, recs2):
        assert (r1.pos, r1.flag & 16) == (r2.pos, r2.flag & 16)


def test_repeat_profile_downshift_hysteresis():
    """Round-5 hysteresis: after the sticky upshift, N consecutive
    clean batches (load < threshold/2) downshift back to base caps."""
    from hsa_tpu.pipeline import Aligner
    di = build_device_index(TEXT, sa_intv=8)
    al = Aligner.from_arrays(di, TEXT, opt=OPT)
    al._PIGEON_SEG_CAP = SEG_CAP
    al._PIGEON_REPEAT_CAPS = (64, 160, 64)
    al._PIGEON_DOWNSHIFT_N = 2
    L = 90
    repeat_reads = [TEXT[c + 30:c + 30 + L].copy() for c in COPIES[:6]]
    rs = np.random.RandomState(23)
    clean_reads = []
    for _ in range(6):
        p = rs.randint(35_000, 59_000 - L)
        clean_reads.append(TEXT[p:p + L].copy())
    al.align(repeat_reads)
    assert al._pigeon_profile == "repeat"
    al.align(clean_reads)
    assert al._pigeon_profile == "repeat"    # 1 clean batch: not yet
    al.align(clean_reads)
    assert al._pigeon_profile == "base"      # 2nd clean batch: downshift
    al.align(repeat_reads)                   # re-upshift still works
    assert al._pigeon_profile == "repeat"
