"""Paired-end resolution -> SAM records (lineage: ``bwape.c``).

Pipeline (SURVEY.md §3.4): per-end occurrence collection (shared with
samse) -> insert-size inference from unique-unique proper-orientation
pairs -> best-pair selection -> mate rescue via glocal DP -> records with
mate fields / proper-pair flags.

Documented deterministic semantics (reference behavior could not be read —
empty mount; these rules are shared by the oracle pipeline so internal
record parity holds):

- orientation: proper pairs are FR (the forward-strand end leftmost);
- insert stats: median/IQR outlier rejection (keep within q25-2*IQR ..
  q75+2*IQR, inserts capped at ``max_isize``), then mean/std of the kept;
- pairing objective: minimize (score1+score2, |insert-mean|, pos);
  accepted iff orientation is FR and insert <= mean+4*std (or
  ``max_isize`` when stats are unavailable);
- mate rescue: when one end has no hits and the other a unique best, the
  missing mate is glocally aligned (full read, free ref ends) in the
  window implied by FR orientation and ``mean+4*std``; accepted iff its
  DP cost <= its aln diff budget * s_mm.  Rescued records carry XT:A:M
  and MAPQ 0.
"""

from __future__ import annotations

import numpy as np

from .. import alphabet
from ..config import AlnOpt, PEOpt
from .cigar import banded_global, cigar_stats, cigar_string
from .mapq import approx_mapq
from .samse import (AlnRecord, Occurrence, collect_occurrences, _make_record,
                    _HASH)

F_PAIRED, F_PROPER, F_UNMAP, F_MUNMAP = 0x1, 0x2, 0x4, 0x8
F_REV, F_MREV, F_READ1, F_READ2 = 0x10, 0x20, 0x40, 0x80


def fit_in_window(read: np.ndarray, window: np.ndarray, s_mm: int, s_gapo: int,
                  s_gape: int):
    """Glocal DP: full read vs any placement in window (free ref start/end).

    Returns (cost, start_offset, cigar).  Used for mate rescue (the
    ``bwa_paired_sw``/``stdaln.c`` analog; a Pallas version lives in
    hsa_tpu.kernels.sw).
    """
    L, G = len(read), len(window)
    BIG = 1 << 28
    m = np.full((L + 1, G + 1), BIG, dtype=np.int64)
    ins = np.full((L + 1, G + 1), BIG, dtype=np.int64)
    dele = np.full((L + 1, G + 1), BIG, dtype=np.int64)
    m[0, :] = 0  # free start anywhere in the window
    for i in range(1, L + 1):
        sub = np.where((read[i - 1] <= 3) & (read[i - 1] == window), 0, s_mm)
        best_prev = np.minimum(np.minimum(m[i - 1, :-1], ins[i - 1, :-1]),
                               dele[i - 1, :-1])
        m[i, 1:] = best_prev + sub
        ins[i, :] = np.minimum(m[i - 1, :] + s_gapo, ins[i - 1, :] + s_gape)
        row_m, row_d = m[i], dele[i]
        for j in range(1, G + 1):
            row_d[j] = min(row_m[j - 1] + s_gapo, row_d[j - 1] + s_gape)
    totals = np.minimum(np.minimum(m[L], ins[L]), dele[L])
    jend = int(np.argmin(totals))
    cost = int(totals[jend])
    if cost >= BIG:
        return cost, -1, []
    # traceback (M > D > I preference), mirroring cigar.banded_global
    ops = []
    i, j = L, jend
    state = int(np.argmin([m[L, jend], dele[L, jend], ins[L, jend]]))
    while i > 0:
        if j == 0:
            ops.append("I"); i -= 1; continue
        if state == 0:
            sub = s_mm if (read[i - 1] > 3 or read[i - 1] != window[j - 1]) else 0
            target = m[i, j] - sub
            prev = [m[i - 1, j - 1], dele[i - 1, j - 1], ins[i - 1, j - 1]]
            for s_, p_ in enumerate(prev):
                if p_ == target:
                    state = s_
                    break
            ops.append("M"); i -= 1; j -= 1
        elif state == 1:
            state = 0 if m[i, j - 1] + s_gapo == dele[i, j] else 1
            ops.append("D"); j -= 1
        else:
            state = 0 if m[i - 1, j] + s_gapo == ins[i, j] else 2
            ops.append("I"); i -= 1
    ops.reverse()
    cigar = []
    for op in ops:
        if cigar and cigar[-1][0] == op:
            cigar[-1][1] += 1
        else:
            cigar.append([op, 1])
    start = j
    return cost, start, [(op, ln) for op, ln in cigar]


def _window_occs(lst, s_mm):
    if not lst:
        return []
    best = lst[0].score
    return [o for o in lst if o.score <= best + s_mm]


def _glen(o, L):
    return L + o.ngapo + o.ngape


def _isize(o_f, L_f, o_r, L_r):
    """Insert size for an FR pair (forward end o_f leftmost)."""
    return (o_r.pos + _glen(o_r, L_r)) - o_f.pos


def infer_isize(pairs_occs, lens1, lens2, max_isize: int):
    """(mean, std, n) from unique-unique FR pairs (lineage: ``infer_isize``)."""
    inserts = []
    for (occ1, occ2), L1, L2 in zip(pairs_occs, lens1, lens2):
        if len(occ1) != 1 or len(occ2) != 1:
            continue
        o1, o2 = occ1[0], occ2[0]
        if o1.strand == o2.strand:
            continue
        of, Lf, orv, Lr = (o1, L1, o2, L2) if o1.strand == 0 else (o2, L2, o1, L1)
        ins = _isize(of, Lf, orv, Lr)
        if 0 < ins <= max_isize:
            inserts.append(ins)
    if len(inserts) < 8:
        return None, None, len(inserts)
    a = np.asarray(inserts, dtype=np.float64)
    q25, q75 = np.percentile(a, [25, 75])
    iqr = q75 - q25
    keep = a[(a >= q25 - 2 * iqr) & (a <= q75 + 2 * iqr)]
    return float(keep.mean()), float(max(keep.std(), 1.0)), len(keep)


def _best_pair(occ1, occ2, L1, L2, mean, std, max_isize):
    """Best proper FR combo or None; deterministic objective.

    Returns (key, o1, o2, ins, n_best, subo_score): ``n_best`` counts
    FR-consistent combos at the best combined score and ``subo_score`` is
    the second-best combined score (None if no other combo) — the inputs
    of the paired-MAPQ adjustment (lineage: ``bwape.c:pairing``'s
    ``o_n``/``subo_score``; docs/PARITY.md #11).
    """
    limit = (mean + 4 * std) if mean is not None else max_isize
    lo = max(0.0, (mean - 4 * std)) if mean is not None else 0.0
    best = None
    n_best = 0
    subo = None
    for o1 in occ1:
        for o2 in occ2:
            if o1.strand == o2.strand:
                continue
            of, Lf, orv, Lr = (o1, L1, o2, L2) if o1.strand == 0 else (o2, L2, o1, L1)
            ins = _isize(of, Lf, orv, Lr)
            if ins <= 0 or ins > limit or ins < lo:
                continue
            sc = o1.score + o2.score
            dev = abs(ins - mean) if mean is not None else 0.0
            key = (sc, dev, of.pos)
            if best is None or sc < best[0][0]:
                if best is not None and best[0][0] != sc:
                    subo = best[0][0]
                best = (key, o1, o2, ins)
                n_best = 1
            elif sc == best[0][0]:
                n_best += 1
                if key < best[0]:
                    best = (key, o1, o2, ins)
            elif subo is None or sc < subo:
                subo = sc
    return best if best is None else best + (n_best, subo)


_PAIR_W = 16     # matrix width of the vectorized pairing; wider windows
                 # (repeat-heavy ends) take the loop twin


def _best_pair_batch(w1, w2, lens1, lens2, mean, std, max_isize):
    """Vectorized :func:`_best_pair` over all pairs of a batch.

    Returns a list of per-pair results with IDENTICAL semantics to the
    loop twin (tested equal): None, or (key, o1, o2, ins, n_best, subo).
    Pairs where either window exceeds _PAIR_W entries fall back to the
    loop (rare: such ends are repeat-heavy and MAPQ-0 anyway).  The
    combo matrices are [B, W, W] masked numpy ops — the per-pair Python
    O(n1*n2) loop dominated paired resolution beyond ~10K pairs/s
    (VERDICT r3 weak #5).
    """
    B = len(w1)
    out = [None] * B
    W = _PAIR_W
    mat_ids = [j for j in range(B)
               if w1[j] and w2[j] and len(w1[j]) <= W and len(w2[j]) <= W]
    for j in range(B):
        if (w1[j] and w2[j]
                and (len(w1[j]) > W or len(w2[j]) > W)):
            out[j] = _best_pair(w1[j], w2[j], lens1[j], lens2[j],
                                mean, std, max_isize)
    if not mat_ids:
        return out
    M = len(mat_ids)
    BIG = np.int64(1 << 60)
    pos = np.zeros((2, M, W), np.int64)
    sc = np.zeros((2, M, W), np.int64)
    st = np.zeros((2, M, W), np.int8)
    gl = np.zeros((2, M, W), np.int64)
    ok = np.zeros((2, M, W), bool)
    for e, (ws, lens) in enumerate(((w1, lens1), (w2, lens2))):
        for i, j in enumerate(mat_ids):
            lst = ws[j]
            n = len(lst)
            pos[e, i, :n] = [o.pos for o in lst]
            sc[e, i, :n] = [o.score for o in lst]
            st[e, i, :n] = [o.strand for o in lst]
            gl[e, i, :n] = [lens[j] + o.ngapo + o.ngape for o in lst]
            ok[e, i, :n] = True
    p1, p2 = pos[0][:, :, None], pos[1][:, None, :]
    s1, s2 = st[0][:, :, None], st[1][:, None, :]
    g1, g2 = gl[0][:, :, None], gl[1][:, None, :]
    limit = (mean + 4 * std) if mean is not None else float(max_isize)
    lo = max(0.0, mean - 4 * std) if mean is not None else 0.0
    of_pos = np.where(s1 == 0, p1, p2)
    rv_end = np.where(s1 == 0, p2 + g2, p1 + g1)
    ins = rv_end - of_pos
    valid = (ok[0][:, :, None] & ok[1][:, None, :] & (s1 != s2)
             & (ins > 0) & (ins <= limit) & (ins >= lo))
    csc = np.where(valid, sc[0][:, :, None] + sc[1][:, None, :], BIG)
    flat = csc.reshape(M, W * W)
    best_sc = flat.min(axis=1)
    has = best_sc < BIG
    isbest = csc == best_sc[:, None, None]
    n_best = (valid & isbest).reshape(M, W * W).sum(axis=1)
    sub_sc = np.where(valid & ~isbest, csc, BIG).reshape(M, W * W).min(axis=1)
    # pick: among best-score combos, min (dev, of_pos, iteration order)
    dev = (np.abs(ins - mean) if mean is not None
           else np.zeros_like(ins, np.float64))
    dev_m = np.where(valid & isbest, dev, np.inf).reshape(M, W * W)
    dmin = dev_m.min(axis=1)
    pmask = valid & isbest & (dev_m.reshape(M, W, W) == dmin[:, None, None])
    pos_m = np.where(pmask, of_pos, BIG).reshape(M, W * W)
    pmin = pos_m.min(axis=1)
    first = np.argmax((pos_m == pmin[:, None])
                      & pmask.reshape(M, W * W), axis=1)
    a_i, b_i = first // W, first % W
    ins_f = ins.reshape(M, W * W)
    for i in np.nonzero(has)[0]:
        j = mat_ids[i]
        a, b = int(a_i[i]), int(b_i[i])
        o1, o2 = w1[j][a], w2[j][b]
        of = o1 if o1.strand == 0 else o2
        key = (int(best_sc[i]), float(dmin[i]), of.pos)
        subo = int(sub_sc[i]) if sub_sc[i] < BIG else None
        out[j] = (key, o1, o2, int(ins_f[i, first[i]]),
                  int(n_best[i]), subo)
    return out


def pair_mapq(mapq1, mapq2, n_best, subo, best_sc, s_mm):
    """Paired-MAPQ adjustment for a proper pair (docs/PARITY.md #11).

    Pair quality ``mapQ_p``: 0 when the best pair is ambiguous; 29 when
    no alternative pair exists; else scaled by the score margin to the
    second-best pair.  Application rule (lineage ``bwape.c:pairing``
    behavior, reconstructed from its documented OUTPUT property — SE
    MAPQ caps at 37 but proper pairs from the lineage reach 60): a
    confident end gains the pair quality, capped at 60; a repetitive
    (MAPQ 0) end is boosted to min(mapQ_p + 7, mate's qual) — a
    uniquely-paired end with a repetitive single-end hit set gets
    paired quality.  Constants are lineage-style but unverifiable
    against the empty mount; registered as deviation #11.
    """
    if n_best > 1:
        mapq_p = 0
    elif subo is None:
        mapq_p = 29
    else:
        import math
        mapq_p = min(23, int(4.343 * math.log1p((subo - best_sc) / s_mm)) + 17)
    if mapq1 > 0 and mapq2 > 0:
        return min(mapq1 + mapq_p, 60), min(mapq2 + mapq_p, 60)
    q1 = mapq1 if mapq1 > 0 else min(mapq_p + 7, mapq2)
    q2 = mapq2 if mapq2 > 0 else min(mapq_p + 7, mapq1)
    return q1, q2


def resolve_batch_pe(text, meta, reads1, reads2, names, quals1, quals2,
                     hits1, hits2, locate_fn, opt: AlnOpt,
                     peopt: PEOpt | None = None, read_offset: int = 0,
                     max_occ: int = 256):
    """Resolve paired batches -> interleaved [rec1, rec2, ...] records.

    hits1/hits2: (hits_fwd, hits_rc) tuples per end from the search engine.
    """
    peopt = peopt or PEOpt()
    cap = min(peopt.max_occ, max_occ)  # -o, bounded by the locate-cost cap
    occs1, trunc1 = collect_occurrences(hits1[0], hits1[1], locate_fn, cap)
    occs2, trunc2 = collect_occurrences(hits2[0], hits2[1], locate_fn, cap)
    return resolve_pe_from_occurrences(text, meta, reads1, reads2, names,
                                       quals1, quals2, occs1, occs2, opt,
                                       peopt, read_offset=read_offset,
                                       trunc1=trunc1, trunc2=trunc2)


def _bulk_ungapped_cores(text, meta, jobs, opt):
    """Vectorized record cores for ungapped occurrences.

    jobs: list of (key, read int8[L], qual|None, Occurrence).  Returns
    dict key -> AlnRecord with flag 0/16 (strand only), byte-equal to
    :func:`hsa_tpu.resolve.samse._make_record` for ngap == 0 — the
    per-record numpy calls it replaces dominated paired-end resolution.
    """
    from .samse import _DECODE_LUT
    out = {}
    if not jobs:
        return out
    n_text = len(text)
    t_arr = np.asarray(text)
    Lmax = max(len(r) for _k, r, _q, _o in jobs)
    NJ = len(jobs)
    # vectorized job prep (the per-job revcomp/asarray loop was ~40% of
    # paired-end core building at 16K+ jobs/batch)
    rd = np.full((NJ, Lmax), 4, np.uint8)
    pos = np.empty(NJ, np.int64)
    lens = np.empty(NJ, np.int64)
    strands = np.empty(NJ, bool)
    for i, (_k, r, _q, o) in enumerate(jobs):
        rd[i, :len(r)] = r
        pos[i] = o.pos
        lens[i] = len(r)
        strands[i] = bool(o.strand)
    if strands.any():
        t0 = np.arange(Lmax)
        cols = np.clip(lens[:, None] - 1 - t0[None, :], 0, Lmax - 1)
        rc = np.take_along_axis(rd, cols, axis=1)
        rc = np.where(rc <= 3, 3 - rc, rc).astype(np.uint8)
        rc[t0[None, :] >= lens[:, None]] = 4
        rd = np.where(strands[:, None], rc, rd)
    t = np.arange(Lmax)
    win = t_arr[np.minimum(pos[:, None] + t[None, :], n_text - 1)]
    mm = ((rd != win) | (rd > 3)) & (t[None, :] < lens[:, None])
    rows, cs = np.nonzero(mm)
    splits = np.searchsorted(rows, np.arange(NJ + 1))
    chars = _DECODE_LUT[np.minimum(rd, 5)]
    has_amb = bool(meta.amb_runs)
    md_lut = "ACGTN"
    starts_a = np.asarray(meta.starts, np.int64)
    si = np.clip(np.searchsorted(starts_a, pos, side="right") - 1,
                 0, len(starts_a) - 1)
    off1 = (pos - starts_a[si] + 1).tolist()
    si_l = si.tolist()
    lens_l = lens.tolist()
    for i, (key, r, qual, o) in enumerate(jobs):
        L = lens_l[i]
        mmp = cs[splits[i]:splits[i + 1]]
        parts = []
        prev = 0
        for p in mmp.tolist():
            parts.append(str(p - prev))
            parts.append(md_lut[min(int(win[i, p]), 4)])
            prev = p + 1
        parts.append(str(L - prev))
        seq = chars[i, :L].tobytes().decode()
        q = (qual[::-1] if (o.strand and qual and qual != "*") else qual) \
            or "*"
        rec = AlnRecord("", 16 if o.strand else 0,
                        meta.names[si_l[i]], off1[i], 0,
                        f"{L}M", seq, q)
        rec.tags.update(NM=len(mmp), MD="".join(parts), XM=o.nmm,
                        XO=0, XG=0)
        rec.ref_span = L              # skip the CIGAR re-parse in tlen
        if has_amb:
            xn = meta.count_amb(o.pos, L)
            if xn:
                rec.tags["XN"] = xn
        out[key] = rec
    return out


def _bulk_gapped_cores(text, meta, jobs, opt):
    """Batched banded-DP record cores for GAPPED occurrences — the PE
    analog of samse's batched pick/alternate cores: one native
    ``rp_banded_batch`` call replaces per-record ctypes round trips.
    Byte-equal to :func:`hsa_tpu.resolve.samse._make_record` for
    ngap > 0 (flag carries strand only; qname/mapq set by the caller).
    """
    from .samse import _DECODE_LUT
    from .. import refpack as _rp
    out = {}
    if not jobs:
        return out
    t_arr = np.asarray(text)
    Lmax = max(len(r) for _k, r, _q, _o in jobs)
    NJ = len(jobs)
    rd = np.full((NJ, Lmax), 4, np.uint8)
    pos = np.empty(NJ, np.int64)
    lens_ = np.empty(NJ, np.int64)
    ngap_ = np.empty(NJ, np.int64)
    for i, (_k, r, _q, o) in enumerate(jobs):
        a = np.asarray(r, np.uint8)
        if o.strand:
            a = np.where(a <= 3, 3 - a, a)[::-1].astype(np.uint8)
        rd[i, :len(r)] = a
        pos[i] = o.pos
        lens_[i] = len(r)
        ngap_[i] = o.ngapo + o.ngape
    starts_a = np.asarray(meta.starts, np.int64)
    lengths_a = np.asarray(meta.lengths, np.int64)
    si = np.clip(np.searchsorted(starts_a, pos, side="right") - 1,
                 0, len(starts_a) - 1)
    glen_w = np.minimum(lens_ + ngap_, starts_a[si] + lengths_a[si] - pos)
    out_b = _rp.banded_batch(rd, np.arange(NJ, dtype=np.int64) * Lmax,
                             lens_.astype(np.int32), t_arr, pos,
                             glen_w.astype(np.int32), opt.s_mm, opt.s_gapo,
                             opt.s_gape, (ngap_ + 1).astype(np.int32))
    if out_b is None:              # native lib absent: per-record twin
        for key, r, qual, o in jobs:
            out[key] = _make_record(text, meta, r, "", qual, o, 0, opt)
        return out
    cigs, mds, nm, gln, gapb = out_b
    chars = _DECODE_LUT[np.minimum(rd, 5)]
    has_amb = bool(meta.amb_runs)
    for i, (key, r, qual, o) in enumerate(jobs):
        L = int(lens_[i])
        seq = chars[i, :L].tobytes().decode()
        q = (qual[::-1] if (o.strand and qual and qual != "*") else qual) \
            or "*"
        ri = int(si[i])
        rec = AlnRecord("", 16 if o.strand else 0, meta.names[ri],
                        int(pos[i] - starts_a[ri]) + 1, 0, cigs[i], seq, q)
        rec.tags.update(NM=int(nm[i]), MD=mds[i], XM=o.nmm, XO=o.ngapo,
                        XG=int(gapb[i]))
        rec.ref_span = int(gln[i])
        if has_amb:
            xn = meta.count_amb(o.pos, int(gln[i]))
            if xn:
                rec.tags["XN"] = xn
        out[key] = rec
    return out


def resolve_pe_from_occurrences(text, meta, reads1, reads2, names, quals1,
                                quals2, occs1, occs2, opt: AlnOpt,
                                peopt: PEOpt | None = None,
                                read_offset: int = 0, trunc1=None,
                                trunc2=None, c2x1=None, c2x2=None):
    """Core paired resolution over per-read Occurrence lists (from
    collect_occurrences or the pigeon engine directly).

    ``c2x1/c2x2`` (optional): per-end unenumerated-candidate counts of
    truncation-capped reads; they inflate the end's c2 and cap its MAPQ
    (mapq.trunc_capped_mapq) exactly like the single-end resolver.
    """
    from .samse import _span_possible
    from .mapq import trunc_capped_mapq
    peopt = peopt or PEOpt()
    B = len(reads1)
    trunc1 = trunc1 if trunc1 is not None else [False] * B
    trunc2 = trunc2 if trunc2 is not None else [False] * B

    def bfilter(lst, L):
        return [o for o in lst if _span_possible(meta, o, L)]

    lens1 = [len(r) for r in reads1]
    lens2 = [len(r) for r in reads2]
    occs1 = [bfilter(l_, L) for l_, L in zip(occs1, lens1)]
    occs2 = [bfilter(l_, L) for l_, L in zip(occs2, lens2)]

    w1 = [_window_occs(l_, opt.s_mm)[:64] for l_ in occs1]
    w2 = [_window_occs(l_, opt.s_mm)[:64] for l_ in occs2]
    mean, std, n_used = infer_isize(list(zip(w1, w2)), lens1, lens2,
                                    peopt.max_isize)

    # ---- phase A: pairing decisions; defer rescues into a batch ----------
    choices = []       # per pair: [o1, o2, proper]
    pair_stats = [None] * B   # (n_best, subo, best_sc) for proper pairs
    jobs = []          # (pair_idx, missing_end, anchor, read, L)
    rlim = int((mean + 4 * std) if mean is not None else peopt.max_isize)
    pairs_all = _best_pair_batch(w1, w2, lens1, lens2, mean, std,
                                 peopt.max_isize)
    for j in range(B):
        r1, r2 = reads1[j], reads2[j]
        L1, L2 = lens1[j], lens2[j]
        o1 = o2 = None
        proper = False
        pair = pairs_all[j]
        if pair is not None:
            _, o1, o2, _, n_best, subo = pair
            pair_stats[j] = (n_best, subo, o1.score + o2.score)
            proper = True
        else:
            for occ, sel in ((occs1[j], 1), (occs2[j], 2)):
                if occ:
                    bests = [o for o in occ if o.score == occ[0].score]
                    pick = bests[((read_offset + j) * _HASH) % (1 << 32) % len(bests)]
                    if sel == 1:
                        o1 = pick
                    else:
                        o2 = pick
            if peopt.is_sw and (o1 is None) != (o2 is None):
                anchor, missing, Lm, rm = ((o1, 2, L2, r2) if o2 is None
                                           else (o2, 1, L1, r1))
                jobs.append((j, missing, anchor, rm, Lm))
            elif peopt.is_sw and o1 is not None and o2 is not None:
                # discordant pair: both ends map but no FR-consistent
                # combo exists (SVs, far-multi-mapped mates).  The
                # lineage's bwa_paired_sw also rescues here (SURVEY
                # §3.4): anchor on a UNIQUE-best end and SW the other
                # into its FR window; acceptance uses the same cost rule
                # as one-end rescue, so a genuinely distant mate fails
                # the screen and the pair stays discordant.
                u1 = bool(w1[j]) and sum(
                    1 for x in w1[j] if x.score == w1[j][0].score) == 1
                u2 = bool(w2[j]) and sum(
                    1 for x in w2[j] if x.score == w2[j][0].score) == 1
                if u1 and (not u2 or o1.score <= o2.score):
                    jobs.append((j, 2, o1, r2, L2))
                elif u2:
                    jobs.append((j, 1, o2, r1, L1))
        choices.append([o1, o2, proper])

    # ---- phase B: batched device rescue screen, host traceback on accepts -
    rescued_flags = [[False, False] for _ in range(B)]
    for j, missing, res in _rescue_batch(text, meta, jobs, rlim, opt):
        if res is None:
            continue
        if missing == 1:
            choices[j][0] = res
            rescued_flags[j][0] = True
        else:
            choices[j][1] = res
            rescued_flags[j][1] = True
        choices[j][2] = True

    # ---- phase C prep: bulk record cores (ungapped + batched gapped) -----
    jobs = []
    gjobs = []
    for j in range(B):
        o1, o2, proper = choices[j]
        for endno, (o, reads_s, quals_s, occ) in enumerate((
                (o1, reads1, quals1, occs1[j]), (o2, reads2, quals2, occs2[j]))):
            if o is not None:
                (jobs if o.ngapo + o.ngape == 0 else gjobs).append(
                    ((j, endno),
                     reads_s[j], quals_s[j] if quals_s else "*", o))
            # XA alternates of this end (window members, both kinds)
            if o is not None and occ:
                window = _window_occs(occ, opt.s_mm)
                for x in window:
                    if x is not o:
                        (jobs if x.ngapo + x.ngape == 0 else gjobs).append(
                            ((j, endno, id(x)), reads_s[j],
                             quals_s[j] if quals_s else "*", x))
    cores = _bulk_ungapped_cores(text, meta, jobs, opt)
    cores.update(_bulk_gapped_cores(text, meta, gjobs, opt))

    # ---- phase C: record building ----------------------------------------
    records = []
    for j in range(B):
        r1, r2 = reads1[j], reads2[j]
        L1, L2 = lens1[j], lens2[j]
        name = names[j]
        q1 = quals1[j] if quals1 else "*"
        q2 = quals2[j] if quals2 else "*"
        o1, o2, proper = choices[j]
        rescued = rescued_flags[j]

        # single-end MAPQs for both ends, then the paired adjustment
        # (docs/PARITY.md #11) for non-rescued proper pairs
        end_mapq = [0, 0]
        end_cc = [(0, 0, []), (0, 0, [])]
        for endno, (L, o, occ, c2x) in enumerate((
                (L1, o1, occs1[j], c2x1), (L2, o2, occs2[j], c2x2))):
            if o is None:
                continue
            window = _window_occs(occ, opt.s_mm) if occ else []
            c1 = min(sum(1 for x in window
                         if x.score == (occ[0].score if occ else 0)), 256)
            extra = int(c2x[j]) if c2x is not None else 0
            c2 = min((len(window) - c1 if occ else 0) + min(extra, 255), 256)
            end_cc[endno] = (c1, c2, window)
            if not rescued[endno]:
                end_mapq[endno] = trunc_capped_mapq(
                    approx_mapq(c1 if occ else 1, c2, o.nmm,
                                opt.diff_budget(L)), c2, extra)
        if proper and pair_stats[j] is not None and not any(rescued):
            n_best, subo, best_sc = pair_stats[j]
            end_mapq[0], end_mapq[1] = pair_mapq(
                end_mapq[0], end_mapq[1], n_best, subo, best_sc, opt.s_mm)

        for endno, (read, L, qual, o, o_mate, L_mate, occ, trunc) in enumerate((
                (r1, L1, q1, o1, o2, L2, occs1[j], trunc1[j]),
                (r2, L2, q2, o2, o1, L1, occs2[j], trunc2[j]))):
            flag = F_PAIRED | (F_READ1 if endno == 0 else F_READ2)
            if o is None:
                flag |= F_UNMAP
                if o_mate is not None:
                    flag |= F_MREV if o_mate.strand else 0
                rec = AlnRecord(name, flag, "*", 0, 0, "*",
                                alphabet.decode(read), qual)
                if o_mate is not None:
                    ri, off_m = meta.pos_to_ref(o_mate.pos)
                    rec.rname = meta.names[ri]
                    rec.pos = off_m + 1  # SAM: unmapped-with-mapped-mate convention
                    rec.rnext = "="
                    rec.pnext = off_m + 1
                records.append(rec)
                continue
            if proper:
                flag |= F_PROPER
            if o.strand:
                flag |= F_REV
            if o_mate is None:
                flag |= F_MUNMAP
            elif o_mate.strand:
                flag |= F_MREV

            c1, c2, window = end_cc[endno]
            was_rescued = rescued[endno]
            mapq = 0 if was_rescued else end_mapq[endno]
            rec = cores.get((j, endno))
            if rec is not None:
                rec.qname = name
                rec.mapq = mapq
            else:
                rec = _make_record(text, meta, read, name, qual, o, mapq, opt)
            rec.flag = flag  # replaces _make_record's 0/16 (strand folded in)
            if occ and not was_rescued:
                rec.tags["XT"] = "U" if c1 == 1 else "R"
                rec.tags["X0"] = c1
                if not trunc:
                    rec.tags["X1"] = c2
                # XA alternates (lineage: sampe -n/-N caps)
                xa_cap = peopt.n_multi if proper else peopt.N_multi
                alts = [x for x in window if x is not o][:xa_cap]
                if alts and len(window) - 1 <= xa_cap:
                    parts = []
                    for x in alts:
                        arec = cores.get((j, endno, id(x)))
                        if arec is None:
                            arec = _make_record(text, meta, read, name, qual,
                                                x, 0, opt)
                        parts.append(
                            f"{arec.rname},{'-' if x.strand else '+'}{arec.pos},"
                            f"{arec.cigar},{arec.tags['NM']}")
                    rec.tags["XA"] = ";".join(parts) + ";"
            if was_rescued:
                rec.tags["XT"] = "M"
            records.append(rec)

        # mate fields from the ACTUAL reference spans of the built records
        a, b = records[-2], records[-1]
        for rec, mate, o, o_mate in ((a, b, o1, o2), (b, a, o2, o1)):
            if o is None or o_mate is None:
                continue
            same = rec.rname == mate.rname
            rec.rnext = "=" if same else mate.rname
            rec.pnext = mate.pos
            if same:
                span_self = getattr(rec, "ref_span", None)
                if span_self is None:
                    span_self = _cigar_ref_span(rec.cigar)
                span_mate = getattr(mate, "ref_span", None)
                if span_mate is None:
                    span_mate = _cigar_ref_span(mate.cigar)
                left = min(rec.pos, mate.pos)
                right = max(rec.pos + span_self, mate.pos + span_mate)
                t = right - left
                rec.tlen = t if (rec.pos, span_self) <= (mate.pos, span_mate) \
                    else -t
                if rec.pos == mate.pos and span_self == span_mate:
                    # same start/span: sign by read number (deterministic)
                    rec.tlen = t if rec.flag & F_READ1 else -t
    return records


def _cigar_ref_span(cigar_str: str) -> int:
    """Reference bases consumed by a CIGAR string (M and D ops)."""
    span = 0
    num = 0
    for ch in cigar_str:
        if ch.isdigit():
            num = num * 10 + ord(ch) - 48
        else:
            if ch in ("M", "D", "=", "X", "N"):
                span += num
            num = 0
    return span


def _rescue_window(text, meta, anchor: Occurrence, L: int, rlim: int):
    """(lo, hi, strand) of the FR-implied rescue window for the missing mate.

    Clamped to the anchor's own reference sequence so a rescued mate can
    never be placed across (or inside) a different chromosome of the
    concatenated text.
    """
    ri, _ = meta.pos_to_ref(anchor.pos)
    seq_lo = int(meta.starts[ri]) if ri >= 0 else 0
    seq_hi = (int(meta.starts[ri] + meta.lengths[ri]) if ri >= 0 else len(text))
    if anchor.strand == 0:
        lo = anchor.pos
        hi = min(seq_hi, anchor.pos + max(rlim, L + 8))
        strand = 1
    else:
        hi = min(seq_hi, anchor.pos + L + 8)
        lo = max(seq_lo, hi - max(rlim, L + 8))
        strand = 0
    return lo, hi, strand


def _rescue_batch(text, meta, jobs, rlim, opt: AlnOpt):
    """Screen all rescue jobs in one device DP pass; traceback on accepts.

    jobs: [(pair_idx, missing_end, anchor, read, L)].  Yields
    (pair_idx, missing_end, Occurrence|None).  The screen uses the
    batched glocal kernel (hsa_tpu.kernels.sw); the acceptance rule and
    the per-accept host traceback match the single-pair path exactly.
    """
    if not jobs:
        return
    import jax.numpy as jnp
    from ..kernels.sw import glocal_screen

    prepped = []
    for j, missing, anchor, read, L in jobs:
        lo, hi, strand = _rescue_window(text, meta, anchor, L, rlim)
        target = alphabet.revcomp(read) if strand == 1 else np.asarray(read)
        prepped.append((j, missing, lo, hi, strand, target, L))
    Lmax = max(p[6] for p in prepped)
    Gmax = max(p[3] - p[2] for p in prepped)
    R = len(prepped)
    reads_a = np.zeros((R, Lmax), np.int32)
    lens_a = np.zeros(R, np.int32)
    wins_a = np.zeros((R, Gmax), np.int32)
    wlens_a = np.zeros(R, np.int32)
    for i, (j, missing, lo, hi, strand, target, L) in enumerate(prepped):
        reads_a[i, :L] = target
        lens_a[i] = L
        wins_a[i, :hi - lo] = np.asarray(text[lo:hi])
        wlens_a[i] = hi - lo
    costs, _ends = glocal_screen(jnp.asarray(reads_a), jnp.asarray(lens_a),
                                 jnp.asarray(wins_a), jnp.asarray(wlens_a),
                                 opt.s_mm, opt.s_gapo, opt.s_gape)
    costs = np.asarray(costs)
    for i, (j, missing, lo, hi, strand, target, L) in enumerate(prepped):
        if hi - lo < L:
            yield j, missing, None
            continue
        budget = max(opt.diff_budget(L), round(0.15 * L))
        if costs[i] > budget * opt.s_mm:
            yield j, missing, None
            continue
        window = np.asarray(text[lo:hi])
        cost, start, cigar = fit_in_window(target, window, opt.s_mm,
                                           opt.s_gapo, opt.s_gape)
        if start < 0 or cost > budget * opt.s_mm:
            yield j, missing, None
            continue
        n_ins = sum(ln for op, ln in cigar if op == "I")
        n_del = sum(ln for op, ln in cigar if op == "D")
        n_opens = sum(1 for op, ln in cigar if op in ("I", "D"))
        nm, _ = cigar_stats(cigar, target, window[start:start + L + n_del])
        yield j, missing, Occurrence(lo + start, strand, cost,
                                     nm - n_ins - n_del, n_opens,
                                     max(n_ins + n_del - n_opens, 0))
