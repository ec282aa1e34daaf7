"""Single-end hit resolution -> SAM records (lineage: ``bwase.c``).

Pipeline per read (SURVEY.md §3.3): merge both-strand hit lists -> locate
all occurrences (batched device locate) -> position-level dedup (the exact
semantics the lineage's ``gap_shadow`` approximates) -> c1/c2 counting ->
primary selection -> MAPQ -> CIGAR/NM/MD via shared DP -> record.

Documented deviations from the strict lineage (mount empty; see
``hsa_tpu.oracle``):
- equal-best tie-break is a deterministic hash of the read ordinal instead
  of ``drand48`` (reference behavior is random; ours is reproducible).
- c1/c2 are counts of distinct (pos, strand) occurrences, clamped at 256.
- occurrences beyond ``max_occ_per_read`` are not located; such reads have
  c1 > 1 anyway (MAPQ 0) and report a located subset in XA.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..config import AlnOpt, SamseOpt
from .. import alphabet
from .cigar import banded_global, cigar_stats, cigar_string
from .mapq import approx_mapq

_HASH = 2654435761


@dataclass
class AlnRecord:
    qname: str
    flag: int
    rname: str
    pos: int          # 1-based; 0 for unmapped
    mapq: int
    cigar: str
    seq: str
    qual: str
    rnext: str = "*"
    pnext: int = 0
    tlen: int = 0
    tags: dict = field(default_factory=dict)

    def to_sam(self) -> str:
        tag_order = ["XT", "X0", "X1", "XN", "XM", "XO", "XG", "NM", "MD", "XA"]
        tags = []
        for t in tag_order:
            if t in self.tags:
                v = self.tags[t]
                ty = "i" if isinstance(v, (int, np.integer)) else "Z"
                tags.append(f"{t}:{ty}:{v}")
        fields = [self.qname, str(self.flag), self.rname, str(self.pos),
                  str(self.mapq), self.cigar, self.rnext, str(self.pnext),
                  str(self.tlen), self.seq, self.qual or "*"]
        return "\t".join(fields + tags)


@dataclass
class Occurrence:
    pos: int     # concat text coordinate (leftmost)
    strand: int  # 0 fwd, 1 rev
    score: int
    nmm: int
    ngapo: int
    ngape: int


def collect_occurrences(hits_fwd, hits_rc, locate_fn, max_occ: int = 512):
    """Per-read merged, deduped occurrence lists (vectorized).

    hits_fwd/hits_rc: list (per read) of Hit lists from either engine.
    locate_fn: callable(ranks_uint32_array) -> positions array (batched).
    Returns (occs_per_read, truncated_flags).  Semantics (shared with the
    loop reference implementation below, tested equal): the per-read
    occurrence budget ``max_occ`` is consumed across both strands in hit
    order; deduplication keeps the minimum-score hit per (pos, strand)
    with first-encountered winning ties.
    """
    B = len(hits_fwd)
    js, ss, ks, ws, sc, nm, go, ge = [], [], [], [], [], [], [], []
    for j in range(B):
        for strand, hits in ((0, hits_fwd[j]), (1, hits_rc[j])):
            for h in hits:
                js.append(j); ss.append(strand); ks.append(h.k)
                ws.append(h.l - h.k + 1); sc.append(h.score)
                nm.append(h.nmm); go.append(h.ngapo); ge.append(h.ngape)
    if not js:
        return [[] for _ in range(B)], [False] * B
    js = np.asarray(js, np.int64); ss = np.asarray(ss, np.int8)
    ks = np.asarray(ks, np.int64); ws = np.asarray(ws, np.int64)
    sc = np.asarray(sc, np.int64); nm = np.asarray(nm, np.int32)
    go = np.asarray(go, np.int32); ge = np.asarray(ge, np.int32)

    # per-read running budget over hits (arrays are grouped by read already)
    cum = np.cumsum(ws)
    first_of_read = np.ones(js.size, bool)
    first_of_read[1:] = js[1:] != js[:-1]
    read_base = np.maximum.accumulate(np.where(first_of_read, cum - ws, -1))
    used_before = (cum - ws) - read_base
    take = np.clip(max_occ - used_before, 0, ws)
    trunc_hit = take < ws
    truncated = [False] * B
    for j in np.unique(js[trunc_hit]):
        truncated[int(j)] = True

    total = int(take.sum())
    if total == 0:
        return [[] for _ in range(B)], truncated
    hid = np.repeat(np.arange(js.size), take)
    offs = np.arange(total) - np.repeat(np.cumsum(take) - take, take)
    ranks = ks[hid] + offs
    pos = np.asarray(locate_fn(ranks.astype(np.uint32))).astype(np.int64)

    # dedup per (read, strand, pos): min score, earliest wins ties
    order = np.lexsort((np.arange(total), sc[hid], pos, ss[hid], js[hid]))
    jo, so, po = js[hid][order], ss[hid][order], pos[order]
    first = np.ones(total, bool)
    first[1:] = (jo[1:] != jo[:-1]) | (so[1:] != so[:-1]) | (po[1:] != po[:-1])
    win = order[first]

    occs = [[] for _ in range(B)]
    for w_i in win:
        h = int(hid[w_i])
        occs[int(js[h])].append(Occurrence(int(pos[w_i]), int(ss[h]),
                                           int(sc[h]), int(nm[h]),
                                           int(go[h]), int(ge[h])))
    for j in range(B):
        occs[j].sort(key=lambda o: (o.score, o.strand, o.pos))
    return occs, truncated


def collect_occurrences_ref(hits_fwd, hits_rc, locate_fn, max_occ: int = 512):
    """Loop reference implementation (semantics oracle for the vectorized one)."""
    B = len(hits_fwd)
    ranks, owners = [], []
    truncated = [False] * B
    for j in range(B):
        budget = max_occ
        for strand, hits in ((0, hits_fwd[j]), (1, hits_rc[j])):
            for h in hits:
                w = h.l - h.k + 1
                take = min(w, budget)
                if take < w:
                    truncated[j] = True
                for r in range(h.k, h.k + take):
                    ranks.append(r)
                    owners.append((j, strand, h))
                budget -= take
        # NOTE: budget is shared across both strands in hit order
    if ranks:
        pos = np.asarray(locate_fn(np.asarray(ranks, dtype=np.uint32)))
    else:
        pos = np.zeros(0, np.int64)
    occs = [dict() for _ in range(B)]
    for (j, strand, h), p in zip(owners, pos):
        key = (int(p), strand)
        cur = occs[j].get(key)
        if cur is None or cur.score > h.score:
            occs[j][key] = Occurrence(int(p), strand, h.score, h.nmm, h.ngapo, h.ngape)
    out = []
    for j in range(B):
        lst = sorted(occs[j].values(), key=lambda o: (o.score, o.strand, o.pos))
        out.append(lst)
    return out, truncated


def _span_possible(meta, o: Occurrence, L: int) -> bool:
    """Boundary filter: can the alignment fit inside one reference sequence?

    The exact reference span is only known after the refinement DP, so the
    filter uses the MINIMUM possible span (every gap op taken as an
    insertion); ungapped hits have the exact span L.  The refinement window
    in _make_record is clamped to the sequence end, so accepted gapped hits
    can never produce CIGARs that cross a chromosome junction.
    """
    ngap = o.ngapo + o.ngape
    min_span = L if ngap == 0 else max(L - ngap, 1)
    return meta.span_ok(o.pos, min_span)


def resolve_batch_se(text, meta, reads, names, quals, hits_fwd, hits_rc,
                     locate_fn, opt: AlnOpt, sopt: SamseOpt | None = None,
                     read_offset: int = 0, max_occ: int = 512):
    """Resolve a batch of single-end reads into SAM records.

    text: int8 concatenated genome codes; meta: RefMeta; reads: list of code
    arrays (original 5'->3' orientation); locate_fn as in collect_occurrences.
    ``read_offset`` keeps the deterministic tie-break stable across batches.
    """
    occs, truncated = collect_occurrences(hits_fwd, hits_rc, locate_fn, max_occ)
    return resolve_from_occurrences(text, meta, reads, names, quals, occs,
                                    truncated, opt, sopt,
                                    read_offset=read_offset)


def resolve_from_occurrences(text, meta, reads, names, quals, occs, truncated,
                             opt: AlnOpt, sopt: SamseOpt | None = None,
                             read_offset: int = 0):
    """Core resolution over per-read Occurrence lists (position-space hit
    sets — produced by collect_occurrences or directly by the pigeon
    engine, whose candidates are already located)."""
    sopt = sopt or SamseOpt()
    records = []
    for j, read in enumerate(reads):
        L = len(read)
        name = names[j]
        qual = quals[j] if quals else "*"
        seq_fwd = alphabet.decode(read)
        lst = [o for o in occs[j] if _span_possible(meta, o, L)]
        if not lst:
            records.append(AlnRecord(name, 4, "*", 0, 0, "*", seq_fwd, qual))
            continue
        best = lst[0].score
        window = [o for o in lst if o.score <= best + opt.s_mm]
        c1 = min(sum(1 for o in window if o.score == best), 256)
        c2 = min(len(window) - c1, 256)
        bests = [o for o in window if o.score == best]
        pick = bests[((read_offset + j) * _HASH) % (1 << 32) % len(bests)]
        max_diff = opt.diff_budget(L)
        mapq = approx_mapq(c1, c2, pick.nmm, max_diff)

        rec = _make_record(text, meta, read, name, qual, pick, mapq, opt)
        rec.tags["XT"] = "U" if c1 == 1 else "R"
        rec.tags["X0"] = c1
        if not truncated[j]:
            rec.tags["X1"] = c2
        # XA alternates
        if 1 < len(window) <= sopt.n_multi + 1 or (c1 == 1 and 0 < c2 <= sopt.n_multi):
            alts = [o for o in window if o is not pick][:sopt.n_multi]
            parts = []
            for o in alts:
                arec = _make_record(text, meta, read, name, qual, o, 0, opt)
                parts.append(f"{arec.rname},{'-' if o.strand else '+'}{arec.pos},"
                             f"{arec.cigar},{arec.tags['NM']}")
            if parts:
                rec.tags["XA"] = ";".join(parts) + ";"
        records.append(rec)
    return records


def _make_record(text, meta, read, name, qual, o: Occurrence, mapq, opt: AlnOpt):
    L = len(read)
    if o.strand:
        aln_read = alphabet.revcomp(read)
        seq = alphabet.decode(aln_read)
        q = qual[::-1] if qual and qual != "*" else qual
        flag = 16
    else:
        aln_read = read
        seq = alphabet.decode(read)
        q = qual
        flag = 0
    ngap = o.ngapo + o.ngape
    ref_i0, off0 = meta.pos_to_ref(o.pos)
    seq_end = (int(meta.starts[ref_i0] + meta.lengths[ref_i0])
               if ref_i0 >= 0 else len(text))
    if ngap == 0:
        glen = L
        ref_win = text[o.pos:o.pos + L]
        cigar = [("M", L)]
        nm, md = cigar_stats(cigar, aln_read, ref_win)
    else:
        # clamp the refinement window to this sequence's end so the CIGAR
        # can never cross a chromosome junction in the concatenated text
        wlen = min(L + ngap, seq_end - o.pos)
        ref_win = text[o.pos:o.pos + wlen]
        _, cigar, glen = banded_global(aln_read, ref_win, opt.s_mm, opt.s_gapo,
                                       opt.s_gape, band=ngap + 1)
        nm, md = cigar_stats(cigar, aln_read, ref_win)
    ref_i, off = meta.pos_to_ref(o.pos)
    rname = meta.names[ref_i] if ref_i >= 0 else "*"
    rec = AlnRecord(name, flag, rname, off + 1, mapq, cigar_string(cigar), seq, q)
    n_gap_bases = sum(ln for op, ln in cigar if op in ("I", "D"))
    xn = meta.count_amb(o.pos, glen)
    rec.tags.update(NM=nm, MD=md, XM=o.nmm, XO=o.ngapo, XG=n_gap_bases)
    if xn:
        rec.tags["XN"] = xn
    return rec
