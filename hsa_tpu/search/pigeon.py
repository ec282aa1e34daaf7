"""Pigeonhole seed-and-verify engine — the TPU-shaped fast path for
diff-bounded short-read alignment.

The reference's branch-and-bound stack (lineage: ``bwtgap.c``) explores
every ≤k-diff pattern of the read suffix; on wide SA intervals that
frontier floods (hundreds of transient states), which is exactly what
overflows a lockstep beam and dominates its gather budget.  This engine
replaces the flood with the classic pigeonhole decomposition, restated
for the TPU cost model (docs/TPU_NOTES.md: row gathers are the currency,
~75 Mrows/s in-scan; flat VPU lanes are nearly free):

1. **Anchor**: split each read into ``n_seg = k+1`` contiguous segments.
   Any alignment with ≤ k total diffs leaves at least one segment exact.
   Exact backward search of all segments is a tiny lockstep scan
   (``n_seg * B`` lanes, ~L/n_seg steps, 2 gathers/lane/step).
2. **Compact**: candidates (segment occurrences) are packed into a dense
   pool with ``jnp.nonzero`` so dead slots pay nothing downstream.
3. **Locate**: walk each pooled candidate to a text position with the
   fused-row LF walk (1 gather/step, ≤ sa_intv steps).
4. **Verify (ungapped)**: fetch the 2-bit packed text window around each
   candidate (NR row gathers, NR in {2, 3} by read length) and count
   mismatches with flat XOR/popcount lanes — no gathers, pure VPU.
5. **Verify (gapped)**: candidates of reads whose best ungapped score
   could admit a gapped record (``best >= s_gapo - s_mm`` or no ungapped
   hit) are compacted into a second pool and screened for every one-run
   gap placement (the only gap shape ``max_gapo <= 1`` allows): for each
   gap length g and side, the minimum-mismatch split point is found with
   per-base prefix sums over the already-fetched window — again pure
   VPU, no extra row gathers beyond the verify fetch.

Per read this is ~10 row gathers end-to-end vs the beam's ~2,900.
Capacity misses are handled in-engine (round 4, the lineage
max_entries-truncation analog; docs/PARITY.md #14): repetitive anchors
extend backward through their own segment, segments still wide after
full extension enumerate a capped sample, and slot/pool/gapped-screen
overflow shaves candidates fairly (slot-major pool priority) — every
shortfall is COUNTED in ``n_missed`` so truncated reads report their
verified subset with conservatively capped MAPQ.  The ``fallback`` flag
is reserved for shape/budget misses (segment shorter than the K-mer
seed, md > n_seg-1, gap runs beyond the clamp) and for truncated reads
that end with no verified candidate (decided by the caller).

Parity contract (vs ``hsa_tpu.oracle.bnb``): for ``max_gapo == 0`` the
enumerated occurrence set equals the oracle's (all ≤ md-mismatch
alignments).  For ``max_gapo == 1`` the one-run gap screen enumerates,
per candidate position, the minimum-score feasible alignment for every
distinct gapped start position (q-class), subject to the oracle's exact
constraints — nmm + ngapo + ngape <= md, ngape <= max_gape, seed-diff
cap, ``indel_end_skip`` — so after position-level dedup the record set
matches the oracle's reporting window.  ``max_gapo >= 2`` is outside
the engine's shape (multi-run gaps); callers must route those configs
to the beam.  Reads whose budget exceeds ``n_seg - 1`` always fall
back; capacity misses (wide repeat intervals, pool or gapped-q-class
overflow) truncate with ``n_missed`` accounting instead (see above).

Shape limits: read length <= 160 (MAX_READ_LEN; window fetch is 2 rows
for reads <= 112bp and 3 rows above).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax.numpy as jnp
from jax import lax

from . import fm
from .exact import exact_search

U32 = jnp.uint32
I32 = jnp.int32
PAD = 5
_PAT = 0x55555555
MAX_READ_LEN = 160
GC_SLOTS = 4          # gapped q-class slots per pool-2 candidate
_BIGNMM = 0x3FFF
_BIGKEY = 0xFFFFFFFF


class PigeonResult(NamedTuple):
    """Device-side result.  Ungapped candidates are POOL-indexed (dense
    compaction): entry i belongs to read-lane ``cidx[i] // cand_cap``
    (``cidx`` is the read-major flat slot id; dead entries carry
    ``cidx == B*cand_cap``).  Pool form keeps the readback O(POOL)
    independent of cand_cap.  Gapped results are pool-2 indexed: lane i
    (< n_gate) belongs to read-lane g_read[i] and carries up to GC_SLOTS
    q-classes (g_key == _BIGKEY marks empties; key packs
    score<<8 | gap_len<<4 | nmm)."""
    pos: jnp.ndarray        # uint32[POOL] candidate start positions
    nmm: jnp.ndarray        # uint8[POOL] verified mismatch counts
    valid: jnp.ndarray      # bool[POOL]
    cidx: jnp.ndarray       # int32[POOL] read-major flat slot id
    fallback: jnp.ndarray   # bool[B]  read needs the exhaustive beam
    n_cand: jnp.ndarray     # int32[B] enumerated candidates (pre-dedup)
    g_q: jnp.ndarray        # uint32[GPOOL, GC_SLOTS] gapped start positions
    g_key: jnp.ndarray      # uint32[GPOOL, GC_SLOTS] packed score/g/nmm
    g_read: jnp.ndarray     # int32[GPOOL] owning read lane
    n_gate: jnp.ndarray     # int32[] live pool-2 lanes
    n_missed: jnp.ndarray   # int32[B] candidates NOT enumerated (capped
                            # repeat intervals / slot / pool overflow);
                            # > 0 marks the lane's hit set TRUNCATED


def pack_text_rows(text: np.ndarray) -> np.ndarray:
    """uint32[nt, 8] rows of 128 packed 2-bit bases (for window fetches).

    Row 0 is an all-zero LEAD row (text base b lives in row ``1 + b//128``)
    so gapped verify windows that begin up to 128 bases before the text
    never index negatively; four all-zero tail rows cover the widest
    (3-row) fetch starting in the last data row.
    """
    t = np.asarray(text, dtype=np.uint8) & 3
    n = len(t)
    nt = n // 128 + 5
    padded = np.zeros(nt * 128, dtype=np.uint32)
    padded[128:128 + n] = t
    w = padded.reshape(nt * 8, 16)
    shifts = (2 * np.arange(16, dtype=np.uint32))[None, :]
    return (w << shifts).sum(axis=1, dtype=np.uint64).astype(np.uint32).reshape(nt, 8)


def auto_anchor_tail(n: int, kmer_k: int, lo: int = 3, hi: int = 8) -> int:
    """Anchor length so spurious candidates stay rare: 4^(K+tail) >= 64*n
    (expected spurious occurrences per anchor <= 1/64)."""
    import math
    need = math.ceil(math.log(max(64 * n, 4), 4)) - kmer_k
    return max(lo, min(hi, need))


MAX_GAP_RUN = 7       # diag shifts use 2*d bits with d <= 2G; G > 7 would
                      # wrap uint32 shift amounts (undefined in XLA)


def max_gap_run(opt, n_seg: int) -> int:
    """Static max one-run gap length G for this (opt, n_seg) compile.

    Non-fallback reads satisfy md <= n_seg - 1 and nmm + g <= md, so
    g <= 1 + min(max_gape, n_seg - 2); 0 when gaps are disabled.
    Clamped to MAX_GAP_RUN (= 7): the diagonal extractors shift packed
    words by 2*d with d up to 2G, and 2*2*8 = 32 would be an undefined
    uint32 shift.  Reads whose budget admits a longer run than the clamp
    are routed to the beam inside :func:`pigeon_search` (``md > G`` when
    ``max_gape + 1 > G``).
    """
    if opt.max_gapo <= 0 or n_seg < 2:
        return 0
    g = 1 + min(opt.max_gape, n_seg - 2)
    assert 2 * 2 * MAX_GAP_RUN < 32
    return min(g, MAX_GAP_RUN)


def pack_pigeon_batch(reads, n_seg: int = 3, max_len: int | None = None,
                      seed_len: int = 32, kmer_k: int = 0,
                      anchor_tail: int = 6, device_masks: bool = False,
                      seg_phase: bool = False):
    """Host-side packing for the pigeon engine.

    reads: list of int8/uint8 code arrays (codes 0..4; 4 = N).

    With ``kmer_k`` > 0, each segment anchors on a SUB-segment: its last
    ``kmer_k + anchor_tail`` bases (K-mer-table seed + short exact tail).
    Completeness is unchanged — an alignment whose segment is exact also
    has that segment's suffix exact — and verification rejects the rare
    spurious anchor (expected extra candidates per anchor ≈
    n / 4^(kmer_k+anchor_tail)).  This caps the anchor scan at
    ``anchor_tail`` steps instead of the full segment length.

    Returns dict of numpy arrays:
      segs_rev uint8[n_seg*B, SL]  reversed anchor-tail bases (seg-major);
                                   with kmer_k > 0 the first kmer_k consumed
                                   bases are OMITTED (the K-mer table seeds
                                   them)
      seg_lens int32[n_seg*B]      remaining (tail) anchor lengths
      seg_off  int32[n_seg*B]      offset of the ANCHOR within the read
      kmer     int32[n_seg*B]      K-mer table index of the seeded prefix
      kmer_ok  uint8[n_seg*B]      1 = lane seeded (len >= K, no N in seed)
      seg_short uint8[n_seg*B]     1 = segment too short to seed (read must
                                   fall back; only when kmer_k > 0)
      rw       uint32[B, RW]       packed 2-bit read (N->0)
      nmask    uint32[B, RW]       PAT-patterned pair bits at N positions
      vmask    uint32[B, RW]       PAT-patterned pair bits at positions < len
      seedmask uint32[B, RW]       PAT-patterned pair bits in the 3' seed
      lens     int32[B]
    """
    K = kmer_k
    if isinstance(reads, tuple):
        B = len(reads[1])
        Lmax = max_len or (int(np.max(reads[1])) if B else 1)
    else:
        B = len(reads)
        Lmax = max_len or max((len(r) for r in reads), default=1)
    Lmax = max(Lmax, 1)
    if Lmax > MAX_READ_LEN:
        raise ValueError(f"pigeon engine handles reads <= {MAX_READ_LEN}bp "
                         f"(got {Lmax}); route longer reads to the beam")
    seg_max = (Lmax + n_seg - 1) // n_seg + 1
    if seg_phase:
        # the half-shifted partition's FIRST segment spans 3L/(2n)
        seg_max = max(seg_max, (3 * Lmax + 2 * n_seg - 1) // (2 * n_seg) + 1)
    SL = max(min(seg_max - K, anchor_tail) if K else seg_max, 1)
    RW = (Lmax + 15) // 16 + 1

    # read matrix (PAD-padded) — everything below is matrix-wise numpy
    R = np.full((B, RW * 16), PAD, dtype=np.uint8)
    if isinstance(reads, tuple):
        R0, lens = reads            # prepacked [B, >=Lmax] matrix + lens
        R[:, :R0.shape[1]] = R0[:, :RW * 16]
        lens = np.asarray(lens, np.int32)
    else:
        lens = np.zeros(B, dtype=np.int32)
        for j, r in enumerate(reads):
            L = len(r)
            R[j, :L] = np.asarray(r, dtype=np.uint8)
            lens[j] = L
    Lv = lens[:, None]

    # -- per-segment anchors ------------------------------------------------
    segs_rev = np.full((n_seg, B, SL), PAD, dtype=np.uint8)
    seg_lens = np.zeros((n_seg, B), dtype=np.int32)
    seg_off = np.zeros((n_seg, B), dtype=np.int32)
    kmer = np.zeros((n_seg, B), dtype=np.int32)
    kmer_ok = np.zeros((n_seg, B), dtype=np.uint8)
    seg_short = np.zeros((n_seg, B), dtype=np.uint8)
    pw = (4 ** np.arange(K - 1, -1, -1, dtype=np.int64))[None, :] if K else None
    def _bound(s):
        # seg_phase: interior boundaries shift by half a segment (ends
        # pinned) — an alternate partition for the repeat-retry pass;
        # pigeonhole completeness holds for ANY partition of the read
        if seg_phase and 0 < s < n_seg:
            return lens * (2 * s + 1) // (2 * n_seg)
        return lens * s // n_seg

    for s in range(n_seg):
        a = _bound(s)
        b = _bound(s + 1)
        w = b - a
        if K == 0:
            # full-segment anchor: reversed columns b-1-t
            t = np.arange(SL)[None, :]
            cols = np.clip(b[:, None] - 1 - t, 0, R.shape[1] - 1)
            seg = np.take_along_axis(R, cols, axis=1)
            valid_t = t < w[:, None]
            segs_rev[s] = np.where(valid_t, seg, PAD)
            seg_lens[s] = np.maximum(w, 0)
            seg_off[s] = a
        else:
            A = np.minimum(w, K + anchor_tail)
            t = np.arange(K + SL)[None, :]
            cols = np.clip(b[:, None] - 1 - t, 0, R.shape[1] - 1)
            seg = np.take_along_axis(R, cols, axis=1)   # [B, K+SL] reversed
            long_enough = w >= K
            head_ok = (seg[:, :K] <= 3).all(axis=1) & long_enough
            kmer[s] = np.where(head_ok,
                               (seg[:, :K].astype(np.int64) * pw).sum(axis=1),
                               0).astype(np.int32)
            kmer_ok[s] = head_ok.astype(np.uint8)
            seg_short[s] = ((w > 0) & ~long_enough).astype(np.uint8)
            tail_t = np.arange(SL)[None, :]
            tail_valid = head_ok[:, None] & (tail_t < (A - K)[:, None])
            segs_rev[s] = np.where(tail_valid, seg[:, K:K + SL], PAD)
            seg_lens[s] = np.where(head_ok, A - K, 0)
            seg_off[s] = np.where(head_ok, b - A, a)

    # -- packed verify words ------------------------------------------------
    t = np.arange(RW * 16)
    codes = R[:, :RW * 16].astype(np.uint32)
    isn = codes > 3
    inlen = t[None, :] < Lv
    codes = np.where(isn, 0, codes)
    sh = (2 * (t % 16)).astype(np.uint32)[None, :]

    def packbits(vals):
        return (vals << sh).reshape(B, RW, 16).sum(axis=2, dtype=np.uint64) \
                           .astype(np.uint32)

    rw = packbits(np.where(inlen, codes, 0))
    nmask = packbits((isn & inlen).astype(np.uint32))
    out = dict(segs_rev=segs_rev.reshape(n_seg * B, SL),
               seg_lens=seg_lens.reshape(-1), seg_off=seg_off.reshape(-1),
               kmer=kmer.reshape(-1), kmer_ok=kmer_ok.reshape(-1),
               seg_short=seg_short.reshape(-1),
               rw=rw, nmask=nmask, lens=lens)
    if not device_masks:
        # vmask/seedmask are pure functions of (lens, seed_len);
        # device_masks=True derives them on device instead (saves two
        # packbits passes here and two array uploads per batch)
        out["vmask"] = packbits(inlen.astype(np.uint32))
        out["seedmask"] = packbits(
            (inlen & (t[None, :] >=
                      np.maximum(Lv - seed_len, 0))).astype(np.uint32))
    return out


def pack_pigeon_upload(batch, md):
    """Fuse a pack_pigeon_batch dict (+ md) into ONE uint32 upload buffer.

    The axon tunnel charges ~per-ARRAY upload overhead for fresh host
    arrays (measured: 14 small arrays cost ~4x one fused buffer of the
    same bytes), so the whole batch rides in one contiguous buffer with
    a shape-static layout; :func:`unpack_pigeon_upload` splits it inside
    the jit.  Fields are bit-packed: segment anchor codes 8b x4/word,
    seg_off|seg_lens 16b+16b, kmer|ok<<24|short<<25, lens|md<<16.
    """
    segs = batch["segs_rev"]
    R, SL = segs.shape
    B2, RW = batch["rw"].shape
    # bit-field range checks (ADVICE r4): silent overflow here would
    # produce wrong alignments with no error — kmer gets 24 bits (K=12
    # fits exactly; K>=13 would corrupt), the 16-bit fields cover reads
    # <= MAX_READ_LEN with huge margin but guard against future edits.
    # Explicit raises (not asserts) so they survive python -O.
    if "kmer" in batch and batch["kmer"].max(initial=0) >= (1 << 24):
        raise ValueError(
            "kmer index overflows its 24-bit upload field (K too large)")
    for fld in ("seg_lens", "seg_off", "lens"):
        if batch[fld].max(initial=0) >= (1 << 16):
            raise ValueError(f"{fld} overflows its 16-bit upload field")
    if np.asarray(md).max(initial=0) >= (1 << 16):
        raise ValueError("md overflows its 16-bit upload field")
    S4 = (SL + 3) // 4
    segs4 = np.zeros((R, S4), np.uint32)
    sr = segs.astype(np.uint32)
    for t in range(SL):
        segs4[:, t // 4] |= sr[:, t] << np.uint32(8 * (t % 4))
    soff_len = (batch["seg_off"].astype(np.uint32)
                | (batch["seg_lens"].astype(np.uint32) << 16))
    if "kmer" in batch:
        kmer_fl = (batch["kmer"].astype(np.uint32)
                   | (batch["kmer_ok"].astype(np.uint32) << 24)
                   | (batch["seg_short"].astype(np.uint32) << 25))
    else:
        kmer_fl = np.zeros(R, np.uint32)
    lens_md = (batch["lens"].astype(np.uint32)
               | (np.asarray(md).astype(np.uint32) << 16))
    buf = np.concatenate([
        segs4.ravel(), soff_len, kmer_fl,
        batch["rw"].astype(np.uint32).ravel(),
        batch["nmask"].astype(np.uint32).ravel(), lens_md])
    return buf, (R, SL, B2, RW)


def unpack_pigeon_upload(buf, shape):
    """Traced inverse of :func:`pack_pigeon_upload`.

    Returns (segs_rev i32[R,SL], seg_lens, seg_off, kmer, kmer_ok,
    seg_short, rw, nmask, lens, md)."""
    R, SL, B2, RW = shape
    S4 = (SL + 3) // 4
    o = 0

    def take(n):
        nonlocal o
        out = lax.slice_in_dim(buf, o, o + n)
        o += n
        return out

    segs4 = take(R * S4).reshape(R, S4)
    cols = [((segs4[:, t // 4] >> U32(8 * (t % 4))) & U32(0xFF)).astype(jnp.int32)
            for t in range(SL)]
    segs_rev = jnp.stack(cols, axis=1)
    soff_len = take(R)
    seg_off = (soff_len & U32(0xFFFF)).astype(I32)
    seg_lens = (soff_len >> U32(16)).astype(I32)
    kmer_fl = take(R)
    kmer = (kmer_fl & U32(0xFFFFFF)).astype(I32)
    kmer_ok = ((kmer_fl >> U32(24)) & U32(1)).astype(jnp.uint8)
    seg_short = ((kmer_fl >> U32(25)) & U32(1)).astype(jnp.uint8)
    rw = take(B2 * RW).reshape(B2, RW)
    nmask = take(B2 * RW).reshape(B2, RW)
    lens_md = take(B2)
    lens = (lens_md & U32(0xFFFF)).astype(I32)
    md = (lens_md >> U32(16)).astype(I32)
    return (segs_rev, seg_lens, seg_off, kmer, kmer_ok, seg_short,
            rw, nmask, lens, md)


def _selectn(words, idx):
    """words: list of [N] vectors (len padded to a power of two with
    zeros); idx: int32 [N] in [0, len(words))."""
    w = list(words)
    P = 1
    while P < len(w):
        P *= 2
    if P > len(w):
        w = w + [jnp.zeros_like(w[0])] * (P - len(w))
    bit = P >> 1
    while bit:
        half = len(w) // 2
        w = [jnp.where((idx & bit) == 0, a, b) for a, b in zip(w[:half], w[half:])]
        bit >>= 1
    return w[0]


def _expand_prefix(mm_words, DW):
    """Pair-bit mismatch words [P, >=DW] -> exclusive per-base prefix sums.

    Returns (P_[P, 16*DW] int32 with P_[:, t] = #mismatches at read
    positions < t, total [P] int32)."""
    shifts = (U32(2) * jnp.arange(16, dtype=U32))[None, None, :]
    bits = ((mm_words[:, :DW, None] >> shifts) & U32(1)).astype(I32)
    bits = bits.reshape(bits.shape[0], DW * 16)
    cs = jnp.cumsum(bits, axis=1)
    excl = cs - bits
    return excl, cs[:, -1]


def pigeon_search(idx, text_rows, segs_rev, seg_lens, seg_off, rw, nmask,
                  vmask, seedmask, lens, md, opt, *, n_seg: int = 3,
                  seg_cap: int = 32, cand_cap: int = 32,
                  pool: int | None = None, gpool: int | None = None,
                  kmer_seed=None, seg_phase: bool = False) -> PigeonResult:
    """Device pigeonhole search (see module docstring).  Traceable; all
    array arguments must reach the jit as parameters, not closures.

    md: int32[B] per-read diff budgets.  ``pool``: dense candidate-pool
    capacity (default 4*B); ``gpool``: gapped pool-2 capacity (default
    pool // 4).  ``kmer_seed``: optional (tk, tl, kmer, kmer_ok,
    seg_short) — K-mer-table seeding from
    :func:`hsa_tpu.search.exact.kmer_table` + ``pack_pigeon_batch``'s
    kmer fields; replaces the first K scan steps of every segment with
    one table gather per interval end.
    """
    lens = jnp.asarray(lens, I32)
    md = jnp.asarray(md, I32)
    B = lens.shape[0]
    CC = cand_cap
    RW = rw.shape[1]
    DW = RW - 1                      # packed words carrying read data
    POOL = pool or 4 * B
    GPOOL = gpool or max(POOL // 4, 8)
    G = max_gap_run(opt, n_seg)      # static max one-run gap length
    # rows per window fetch: select indices reach ws(<=7) + DW + 1
    NR = (DW + 16) // 8
    n = jnp.uint32(idx.n)

    if vmask is None or seedmask is None:
        # device-derived masks: pure functions of (lens, opt.seed_len);
        # bit-identical to pack_pigeon_batch's host packbits
        def pair_mask(k):   # PAT-patterned pairs at positions < k (k in [0,16])
            sh_ = (U32(2) * (U32(16) - jnp.clip(k, 1, 16).astype(U32)))
            return jnp.where(k > 0, U32(_PAT) >> sh_, U32(0))
        tw = jnp.arange(RW, dtype=I32)[None, :]
        rem = jnp.clip(lens[:, None] - 16 * tw, 0, 16)
        if vmask is None:
            vmask = pair_mask(rem)
        if seedmask is None:
            sstart = jnp.maximum(lens - opt.seed_len, 0)
            lo = jnp.clip(sstart[:, None] - 16 * tw, 0, 16)
            seedmask = pair_mask(rem) & ~pair_mask(lo)

    # 1. anchor: lockstep exact search of all segments
    short_fb = jnp.zeros(B, bool)
    if kmer_seed is None:
        k, l, matched = exact_search(idx, segs_rev, seg_lens)
    else:
        tk, tl, kmer, kmer_ok, seg_short = kmer_seed
        k0 = lax.optimization_barrier(jnp.take(tk, kmer))
        l0 = lax.optimization_barrier(jnp.take(tl, kmer))
        okk = kmer_ok.astype(bool)
        k0 = jnp.where(okk, k0, U32(1))
        l0 = jnp.where(okk, l0, U32(0))
        alive0 = okk & (k0 <= l0)
        k, l, matched = exact_search(idx, segs_rev, seg_lens,
                                     init=(k0, l0, alive0))
        short_fb = seg_short.astype(bool).reshape(n_seg, B).any(axis=0)
    seg_off = jnp.asarray(seg_off, I32)
    w = jnp.where(matched, l - k + U32(1), U32(0))

    # 1b. wide-anchor rescue (repeat tolerance): anchors whose interval
    # exceeds seg_cap are extended backward through their OWN segment —
    # completeness holds because an alignment whose segment is exact has
    # every suffix of the segment exact; if the extension empties (or
    # hits an N) the FULL segment occurs nowhere / cannot be exact, so
    # the lane is dropped outright.  Lanes exhausting the segment while
    # still wide are genuine repeats: enumeration below caps them at
    # seg_cap occurrences and counts the rest in ``n_missed`` (the
    # lineage's max_entries-truncation analog) instead of falling back.
    R = k.shape[0]
    lane_id = jnp.arange(R, dtype=I32) % B
    s_idx = jnp.arange(R, dtype=I32) // B
    Lr = jnp.take(lens, lane_id)
    if seg_phase:    # half-shifted partition (pack_pigeon_batch seg_phase)
        a_start = jnp.where(s_idx > 0,
                            (Lr * (2 * s_idx + 1)) // (2 * n_seg), 0)
    else:
        a_start = (Lr * s_idx) // n_seg
    rem = seg_off - a_start
    # any wide anchor with read bases to its left can narrow: within its
    # own segment (phase 1, completeness-sound) and/or past the segment
    # boundary (phase 2, heuristic) — full-segment anchors (rem == 0,
    # e.g. kmer_k = 0 packing) skip phase 1 and go straight to phase 2
    wide0 = matched & (w > U32(seg_cap)) & (seg_off > 0)
    WPOOL = max(R // 4, 64)
    n_wide = wide0.sum()
    widx = jnp.nonzero(wide0, size=WPOOL, fill_value=R)[0]
    in_w = jnp.arange(WPOOL) < jnp.minimum(n_wide, WPOOL)
    gix = jnp.minimum(widx, R - 1)
    wlane = jnp.take(lane_id, gix)
    wa = jnp.take(a_start, gix)
    EXT = max((16 * DW + n_seg - 1) // n_seg + 1, 1)  # segment-length bound
    rw_flat = rw.reshape(-1)
    nm_flat = nmask.reshape(-1)
    nwords = rw_flat.shape[0]

    def ext_cond(carry):
        t, _ek, _el, _eo, alive, _kl = carry
        return (t < EXT) & alive.any()

    def ext_body(carry):
        t, ek, el, eoff, alive, kill = carry
        p = eoff - 1                       # alive => eoff > wa >= 0
        flat = jnp.clip(wlane * RW + (p >> 4), 0, nwords - 1)
        sh_p = U32(2) * (p & 15).astype(U32)
        pw = lax.optimization_barrier(jnp.take(rw_flat, flat))
        base = (pw >> sh_p) & U32(3)
        is_n = ((jnp.take(nm_flat, flat) >> sh_p) & U32(1)) == U32(1)
        k2, l2 = fm.extend(idx, base, ek, el)
        bad = is_n | (k2 > l2)
        kill = kill | (alive & bad)
        good = alive & ~bad
        ek = jnp.where(good, k2, ek)
        el = jnp.where(good, l2, el)
        eoff = jnp.where(good, eoff - 1, eoff)
        alive = good & (el - ek + U32(1) > U32(seg_cap)) & (eoff > wa)
        return (t + 1, ek, el, eoff, alive, kill)

    _, ek, el, eoff, _, killw = lax.while_loop(
        ext_cond, ext_body,
        (jnp.int32(0), jnp.take(k, gix), jnp.take(l, gix),
         jnp.take(seg_off, gix), in_w & (jnp.take(rem, gix) > 0),
         jnp.zeros(WPOOL, bool)))

    # 1c. over-extension (phase 2): lanes STILL wide after consuming their
    # whole segment are genuine repeats (the full segment occurs
    # > seg_cap times); enumerating seg_cap of thousands of copies rarely
    # samples the true locus, so keep extending LEFT past the segment
    # boundary through the read.  This is a heuristic narrowing, not a
    # completeness proof (the true alignment may hold a mismatch in the
    # extended span — then the narrowed interval excludes it), so an
    # empty extension or an N FREEZES the lane at its last good interval
    # instead of killing it, and every position the over-extension
    # excludes is counted into ``n_missed`` (truncation -> conservative
    # MAPQ; a read left with no verifying candidate still re-runs on the
    # beam).  Candidates that survive match a strictly longer exact
    # substring of the read, which is what makes them likely to verify.
    EXT2 = 16 * DW                     # read-length bound; loop is
    w1 = el - ek + U32(1)              # data-dependent and exits early

    def ext2_cond(carry):
        t, _ek, _el, _eo, alive = carry
        return (t < EXT2) & alive.any()

    def ext2_body(carry):
        t, ek, el, eoff, alive = carry
        p = eoff - 1                   # alive => eoff > 0
        flat = jnp.clip(wlane * RW + (p >> 4), 0, nwords - 1)
        sh_p = U32(2) * (p & 15).astype(U32)
        pw = lax.optimization_barrier(jnp.take(rw_flat, flat))
        base = (pw >> sh_p) & U32(3)
        is_n = ((jnp.take(nm_flat, flat) >> sh_p) & U32(1)) == U32(1)
        k2, l2 = fm.extend(idx, base, ek, el)
        good = alive & ~is_n & (k2 <= l2)
        ek = jnp.where(good, k2, ek)
        el = jnp.where(good, l2, el)
        eoff = jnp.where(good, eoff - 1, eoff)
        alive = good & (el - ek + U32(1) > U32(seg_cap)) & (eoff > 0)
        return (t + 1, ek, el, eoff, alive)

    alive2 = in_w & ~killw & (w1 > U32(seg_cap)) & (eoff > 0)
    _, ek, el, eoff, _ = lax.while_loop(
        ext2_cond, ext2_body, (jnp.int32(0), ek, el, eoff, alive2))
    # positions excluded by the over-extension are missed candidates
    w2 = el - ek + U32(1)
    ext2_missed = jnp.where(alive2, jnp.minimum(w1 - w2, U32(1) << U32(24)),
                            U32(0)).astype(I32)
    extra_missed = jnp.zeros(R, I32).at[widx].add(ext2_missed, mode="drop")

    k = k.at[widx].set(ek, mode="drop")
    l = l.at[widx].set(el, mode="drop")
    seg_off = seg_off.at[widx].set(eoff, mode="drop")
    matched = matched.at[widx].set(~killw, mode="drop")
    w = jnp.where(matched, l - k + U32(1), U32(0))

    c_full = jnp.where(matched, w, U32(0)).astype(I32)
    c = jnp.minimum(c_full, seg_cap).reshape(n_seg, B)
    n_missed = (c_full - jnp.minimum(c_full, seg_cap) + extra_missed) \
        .reshape(n_seg, B).sum(axis=0)
    kk = k.reshape(n_seg, B)
    soff = seg_off.reshape(n_seg, B)

    # 1d. narrowest-first per-read segment order: the narrowest matched
    # segment has the fewest repeat copies and so carries the most
    # information per slot — it claims slots first.  Both the CC cap and
    # the slot-major pool compaction below then spend their budget on the
    # most specific candidates; in segment-index order a wide leading
    # repeat segment starves the narrow segment that actually localizes
    # the read (repeat-genome fallback was dominated by exactly this).
    cf2 = c_full.reshape(n_seg, B)
    order = jnp.argsort(jnp.where(cf2 > 0, cf2, jnp.int32(0x7FFFFFFF)),
                        axis=0).astype(I32)
    c = jnp.take_along_axis(c, order, axis=0)
    kk = jnp.take_along_axis(kk, order, axis=0)
    soff = jnp.take_along_axis(soff, order, axis=0)

    # 2. slot assignment (read-major flat [B*CC]: read j's slots contiguous)
    starts = [jnp.zeros(B, I32)]
    for s in range(1, n_seg):
        starts.append(starts[-1] + c[s - 1])
    total = starts[-1] + c[n_seg - 1]
    n_missed = n_missed + jnp.maximum(total - CC, 0)

    slot = jnp.broadcast_to(jnp.arange(CC, dtype=I32)[:, None], (CC, B))
    ranks = jnp.zeros((CC, B), U32)
    soff_m = jnp.zeros((CC, B), I32)
    filled = jnp.zeros((CC, B), bool)
    for s in range(n_seg):
        st = starts[s][None, :]
        inseg = (slot >= st) & (slot < st + c[s][None, :])
        ranks = jnp.where(inseg, kk[s][None, :] + (slot - st).astype(U32), ranks)
        soff_m = jnp.where(inseg, soff[s][None, :], soff_m)
        filled = filled | inseg

    # read-major flattening: flat index = read*CC + slot
    ranks_f = ranks.T.reshape(-1)
    soff_f = soff_m.T.reshape(-1)

    # 3. dense pool compaction (dead slots pay nothing downstream).
    # Compaction priority is SLOT-MAJOR: every lane's first candidate
    # outranks any lane's second, so pool overflow shaves candidates
    # evenly across lanes instead of starving the batch tail (repeat-
    # dense batches overflow routinely; fairness keeps every lane's
    # best candidates so overflow degrades MAPQ, not mapping).
    filled_s = filled.reshape(-1)              # [CC*B] slot-major
    n_filled = filled_s.sum()
    sidx = jnp.nonzero(filled_s, size=POOL, fill_value=CC * B)[0]
    cidx = jnp.where(sidx < CC * B,
                     (sidx % B) * CC + sidx // B, B * CC)
    in_pool = jnp.arange(POOL) < n_filled
    pool_over = n_filled > POOL
    # candidates at/after the pool cutoff are lost; counted into
    # n_missed (truncation), not a fallback
    cutoff = jnp.where(pool_over, sidx[POOL - 1], jnp.int32(CC * B))
    lost = filled_s & (jnp.arange(CC * B) > cutoff)
    n_missed = n_missed + lost.reshape(CC, B).sum(axis=0)

    pranks = jnp.take(ranks_f, cidx)          # clamped at fill; masked below
    psoff = jnp.take(soff_f, cidx)
    pread = jnp.minimum(cidx // CC, B - 1)
    # ALL per-read verify data in ONE fat row gather (4*RW packed words +
    # lens|md): per-word takes here measured ~35 ms/batch on their own
    combo = jnp.concatenate(
        [rw, vmask, nmask, seedmask,
         (lens.astype(U32) | (md.astype(U32) << U32(16)))[:, None]], axis=1)
    crow = lax.optimization_barrier(jnp.take(combo, pread, axis=0))
    plens = (crow[:, 4 * RW] & U32(0xFFFF)).astype(I32)
    pmd = (crow[:, 4 * RW] >> U32(16)).astype(I32)

    # 4. locate pooled candidates (fused-row LF walk, 1 gather/step)
    ppos = fm.locate(idx, jnp.where(in_pool, pranks, U32(0)))
    pstart = ppos - psoff.astype(U32)          # wraps when ppos < psoff
    # window fetch is valid whenever SOME (possibly gapped) alignment could
    # start in-text: ppos + G >= psoff keeps padded coords non-negative
    fetch_ok = in_pool & (ppos + U32(G) >= psoff.astype(U32))
    pvalid = (in_pool & (ppos >= psoff.astype(U32))
              & (pstart + plens.astype(U32) <= n))

    # 5. window extraction: NR text-row gathers cover
    #    [pstart - G, pstart - G + 128*NR) in lead-padded row coordinates
    startf = jnp.where(fetch_ok, pstart + U32(128 - G), U32(0))
    r0 = (startf >> U32(7)).astype(I32)
    rowsN = lax.optimization_barrier(
        jnp.take(text_rows, jnp.concatenate([r0 + i for i in range(NR)]),
                 axis=0))
    words = [rowsN[i * POOL:(i + 1) * POOL, t]
             for i in range(NR) for t in range(8)]
    ws = ((startf >> U32(4)) & U32(7)).astype(I32)
    sh = (U32(2) * (startf & U32(15))).astype(U32)
    sh_nz = sh > 0
    inv = jnp.where(sh_nz, U32(32) - sh, U32(1))
    WW = []                          # window words: base (pstart - G + 16t)
    for t in range(DW + 1):
        lo = _selectn(words, ws + t)
        hi = _selectn(words, ws + t + 1)
        WW.append(jnp.where(sh_nz, (lo >> sh) | (hi << inv), lo))

    def diag_words(d):
        """Packed window words of diagonal d: base (pstart - G + d + 16t)."""
        if d == 0:
            return WW
        s2, v2 = U32(2 * d), U32(32 - 2 * d)
        return [(WW[t] >> s2) | (WW[t + 1] << v2) for t in range(DW)]

    # 5a. ungapped verify on the central diagonal (d = G)
    PATC = U32(_PAT)
    ud = diag_words(G)
    mm_u, nmm_f, seed_f = [], jnp.zeros(POOL, U32), jnp.zeros(POOL, U32)
    for t in range(DW):
        d = ud[t] ^ crow[:, t]
        vm = crow[:, RW + t]
        nm = crow[:, 2 * RW + t]
        sm = crow[:, 3 * RW + t]
        mm = (((d | (d >> U32(1))) & PATC) | nm) & vm
        mm_u.append(mm)
        nmm_f = nmm_f + lax.population_count(mm)
        seed_f = seed_f + lax.population_count(mm & sm)
    pnmm = nmm_f.astype(I32)
    pvalid = (pvalid & (pnmm <= pmd)
              & (seed_f.astype(I32) <= opt.max_seed_diff))

    # 6. results stay in POOL form (round 4): pos/nmm/valid/cidx are
    # pool-indexed, cidx = read-major flat slot id (lane = cidx // CC).
    # The old slot-major [B*CC] scatter cost a B*CC-sized readback that
    # capped CC at 16; pool form reads back O(POOL) regardless of CC.
    pos_o = jnp.where(pvalid, pstart, U32(0))
    nmm_o = pnmm.astype(jnp.uint8)
    val_o = pvalid

    # 7. gapped verify (G > 0): pool-2 screen of one-run gap placements
    if G > 0:
        # per-read best ungapped nmm via scatter-min over the pool
        n2 = jnp.full(B, _BIGNMM, I32).at[pread].min(
            jnp.where(pvalid, pnmm, _BIGNMM), mode="drop")
        best_sc = n2 * opt.s_mm
        # gapped records can only enter the reporting window when the
        # lane's best ungapped score admits them (or no ungapped hit)
        need_gap = best_sc >= (opt.s_gapo - opt.s_mm)
        gate = fetch_ok & jnp.take(need_gap, pread)
        n_gate = gate.sum()
        gidx = jnp.nonzero(gate, size=GPOOL, fill_value=POOL)[0]
        in_g = jnp.arange(GPOOL) < n_gate
        g_over = n_gate > GPOOL
        gcut = jnp.where(g_over, gidx[GPOOL - 1], jnp.int32(POOL))
        # pool-2 overflow: candidates past the cutoff lose their gapped
        # screen.  Pool order is slot-major (fair), so the loss shaves
        # every read's LAST candidates; counted into n_missed
        # (truncation — conservative MAPQ + beam only when the read ends
        # with no occurrences) instead of a blanket fallback, which made
        # repeat-dense batches re-run 14% of reads on the beam.
        g_lostp = gate & (jnp.arange(POOL) > gcut)
        n_missed = n_missed + (jnp.zeros(B, I32).at[
            jnp.where(g_lostp, pread, B)].add(1, mode="drop"))

        def g2(x):
            return jnp.take(x, jnp.minimum(gidx, POOL - 1), axis=0)

        pstart2 = g2(pstart)
        plens2 = g2(plens)
        pmd2 = g2(pmd)
        pread2 = g2(pread)
        crow2 = g2(crow)
        WW2 = g2(jnp.stack(WW, axis=1))

        LT = 16 * DW
        seed_start = (plens2 - opt.seed_len)[:, None]     # [P2, 1]
        tpos = jnp.arange(LT, dtype=I32)[None, :]          # [1, LT]
        skip = opt.indel_end_skip
        Lv2 = plens2[:, None]

        def diag_prefix(d):
            """(mm prefix, mm total, seed prefix, seed total) of diag d."""
            s2, v2_ = U32(2 * d), U32(32 - 2 * d)
            mmw, smw = [], []
            for t in range(DW):
                if d == 0:
                    win = WW2[:, t]
                else:
                    win = (WW2[:, t] >> s2) | (WW2[:, t + 1] << v2_)
                x = win ^ crow2[:, t]
                mm = ((((x | (x >> U32(1))) & PATC) | crow2[:, 2 * RW + t])
                      & crow2[:, RW + t])
                mmw.append(mm)
                smw.append(mm & crow2[:, 3 * RW + t])
            Pm, Tm = _expand_prefix(jnp.stack(mmw, axis=1), DW)
            Ps, Ts = _expand_prefix(jnp.stack(smw, axis=1), DW)
            return Pm, Tm[:, None], Ps, Ts[:, None]

        PG, TG, SG, TSG = diag_prefix(G)
        BIG = jnp.int32(_BIGNMM)
        # per-q-class (delta in [-G, G]) minimum: key = score<<8|g<<4|nmm
        class_key = [jnp.full(GPOOL, _BIGKEY, U32) for _ in range(2 * G + 1)]

        def upd_class(ci, nmm_best, g):
            key = ((nmm_best.astype(U32) * U32(opt.s_mm)
                    + U32(opt.s_gapo + opt.s_gape * (g - 1))) << U32(8)) \
                | (U32(g) << U32(4)) | nmm_best.astype(U32)
            key = jnp.where(nmm_best < BIG, key, U32(_BIGKEY))
            class_key[ci] = jnp.minimum(class_key[ci], key)

        for g in range(1, G + 1):
            feas_g = (jnp.int32(g) <= pmd2)[:, None]
            Pp, Tp, Sp, TSp = diag_prefix(G + g)
            Pm_, Tm_, Sm_, TSm_ = diag_prefix(G - g)

            def shift(P, gg):
                return jnp.concatenate(
                    [P[:, gg:], jnp.broadcast_to(BIG, (GPOOL, gg))], axis=1)

            # deletion, gap after anchor: q = pstart (class delta 0)
            tm = (tpos >= skip) & (tpos <= Lv2 - skip)
            gseed = jnp.where(tpos > seed_start, g, 0)
            nmm_t = PG + (Tp - Pp)
            sd_t = SG + (TSp - Sp) + gseed
            ok_t = tm & feas_g & (nmm_t + g <= pmd2[:, None]) \
                & (sd_t <= opt.max_seed_diff)
            q_ok = (pstart2 < n) & (pstart2 + plens2.astype(U32) + U32(g) <= n)
            nb = jnp.where(ok_t & q_ok[:, None], nmm_t, BIG).min(axis=1)
            upd_class(G, nb, g)

            # deletion, gap before anchor: q = pstart - g (class delta -g)
            nmm_t = Pm_ + (TG - PG)
            sd_t = Sm_ + (TSG - SG) + gseed
            q2 = pstart2 - U32(g)
            ok_t = tm & feas_g & (nmm_t + g <= pmd2[:, None]) \
                & (sd_t <= opt.max_seed_diff)
            q_ok = (q2 < n) & (q2 + plens2.astype(U32) + U32(g) <= n)
            nb = jnp.where(ok_t & q_ok[:, None], nmm_t, BIG).min(axis=1)
            upd_class(G - g, nb, g)

            # insertion, gap after anchor: q = pstart (class delta 0);
            # read positions t..t+g-1 are the inserted run
            tm_i = (tpos >= skip - 1) & (tpos <= Lv2 - skip - g)
            iseed = jnp.clip(tpos + g - seed_start, 0, g)
            nmm_t = PG + (Tm_ - shift(Pm_, g))
            sd_t = SG + (TSm_ - shift(Sm_, g)) + iseed
            ok_t = tm_i & feas_g & (nmm_t + g <= pmd2[:, None]) \
                & (sd_t <= opt.max_seed_diff)
            q_ok = (pstart2 < n) & (pstart2 + (plens2 - g).astype(U32) <= n)
            nb = jnp.where(ok_t & q_ok[:, None], nmm_t, BIG).min(axis=1)
            upd_class(G, nb, g)

            # insertion, gap before anchor: q = pstart + g (class delta +g)
            nmm_t = Pp + (TG - shift(PG, g))
            sd_t = Sp + (TSG - shift(SG, g)) + iseed
            q3 = pstart2 + U32(g)
            ok_t = tm_i & feas_g & (nmm_t + g <= pmd2[:, None]) \
                & (sd_t <= opt.max_seed_diff)
            q_ok = (q3 < n) & (q3 + (plens2 - g).astype(U32) <= n)
            nb = jnp.where(ok_t & q_ok[:, None], nmm_t, BIG).min(axis=1)
            upd_class(G + g, nb, g)

        # top-GC_SLOTS q-classes by packed key (score-major)
        kmat = jnp.stack(class_key, axis=1)               # [P2, 2G+1]
        qmat = (pstart2[:, None]
                + jnp.arange(-G, G + 1, dtype=jnp.int32).astype(U32)[None, :])
        out_k, out_q = [], []
        for _ in range(min(GC_SLOTS, 2 * G + 1)):
            i = jnp.argmin(kmat, axis=1)
            oh = jnp.arange(2 * G + 1)[None, :] == i[:, None]
            out_k.append(jnp.take_along_axis(kmat, i[:, None], axis=1)[:, 0])
            out_q.append(jnp.take_along_axis(qmat, i[:, None], axis=1)[:, 0])
            kmat = jnp.where(oh, U32(_BIGKEY), kmat)
        while len(out_k) < GC_SLOTS:
            out_k.append(jnp.full(GPOOL, _BIGKEY, U32))
            out_q.append(jnp.zeros(GPOOL, U32))
        g_key = jnp.stack(out_k, axis=1)
        g_q = jnp.stack(out_q, axis=1)
        # conservative overflow: a dropped q-class could still enter the
        # reporting window (score <= kept best + s_mm) — counted as a
        # missed candidate (truncation), like every other capacity miss
        if 2 * G + 1 > GC_SLOTS:
            rem_key = kmat.min(axis=1)
            rem = rem_key >> U32(8)
            kept = out_k[0] >> U32(8)
            g_drop = in_g & (rem_key != U32(_BIGKEY)) \
                & (rem <= kept + U32(opt.s_mm))
            n_missed = n_missed + (jnp.zeros(B, I32).at[
                jnp.where(g_drop, pread2, B)].add(1, mode="drop"))
        g_key = jnp.where(in_g[:, None], g_key, U32(_BIGKEY))
        g_read = jnp.where(in_g, pread2, jnp.int32(B))
    else:
        g_q = jnp.zeros((1, GC_SLOTS), U32)
        g_key = jnp.full((1, GC_SLOTS), _BIGKEY, U32)
        g_read = jnp.full(1, B, I32)
        n_gate = jnp.int32(0)

    # 8. structural fallback (shape/budget beyond the pigeonhole screen).
    # Capacity misses (wide repeat intervals, slot/pool overflow) are NOT
    # fallbacks anymore: they enumerate a capped candidate subset and
    # report the shortfall in n_missed; the caller re-runs a truncated
    # read on the beam only when NO candidate verified.
    fallback = short_fb | (md > (n_seg - 1))
    if opt.max_gapo > 0 and opt.max_gape + 1 > G:
        # the MAX_GAP_RUN clamp bound: reads whose budget admits a gap
        # run longer than the screened G must take the exhaustive beam
        fallback = fallback | (md > G)
    return PigeonResult(pos=pos_o, nmm=nmm_o, valid=val_o,
                        cidx=cidx.astype(I32), fallback=fallback,
                        n_cand=jnp.minimum(total, CC),
                        g_q=g_q, g_key=g_key, g_read=g_read,
                        n_gate=jnp.asarray(n_gate, I32),
                        n_missed=n_missed)


def unpack_gap_key(key):
    """Packed gapped key -> (score, gap_len, nmm) int arrays."""
    key = np.asarray(key, np.uint32)
    return (key >> 8).astype(np.int64), ((key >> 4) & 0xF).astype(np.int64), \
        (key & 0xF).astype(np.int64)


def fetch_result(res: PigeonResult) -> PigeonResult:
    """Overlapped device->host transfer of every result array.

    A TINY sync readback goes first: on the axon backend, async host
    copies issued against still-executing outputs land in the slow
    queued regime (~490 ms/batch measured); one scalar readback forces
    the execution to complete in the fast sync mode, after which the
    fat copies are pure transfers.  They are issued async so the
    per-array tunnel RTTs (~15 ms each) overlap.  When no lane needed
    the gapped screen (n_gate == 0 — every lane on clean mismatch
    workloads), the pool-2 arrays are synthesized empty host-side
    instead of transferred (~2-3 MB/batch saved at ~80 MB/s).
    """
    if not hasattr(res.n_gate, "copy_to_host_async"):
        return PigeonResult(*(np.asarray(x) for x in res))
    n_gate = int(np.asarray(res.n_gate).sum())  # sync point (scalar;
    # the sharded form carries one count per data slice)
    if n_gate == 0:
        GC = res.g_key.shape[1]
        B = res.fallback.shape[0]
        skip = dict(g_q=np.zeros((1, GC), np.uint32),
                    g_key=np.full((1, GC), _BIGKEY, np.uint32),
                    g_read=np.full(1, 2 * B, np.int32))
    else:
        skip = {}
    fields = res._asdict()
    for k, x in fields.items():
        if k not in skip and hasattr(x, "copy_to_host_async"):
            x.copy_to_host_async()
    return PigeonResult(**{k: (skip[k] if k in skip else np.asarray(x))
                           for k, x in fields.items()})


def pigeon_occurrences(res: PigeonResult, B: int, opt, cand_cap: int):
    """Host finalization (READS BACK): per-read deduped Occurrence lists.

    Lanes [0, B) are forward-strand reads, [B, 2B) their reverse
    complements (the ``pipeline.search_batch_device`` convention).
    Merges the ungapped candidate slots with the gapped pool-2 classes;
    dedup keeps the minimum score per (pos, strand).
    Returns (occs per read [B], fallback bool[B], missed int32[B]) —
    ``missed[j] > 0`` means read j's candidate enumeration was CAPPED
    (repeat intervals / slot / pool overflow): its occurrence list is a
    truncated subset and MAPQ must be suppressed accordingly.
    """
    from ..resolve.samse import Occurrence
    CC = cand_cap
    s_mm = opt.s_mm
    pos = np.asarray(res.pos)
    nmm = np.asarray(res.nmm)
    valid = np.asarray(res.valid)
    cidx = np.asarray(res.cidx, np.int64)
    fallback = np.asarray(res.fallback)
    B2 = fallback.shape[0]
    assert B2 == 2 * B, (B2, B)
    fb = fallback[:B] | fallback[B:]
    miss_all = np.asarray(res.n_missed, np.int64)
    missed = miss_all[:B] + miss_all[B:]

    # pool-form ungapped entries grouped by lane (cidx // CC)
    ung_by_lane: dict[int, list] = {}
    for i in np.nonzero(valid)[0]:
        ung_by_lane.setdefault(int(cidx[i]) // CC, []).append(
            (int(pos[i]), int(nmm[i])))

    # gapped pool-2 entries grouped by lane
    g_read = np.asarray(res.g_read)
    g_q = np.asarray(res.g_q)
    g_key = np.asarray(res.g_key)
    gap_by_lane: dict[int, list] = {}
    live = np.nonzero((g_read < B2) & (g_key != _BIGKEY).any(axis=1))[0]
    for i in live:
        lane = int(g_read[i])
        for s in range(g_key.shape[1]):
            kv = int(g_key[i, s])
            if kv == _BIGKEY:
                continue
            score, g, nm = kv >> 8, (kv >> 4) & 0xF, kv & 0xF
            gap_by_lane.setdefault(lane, []).append(
                (int(g_q[i, s]), score, nm, g))

    def better(cur, score, ngapo, ngape, nm):
        # canonical dedup order (shared with pigeon_occ_arrays):
        # min (score, ngapo, ngape, nmm) wins
        return cur is None or (cur.score, cur.ngapo, cur.ngape, cur.nmm) \
            > (score, ngapo, ngape, nm)

    occs = []
    for j in range(B):
        d = {}
        if not fb[j]:
            for lane, strand in ((j, 0), (j + B, 1)):
                for p, nm in ung_by_lane.get(lane, ()):
                    key = (p, strand)
                    if better(d.get(key), nm * s_mm, 0, 0, nm):
                        d[key] = Occurrence(p, strand, nm * s_mm, nm, 0, 0)
                for q, score, nm, g in gap_by_lane.get(lane, ()):
                    key = (q, strand)
                    if better(d.get(key), score, 1, g - 1, nm):
                        d[key] = Occurrence(q, strand, score, nm, 1, g - 1)
        occs.append(sorted(d.values(), key=lambda o: (o.score, o.strand, o.pos)))
    return occs, fb, missed


def pigeon_occ_arrays(res: PigeonResult, B: int, opt, cand_cap: int):
    """Vectorized host finalization: flat occurrence ARRAYS, no Python
    per-occurrence objects (the loop twin is :func:`pigeon_occurrences`;
    tested equal).

    Returns (occ dict, fallback bool[B], missed int32[B]; see
    :func:`pigeon_occurrences` for the ``missed`` contract).  The dict
    holds numpy arrays ``rid, pos, strand, score, nmm, ngapo, ngape``
    deduped per (rid, strand, pos) by minimum (score, ngapo, ngape, nmm)
    and sorted by (rid, score, strand, pos) — the order the resolution
    layer consumes.  Entries of fallback reads are dropped.
    """
    CC = cand_cap
    s_mm = opt.s_mm
    pos = np.asarray(res.pos)
    nmm = np.asarray(res.nmm)
    valid = np.asarray(res.valid)
    cidx = np.asarray(res.cidx, np.int64)
    fallback = np.asarray(res.fallback)
    B2 = fallback.shape[0]
    assert B2 == 2 * B, (B2, B)
    fb = fallback[:B] | fallback[B:]
    miss_all = np.asarray(res.n_missed, np.int64)
    missed = miss_all[:B] + miss_all[B:]

    pi = np.nonzero(valid)[0]
    li = cidx[pi] // CC
    u_pos = pos[pi].astype(np.int64)
    u_nmm = nmm[pi].astype(np.int32)
    u_rid = np.where(li < B, li, li - B).astype(np.int64)
    u_str = (li >= B).astype(np.int8)
    u_sc = u_nmm * s_mm
    u_go = np.zeros(li.size, np.int32)
    u_ge = np.zeros(li.size, np.int32)

    g_read = np.asarray(res.g_read)
    g_key = np.asarray(res.g_key)
    g_q = np.asarray(res.g_q)
    gi, gs = np.nonzero((g_key != _BIGKEY) & (g_read < B2)[:, None])
    lane = g_read[gi]
    kv = g_key[gi, gs].astype(np.int64)
    v_pos = g_q[gi, gs].astype(np.int64)
    v_sc = (kv >> 8).astype(np.int32)
    v_g = ((kv >> 4) & 0xF).astype(np.int32)
    v_nmm = (kv & 0xF).astype(np.int32)
    v_rid = np.where(lane < B, lane, lane - B).astype(np.int64)
    v_str = (lane >= B).astype(np.int8)
    v_go = np.ones(gi.size, np.int32)
    v_ge = v_g - 1

    rid = np.concatenate([u_rid, v_rid])
    o_pos = np.concatenate([u_pos, v_pos])
    o_str = np.concatenate([u_str, v_str])
    o_sc = np.concatenate([u_sc, v_sc])
    o_nmm = np.concatenate([u_nmm, v_nmm])
    o_go = np.concatenate([u_go, v_go])
    o_ge = np.concatenate([u_ge, v_ge])

    keep = ~fb[rid]
    rid, o_pos, o_str, o_sc, o_nmm, o_go, o_ge = (
        a[keep] for a in (rid, o_pos, o_str, o_sc, o_nmm, o_go, o_ge))

    # dedup per (rid, strand, pos): min (score, ngapo, ngape, nmm)
    order = np.lexsort((o_nmm, o_ge, o_go, o_sc, o_pos, o_str, rid))
    rid, o_pos, o_str, o_sc, o_nmm, o_go, o_ge = (
        a[order] for a in (rid, o_pos, o_str, o_sc, o_nmm, o_go, o_ge))
    first = np.ones(rid.size, bool)
    first[1:] = ((rid[1:] != rid[:-1]) | (o_str[1:] != o_str[:-1])
                 | (o_pos[1:] != o_pos[:-1]))
    rid, o_pos, o_str, o_sc, o_nmm, o_go, o_ge = (
        a[first] for a in (rid, o_pos, o_str, o_sc, o_nmm, o_go, o_ge))

    # canonical consumption order: (rid, score, strand, pos)
    order = np.lexsort((o_pos, o_str, o_sc, rid))
    occ = dict(rid=rid[order], pos=o_pos[order], strand=o_str[order],
               score=o_sc[order], nmm=o_nmm[order], ngapo=o_go[order],
               ngape=o_ge[order])
    return occ, fb, missed


def occ_arrays_to_lists(occ, B):
    """Flat occurrence arrays -> per-read Occurrence lists.

    The inverse adapter of :func:`occ_lists_to_arrays` for consumers that
    need list form (paired-end resolution): arrays arrive deduped and
    sorted by (rid, score, strand, pos), so appending in order preserves
    the canonical list ordering.  One pass over ACTUAL occurrences
    (~1-3/read) — ~10x cheaper than scanning the per-slot matrices.
    """
    from ..resolve.samse import Occurrence
    occs = [[] for _ in range(B)]
    rid = occ["rid"].tolist()
    pos = occ["pos"].tolist()
    strand = occ["strand"].tolist()
    score = occ["score"].tolist()
    nmm = occ["nmm"].tolist()
    go = occ["ngapo"].tolist()
    ge = occ["ngape"].tolist()
    for i in range(len(rid)):
        occs[rid[i]].append(Occurrence(pos[i], strand[i], score[i],
                                       nmm[i], go[i], ge[i]))
    return occs


def occ_lists_to_arrays(occs):
    """Adapter: per-read Occurrence lists -> the flat array dict of
    :func:`pigeon_occ_arrays` (lists are already deduped + sorted)."""
    rid, pos, strand, score, nmm, ngapo, ngape = [], [], [], [], [], [], []
    for j, lst in enumerate(occs):
        for o in lst:
            rid.append(j); pos.append(o.pos); strand.append(o.strand)
            score.append(o.score); nmm.append(o.nmm)
            ngapo.append(o.ngapo); ngape.append(o.ngape)
    return dict(rid=np.asarray(rid, np.int64), pos=np.asarray(pos, np.int64),
                strand=np.asarray(strand, np.int8),
                score=np.asarray(score, np.int32),
                nmm=np.asarray(nmm, np.int32),
                ngapo=np.asarray(ngapo, np.int32),
                ngape=np.asarray(ngape, np.int32))
