"""Pigeonhole seed-and-verify engine — the TPU-shaped fast path for
mismatch-bounded short-read alignment.

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
4. **Verify**: fetch the 2-bit packed text window around each candidate
   (2 row gathers) and count mismatches with flat XOR/popcount lanes —
   no gathers, pure VPU.

Per read this is ~10x fewer row gathers than the beam and has NO
overflow failure mode: every capacity miss (repetitive segment,
candidate-pool full) sets a per-read ``fallback`` flag and the caller
re-runs those reads on the exhaustive beam ladder — the pigeonhole hit
set is exact, never approximate.

Parity contract: for mismatch-only verification the enumerated
occurrence set equals the oracle's (all ≤ md-mismatch alignments; the
resolve layer applies the best+s_mm reporting window).  When gap budgets
are enabled, gapped alignments can only affect the reported records if
``s_gapo <= best_ungapped + s_mm`` or no ungapped hit exists — both
conditions set ``fallback`` (the beam handles those reads), so records
stay record-equal with the oracle.  Reads whose budget exceeds
``n_seg - 1`` always fall back.

Shape limits: read length <= 112 (the two-row 256-base window must cover
len + 15 alignment slack); longer reads are the caller's fallback.
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
MAX_READ_LEN = 112


class PigeonResult(NamedTuple):
    """Device-side result.  Candidate matrices are flat [B*CC] read-major
    (read j's slots at [j*CC, (j+1)*CC))."""
    pos: jnp.ndarray        # uint32[B*CC] candidate start positions
    nmm: jnp.ndarray        # int32[B*CC] verified mismatch counts
    valid: jnp.ndarray      # bool[B*CC]
    fallback: jnp.ndarray   # bool[B]  read needs the exhaustive beam
    n_cand: jnp.ndarray     # int32[B] enumerated candidates (pre-dedup)


def pack_text_rows(text: np.ndarray) -> np.ndarray:
    """uint32[nt, 8] rows of 128 packed 2-bit bases (for window fetches).

    One extra all-zero row pads the tail so ``row+1`` is always valid.
    """
    t = np.asarray(text, dtype=np.uint8) & 3
    n = len(t)
    nt = n // 128 + 2
    padded = np.zeros(nt * 128, dtype=np.uint32)
    padded[:n] = t
    w = padded.reshape(nt * 8, 16)
    shifts = (2 * np.arange(16, dtype=np.uint32))[None, :]
    return (w << shifts).sum(axis=1, dtype=np.uint64).astype(np.uint32).reshape(nt, 8)


def auto_anchor_tail(n: int, kmer_k: int, lo: int = 3, hi: int = 8) -> int:
    """Anchor length so spurious candidates stay rare: 4^(K+tail) >= 64*n
    (expected spurious occurrences per anchor <= 1/64)."""
    import math
    need = math.ceil(math.log(max(64 * n, 4), 4)) - kmer_k
    return max(lo, min(hi, need))


def pack_pigeon_batch(reads, n_seg: int = 3, max_len: int | None = None,
                      seed_len: int = 32, kmer_k: int = 0,
                      anchor_tail: int = 6):
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
    for s in range(n_seg):
        a = lens * s // n_seg
        b = lens * (s + 1) // n_seg
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
    vmask = packbits(inlen.astype(np.uint32))
    nmask = packbits((isn & inlen).astype(np.uint32))
    seedmask = packbits((inlen & (t[None, :] >=
                                  np.maximum(Lv - seed_len, 0))).astype(np.uint32))
    return dict(segs_rev=segs_rev.reshape(n_seg * B, SL),
                seg_lens=seg_lens.reshape(-1), seg_off=seg_off.reshape(-1),
                kmer=kmer.reshape(-1), kmer_ok=kmer_ok.reshape(-1),
                seg_short=seg_short.reshape(-1),
                rw=rw, nmask=nmask, vmask=vmask, seedmask=seedmask, lens=lens)


def _select16(words, idx16):
    """words: list of 16 [N] vectors; idx16: int32 [N] in [0, 15]."""
    def sel(lo, hi, bit):
        return [jnp.where((idx16 & bit) == 0, a, b) for a, b in zip(lo, hi)]
    w = sel(words[:8], words[8:], 8)
    w = sel(w[:4], w[4:], 4)
    w = sel(w[:2], w[2:], 2)
    w = sel(w[:1], w[1:], 1)
    return w[0]


def pigeon_search(idx, text_rows, segs_rev, seg_lens, seg_off, rw, nmask,
                  vmask, seedmask, lens, md, opt, *, n_seg: int = 3,
                  seg_cap: int = 32, cand_cap: int = 32,
                  pool: int | None = None, kmer_seed=None) -> PigeonResult:
    """Device pigeonhole search (see module docstring).  Traceable; all
    array arguments must reach the jit as parameters, not closures.

    md: int32[B] per-read diff budgets.  ``pool``: dense candidate-pool
    capacity (default 4*B).  ``kmer_seed``: optional
    (tk, tl, kmer, kmer_ok, seg_short) — K-mer-table seeding from
    :func:`hsa_tpu.search.exact.kmer_table` + ``pack_pigeon_batch``'s
    kmer fields; replaces the first K scan steps of every segment with
    one table gather per interval end.
    """
    lens = jnp.asarray(lens, I32)
    md = jnp.asarray(md, I32)
    B = lens.shape[0]
    CC = cand_cap
    RW = rw.shape[1]
    POOL = pool or 4 * B

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
    w = jnp.where(matched, l - k + U32(1), U32(0))
    ok = matched & (w <= U32(seg_cap))
    c = jnp.where(ok, w, U32(0)).astype(I32).reshape(n_seg, B)
    kk = k.reshape(n_seg, B)
    soff = seg_off.reshape(n_seg, B).astype(I32)
    seg_over = (matched & (w > U32(seg_cap))).reshape(n_seg, B).any(axis=0)

    # 2. slot assignment (read-major flat [B*CC]: read j's slots contiguous)
    starts = [jnp.zeros(B, I32)]
    for s in range(1, n_seg):
        starts.append(starts[-1] + c[s - 1])
    total = starts[-1] + c[n_seg - 1]
    cand_over = total > CC

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
    filled_f = filled.T.reshape(-1)
    ranks_f = ranks.T.reshape(-1)
    soff_f = soff_m.T.reshape(-1)

    # 3. dense pool compaction (dead slots pay nothing downstream)
    n_filled = filled_f.sum()
    cidx = jnp.nonzero(filled_f, size=POOL, fill_value=B * CC)[0]
    in_pool = jnp.arange(POOL) < n_filled
    pool_over = n_filled > POOL
    # reads with a filled slot at/after the pool cutoff lost candidates
    cutoff = jnp.where(pool_over, cidx[POOL - 1], jnp.int32(B * CC))
    lost = filled_f & (jnp.arange(B * CC) > cutoff)
    pool_lost = lost.reshape(B, CC).any(axis=1)

    pranks = jnp.take(ranks_f, cidx)          # clamped at fill; masked below
    psoff = jnp.take(soff_f, cidx)
    pread = jnp.minimum(cidx // CC, B - 1)
    # ALL per-read verify data in ONE fat row gather (32 packed words +
    # lens|md): per-word takes here measured ~35 ms/batch on their own
    combo = jnp.concatenate(
        [rw, vmask, nmask, seedmask,
         (lens.astype(U32) | (md.astype(U32) << U32(16)))[:, None]], axis=1)
    crow = lax.optimization_barrier(jnp.take(combo, pread, axis=0))
    plens = (crow[:, 4 * RW] & U32(0xFFFF)).astype(I32)
    pmd = (crow[:, 4 * RW] >> U32(16)).astype(I32)

    # 4. locate pooled candidates (fused-row LF walk, 1 gather/step)
    ppos = fm.locate(idx, jnp.where(in_pool, pranks, U32(0)))
    pstart = ppos - psoff.astype(U32)
    pvalid = (in_pool & (ppos >= psoff.astype(U32))
              & (pstart + plens.astype(U32) <= jnp.uint32(idx.n)))

    # 5. verify: 2 text-row gathers cover [start, start+len)
    startf = jnp.where(pvalid, pstart, U32(0))
    r0 = (startf >> U32(7)).astype(I32)
    rows2 = lax.optimization_barrier(
        jnp.take(text_rows, jnp.concatenate([r0, r0 + 1]), axis=0))
    words = ([rows2[:POOL, t] for t in range(8)]
             + [rows2[POOL:, t] for t in range(8)])
    ws = ((startf >> U32(4)) & U32(7)).astype(I32)
    sh = (U32(2) * (startf & U32(15))).astype(U32)
    sh_nz = sh > 0
    inv = jnp.where(sh_nz, U32(32) - sh, U32(1))

    PAT = U32(_PAT)
    nmm_f = jnp.zeros(POOL, U32)
    seed_f = jnp.zeros(POOL, U32)
    for t in range(RW):
        lo = _select16(words, ws + t)
        hi = _select16(words, ws + t + 1)
        win = jnp.where(sh_nz, (lo >> sh) | (hi << inv), lo)
        d = win ^ crow[:, t]
        vm = crow[:, RW + t]
        nm = crow[:, 2 * RW + t]
        sm = crow[:, 3 * RW + t]
        mm = (((d | (d >> U32(1))) & PAT) | nm) & vm
        nmm_f = nmm_f + lax.population_count(mm)
        seed_f = seed_f + lax.population_count(mm & sm)
    pnmm = nmm_f.astype(I32)
    pvalid = (pvalid & (pnmm <= pmd)
              & (seed_f.astype(I32) <= opt.max_seed_diff))

    # 6. scatter pool back to read-major slots (fill index B*CC drops)
    pos_o = jnp.zeros(B * CC, U32).at[cidx].set(jnp.where(pvalid, pstart, U32(0)))
    nmm_o = jnp.zeros(B * CC, I32).at[cidx].set(pnmm)
    val_o = jnp.zeros(B * CC, bool).at[cidx].set(pvalid)

    # 7. structural fallback (capacity misses / budget beyond pigeonhole).
    # The gapped-window fallback is decided per READ over both strands at
    # finalization (pigeon_occurrences) — a lane with no hit is normal for
    # the wrong strand and must not flag the read by itself.
    fallback = (seg_over | cand_over | pool_lost | short_fb
                | (md > (n_seg - 1)))
    return PigeonResult(pos=pos_o, nmm=nmm_o, valid=val_o, fallback=fallback,
                        n_cand=jnp.minimum(total, CC))


def pigeon_occurrences(res: PigeonResult, B: int, opt, cand_cap: int):
    """Host finalization (READS BACK): per-read deduped Occurrence lists.

    Lanes [0, B) are forward-strand reads, [B, 2B) their reverse
    complements (the ``pipeline.search_batch_device`` convention).
    Applies the gapped-window fallback per read: with gap budgets enabled,
    gapped alignments can only affect output when no ungapped hit exists
    on either strand or ``s_gapo <= best + s_mm`` — those reads are
    flagged for the beam.  Returns (occs per read [B], fallback bool[B]).
    """
    from ..resolve.samse import Occurrence
    CC = cand_cap
    s_mm = opt.s_mm
    pos = np.asarray(res.pos).reshape(-1, CC)
    nmm = np.asarray(res.nmm).reshape(-1, CC)
    valid = np.asarray(res.valid).reshape(-1, CC)
    fallback = np.asarray(res.fallback)
    B2 = pos.shape[0]
    assert B2 == 2 * B, (B2, B)
    fb = fallback[:B] | fallback[B:]
    occs = []
    for j in range(B):
        d = {}
        if not fb[j]:
            for lane, strand in ((j, 0), (j + B, 1)):
                for s in np.nonzero(valid[lane])[0]:
                    key = (int(pos[lane, s]), strand)
                    sc = int(nmm[lane, s]) * s_mm
                    cur = d.get(key)
                    if cur is None or cur.score > sc:
                        d[key] = Occurrence(int(pos[lane, s]), strand, sc,
                                            int(nmm[lane, s]), 0, 0)
            if opt.max_gapo > 0:
                if not d or opt.s_gapo <= min(o.score for o in d.values()) + s_mm:
                    fb[j] = True
                    d = {}
        occs.append(sorted(d.values(), key=lambda o: (o.score, o.strand, o.pos)))
    return occs, fb
