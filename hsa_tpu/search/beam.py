"""Batched beam-search inexact alignment — the TPU replacement for the
reference's branch-and-bound stack (lineage: ``bwtgap.c`` ``gap_push`` /
``gap_pop`` / ``bwt_match_gap``; BASELINE.json north star).

Thousands of reads advance SA-interval *frontiers* in lockstep.  Each read
owns ``W`` frontier slots (states); one step expands every live state into
up to 9 children — 4 match/mismatch (one per base), 1 insertion, 4
deletions — scores them with the Appendix-A budgets, and keeps the best
``W`` by score (``lax.top_k``).  Completed states (i == 0) migrate into a
per-read hit buffer of capacity ``H``.

Performance layout (this is the hot loop of the whole framework): a state
is THREE uint32 words — k, l, and a bit-packed ``meta`` word::

    meta = i | nmm<<9 | ngapo<<13 | ngape<<16 | seed_mm<<20 | st<<24

so the per-step top-W selection costs one ``top_k`` over score keys plus a
SINGLE ``take_along_axis`` gather of the packed [B, 9W, 3] candidate
array; liveness and scores are re-derived from the returned top-k *values*
(separate per-field gathers were ~7x the cost of the occ pass itself).
The hit-buffer merge runs under ``lax.cond`` — completions only happen in
the last ~(max_gapo+max_gape+1) steps of a read.

Parity contract (SURVEY.md §7.3.1): the oracle's accepted hit set is
order-independent, so this engine reproduces it exactly *provided no valid
candidate is dropped* by the top-W selection or the hit buffer.  Both drop
events are counted and returned (``n_live_dropped`` / ``n_hits_dropped``);
a nonzero count on a read is a parity alarm for that read.

Field limits implied by the packing: read length <= 511, nmm <= 15,
ngapo <= 7, ngape <= 15, seed diffs <= 15 (asserted).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

U32 = jnp.uint32
I32 = jnp.int32
INF = jnp.int32(1 << 29)
_KEYMAX = jnp.int32(1 << 30)
M_, I_, D_ = 0, 1, 2

# meta bit layout
_I_BITS = 9
_NMM_SH, _GAPO_SH, _GAPE_SH, _SEED_SH, _ST_SH = 9, 13, 16, 20, 24


def _pack(i, nmm, ngapo, ngape, seed_mm, st):
    return (i.astype(U32) | (nmm.astype(U32) << _NMM_SH)
            | (ngapo.astype(U32) << _GAPO_SH) | (ngape.astype(U32) << _GAPE_SH)
            | (seed_mm.astype(U32) << _SEED_SH) | (st.astype(U32) << _ST_SH))


def _unpack(meta):
    i = (meta & U32(0x1FF)).astype(I32)
    nmm = ((meta >> _NMM_SH) & U32(0xF)).astype(I32)
    ngapo = ((meta >> _GAPO_SH) & U32(0x7)).astype(I32)
    ngape = ((meta >> _GAPE_SH) & U32(0xF)).astype(I32)
    seed_mm = ((meta >> _SEED_SH) & U32(0xF)).astype(I32)
    st = ((meta >> _ST_SH) & U32(0x3)).astype(I32)
    return i, nmm, ngapo, ngape, seed_mm, st


class BeamResult(NamedTuple):
    hit_score: jnp.ndarray   # int32[B, H]
    hit_k: jnp.ndarray       # uint32[B, H]
    hit_l: jnp.ndarray       # uint32[B, H]
    hit_nmm: jnp.ndarray     # int32[B, H]
    hit_ngapo: jnp.ndarray   # int32[B, H]
    hit_ngape: jnp.ndarray   # int32[B, H]
    hit_valid: jnp.ndarray   # bool[B, H]
    best_score: jnp.ndarray  # int32[B] (INF when no hit)
    n_live_dropped: jnp.ndarray  # int32[B] beam-overflow parity alarms
    n_hits_dropped: jnp.ndarray  # int32[B]


def _select_packed(packed, valid, score, K: int):
    """Keep the K lowest-score valid rows of packed [B, N, 3].

    Returns (packed[B,K,3], valid[B,K], score[B,K], n_valid[B]).
    Liveness/score come from the top-k values — no extra gathers.
    """
    key = jnp.where(valid, _KEYMAX - score, I32(-1))
    vals, idxs = lax.top_k(key, K)
    out = jnp.take_along_axis(packed, idxs[:, :, None], axis=1)
    out_valid = vals > -1
    out_score = jnp.where(out_valid, _KEYMAX - vals, INF)
    return out, out_valid, out_score, valid.sum(axis=1, dtype=I32)


def beam_search(idx, reads_fwd, lens, D, max_diff, opt, *,
                beam_width: int | None = None, max_hits: int = 32) -> BeamResult:
    """Run the inexact search for a whole batch.

    reads_fwd: int32/uint8 [B, Lmax] codes in 5'->3' order (PAD beyond len)
    lens:      int32[B]
    D:         int32[B, Lmax] width lower bounds (from cal_width_device);
               pass zeros to disable pruning (hit set unchanged)
    max_diff:  int32[B] per-read diff budgets
    """
    from . import fm

    W = beam_width or opt.beam_width
    H = max_hits
    B, Lmax = reads_fwd.shape
    assert Lmax < (1 << _I_BITS), "read length exceeds packed-state limit (511)"
    assert opt.max_gapo <= 7 and opt.max_gape <= 15 and opt.max_seed_diff <= 15
    reads_fwd = reads_fwd.astype(I32)
    lens = lens.astype(I32)
    # budgets above 15 cannot be represented in the 4-bit nmm packing; the
    # numpy entry (align_batch) asserts, this clamp is the traced-path belt
    max_diff = jnp.minimum(max_diff.astype(I32), 15)
    s_mm, s_gapo, s_gape = opt.s_mm, opt.s_gapo, opt.s_gape
    skip = opt.indel_end_skip

    # Dshift[b, j] = D[b, j-1], Dshift[b, 0] = 0  (lower bound for prefix len j).
    # The per-state step needs read[i-1], Dshift[i-1], Dshift[i]; pack all
    # three into one word indexed by j = i-1 so the step does ONE gather:
    #   combo[j] = read[j] | min(Dshift[j],31)<<3 | min(Dshift[j+1],31)<<8
    # (D clamps at 31: budgets are <= 15, so the pruning test is unchanged)
    Dshift = jnp.concatenate([jnp.zeros((B, 1), I32), D.astype(I32)], axis=1)
    Dc = jnp.minimum(Dshift, 31)
    combo = (reads_fwd | (Dc[:, :Lmax] << 3) | (Dc[:, 1:Lmax + 1] << 8))

    # frontier: packed [B, W, 3] (k, l, meta) + score + live
    f0 = jnp.zeros((B, W, 3), U32)
    f0 = f0.at[:, 0, 1].set(jnp.full(B, idx.n, U32))
    f0 = f0.at[:, 0, 2].set(lens.astype(U32))  # i = len, all else 0, st = M
    live0 = jnp.zeros((B, W), bool).at[:, 0].set(lens > 0)
    score0 = jnp.zeros((B, W), I32)

    hits0 = jnp.zeros((B, H, 3), U32)
    hitsv0 = jnp.zeros((B, H), bool)
    hitss0 = jnp.full((B, H), INF, I32)
    best0 = jnp.full(B, INF, I32)
    drops0 = jnp.zeros(B, I32)

    # static specialization: no gap children at all when gap opens are
    # disabled (mismatch-only configs get 4W candidates instead of 9W)
    with_gaps = opt.max_gapo > 0
    n_steps = Lmax + (opt.max_gapo + opt.max_gape if with_gaps else 0)
    seed_start = lens - opt.seed_len  # in_seed iff i > seed_start

    def step(carry, _):
        f, live, score, hits, hitsv, hitss, best, ldrop, hdrop = carry

        k, l, meta = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        i, nmm, ngapo, ngape, seed_mm, st = _unpack(meta)
        ndiff = nmm + ngapo + ngape
        expand = live & (i > 0)
        bidx = jnp.clip(i - 1, 0, Lmax - 1)
        cw = jnp.take_along_axis(combo, bidx, axis=1)          # [B, W]
        b = cw & 7
        lb_im1 = (cw >> 3) & 31   # Dshift[i-1]: bound for the i-1 children
        in_seed = (i > seed_start[:, None]).astype(I32)

        # one fused occ pass for all 4 bases at both interval ends
        k4, l4 = fm.extend4(idx, k.reshape(-1), l.reshape(-1))
        k4 = k4.reshape(B, W, 4)
        l4 = l4.reshape(B, W, 4)
        nonempty = k4 <= l4

        ks, ls, metas, scores, valids = [], [], [], [], []

        def add(valid, kk, ll, mm, sc):
            ks.append(kk); ls.append(ll); metas.append(mm)
            scores.append(sc); valids.append(valid)

        # 4 match/mismatch children (consume a read base)
        for a in range(4):
            ismm = (b != a).astype(I32)
            seed_add = ismm * in_seed
            child_meta = _pack(i - 1, nmm + ismm, ngapo, ngape,
                               seed_mm + seed_add, jnp.full_like(i, M_))
            child_ndiff = ndiff + ismm
            ok = (expand & nonempty[:, :, a]
                  & (child_ndiff + lb_im1 <= max_diff[:, None])
                  & (seed_mm + seed_add <= opt.max_seed_diff))
            add(ok, k4[:, :, a], l4[:, :, a], child_meta,
                score + ismm * s_mm)

        if with_gaps:
            consumed = lens[:, None] - i
            indel_ok = (consumed >= skip) & (i >= skip)
            lb_i = (cw >> 8) & 31  # Dshift[i]: bound for deletion children
            open_ = st == M_
            gap_cost = jnp.where(open_, s_gapo, s_gape)
            d_gapo, d_gape = open_.astype(I32), (~open_).astype(I32)
            ins_ok = indel_ok & ((open_ & (ngapo < opt.max_gapo))
                                 | ((st == I_) & (ngape < opt.max_gape)))
            del_ok = indel_ok & ((open_ & (ngapo < opt.max_gapo))
                                 | ((st == D_) & (ngape < opt.max_gape)))

            # insertion child (consume a read base, interval unchanged)
            child_meta = _pack(i - 1, nmm, ngapo + d_gapo, ngape + d_gape,
                               seed_mm + in_seed, jnp.full_like(i, I_))
            ok = (expand & ins_ok
                  & (ndiff + 1 + lb_im1 <= max_diff[:, None])
                  & (seed_mm + in_seed <= opt.max_seed_diff))
            add(ok, k, l, child_meta, score + gap_cost)

            # 4 deletion children (consume a genome base, i unchanged)
            for a in range(4):
                child_meta = _pack(i, nmm, ngapo + d_gapo, ngape + d_gape,
                                   seed_mm + in_seed, jnp.full_like(i, D_))
                ok = (expand & del_ok & nonempty[:, :, a]
                      & (ndiff + 1 + lb_i <= max_diff[:, None])
                      & (seed_mm + in_seed <= opt.max_seed_diff))
                add(ok, k4[:, :, a], l4[:, :, a], child_meta, score + gap_cost)

        kc = jnp.concatenate(ks, axis=1)          # [B, 9W] (4W when no gaps)
        lc = jnp.concatenate(ls, axis=1)
        metac = jnp.concatenate(metas, axis=1)
        scorec = jnp.concatenate(scores, axis=1)
        V = jnp.concatenate(valids, axis=1)
        packed = jnp.stack([kc, lc, metac], axis=2)  # [B, 9W, 3]

        child_i = (metac & U32(0x1FF)).astype(I32)
        hitmask = V & (child_i == 0)
        step_best = jnp.min(jnp.where(hitmask, scorec, INF), axis=1)
        best = jnp.minimum(best, step_best)
        window = scorec <= (best[:, None] + s_mm)
        hitmask = hitmask & window
        livemask = V & (child_i > 0) & window

        # --- frontier selection (one top_k + one packed gather) ---
        f2, live2, score2, n_valid = _select_packed(packed, livemask, scorec, W)
        ldrop = ldrop + jnp.maximum(n_valid - W, 0)

        # --- hit-buffer merge, only when some candidate completed ---
        # only read-consuming children (match/mismatch + insertion) can complete
        HC = (5 if with_gaps else 4) * W

        def do_merge(args):
            hits, hitsv, hitss, hdrop = args
            merged = jnp.concatenate([hits, packed[:, :HC]], axis=1)
            mvalid = jnp.concatenate([hitsv, hitmask[:, :HC]], axis=1)
            mscore = jnp.concatenate([hitss, scorec[:, :HC]], axis=1)
            h2, hv2, hs2, n_v = _select_packed(merged, mvalid, mscore, H)
            return h2, hv2, hs2, hdrop + jnp.maximum(n_v - H, 0)

        hits, hitsv, hitss, hdrop = lax.cond(
            jnp.any(hitmask), do_merge, lambda a: a, (hits, hitsv, hitss, hdrop))

        return (f2, live2, score2, hits, hitsv, hitss, best, ldrop, hdrop), None

    carry0 = (f0, live0, score0, hits0, hitsv0, hitss0, best0, drops0, drops0)
    (f, live, score, hits, hitsv, hitss, best, ldrop, hdrop), _ = lax.scan(
        step, carry0, None, length=n_steps)

    # final window filter (scores may beat earlier hits later in the run)
    hitsv = hitsv & (hitss <= best[:, None] + s_mm)
    hi, hnmm, hgapo, hgape, _, _ = _unpack(hits[:, :, 2])
    return BeamResult(hit_score=hitss, hit_k=hits[:, :, 0], hit_l=hits[:, :, 1],
                      hit_nmm=hnmm, hit_ngapo=hgapo, hit_ngape=hgape,
                      hit_valid=hitsv, best_score=best,
                      n_live_dropped=ldrop, n_hits_dropped=hdrop)


_jit_cache = {}


def _opt_key(opt):
    return tuple(sorted(opt.to_dict().items()))


def _jitted(idx, kind, body):
    """Per-index cache of jitted device functions (eager tracing of the
    scan-based passes costs more than the device work itself).  Keys include
    every value baked into the closure (index identity, kind, opt).  Index
    tables are passed as jit ARGUMENTS, not closures — closure arrays become
    HLO literals and multi-GB indexes then break the remote-compile path
    (see search.jitcache)."""
    from .jitcache import jit_over_idx
    key = (id(idx), kind)
    f = _jit_cache.get(key)
    if f is None:
        f = jit_over_idx(idx, body)
        _jit_cache[key] = f
    return f


def align_batch(idx, reads, opt, *, beam_width=None, max_hits=32, max_len=None,
                ladder=None):
    """Host convenience wrapper: list of code arrays -> per-read hit lists.

    Returns (hits_per_read, result) where hits_per_read[i] is a list of
    ``oracle.bnb.Hit``-compatible tuples (score, nmm, ngapo, ngape, k, l),
    deduplicated, sorted like the oracle's output.
    """
    import numpy as np
    from ..oracle.bnb import Hit
    from .widths import cal_width_device

    Lmax = max_len or max(len(r) for r in reads)
    B = len(reads)
    too_long = max(len(r) for r in reads)
    if too_long > Lmax:
        raise ValueError(f"read length {too_long} exceeds max_len {Lmax}; "
                         f"truncating silently would misreport alignments")
    fwd = np.full((B, Lmax), 5, dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for j, r in enumerate(reads):
        L = len(r)
        fwd[j, :L] = np.asarray(r, dtype=np.uint8)
        lens[j] = L
    md = np.array([opt.diff_budget(int(L)) for L in lens], dtype=np.int32)
    if md.size and md.max() > 15:
        raise ValueError("diff budget > 15 unsupported by the packed beam "
                         "state (and unrealistic for short-read budgets)")
    fwd_j = jnp.asarray(fwd)
    lens_j = jnp.asarray(lens)
    if idx.rev_occ_blocks is not None:
        width_f = _jitted(idx, "width",
                          lambda ix, r, l: cal_width_device(ix, r, l))
        D = width_f(fwd_j, lens_j)
    else:
        D = jnp.zeros((B, Lmax), I32)
    if ladder:
        from .adaptive import AdaptiveBeam
        key = (id(idx), "ladder", tuple(ladder), max_hits, _opt_key(opt))
        ab = _jit_cache.get(key)
        if ab is None:
            ab = AdaptiveBeam(idx, opt, ladder=ladder, max_hits=max_hits)
            _jit_cache[key] = ab
        res = ab(fwd, lens, np.asarray(D), md)
    else:
        W, H = beam_width, max_hits
        beam_f = _jitted(idx, ("beam", W or opt.beam_width, H, _opt_key(opt)),
                         lambda ix, rf, ln, D_, m_: beam_search(
                             ix, rf, ln, D_, m_, opt, beam_width=W, max_hits=H))
        res = beam_f(fwd_j, lens_j, D, jnp.asarray(md))
    out = []
    hv = np.asarray(res.hit_valid)
    hs = np.asarray(res.hit_score)
    hk = np.asarray(res.hit_k)
    hl = np.asarray(res.hit_l)
    hm = np.asarray(res.hit_nmm)
    ho = np.asarray(res.hit_ngapo)
    he = np.asarray(res.hit_ngape)
    for j in range(B):
        seen = {}
        for h in range(hv.shape[1]):
            if not hv[j, h]:
                continue
            key = (int(hk[j, h]), int(hl[j, h]), int(hm[j, h]), int(ho[j, h]), int(he[j, h]))
            sc = int(hs[j, h])
            if key not in seen or seen[key] > sc:
                seen[key] = sc
        hits = [Hit(sc, nmm, ngapo, ngape, k_, l_)
                for (k_, l_, nmm, ngapo, ngape), sc in seen.items()]
        hits.sort(key=lambda h: (h.score, h.k, h.l, h.nmm, h.ngapo, h.ngape))
        out.append(hits)
    return out, res
