"""Batched beam-search inexact alignment — the TPU replacement for the
reference's branch-and-bound stack (lineage: ``bwtgap.c`` ``gap_push`` /
``gap_pop`` / ``bwt_match_gap``; BASELINE.json north star).

Thousands of reads advance SA-interval *frontiers* in lockstep.  Each read
owns ``W`` frontier slots (states); one step expands every live state into
up to 9 children — 4 match/mismatch (one per base), 1 insertion, 4
deletions — scores them with the Appendix-A budgets, and keeps the best
``W`` by score (``lax.top_k``).  Completed states (i == 0) migrate into a
per-read hit buffer of capacity ``H``.

Parity contract (SURVEY.md §7.3.1): the oracle's accepted hit set is
order-independent, so this engine reproduces it exactly *provided no valid
candidate is dropped* by the top-W selection or the hit buffer.  Both drop
events are counted and returned (``n_live_dropped`` / ``n_hits_dropped``);
a nonzero count on a read is a parity alarm for that read.

State fields (per [B, W] slot):
  k, l     uint32  SA interval
  i        int32   unmatched read-prefix length (completion at 0)
  nmm/ngapo/ngape/seed_mm  int32 budgets spent
  st       int32   last op: 0=M 1=I 2=D (affine transitions M->MID, I->IM, D->DM)
  score    int32
  live     bool
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import fm

U32 = jnp.uint32
I32 = jnp.int32
INF = jnp.int32(1 << 29)
_KEYMAX = jnp.int32(1 << 30)
M_, I_, D_ = 0, 1, 2


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


def _topk_select(fields: dict, valid, score, K: int):
    """Keep the K lowest-score valid entries of each row."""
    key = jnp.where(valid, _KEYMAX - score, I32(-1))
    _, idxs = lax.top_k(key, K)
    out = {n: jnp.take_along_axis(a, idxs, axis=1) for n, a in fields.items()}
    out_valid = jnp.take_along_axis(valid, idxs, axis=1)
    out_score = jnp.take_along_axis(score, idxs, axis=1)
    return out, out_valid, out_score


def beam_search(idx, reads_fwd, lens, D, max_diff, opt, *,
                beam_width: int | None = None, max_hits: int = 32) -> BeamResult:
    """Run the inexact search for a whole batch.

    reads_fwd: int32/uint8 [B, Lmax] codes in 5'->3' order (PAD beyond len)
    lens:      int32[B]
    D:         int32[B, Lmax] width lower bounds (from cal_width_device);
               pass zeros to disable pruning (hit set unchanged)
    max_diff:  int32[B] per-read diff budgets
    """
    W = beam_width or opt.beam_width
    H = max_hits
    B, Lmax = reads_fwd.shape
    reads_fwd = reads_fwd.astype(I32)
    lens = lens.astype(I32)
    max_diff = max_diff.astype(I32)
    s_mm, s_gapo, s_gape = opt.s_mm, opt.s_gapo, opt.s_gape
    skip = opt.indel_end_skip

    # Dshift[b, j] = D[b, j-1], Dshift[b, 0] = 0  (lower bound for prefix len j;
    # shape [B, Lmax+1] so j = i' in [0, Lmax] indexes directly)
    Dshift = jnp.concatenate([jnp.zeros((B, 1), I32), D.astype(I32)], axis=1)

    def init_frontier():
        z = lambda dt: jnp.zeros((B, W), dt)
        f = dict(k=z(U32), l=z(U32), i=z(I32), nmm=z(I32), ngapo=z(I32),
                 ngape=z(I32), seed_mm=z(I32), st=z(I32))
        f["l"] = f["l"].at[:, 0].set(jnp.full(B, idx.n, U32))
        f["i"] = f["i"].at[:, 0].set(lens)
        live = jnp.zeros((B, W), bool).at[:, 0].set(lens > 0)
        score = jnp.zeros((B, W), I32)
        return f, live, score

    f0, live0, score0 = init_frontier()
    hits0 = dict(k=jnp.zeros((B, H), U32), l=jnp.zeros((B, H), U32),
                 nmm=jnp.zeros((B, H), I32), ngapo=jnp.zeros((B, H), I32),
                 ngape=jnp.zeros((B, H), I32))
    hitsv0 = jnp.zeros((B, H), bool)
    hitss0 = jnp.full((B, H), INF, I32)
    best0 = jnp.full(B, INF, I32)
    drops0 = jnp.zeros(B, I32)

    n_steps = Lmax + opt.max_gapo + opt.max_gape

    def step(carry, _):
        f, live, score, hits, hitsv, hitss, best, ldrop, hdrop = carry

        i = f["i"]
        expand = live & (i > 0)
        # per-state read base (next to consume, 3' side of the unmatched prefix)
        bidx = jnp.clip(i - 1, 0, Lmax - 1)
        b = jnp.take_along_axis(reads_fwd, bidx, axis=1)       # [B, W]
        in_seed = (i > (lens - opt.seed_len)[:, None]).astype(I32)
        consumed = lens[:, None] - i
        indel_ok = (consumed >= skip) & (i >= skip)

        # one fused occ pass for all 4 bases at both interval ends
        k4, l4 = fm.extend4(idx, f["k"].reshape(-1), f["l"].reshape(-1))
        k4 = k4.reshape(B, W, 4)
        l4 = l4.reshape(B, W, 4)
        nonempty = k4 <= l4

        open_ = f["st"] == M_
        gap_cost = jnp.where(open_, s_gapo, s_gape)
        ins_ok = indel_ok & ((open_ & (f["ngapo"] < opt.max_gapo))
                             | ((f["st"] == I_) & (f["ngape"] < opt.max_gape)))
        del_ok = indel_ok & ((open_ & (f["ngapo"] < opt.max_gapo))
                             | ((f["st"] == D_) & (f["ngape"] < opt.max_gape)))

        cand = {n: [] for n in ("k", "l", "i", "nmm", "ngapo", "ngape",
                                "seed_mm", "st", "score")}
        cvalid = []

        def add(valid, k, l, i_, nmm, ngapo, ngape, seed_mm, st, score_):
            cand["k"].append(k); cand["l"].append(l); cand["i"].append(i_)
            cand["nmm"].append(nmm); cand["ngapo"].append(ngapo)
            cand["ngape"].append(ngape); cand["seed_mm"].append(seed_mm)
            cand["st"].append(jnp.broadcast_to(st, valid.shape).astype(I32))
            cand["score"].append(score_)
            cvalid.append(valid)

        # 4 match/mismatch children
        for a in range(4):
            ismm = (b != a).astype(I32)
            add(expand & nonempty[:, :, a],
                k4[:, :, a], l4[:, :, a], i - 1,
                f["nmm"] + ismm, f["ngapo"], f["ngape"],
                f["seed_mm"] + ismm * in_seed, M_,
                score + ismm * s_mm)

        # insertion child (consumes a read base, interval unchanged)
        add(expand & ins_ok,
            f["k"], f["l"], i - 1,
            f["nmm"], f["ngapo"] + open_.astype(I32), f["ngape"] + (~open_).astype(I32),
            f["seed_mm"] + in_seed, I_,
            score + gap_cost)

        # 4 deletion children (consume a genome base, i unchanged)
        for a in range(4):
            add(expand & del_ok & nonempty[:, :, a],
                k4[:, :, a], l4[:, :, a], i,
                f["nmm"], f["ngapo"] + open_.astype(I32), f["ngape"] + (~open_).astype(I32),
                f["seed_mm"] + in_seed, D_,
                score + gap_cost)

        C = {n: jnp.concatenate(v, axis=1) for n, v in cand.items()}  # [B, 9W]
        V = jnp.concatenate(cvalid, axis=1)
        ndiff = C["nmm"] + C["ngapo"] + C["ngape"]
        lb = jnp.take_along_axis(Dshift, jnp.clip(C["i"], 0, Lmax), axis=1)
        V = V & (ndiff + lb <= max_diff[:, None]) \
              & (C["seed_mm"] <= opt.max_seed_diff)

        hitmask = V & (C["i"] == 0)
        step_best = jnp.min(jnp.where(hitmask, C["score"], INF), axis=1)
        best = jnp.minimum(best, step_best)
        window = C["score"] <= (best[:, None] + s_mm)
        hitmask = hitmask & window
        livemask = V & (C["i"] > 0) & window

        # --- frontier selection ---
        nf_fields = {n: C[n] for n in ("k", "l", "i", "nmm", "ngapo", "ngape",
                                       "seed_mm", "st")}
        f2, live2, score2 = _topk_select(nf_fields, livemask, C["score"], W)
        ldrop = ldrop + jnp.maximum(livemask.sum(axis=1, dtype=I32) - W, 0)

        # --- hit-buffer merge ---
        # only the 5W read-consuming children (match/mismatch, insertion) can
        # reach i == 0; deletion children keep i unchanged — slice them off
        HC = 5 * W
        merged = {n: jnp.concatenate([hits[n], C[n][:, :HC]], axis=1)
                  for n in ("k", "l", "nmm", "ngapo", "ngape")}
        mvalid = jnp.concatenate([hitsv, hitmask[:, :HC]], axis=1)
        mscore = jnp.concatenate([hitss, C["score"][:, :HC]], axis=1)
        hits2, hitsv2, hitss2 = _topk_select(merged, mvalid, mscore, H)
        hdrop = hdrop + jnp.maximum(mvalid.sum(axis=1, dtype=I32) - H, 0)

        return (f2, live2, score2, hits2, hitsv2, hitss2, best, ldrop, hdrop), None

    carry0 = (f0, live0, score0, hits0, hitsv0, hitss0, best0, drops0, drops0)
    (f, live, score, hits, hitsv, hitss, best, ldrop, hdrop), _ = lax.scan(
        step, carry0, None, length=n_steps)

    # final window filter (scores may beat earlier hits later in the run)
    hitsv = hitsv & (hitss <= best[:, None] + s_mm)
    return BeamResult(hit_score=hitss, hit_k=hits["k"], hit_l=hits["l"],
                      hit_nmm=hits["nmm"], hit_ngapo=hits["ngapo"],
                      hit_ngape=hits["ngape"], hit_valid=hitsv,
                      best_score=best, n_live_dropped=ldrop, n_hits_dropped=hdrop)


def align_batch(idx, reads, opt, *, beam_width=None, max_hits=32, max_len=None):
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
    fwd = np.full((B, Lmax), 5, dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for j, r in enumerate(reads):
        L = min(len(r), Lmax)
        fwd[j, :L] = np.asarray(r, dtype=np.uint8)[:L]
        lens[j] = L
    md = np.array([opt.diff_budget(int(L)) for L in lens], dtype=np.int32)
    fwd_j = jnp.asarray(fwd)
    lens_j = jnp.asarray(lens)
    if idx.rev_occ_blocks is not None:
        D = cal_width_device(idx, fwd_j, lens_j)
    else:
        D = jnp.zeros((B, Lmax), I32)
    res = beam_search(idx, fwd_j, lens_j, D, jnp.asarray(md), opt,
                      beam_width=beam_width, max_hits=max_hits)
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
