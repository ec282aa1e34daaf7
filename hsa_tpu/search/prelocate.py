"""Phase-A occurrence pre-location (docs/TPU_NOTES.md two-phase flow).

Host-side resolution needs text positions for the SA ranks of every hit
occurrence.  Locating them lazily (during phase B) runs the LF-walk in
the degraded post-readback mode, ~100x slower; instead, phase A expands
each read's hit intervals into a budgeted rank set and locates them
while the process is still clean.  rank -> position is a global property
of the index, so the result is a CACHE keyed by rank: phase B looks
positions up and falls back to the live ``locate_fn`` only for ranks
beyond the budget (rare, and correct either way).

All device code here follows the clean-construct rules: [H, B] / [OCC, B]
lane-major elementwise, unrolled row loops, one flat locate call.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..kernels.select import SENT
from .beam import RawBeamResult

U32 = jnp.uint32
I32 = jnp.int32


_jit_cache = {}


def prelocate_device(idx, raw: RawBeamResult, occ_cap: int = 48):
    """(ranks uint32[OCC, B], pos uint32[OCC, B], valid bool[OCC, B]).

    Expands the raw hit buffer's SA intervals in buffer order under a
    per-read budget of ``occ_cap`` occurrences, then locates all ranks in
    one flat call.  Runs entirely on device (call in phase A), jitted per
    (index, shape).
    """
    from .jitcache import jit_over_idx

    H, B = raw.hkey.shape
    key = (id(idx), H, B, occ_cap)
    f = _jit_cache.get(key)
    if f is None:
        f = jit_over_idx(idx, lambda ix, hkey, hk, hl: _prelocate_body(
            ix, hkey, hk, hl, occ_cap))
        _jit_cache[key] = f
    return f(raw.hkey, raw.hit_k, raw.hit_l)


def _prelocate_body(idx, hkey, hit_k, hit_l, occ_cap):
    from . import fm

    raw = RawBeamResult(hkey, hit_k, hit_l, None, None, None, None)
    H, B = raw.hkey.shape
    valid_h = raw.hkey < SENT                      # [H, B]
    w = jnp.where(valid_h, raw.hit_l - raw.hit_k + U32(1), U32(0))
    w = jnp.where(w > jnp.uint32(occ_cap), jnp.uint32(occ_cap), w)

    # per-read running budget over buffer rows (unrolled prefix)
    takes, prefixes = [], []
    used = jnp.zeros((B,), U32)
    for h in range(H):
        room = jnp.uint32(occ_cap) - used
        t = jnp.where(w[h] < room, w[h], room)
        takes.append(t)
        prefixes.append(used)
        used = used + t

    # slot s of read b belongs to hit h iff prefix[h] <= s < prefix[h]+take[h]
    slot = jnp.broadcast_to(
        jnp.arange(occ_cap, dtype=U32)[:, None], (occ_cap, B))
    ranks = jnp.zeros((occ_cap, B), U32)
    vmask = jnp.zeros((occ_cap, B), bool)
    for h in range(H):
        lo = prefixes[h][None, :]
        hi = (prefixes[h] + takes[h])[None, :]
        inh = (slot >= lo) & (slot < hi)
        ranks = jnp.where(inh, raw.hit_k[h][None, :] + (slot - lo), ranks)
        vmask = vmask | inh
    pos = fm.locate(idx, ranks.reshape(-1)).reshape(occ_cap, B)
    return ranks, pos, vmask


class PositionCache:
    """Host-side rank -> position lookup built from prelocate outputs."""

    def __init__(self):
        self._ranks = []
        self._pos = []
        self._sorted = None

    def add(self, ranks, pos, valid):
        r = np.asarray(ranks).reshape(-1)
        p = np.asarray(pos).reshape(-1)
        v = np.asarray(valid).reshape(-1)
        self._ranks.append(r[v])
        self._pos.append(p[v])
        self._sorted = None

    def add_raw_result(self, idx_dev, res, locate_cap: int = 48):
        """Convenience: prelocate a RawBeamResult/LadderRawResult NOW (device)."""
        from .adaptive import LadderRawResult
        raws = res.raws if isinstance(res, LadderRawResult) else (res,)
        outs = []
        for raw in raws:
            outs.append(prelocate_device(idx_dev, raw, locate_cap))
        # defer readback to first lookup: keep device arrays
        self._pending = getattr(self, "_pending", [])
        self._pending.extend(outs)

    def _materialize(self):
        for ranks, pos, valid in getattr(self, "_pending", []):
            self.add(ranks, pos, valid)
        self._pending = []
        if self._sorted is None:
            if self._ranks:
                r = np.concatenate(self._ranks)
                p = np.concatenate(self._pos)
                order = np.argsort(r, kind="stable")
                self._r = r[order]
                self._p = p[order]
            else:
                self._r = np.zeros(0, np.uint32)
                self._p = np.zeros(0, np.uint32)
            self._sorted = True

    def locate_fn(self, fallback):
        """Wrap a live locate_fn with this cache."""

        def f(ranks):
            self._materialize()
            ranks = np.asarray(ranks, np.uint32)
            if ranks.size == 0:
                return np.zeros(0, np.uint32)
            out = np.zeros(ranks.shape, np.uint32)
            if self._r.size:
                i = np.clip(np.searchsorted(self._r, ranks), 0,
                            self._r.size - 1)
                hit = self._r[i] == ranks
                out[hit] = self._p[i[hit]]
            else:
                hit = np.zeros(ranks.shape, bool)
            miss = ~hit
            if miss.any():
                out[miss] = np.asarray(fallback(ranks[miss]), np.uint32)
            return out

        return f
