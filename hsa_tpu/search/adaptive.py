"""Adaptive beam escalation: narrow beams first, escalate flagged reads.

The overflow counters make beam truncation *observable* per read, which
turns beam width into a ladder instead of a global knob: run everything at
a cheap width, then re-run only the reads whose beam or hit buffer
overflowed at the next width.  A read that never overflows has the exact
(oracle-equal) hit set regardless of the width that produced it, so a
ladder's output quality equals running every read at the highest width it
reached.

The whole ladder is ONE jitted device function: flagged reads are selected
with a static-size ``jnp.nonzero`` (capacity = ``esc_frac`` of the batch per
rung), re-searched at the next width, and scattered back — no host
round-trips (a host-side version measured slower than the flat beam).
Reads flagged beyond a rung's capacity keep their current results and stay
flagged, so truncation remains observable.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .beam import BeamResult, beam_search


class AdaptiveBeam:
    """Caches one jitted ladder function per batch size."""

    def __init__(self, dev_idx, opt, *, ladder=(8, 64), max_hits: int = 16,
                 esc_frac: float = 1 / 3, esc_batch=None):
        self.dev = dev_idx
        self.opt = opt
        self.ladder = tuple(ladder)
        self.max_hits = max_hits
        self.esc_frac = esc_frac
        self._jit_cache = {}

    def _ladder_fn(self, B: int):
        if B in self._jit_cache:
            return self._jit_cache[B]
        from .jitcache import split_idx, join_idx
        opt, H = self.opt, self.max_hits
        ladder = self.ladder
        ESC = max(int(B * self.esc_frac), 1)
        arrays, meta = split_idx(self.dev)
        # B used as the out-of-range nonzero fill below

        @jax.jit
        def run_core(arrs, fwd, lens, D, md):
            dev = join_idx(meta, arrs)
            res = beam_search(dev, fwd, lens, D, md, opt,
                              beam_width=ladder[0], max_hits=H)
            for W in ladder[1:]:
                flag = (res.n_live_dropped > 0) | (res.n_hits_dropped > 0)
                n_flag = flag.sum()
                # fill with an OUT-OF-RANGE index: gathers clamp (harmless,
                # masked by `valid`) and the scatter-back DROPS those rows —
                # fill_value=0 would make row 0 a duplicate scatter target
                # with undefined ordering
                idx = jnp.nonzero(flag, size=ESC, fill_value=B)[0]
                valid = jnp.arange(ESC) < n_flag
                sub = beam_search(
                    dev, fwd[idx], jnp.where(valid, lens[idx], 0),
                    D[idx], md[idx], opt, beam_width=W, max_hits=H)
                # scatter escalated rows back (only the valid ones)
                def merge(a, b):
                    upd = jnp.where(
                        valid.reshape((ESC,) + (1,) * (b.ndim - 1)), b, a[idx])
                    return a.at[idx].set(upd)
                res = BeamResult(*(merge(a, b) for a, b in zip(res, sub)))
            return res

        run = lambda fwd, lens, D, md: run_core(arrays, fwd, lens, D, md)
        self._jit_cache[B] = run
        return run

    def __call__(self, fwd, lens, D, md) -> BeamResult:
        fwd = jnp.asarray(fwd)
        return self._ladder_fn(fwd.shape[0])(
            fwd, jnp.asarray(lens), jnp.asarray(D), jnp.asarray(md))
