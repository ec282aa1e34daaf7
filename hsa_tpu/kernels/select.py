"""Pallas top-K selection kernels for the beam engine.

Why Pallas: on the target XLA/TPU backend, cross-row combination
primitives placed inside a ``lax.scan`` — ``lax.sort``, ``lax.top_k``,
axis reductions, even unrolled pairwise min-trees — trigger a slow
scalar lowering (measured round 1: a 20-step scan with in-kernel Pallas
selection runs in ~0.1 ms where the XLA-sort variant takes 80 ms).
Mosaic-compiled kernels vectorize sublane reductions normally.  NOTE:
round 1 also attributed a *persistent* process-wide slowdown to these
primitives; the round-2 re-baseline could not reproduce that
persistence (docs/TPU_NOTES.md v2 — legacy rules, unverified).  The
Pallas path is kept for the reproducible per-dispatch win.

Layout contract: candidate matrices are **row-major [C, B]** — candidate
slots on the (sublane) row axis, reads on the lane axis.  Keys embed
``score << KEY_SH | column`` with column unique per row, so iterative-min
selection is deterministic without a stable sort.  SENT (0x7FFF0000)
marks invalid lanes; NOTE 0xFFFFFFFF must never be used as a sentinel
(it independently triggers the degraded mode).

The kernels run in interpret mode off-TPU (CPU test suite).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32
I32 = jnp.int32

KEY_SH = 14                      # key = score << KEY_SH | column
SENT = np.uint32(0x7FFF0000)     # invalid-key sentinel (NOT 0xffffffff!)
SCORE_CAP = int(SENT) >> KEY_SH  # scores at/above this are "no hit"
_SENT_I = np.int32(0x7FFF0000)

# Set True (or env HSA_SELECT_REFERENCE) to route every select through the
# XLA-sort reference.  AdaptiveBeam flips this after a Mosaic scoped-vmem
# compile failure (observed flaky at [352, 512] K=32 through the AOT
# tunnel) and retries — the slower sort beats a failed batch.
FORCE_REFERENCE = False


@functools.lru_cache(maxsize=None)
def _build_select(C: int, B: int, K: int, n_pay: int, with_window: bool,
                  with_accum: bool, interpret: bool, lanes: int):
    """okey output carries K selected keys plus a final row holding the
    accumulated drop counter — a dedicated (1, lanes) counter output
    triggered the round-1 slow mode, a row of the main output did not
    (docs/TPU_NOTES.md v2 legacy rule, unverified; kept as cheap)."""
    grid = (B // lanes,)

    def kern(*refs):
        # ins: key, payload[n_pay], [window], [accum]
        # outs: okey, payload outs, ndrop
        key_ref = refs[0]
        pay_refs = refs[1:1 + n_pay]
        pos = 1 + n_pay
        key = key_ref[:].astype(I32)
        if with_window:
            win = refs[pos][:].astype(I32)      # [1, lanes]
            pos += 1
            key = jnp.where((key >> KEY_SH) > win, _SENT_I, key)
        if with_accum:
            acc = refs[pos][:].astype(I32)[0]   # [lanes]
            pos += 1
        else:
            acc = 0
        okey_ref = refs[pos]
        pay_out = refs[pos + 1:pos + 1 + n_pay]
        pays = [r[:].astype(I32) for r in pay_refs]
        nvalid = jnp.sum((key < _SENT_I).astype(I32), axis=0)
        # drop-count accumulation happens HERE: an XLA-side add of the
        # kernel's counter output into a scan carry re-triggers the
        # degraded mode (docs/TPU_NOTES.md); in-kernel it is free
        okey_ref[K, :] = (acc + jnp.maximum(nvalid - K, 0)).astype(U32)
        for s in range(K):
            m = jnp.min(key, axis=0)
            hit = key == m[None, :]
            okey_ref[s, :] = m.astype(U32)
            for r, p in zip(pay_out, pays):
                r[s, :] = jnp.sum(jnp.where(hit, p, 0), axis=0).astype(U32)
            key = jnp.where(hit, _SENT_I, key)

    in_specs = [pl.BlockSpec((C, lanes), lambda i: (0, i),
                             memory_space=pltpu.VMEM)] * (1 + n_pay)
    n_extra = (1 if with_window else 0) + (1 if with_accum else 0)
    in_specs += [pl.BlockSpec((1, lanes), lambda i: (0, i),
                              memory_space=pltpu.VMEM)] * n_extra
    out_specs = ([pl.BlockSpec((K + 1, lanes), lambda i: (0, i),
                               memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec((K, lanes), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)] * n_pay)
    out_shape = ([jax.ShapeDtypeStruct((K + 1, B), jnp.uint32)]
                 + [jax.ShapeDtypeStruct((K, B), jnp.uint32)] * n_pay)
    return pl.pallas_call(kern, grid=grid, in_specs=in_specs,
                          out_specs=out_specs, out_shape=out_shape,
                          interpret=interpret)


def select_topk_reference(key, payloads, K: int, window=None):
    """Pure-XLA reference of select_topk (multi-operand sort).

    Used on CPU (tests; none of the TPU pathologies apply there) and as
    the semantics oracle for the Pallas kernel.  Bit-identical to the
    kernel: keys are unique, so sort order is fully determined.
    """
    C, B = key.shape
    if window is not None:
        win = window.astype(jnp.uint32).reshape(1, B)
        key = jnp.where((key >> KEY_SH) > win, jnp.uint32(SENT) | key, key)
    nvalid = (key < SENT).sum(axis=0, dtype=I32)
    ndrop = jnp.maximum(nvalid - K, 0).astype(U32)
    sk, *pouts = jax.lax.sort((key, *payloads), dimension=0, num_keys=1)
    return sk[:K], tuple(p[:K] for p in pouts), ndrop


def select_topk(key, payloads, K: int, window=None, drop_accum=None, *,
                interpret=None, lanes: int = 512):
    """Top-K smallest-key rows of [C, B] matrices.

    key:      uint32 [C, B], SENT where invalid, unique keys per column
              (embed the row index in the low KEY_SH bits)
    payloads: tuple of uint32 [C, B] carried along with the keys
    window:   optional uint32 [B] or [1, B] max allowed score; key rows
              whose score field exceeds it are invalidated first
    drop_accum: optional uint32 [1, B] running drop counter; the returned
              counter is drop_accum + this call's drops (the add MUST
              happen in-kernel: adding the counter output into a scan
              carry XLA-side re-triggers the degraded mode)
    Returns (okeyd [K+1,B] uint32 — rows 0..K-1 selected keys, row K the
    drop counter —, payload outs tuple [K,B], ndrop [1,B] view of row K).
    Callers consuming the counter should read okeyd[K] (a dedicated
    (1, lanes) counter output triggered the round-1 slow mode;
    docs/TPU_NOTES.md v2 legacy rule, unverified).
    """
    C, B = key.shape
    import os
    if FORCE_REFERENCE or os.environ.get("HSA_SELECT_REFERENCE"):
        okey, pouts, nd = select_topk_reference(key, payloads, K, window)
        nd = nd.reshape(1, B)
        if drop_accum is not None:
            nd = drop_accum.astype(jnp.uint32).reshape(1, B) + nd
        return jnp.concatenate([okey, nd], axis=0), pouts, nd
    if interpret is None:
        if jax.default_backend() == "cpu" or C * K > 200_000:
            # CPU: sort-based reference (fast to compile; the kernel itself
            # is covered by tests/test_select_kernel.py in interpret mode).
            # TPU with C*K beyond ~200K: the Mosaic scoped-vmem stack of
            # the unrolled K-deep selection overflows the 16M limit
            # (observed 40.7M at [2592, 128]); these wide-ladder merges
            # are rare escalation stages, so the slower XLA sort is the
            # correct trade.
            okey, pouts, nd = select_topk_reference(key, payloads, K, window)
            nd = nd.reshape(1, B)
            if drop_accum is not None:
                nd = drop_accum.astype(jnp.uint32).reshape(1, B) + nd
            okeyd = jnp.concatenate([okey, nd], axis=0)
            return okeyd, pouts, nd
        interpret = False
    # lane count stays at the full 512 regardless of B: blocks narrower
    # than 512 lanes (observed [2592, 65] and [2592, 128]) blow the
    # Mosaic scoped-vmem stack (~41M vs the 16M limit) where the same C
    # at 512 lanes compiles — small batches pad up instead.
    pad = (-B) % lanes
    Bp = B + pad
    args = [key, *payloads]
    if pad:
        args = [jnp.pad(a, ((0, 0), (0, pad)), constant_values=int(SENT))
                for a in args]
    if window is not None:
        w = window.astype(jnp.uint32).reshape(1, B)
        if pad:
            w = jnp.pad(w, ((0, 0), (0, pad)))
        args.append(w)
    if drop_accum is not None:
        d = drop_accum.astype(jnp.uint32).reshape(1, B)
        if pad:
            d = jnp.pad(d, ((0, 0), (0, pad)))
        args.append(d)
    fn = _build_select(C, Bp, K, len(payloads), window is not None,
                       drop_accum is not None, bool(interpret), lanes)
    try:
        outs = fn(*args)
    except Exception:
        # Mosaic scoped-vmem stack OOM is shape- and build-dependent (the
        # C*K guard above covers the systematic cases, but e.g. [352, 512]
        # K=32 was observed to need 22.7M vs the 16M limit on some AOT
        # builds) — fall back to the XLA sort rather than fail the batch
        okey, pouts, nd = select_topk_reference(key, payloads, K, window)
        nd = nd.reshape(1, B)
        if drop_accum is not None:
            nd = drop_accum.astype(jnp.uint32).reshape(1, B) + nd
        return jnp.concatenate([okey, nd], axis=0), pouts, nd
    okeyd = outs[0][:, :B]       # [K+1, B]: rows 0..K-1 keys, row K drops
    pouts = tuple(o[:, :B] for o in outs[1:1 + len(payloads)])
    return okeyd, pouts, okeyd[K:K + 1]
