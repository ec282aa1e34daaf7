"""Device width pass: the D(i) prefix lower-bound array (BASELINE north star).

Analog of the reference's ``bwtaln.c:bwt_cal_width`` — computes, per read,
D[i] = lower bound on diffs needed to match read[0..i] anywhere in the
genome, by greedy exact extension with resets on the reverse-text index
(see :func:`hsa_tpu.fmcore.cal_width`).  Batched: all reads advance one
prefix base per ``lax.scan`` step on the reverse occ table.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from . import fm

U32 = jnp.uint32
PAD = 5


def cal_width_device(idx, reads_fwd, lens):
    """D arrays for a batch: int32[B, Lmax] (entries beyond len hold D[len-1]).

    reads_fwd: uint8/int32 [B, Lmax] in 5'->3' order, PAD-padded.
    Requires idx.rev_occ_blocks.
    """
    B, Lmax = reads_fwd.shape
    k0 = jnp.zeros(B, dtype=U32)
    l0 = jnp.full(B, idx.n, dtype=U32)
    z0 = jnp.zeros(B, dtype=jnp.int32)

    def step(carry, col):
        k, l, z = carry
        is_pad = col >= PAD
        is_n = col == 4
        k2, l2 = fm.extend(idx, col.astype(U32), k, l, rev=True)
        ok = (k2 <= l2) & ~is_n
        # reset lanes that broke; bump their z
        z = jnp.where(~is_pad & ~ok, z + 1, z)
        k = jnp.where(is_pad, k, jnp.where(ok, k2, k0))
        l = jnp.where(is_pad, l, jnp.where(ok, l2, l0))
        return (k, l, z), z

    (_, _, _), D = lax.scan(step, (k0, l0, z0), reads_fwd.T.astype(jnp.int32))
    return D.T  # [B, Lmax]
