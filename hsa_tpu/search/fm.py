"""Batched FM-index primitives over the self-contained occ layout (jnp).

These are the device analogs of the reference's ``bwt.c`` rank/locate
primitives (``bwt_occ4``/``bwt_2occ4``/``bwt_sa``), restated over
``hsa_tpu.index.layout`` v3 rows and batched over query vectors.

Performance discipline (docs/TPU_NOTES.md; measured on v5e):

- every rank query is ONE 32-byte row gather (``jnp.take`` from a table
  that reaches the executable as an ARGUMENT — never a closure);
- gather results pass through ``lax.optimization_barrier`` so XLA keeps
  the fast standalone gather lowering instead of fusing it into a
  consumer loop;
- all decode/count compute is elementwise on FLAT [B] vectors (never
  [B, k]-minor-dim broadcast chains) — constant shifts, flat variable
  shifts, per-word unrolled popcounts;
- no integer division/remainder in hot paths.

Rank convention: the primitive is ``occ_lt(a, p)`` = number of ``a`` among
bwt_full rows ``[0, p)`` excluding the primary row, for p in [0, n+1].
Backward extension of [k, l] with base a::

    k' = C[a] + occ_lt(a, k)
    l' = C[a] + occ_lt(a, l + 1) - 1

All ranks are uint32 (genome bound 4.3 Gbp, SURVEY.md §7.2).

Index sharding (BASELINE configs 4-5): when the ``idx`` namespace carries a
``shard_axis`` name (set inside ``shard_map`` by ``hsa_tpu.dist``), the
occ/mark/sample arrays are *local row ranges* of the global tables and
every primitive follows the masked-gather + ``psum`` pattern: the owning
shard contributes the real value, all others contribute zero, and a psum
over the shard axis merges — the "all-gather interval merge" of the north
star, expressed per-query.  The same code runs unsharded when
``shard_axis`` is None.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

U32 = jnp.uint32
I32 = jnp.int32
_PAT55 = 0x55555555


def _stored_prefix(primary, p):
    """# stored-BWT rows among full rows [0, p): drop the primary row."""
    p = p.astype(U32)
    return jnp.where(p <= primary, p, p - U32(1))


def _gather_rows(idx, blocks, b_global, offset_attr):
    """Row gather by global block id -> (rows [B, 8], own mask [B] | None).

    On sharded indexes ``own`` marks lanes whose block this shard owns;
    callers must gate every value derived from non-owned rows with ``own``
    before the psum merge.  Unsharded: own is None.  The barrier keeps the
    gather on XLA's fast standalone lowering.
    """
    ax = getattr(idx, "shard_axis", None)
    b_global = b_global.astype(I32)
    if ax is None:
        return lax.optimization_barrier(jnp.take(blocks, b_global, axis=0)), None
    off = getattr(idx, offset_attr)
    local = b_global - off
    own = (local >= 0) & (local < blocks.shape[0])
    rows = jnp.take(blocks, jnp.clip(local, 0, blocks.shape[0] - 1), axis=0)
    return lax.optimization_barrier(rows), own


def _psum(idx, x):
    ax = getattr(idx, "shard_axis", None)
    return lax.psum(x, ax) if ax is not None else x


def _word_masks(off):
    """Four flat uint32 masks; mask j selects the 2-bit symbol pairs of word
    j that lie below prefix length ``off`` (off int32 [B] in [0, 64])."""
    PAT = U32(_PAT55)
    ms = []
    rem = off
    for _ in range(4):
        v = jnp.where(rem < 16, rem, 16)
        rem = rem - v
        sh = U32(2) * (U32(16) - jnp.where(v > 1, v, 1).astype(U32))
        ms.append(jnp.where(v > 0, PAT >> sh, U32(0)))
    return ms


def _row_decode(idx, p, *, rev: bool = False):
    """(rows [B,8], off int32 [B], own [B]|None) for stored prefix lengths."""
    blocks = idx.rev_occ_blocks if rev else idx.occ_blocks
    primary = idx.rev_primary if rev else idx.primary
    offset_attr = "rev_row_offset" if rev else "row_offset"
    p_st = _stored_prefix(primary, p)
    b = (p_st >> U32(6)).astype(I32)
    off = (p_st & U32(63)).astype(I32)
    rows, own = _gather_rows(idx, blocks, b, offset_attr)
    return rows, off, own


def _count_base(rows, ms, a):
    """Flat in-block match count of base ``a`` (int or flat uint32 [B])."""
    PAT = U32(_PAT55)
    if isinstance(a, int):
        aa = U32(a)
    else:
        aa = a.astype(U32)
    tot = None
    for j in range(4):
        x = rows[:, 4 + j] ^ (aa * PAT)
        e = (~x) & ((~x) >> U32(1)) & ms[j]
        c = lax.population_count(e)
        tot = c if tot is None else tot + c
    return tot


def _select4(rows, a, base_col=0):
    """Flat 4-way column select: rows[:, base_col + a] for a uint32/int32 [B]."""
    a = a.astype(I32)
    r01 = jnp.where(a < 1, rows[:, base_col + 0], rows[:, base_col + 1])
    r23 = jnp.where(a < 3, rows[:, base_col + 2], rows[:, base_col + 3])
    return jnp.where(a < 2, r01, r23)


def occ_lt4(idx, p):
    """[B,4] counts of each base among bwt_full rows [0, p). p: uint32[B]."""
    rows, off, own = _row_decode(idx, p)
    ms = _word_masks(off)
    outs = []
    for a in range(4):
        tot = rows[:, a] + _count_base(rows, ms, a)
        if own is not None:
            tot = tot * own.astype(U32)
        outs.append(tot)
    return _psum(idx, jnp.stack(outs, axis=1))


def occ_lt4_flat(idx, p):
    """Tuple of 4 flat [B] counts (same values as occ_lt4 columns)."""
    rows, off, own = _row_decode(idx, p)
    ms = _word_masks(off)
    outs = []
    for a in range(4):
        tot = rows[:, a] + _count_base(rows, ms, a)
        if own is not None:
            tot = tot * own.astype(U32)
        outs.append(_psum(idx, tot))
    return tuple(outs)


def occ_lt(idx, a, p, *, rev: bool = False):
    """[B] count of base a[B] among bwt_full rows [0, p). a must be 0..3."""
    rows, off, own = _row_decode(idx, p, rev=rev)
    ms = _word_masks(off)
    res = _select4(rows, a) + _count_base(rows, ms, a)
    if own is not None:
        res = res * own.astype(U32)
    return _psum(idx, res)


def extend(idx, a, k, l, *, rev: bool = False):
    """Left-extend [k,l] with base a (uint32 vectors). Empty iff k' > l'.

    Callers must mask lanes where a > 3 themselves (N never matches).
    """
    a = jnp.minimum(a, 3).astype(U32)
    Ca = jnp.take(idx.C, a.astype(I32))
    k2 = Ca + occ_lt(idx, a, k, rev=rev)
    l2 = Ca + occ_lt(idx, a, l + U32(1), rev=rev) - U32(1)
    return k2, l2


def extend4(idx, k, l):
    """All-bases extension: ([B,4] k', [B,4] l') — the ``bwt_2occ4`` analog."""
    o_k = occ_lt4(idx, k)
    o_l = occ_lt4(idx, l + U32(1))
    C4 = idx.C[None, 0:4]
    return C4 + o_k, C4 + o_l - U32(1)


def extend4_flat(idx, k, l):
    """Flat all-bases extension: two tuples of 4 [B] vectors (k'_a, l'_a)."""
    o_k = occ_lt4_flat(idx, k)
    o_l = occ_lt4_flat(idx, l + U32(1))
    ks, ls = [], []
    for a in range(4):
        Ca = idx.C[a]
        ks.append(Ca + o_k[a])
        ls.append(Ca + o_l[a] - U32(1))
    return tuple(ks), tuple(ls)


def bwt_char(idx, r):
    """bwt_full symbol at rank r (garbage at r == primary; mask there)."""
    j = jnp.where(r < idx.primary, r, r - U32(1))  # stored index of row r
    b = (j >> U32(6)).astype(I32)
    b_off = (j & U32(63)).astype(I32)
    rows, own = _gather_rows(idx, idx.occ_blocks, b, "row_offset")
    word = _select4(rows, (b_off >> 4), base_col=4)
    sym = (word >> (U32(2) * (b_off & 15).astype(U32))) & U32(3)
    if own is not None:
        sym = sym * own.astype(U32)
    return _psum(idx, sym)


def lf(idx, r):
    """LF mapping; LF(primary) = 0.  ONE row gather total: the row of the
    stored symbol at rank r also holds the counts needed for occ(c, r+1)."""
    j = jnp.where(r < idx.primary, r, r - U32(1))  # stored index of row r
    b = (j >> U32(6)).astype(I32)
    b_off = (j & U32(63)).astype(I32)
    rows, own = _gather_rows(idx, idx.occ_blocks, b, "row_offset")
    word = _select4(rows, (b_off >> 4), base_col=4)
    c = (word >> (U32(2) * (b_off & 15).astype(U32))) & U32(3)
    # occ_lt(c, r+1) = counts_b[c] + in-block matches among first b_off+1 syms
    ms = _word_masks(b_off + 1)
    occ = _select4(rows, c) + _count_base(rows, ms, c)
    if own is not None:
        occ = occ * own.astype(U32)
        c = c * own.astype(U32)
    occ = _psum(idx, occ)
    c = _psum(idx, c)
    res = jnp.take(idx.C, c.astype(I32)) + occ - U32(1)
    return jnp.where(r == idx.primary, U32(0), res)


def _mark_info(idx, r):
    """(is_marked[B] bool, mark_rank[B] uint32) for ranks r — flat decode."""
    b = (r >> U32(7)).astype(I32)
    off = (r & U32(127)).astype(I32)
    rows, own = _gather_rows(idx, idx.mark_blocks, b, "mark_row_offset")
    w = _select4(rows, (off >> 5), base_col=1)
    bit = (w >> (off & 31).astype(U32)) & U32(1)
    # rank of marks below r inside the block: per-word masked popcounts.
    # Masks are built from two 16-bit halves: (1<<v)-1 for v in [0,16] never
    # materializes an all-ones literal (0xFFFFFFFF in a where-branch flips
    # the backend into its degraded mode — docs/TPU_NOTES.md trigger 4).
    below = rows[:, 0]
    rem = off
    for j in range(4):
        v = jnp.where(rem < 32, rem, 32)
        rem = rem - v
        v_lo = jnp.where(v < 16, v, 16).astype(U32)
        v_hi = (v.astype(U32) - v_lo)
        m = ((U32(1) << v_lo) - U32(1)) | (((U32(1) << v_hi) - U32(1)) << U32(16))
        below = below + lax.population_count(rows[:, 1 + j] & m)
    if own is not None:
        bit = bit * own.astype(U32)
        below = below * own.astype(U32)
    return _psum(idx, bit) == 1, _psum(idx, below)


def _sample_lookup(idx, mrank):
    ax = getattr(idx, "shard_axis", None)
    mrank = mrank.astype(I32)
    if ax is None:
        return lax.optimization_barrier(jnp.take(idx.samples, mrank))
    off = idx.sample_offset
    local = mrank - off
    own = (local >= 0) & (local < idx.samples.shape[0])
    val = jnp.take(idx.samples, jnp.clip(local, 0, idx.samples.shape[0] - 1))
    return lax.psum(val * own.astype(val.dtype), ax)


def locate(idx, r):
    """Text positions of ranks r[B] via the bounded LF-walk (<= sa_intv-1 steps)."""
    B = r.shape[0]
    pos = jnp.zeros(B, dtype=U32)
    steps = jnp.zeros(B, dtype=U32)
    done = jnp.zeros(B, dtype=bool)

    def body(i, carry):
        r, steps, pos, done = carry
        m, mrank = _mark_info(idx, r)
        newly = m & ~done
        pos = jnp.where(newly, _sample_lookup(idx, mrank) + steps, pos)
        done = done | m
        r_next = lf(idx, r)
        r = jnp.where(done, r, r_next)
        steps = jnp.where(done, steps, steps + U32(1))
        return (r, steps, pos, done)

    r, steps, pos, done = lax.fori_loop(0, idx.sa_intv, body, (r, steps, pos, done))
    return pos
