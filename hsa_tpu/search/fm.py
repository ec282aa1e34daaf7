"""Batched FM-index primitives over the blocked occ layout (jnp).

These are the device analogs of the reference's ``bwt.c`` rank/locate
primitives (``bwt_occ4``/``bwt_2occ4``/``bwt_sa``), restated over
``hsa_tpu.index.layout``'s blocked rows and batched over query vectors.
This jnp path is the semantics reference for the Pallas kernels in
``hsa_tpu.kernels`` and is itself jit-compatible (XLA row gathers).

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
_PAT55 = jnp.uint32(0x55555555)


def _stored_prefix(primary, p):
    """# stored-BWT rows among full rows [0, p): drop the primary row."""
    p = p.astype(U32)
    return jnp.where(p <= primary, p, p - U32(1))


def _gather_rows(idx, blocks, b_global, offset_attr):
    """Row gather by global block id.

    On sharded indexes returns (rows, own) where ``own`` marks lanes whose
    block this shard owns; non-owned rows are zeroed AND the caller must
    additionally gate derived counts with ``own`` before the psum merge —
    zeroed 2-bit words would otherwise decode as runs of base A.
    Unsharded: own is None.
    """
    ax = getattr(idx, "shard_axis", None)
    b_global = b_global.astype(jnp.int32)
    if ax is None:
        return jnp.take(blocks, b_global, axis=0), None
    off = getattr(idx, offset_attr)
    local = b_global - off
    own = (local >= 0) & (local < blocks.shape[0])
    rows = jnp.take(blocks, jnp.clip(local, 0, blocks.shape[0] - 1), axis=0)
    return rows * own[:, None].astype(rows.dtype), own


def _psum(idx, x):
    ax = getattr(idx, "shard_axis", None)
    return lax.psum(x, ax) if ax is not None else x


def _row_split(idx, blocks, superblocks, p_st, offset_attr):
    """(cnt[B,4], words[B,2], off[B], own[B]|None) for stored prefix lengths.

    cnt = superblock absolute counts + block-relative uint16 counts; words
    are the block's 32 symbols (2-bit packed, 16 per word); off in [0, 32).
    Superblock tables are small and replicated on sharded indexes (their
    contribution is still gated by ``own`` in the callers).
    """
    b = (p_st >> U32(5)).astype(jnp.int32)
    sbi = (p_st >> U32(15)).astype(jnp.int32)
    off = (p_st & U32(31)).astype(jnp.int32)
    rows, own = _gather_rows(idx, blocks, b, offset_attr)
    sb = jnp.take(superblocks, sbi, axis=0)          # [B,4] absolute counts
    relAC, relGT = rows[:, 0], rows[:, 1]
    rel = jnp.stack([relAC & U32(0xFFFF), relAC >> U32(16),
                     relGT & U32(0xFFFF), relGT >> U32(16)], axis=1)
    return sb + rel, rows[:, 2:4], off, own


def _inblock_valid_mask(off):
    """[B,2] uint32 mask selecting the first ``off`` symbols of a block."""
    widx = jnp.arange(2, dtype=jnp.int32)
    v = jnp.clip(off[:, None] - 16 * widx[None, :], 0, 16)  # valid syms per word
    shift = (U32(2) * (U32(16) - jnp.maximum(v, 1).astype(U32)))
    return jnp.where(v > 0, _PAT55 >> shift, U32(0))


def _match_bits(words, a):
    """Bit 2j set iff symbol j of the word equals base a (a broadcastable)."""
    x = words ^ (a.astype(U32) * _PAT55)
    return (~x) & ((~x) >> U32(1)) & _PAT55


def occ_lt4(idx, p):
    """[B,4] counts of each base among bwt_full rows [0, p). p: uint32[B]."""
    cnt, words, off, own = _row_split(idx, idx.occ_blocks, idx.occ_super,
                                      _stored_prefix(idx.primary, p), "row_offset")
    vmask = _inblock_valid_mask(off)
    outs = []
    for a in range(4):
        y = _match_bits(words, jnp.uint32(a)) & vmask
        outs.append(cnt[:, a] + lax.population_count(y).sum(axis=1, dtype=U32))
    res = jnp.stack(outs, axis=1)
    if own is not None:
        res = res * own[:, None].astype(res.dtype)
    return _psum(idx, res)


def occ_lt(idx, a, p, *, rev: bool = False):
    """[B] count of base a[B] among bwt_full rows [0, p). a must be 0..3."""
    blocks = idx.rev_occ_blocks if rev else idx.occ_blocks
    superblocks = idx.rev_occ_super if rev else idx.occ_super
    primary = idx.rev_primary if rev else idx.primary
    offset_attr = "rev_row_offset" if rev else "row_offset"
    cnt, words, off, own = _row_split(idx, blocks, superblocks,
                                      _stored_prefix(primary, p), offset_attr)
    vmask = _inblock_valid_mask(off)
    y = _match_bits(words, a[:, None]) & vmask
    inb = lax.population_count(y).sum(axis=1, dtype=U32)
    res = jnp.take_along_axis(cnt, a[:, None].astype(jnp.int32), axis=1)[:, 0] + inb
    if own is not None:
        res = res * own.astype(res.dtype)
    return _psum(idx, res)


def extend(idx, a, k, l, *, rev: bool = False):
    """Left-extend [k,l] with base a (uint32 vectors). Empty iff k' > l'.

    Callers must mask lanes where a > 3 themselves (N never matches).
    """
    a = jnp.minimum(a, 3).astype(U32)
    Ca = jnp.take(idx.C, a.astype(jnp.int32))
    k2 = Ca + occ_lt(idx, a, k, rev=rev)
    l2 = Ca + occ_lt(idx, a, l + U32(1), rev=rev) - U32(1)
    return k2, l2


def extend4(idx, k, l):
    """All-bases extension: ([B,4] k', [B,4] l') — the ``bwt_2occ4`` analog.

    Two separate occ passes: fusing the ends into one concatenated query
    batch was measured ~10% SLOWER end-to-end (the concat/split outweighs
    the gather-efficiency gain at these sizes).
    """
    o_k = occ_lt4(idx, k)
    o_l = occ_lt4(idx, l + U32(1))
    C4 = idx.C[None, 0:4]
    return C4 + o_k, C4 + o_l - U32(1)


def bwt_char(idx, r):
    """bwt_full symbol at rank r (garbage at r == primary; mask there)."""
    j = jnp.where(r < idx.primary, r, r - U32(1))
    b = (j >> U32(5)).astype(jnp.int32)
    off = (j & U32(31)).astype(jnp.int32)
    rows, _ = _gather_rows(idx, idx.occ_blocks, b, "row_offset")
    word = jnp.take_along_axis(rows, (2 + (off >> 4))[:, None], axis=1)[:, 0]
    # non-owned rows are zero -> contribute 0; psum recovers the owner's value
    return _psum(idx, (word >> (U32(2) * (off & 15).astype(U32))) & U32(3))


def lf(idx, r):
    """LF mapping; LF(primary) = 0."""
    c = bwt_char(idx, r)
    res = jnp.take(idx.C, c.astype(jnp.int32)) + occ_lt(idx, c, r + U32(1)) - U32(1)
    return jnp.where(r == idx.primary, U32(0), res)


def _mark_info(idx, r):
    """(is_marked[B] bool, mark_rank[B] uint32) for ranks r."""
    b = (r >> U32(7)).astype(jnp.int32)
    off = (r & U32(127)).astype(jnp.int32)
    rows, _ = _gather_rows(idx, idx.mark_blocks, b, "mark_row_offset")
    cnt = rows[:, 0]
    bits = rows[:, 1:5]  # [B,4] words of 32 ranks
    w = jnp.take_along_axis(bits, (off >> 5)[:, None], axis=1)[:, 0]
    bit = (w >> (off & 31).astype(U32)) & U32(1)
    # rank of marks below r inside the block
    wi = jnp.arange(4, dtype=jnp.int32)
    v = jnp.clip(off[:, None] - 32 * wi[None, :], 0, 32)
    full = v >= 32
    shift = (U32(32) - jnp.clip(v, 1, 31).astype(U32))
    wmask = jnp.where(full, U32(0xFFFFFFFF),
                      jnp.where(v > 0, U32(0xFFFFFFFF) >> shift, U32(0)))
    below = lax.population_count(bits & wmask).sum(axis=1, dtype=U32)
    return _psum(idx, bit) == 1, _psum(idx, cnt + below)


def _sample_lookup(idx, mrank):
    ax = getattr(idx, "shard_axis", None)
    mrank = mrank.astype(jnp.int32)
    if ax is None:
        return jnp.take(idx.samples, mrank)
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
