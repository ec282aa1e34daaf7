"""Blocked, self-contained occ-table layout for TPU gathers (v3).

This is the TPU-native replacement for the reference's interleaved
occ-checkpoint BWT stream (lineage: ``bwt.c:bwt_bwtupdate_core``,
``OCC_INTERVAL`` 0x80).  The layout and the access discipline in
:mod:`hsa_tpu.search.fm` encode two hard-won rules of this XLA/TPU
backend (measured on v5e, see docs/TPU_NOTES.md):

1. **Row gathers are roofline-fast** (tens of Gq/s) when the table is a
   jit *argument* and the consuming compute is flat.  A table captured as
   a Python closure becomes an HLO constant and flips XLA's gather onto a
   ~100x slower path that additionally degrades every subsequent dispatch
   of the process.
2. **Elementwise compute must run on flat [N] vectors.**  Broadcast
   chains over tiny minor dimensions ([N, 2]-shaped masks etc.) lower
   ~100-1000x below VPU rate.

Hence one rank query touches exactly ONE 32-byte row and all decoding is
flat:

- ``occ_blocks`` uint32[nb, 8], one row per 64-symbol block::

      w0..w3 = absolute counts of A/C/G/T among stored-BWT rows [0, 64*b)
      w4..w7 = symbols 64*b .. 64*b+63, 2-bit packed little-end-first

  nb = n//64 + 1 so a prefix length of exactly n is always addressable
  (the final row may be a pure checkpoint).  32 bytes per 64 symbols =
  0.5 B/symbol — the same footprint as a two-level checkpoint scheme,
  with no second gather.

- Locate support is a parallel mark structure over SA *ranks*, blocked by
  128 ranks: ``mark_blocks`` (uint32[nb2, 8]) rows::

      [cnt_marked, m0, m1, m2, m3, pad, pad, pad]

  bit j%32 of word 1+j//32 set iff rank 128*b + j is marked (its SA value
  is a multiple of ``sa_intv``); ``cnt_marked`` counts marked ranks
  < 128*b.  ``samples`` holds the SA values of marked ranks in rank order.

All ranks/positions/counts are uint32: the genome length bound is 2^32-2
(~4.3 Gbp), which covers the human genome; TPU int64 emulation is avoided.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BLOCK = 64           # symbols per occ block
OCC_ROW = 8          # uint32 words per occ row
MARK_BLOCK = 128     # ranks per mark row
MARK_ROW = 8         # uint32 words per mark row

LAYOUT_VERSION = 3


@dataclass
class DeviceIndex:
    """Host-side (numpy) container; ``as_jax()`` moves arrays to device."""

    n: int                   # text length
    primary: int             # rank of the sentinel row
    sa_intv: int
    C: np.ndarray            # uint32[5]
    occ_blocks: np.ndarray   # uint32[nb, 8]
    mark_blocks: np.ndarray  # uint32[nb2, 8]
    samples: np.ndarray      # uint32[n_marked]
    # reverse-text occ table (for the D-array width pass); may be None when
    # only exact search is needed
    rev_primary: int = -1
    rev_occ_blocks: np.ndarray | None = None

    def as_jax(self):
        import jax.numpy as jnp
        from types import SimpleNamespace
        return SimpleNamespace(
            n=np.uint32(self.n), primary=np.uint32(self.primary),
            sa_intv=int(self.sa_intv),
            C=jnp.asarray(self.C),
            occ_blocks=jnp.asarray(self.occ_blocks),
            mark_blocks=jnp.asarray(self.mark_blocks),
            samples=jnp.asarray(self.samples),
            rev_primary=np.uint32(self.rev_primary & 0xFFFFFFFF),
            rev_occ_blocks=(jnp.asarray(self.rev_occ_blocks)
                            if self.rev_occ_blocks is not None else None),
        )

    def save(self, path: str):
        empty = np.zeros((0, OCC_ROW), np.uint32)
        # compression is worthwhile only for small indexes: zlib inflate of a
        # multi-GB genome index takes tens of minutes single-threaded at load
        total = self.occ_blocks.nbytes * (2 if self.rev_occ_blocks is not None
                                          else 1) + self.mark_blocks.nbytes
        savez = np.savez_compressed if total < (256 << 20) else np.savez
        savez(
            path, n=self.n, primary=self.primary, sa_intv=self.sa_intv,
            layout_version=LAYOUT_VERSION,
            C=self.C, occ_blocks=self.occ_blocks,
            mark_blocks=self.mark_blocks,
            samples=self.samples, rev_primary=self.rev_primary,
            rev_occ_blocks=(self.rev_occ_blocks if self.rev_occ_blocks is not None
                            else empty))

    @classmethod
    def load(cls, path: str) -> "DeviceIndex":
        z = np.load(path)
        if int(z.get("layout_version", 1)) != LAYOUT_VERSION:
            raise ValueError(f"{path}: old index layout; rebuild with "
                             f"hsa-tpu index (layout_version {LAYOUT_VERSION} "
                             f"expected)")
        rev = z["rev_occ_blocks"]
        return cls(n=int(z["n"]), primary=int(z["primary"]),
                   sa_intv=int(z["sa_intv"]), C=z["C"],
                   occ_blocks=z["occ_blocks"],
                   mark_blocks=z["mark_blocks"],
                   samples=z["samples"], rev_primary=int(z["rev_primary"]),
                   rev_occ_blocks=rev if rev.size else None)


def _pack_occ_blocks(bwt: np.ndarray, n: int) -> np.ndarray:
    """uint32[nb, 8] self-contained rows from a stored BWT (codes 0..3)."""
    nb = n // BLOCK + 1
    padded = np.zeros(nb * BLOCK, dtype=np.uint32)
    padded[:n] = bwt
    sym = padded.reshape(nb, BLOCK)

    rows = np.zeros((nb, OCC_ROW), dtype=np.uint32)
    # absolute exclusive counts per base at block starts.  Padding symbols
    # (code 0) only occupy final-row tails; they never enter the cumsum of
    # any row that exists (the final row has no successor).
    for a in range(4):
        per_block = (sym == a).sum(axis=1, dtype=np.uint64)
        rows[:, a] = np.concatenate([[0], np.cumsum(per_block)[:-1]]).astype(np.uint32)
    w = sym.reshape(nb, 4, 16)
    shifts = (2 * np.arange(16, dtype=np.uint32))[None, None, :]
    rows[:, 4:8] = (w << shifts).sum(axis=2, dtype=np.uint64).astype(np.uint32)
    return rows


def _pack_mark_blocks(marks: np.ndarray) -> np.ndarray:
    """uint32[nb2,8] mark rows from a bool/uint8 mark vector over ranks 0..n."""
    m = marks.astype(np.uint32)
    n1 = m.size  # n + 1 ranks
    nb = (n1 - 1) // MARK_BLOCK + 1 if n1 else 1
    padded = np.zeros(nb * MARK_BLOCK, dtype=np.uint32)
    padded[:n1] = m
    bits = padded.reshape(nb, 4, 32)
    shifts = np.arange(32, dtype=np.uint32)[None, None, :]
    rows = np.zeros((nb, MARK_ROW), dtype=np.uint32)
    rows[:, 1:5] = (bits << shifts).sum(axis=2, dtype=np.uint64).astype(np.uint32)
    per_block = padded.reshape(nb, MARK_BLOCK).sum(axis=1, dtype=np.uint64)
    rows[:, 0] = np.concatenate([[0], np.cumsum(per_block)[:-1]]).astype(np.uint32)
    return rows


def build_device_index(text: np.ndarray, sa_intv: int = 32,
                       with_reverse: bool = True) -> DeviceIndex:
    """Full index build: native SA-IS (refpack) -> blocked device layout.

    ``text``: int8/uint8 codes 0..3 (ambiguity-substituted).
    """
    from .. import refpack

    t = np.ascontiguousarray(text, dtype=np.uint8)
    n = len(t)
    _, bwt, primary, marks, samples = refpack.build(t, sa_intv=sa_intv)
    counts = np.bincount(t, minlength=4).astype(np.uint64)
    C = np.concatenate([[1], 1 + np.cumsum(counts)]).astype(np.uint32)
    occ = _pack_occ_blocks(bwt, n)
    mark_blocks = _pack_mark_blocks(marks)
    rev_primary, rev_occ = -1, None
    if with_reverse:
        _, rbwt, rev_primary, _, _ = refpack.build(t[::-1].copy(), sa_intv=sa_intv)
        rev_occ = _pack_occ_blocks(rbwt, n)
    return DeviceIndex(n=n, primary=primary, sa_intv=sa_intv, C=C,
                       occ_blocks=occ, mark_blocks=mark_blocks,
                       samples=samples.astype(np.uint32),
                       rev_primary=rev_primary, rev_occ_blocks=rev_occ)
