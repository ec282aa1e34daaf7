"""Blocked, checkpointed occ-table layout for TPU gathers.

This is the TPU-native replacement for the reference's interleaved
occ-checkpoint BWT stream (lineage: ``bwt.c:bwt_bwtupdate_core``,
``OCC_INTERVAL`` 0x80).  XLA's TPU gather throughput is per-WORD bound
(measured ~2-3 GB/s effective regardless of row width), so the layout
minimizes words per rank query (SURVEY.md §7.3.2):

- **Two-level checkpoints.**  The stored BWT is cut into 32-symbol blocks;
  each block is one 16-byte row of ``occ_blocks`` (uint32[nb, 4])::

      w0 = cntA | cntC << 16      (uint16 counts relative to the superblock)
      w1 = cntG | cntT << 16
      w2 = symbols 0..15, 2-bit packed little-end-first
      w3 = symbols 16..31

  Absolute counts at every 32768-symbol *superblock* boundary live in
  ``occ_super`` (uint32[nsb, 4]) — 16 bytes per 32 Ksymbols (~1.5 MB for a
  human-scale genome), a second, much better-cached gather.
  One rank query = one 4-word row gather + one 4-word superblock gather +
  VPU popcounts — 2.4x faster than a flat 64-byte-row layout on v5e.
  (Relative counts fit uint16: max 32768-32 < 65536, homopolymer-safe.)

- ``nb = n//32 + 1`` / ``nsb = n//32768 + 1`` so a prefix length of
  exactly n is always addressable (final rows are pure checkpoints).

- Locate support is a parallel mark structure over SA *ranks*, blocked by
  128 ranks: ``mark_blocks`` (uint32[nb2, 8]) rows::

      [cnt_marked, m0, m1, m2, m3, pad, pad, pad]

  bit j%32 of word j//32 set iff rank 128*b + j is marked (its SA value is
  a multiple of ``sa_intv``); ``cnt_marked`` counts marked ranks < 128*b.
  ``samples`` holds the SA values of marked ranks in rank order.

All ranks/positions/counts are uint32: the genome length bound is 2^32-2
(~4.3 Gbp), which covers the human genome; TPU int64 emulation is avoided.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BLOCK = 32           # symbols per occ block
SUPER = 32768        # symbols per superblock (absolute checkpoints)
OCC_ROW = 4          # uint32 words per occ row
MARK_BLOCK = 128     # ranks per mark row
MARK_ROW = 8         # uint32 words per mark row


@dataclass
class DeviceIndex:
    """Host-side (numpy) container; ``as_jax()`` moves arrays to device."""

    n: int                   # text length
    primary: int             # rank of the sentinel row
    sa_intv: int
    C: np.ndarray            # uint32[5]
    occ_blocks: np.ndarray   # uint32[nb, 4]
    occ_super: np.ndarray    # uint32[nsb, 4]
    mark_blocks: np.ndarray  # uint32[nb2, 8]
    samples: np.ndarray      # uint32[n_marked]
    # reverse-text occ tables (for the D-array width pass); may be None when
    # only exact search is needed
    rev_primary: int = -1
    rev_occ_blocks: np.ndarray | None = None
    rev_occ_super: np.ndarray | None = None

    def as_jax(self):
        import jax.numpy as jnp
        from types import SimpleNamespace
        return SimpleNamespace(
            n=np.uint32(self.n), primary=np.uint32(self.primary),
            sa_intv=int(self.sa_intv),
            C=jnp.asarray(self.C),
            occ_blocks=jnp.asarray(self.occ_blocks),
            occ_super=jnp.asarray(self.occ_super),
            mark_blocks=jnp.asarray(self.mark_blocks),
            samples=jnp.asarray(self.samples),
            rev_primary=np.uint32(self.rev_primary & 0xFFFFFFFF),
            rev_occ_blocks=(jnp.asarray(self.rev_occ_blocks)
                            if self.rev_occ_blocks is not None else None),
            rev_occ_super=(jnp.asarray(self.rev_occ_super)
                           if self.rev_occ_super is not None else None),
        )

    def save(self, path: str):
        empty4 = np.zeros((0, OCC_ROW), np.uint32)
        # compression is worthwhile only for small indexes: zlib inflate of a
        # multi-GB genome index takes tens of minutes single-threaded at load
        total = self.occ_blocks.nbytes * (2 if self.rev_occ_blocks is not None
                                          else 1) + self.mark_blocks.nbytes
        savez = np.savez_compressed if total < (256 << 20) else np.savez
        savez(
            path, n=self.n, primary=self.primary, sa_intv=self.sa_intv,
            layout_version=2,
            C=self.C, occ_blocks=self.occ_blocks, occ_super=self.occ_super,
            mark_blocks=self.mark_blocks,
            samples=self.samples, rev_primary=self.rev_primary,
            rev_occ_blocks=(self.rev_occ_blocks if self.rev_occ_blocks is not None
                            else empty4),
            rev_occ_super=(self.rev_occ_super if self.rev_occ_super is not None
                           else empty4))

    @classmethod
    def load(cls, path: str) -> "DeviceIndex":
        z = np.load(path)
        if int(z.get("layout_version", 1)) != 2:
            raise ValueError(f"{path}: old index layout; rebuild with "
                             f"hsa-tpu index (layout_version 2 expected)")
        rev = z["rev_occ_blocks"]
        return cls(n=int(z["n"]), primary=int(z["primary"]),
                   sa_intv=int(z["sa_intv"]), C=z["C"],
                   occ_blocks=z["occ_blocks"], occ_super=z["occ_super"],
                   mark_blocks=z["mark_blocks"],
                   samples=z["samples"], rev_primary=int(z["rev_primary"]),
                   rev_occ_blocks=rev if rev.size else None,
                   rev_occ_super=z["rev_occ_super"] if rev.size else None)


def _pack_occ_blocks(bwt: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(occ_blocks uint32[nb,4], occ_super uint32[nsb,4]) from a stored BWT."""
    nb = n // BLOCK + 1
    nsb = n // SUPER + 1
    padded = np.zeros(nb * BLOCK, dtype=np.uint32)
    padded[:n] = bwt
    sym = padded.reshape(nb, BLOCK)

    rows = np.zeros((nb, OCC_ROW), dtype=np.uint32)
    abs_excl = np.zeros((nb, 4), dtype=np.uint64)
    # padding symbols (code 0) only occupy final-row tails; their counts are
    # dropped by the exclusive cumsums below
    for a in range(4):
        per_block = (sym == a).sum(axis=1, dtype=np.uint64)
        abs_excl[:, a] = np.concatenate([[0], np.cumsum(per_block)[:-1]])
    blocks_per_super = SUPER // BLOCK
    sb_idx = np.arange(nb) // blocks_per_super
    sb_rows = np.zeros((nsb, 4), dtype=np.uint32)
    sb_starts = np.arange(nsb) * blocks_per_super
    sb_starts = np.minimum(sb_starts, nb - 1)
    sb_rows[:, :] = abs_excl[sb_starts].astype(np.uint32)
    rel = abs_excl - sb_rows[sb_idx].astype(np.uint64)
    assert rel.max(initial=0) < 65536, "relative count overflow"
    rows[:, 0] = (rel[:, 0] | (rel[:, 1] << 16)).astype(np.uint32)
    rows[:, 1] = (rel[:, 2] | (rel[:, 3] << 16)).astype(np.uint32)
    w = sym.reshape(nb, 2, 16)
    shifts = (2 * np.arange(16, dtype=np.uint32))[None, None, :]
    rows[:, 2:4] = (w << shifts).sum(axis=2, dtype=np.uint64).astype(np.uint32)
    return rows, sb_rows


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
    occ, sb = _pack_occ_blocks(bwt, n)
    mark_blocks = _pack_mark_blocks(marks)
    rev_primary, rev_occ, rev_sb = -1, None, None
    if with_reverse:
        _, rbwt, rev_primary, _, _ = refpack.build(t[::-1].copy(), sa_intv=sa_intv)
        rev_occ, rev_sb = _pack_occ_blocks(rbwt, n)
    return DeviceIndex(n=n, primary=primary, sa_intv=sa_intv, C=C,
                       occ_blocks=occ, occ_super=sb, mark_blocks=mark_blocks,
                       samples=samples.astype(np.uint32),
                       rev_primary=rev_primary, rev_occ_blocks=rev_occ,
                       rev_occ_super=rev_sb)
