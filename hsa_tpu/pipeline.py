"""End-to-end single-host alignment pipeline: index artifacts + batch driver.

The TPU analog of the reference's ``bwa_aln_core`` / ``bwa_sai2sam_se_core``
batch loops (lineage: ``bwtaln.c``, ``bwase.c``): host streams read batches,
device runs both-strand beam search + locate, host resolves records.

Index artifact directory layout (``<prefix>.hsa/``):
  index.npz   — DeviceIndex arrays (blocked occ/mark tables, samples, C)
  meta.json   — RefMeta (names/starts/lengths/amb) + build parameters
  text.pac    — 2-bit packed concatenated genome (+ length), for CIGAR/MD
"""

from __future__ import annotations

import json
import os

import numpy as np

from . import alphabet, refpack
from .config import AlnOpt, SamseOpt
from .index.layout import DeviceIndex, build_device_index
from .io.fastx import RefMeta, load_reference
from .resolve.samse import resolve_batch_se


class ReadBatch:
    """Matrix-backed read batch: codes uint8 [B, Lmax] + lens int32 [B].

    Replaces list-of-arrays batches on the hot path so packing and
    resolution work matrix-to-matrix (no 65K-iteration Python copy
    loops).  Indexing returns the j-th read's code view, so every
    list-based consumer keeps working.
    """

    __slots__ = ("mat", "lens")

    def __init__(self, mat, lens):
        self.mat = np.asarray(mat, np.uint8)
        self.lens = np.asarray(lens, np.int32)

    @classmethod
    def from_reads(cls, reads):
        if isinstance(reads, ReadBatch):
            return reads
        B = len(reads)
        Lmax = max((len(r) for r in reads), default=1)
        mat = np.full((B, max(Lmax, 1)), 5, np.uint8)
        lens = np.zeros(B, np.int32)
        for j, r in enumerate(reads):
            mat[j, :len(r)] = np.asarray(r, np.uint8)
            lens[j] = len(r)
        return cls(mat, lens)

    def __len__(self):
        return self.mat.shape[0]

    def __getitem__(self, j):
        return self.mat[j, :self.lens[j]].astype(np.int8)

    def __iter__(self):
        return (self[j] for j in range(len(self)))

    def subset(self, idx):
        idx = np.asarray(idx, np.int64)
        return ReadBatch(self.mat[idx], self.lens[idx])

    def padded(self, Lmax=None):
        """(mat, lens) with columns >= lens set to PAD(5)."""
        m = self.mat
        if Lmax is not None and m.shape[1] < Lmax:
            m = np.pad(m, ((0, 0), (0, Lmax - m.shape[1])),
                       constant_values=5)
        t = np.arange(m.shape[1])[None, :]
        return np.where(t < self.lens[:, None], m, 5).astype(np.uint8), \
            self.lens


def _beam_pad(n: int) -> int:
    """Beam fallback batch padding target.

    Small sets (tests, trickle fallbacks) pad to the next power of two;
    pooled stream flushes (> 64) quantize to powers of FOUR from 512 —
    the beam is latency-dominated (2K lanes 1.3 s vs 32K 2.1 s measured)
    and every distinct shape costs a compile, so two or three classes
    cover a whole stream.
    """
    if n <= 64:
        return 1 << max(n - 1, 0).bit_length()
    tgt = 512
    while tgt < n:
        tgt *= 4
    return tgt


def _occ_merge(occ, socc, fmap):
    """Merge a fallback occ dict (rid local to ``fmap`` order) into a
    batch occ dict and restore canonical (rid, score, strand, pos)
    order."""
    socc = dict(socc)
    socc["rid"] = fmap[socc["rid"]] if socc["rid"].size else socc["rid"]
    occ = {k: np.concatenate([occ[k], socc[k]]) for k in occ}
    order = np.lexsort((occ["pos"], occ["strand"], occ["score"],
                        occ["rid"]))
    return {k: v[order] for k, v in occ.items()}


def force_sync_mode():
    """Put the backend into its synchronous execution regime.

    On the axon tunnel, async dispatch LIES about completion
    (block_until_ready returns before work runs) and the queued work
    executes ~50x slower than synchronous mode; one tiny device->host
    readback flips the process into the honest, faster regime
    (docs/TPU_NOTES.md).  Call once before any real work.
    """
    import jax.numpy as jnp
    np.asarray(jnp.arange(8, dtype=jnp.uint32) * jnp.uint32(3))


def build_index(fasta_path: str, prefix: str, sa_intv: int = 32) -> str:
    """``hsa-tpu index``: FASTA -> artifact dir. Returns the dir path."""
    text, meta = load_reference(fasta_path)
    di = build_device_index(text, sa_intv=sa_intv, with_reverse=True)
    outdir = prefix + ".hsa"
    os.makedirs(outdir, exist_ok=True)
    di.save(os.path.join(outdir, "index.npz"))
    with open(os.path.join(outdir, "meta.json"), "w") as fh:
        json.dump(dict(ref=meta.to_dict(), sa_intv=sa_intv, version=1), fh)
    packed = refpack.pack_2bit(text.astype(np.uint8))
    with open(os.path.join(outdir, "text.pac"), "wb") as fh:
        fh.write(np.int64(len(text)).tobytes())
        fh.write(packed.tobytes())
    return outdir


class Aligner:
    """Loads index artifacts and aligns read batches.

    ``engine``: "auto" routes eligible batches (short reads, modest diff
    budgets) through the pigeonhole seed-and-verify engine with the beam
    ladder as exact fallback; "beam" forces the exhaustive beam; "pigeon"
    forces the pigeon path (ineligible batches raise).
    """

    def __init__(self, index_dir: str, opt: AlnOpt | None = None,
                 ladder=None, engine: str = "auto"):
        if not os.path.isdir(index_dir) and os.path.isdir(index_dir + ".hsa"):
            index_dir = index_dir + ".hsa"
        self.index_dir = index_dir
        self.opt = opt or AlnOpt()
        self.ladder = ladder
        self.engine = engine
        self.di = DeviceIndex.load(os.path.join(index_dir, "index.npz"))
        with open(os.path.join(index_dir, "meta.json")) as fh:
            m = json.load(fh)
        self.meta = RefMeta.from_dict(m["ref"])
        with open(os.path.join(index_dir, "text.pac"), "rb") as fh:
            n = np.frombuffer(fh.read(8), np.int64)[0]
            packed = np.frombuffer(fh.read(), np.uint8)
        self.text = refpack.unpack_2bit(packed, int(n)).astype(np.int8)
        self.dev = self.di.as_jax()
        self._text_rows = None
        self._pigeon_jit = {}
        force_sync_mode()

    @classmethod
    def from_arrays(cls, di, text, meta: RefMeta | None = None,
                    opt: AlnOpt | None = None, ladder=None,
                    engine: str = "auto", index_dir: str | None = None):
        """Construct from in-memory arrays (bench/tests): DeviceIndex +
        int8 text (+ optional RefMeta; a single-sequence meta is synthesized
        when omitted).  ``index_dir`` (optional) enables the on-disk K-mer
        table cache."""
        self = cls.__new__(cls)
        self.index_dir = index_dir
        self.opt = opt or AlnOpt()
        self.ladder = ladder
        self.engine = engine
        self.di = di
        self.meta = meta or RefMeta(
            names=["seq0"], starts=np.zeros(1, np.int64),
            lengths=np.asarray([len(text)], np.int64), total=len(text))
        self.text = np.asarray(text, np.int8)
        self.dev = di.as_jax()
        self._text_rows = None
        self._pigeon_jit = {}
        force_sync_mode()
        return self

    # -- pigeon fast path --------------------------------------------------
    # capacity knobs (env-overridable for tuning runs): candidate slots
    # per read-strand lane, and the max anchor interval width before a
    # segment counts as repetitive (wider -> fewer beam fallbacks on
    # repeat-dense genomes at more verify work per batch)
    # CC=48 (round 4): moderately repetitive reads carry ~40-70 real
    # candidates after wide-anchor extension; the pool-form readback
    # makes CC readback-free, so enumerate them instead of sampling 16
    # (sampling missed the true copy for ~12% of repeat-genome reads).
    _PIGEON_CAND_CAP = int(os.environ.get("HSA_PIGEON_CC", "48"))
    _PIGEON_SEG_CAP = int(os.environ.get("HSA_PIGEON_SEG_CAP", "32"))
    _PIGEON_POOL_MULT = int(os.environ.get("HSA_PIGEON_POOL", "4"))
    _PIGEON_MIN_SEG = 12
    # repeat profile (round 4): when a batch's fallback + truncation
    # fraction exceeds the threshold, later batches compile with these
    # caps — wide enough to enumerate typical repeat families (~48-96
    # copies) so beam fallback drops ~3x (0.055 -> 0.019 measured on the
    # repeats genome) at ~1.7x device-step cost; i.i.d.-like inputs
    # never trigger it so the headline path keeps the lean caps.  The
    # switch is sticky (streams are homogeneous) and costs one extra
    # compile.  Lineage analog: bwtgap.c's max_entries work cap, which
    # is likewise a repeat-capacity knob (SURVEY.md §2 inexact core).
    _PIGEON_REPEAT_CAPS = tuple(
        int(x) for x in os.environ.get("HSA_PIGEON_REPEAT_CAPS",
                                       "96,160,16").split(","))
    _PIGEON_REPEAT_THRESH = float(
        os.environ.get("HSA_PIGEON_REPEAT_THRESH", "0.10"))
    _pigeon_profile = "base"          # instance attr once switched
    # round 5: the alternate-partition retry pass (seg_phase) absorbs
    # most would-be beam fallbacks — a read whose pass-1 enumeration was
    # capacity-truncated with NO verified candidate re-runs as one lane
    # of a SMALL second pigeon pass over the half-shifted partition at
    # the wide repeat caps (~10 gathers/read) instead of a ~0.6 ms/lane
    # widest-rung beam lane; only dual failures hit the beam.  A retry
    # pass that is COMPLETE (no truncation) and still empty proves the
    # read unmapped (pigeonhole completeness holds for any partition).
    _PIGEON_RETRY = os.environ.get("HSA_PIGEON_RETRY", "1") != "0"
    # retry capacity profile: wider than the repeat profile (the retry
    # batch is a small fraction, so wide caps cost little there) —
    # every retry success converts a ~0.6 ms widest-rung beam lane into
    # ~10 extra gathers
    _PIGEON_RETRY_CAPS = tuple(
        int(x) for x in os.environ.get("HSA_PIGEON_RETRY_CAPS",
                                       "96,160,16").split(","))
    # hysteresis (round 5): the sticky repeat-profile upshift now
    # DOWNSHIFTS after this many consecutive batches whose
    # fallback+trunc fraction stayed under threshold/2 — a transient
    # repeat region no longer taxes the rest of a clean stream 1.7x.
    _PIGEON_DOWNSHIFT_N = int(os.environ.get("HSA_PIGEON_DOWNSHIFT", "4"))
    _profile_clean = 0                # consecutive clean batches
    last_retry_frac = 0.0             # seg_phase retries / batch (stats)

    def _pigeon_caps(self, prof: str):
        """(seg_cap, cand_cap, pool_mult) for a capacity profile."""
        if prof == "repeat":
            return self._PIGEON_REPEAT_CAPS
        if prof == "retry":
            return self._PIGEON_RETRY_CAPS
        return (self._PIGEON_SEG_CAP, self._PIGEON_CAND_CAP,
                self._PIGEON_POOL_MULT)

    def _pigeon_eligible(self, reads):
        """Batch-level gate: n_seg when every read fits the pigeon shape.

        The engine covers reads <= MAX_READ_LEN with one-run gap budgets
        (``max_gapo <= 1``; multi-run gaps are outside the pigeonhole
        screen and route to the beam).  See :meth:`_pigeon_split` for the
        per-read router that peels off only the ineligible reads.
        """
        if self.engine == "beam" or not len(reads):
            return None
        from .search.pigeon import MAX_READ_LEN
        lens = [len(r) for r in reads]
        Lmax = max(lens)
        md_max = max(self.opt.diff_budget(L) for L in set(lens))
        n_seg = md_max + 1
        ok = (Lmax <= MAX_READ_LEN
              and self.opt.max_gapo <= 1
              and min(lens) // n_seg >= self._PIGEON_MIN_SEG)
        if self.engine == "pigeon" and not ok:
            raise ValueError("batch not eligible for the pigeon engine "
                             f"(Lmax={Lmax}, md_max={md_max}, "
                             f"max_gapo={self.opt.max_gapo})")
        return n_seg if ok else None

    @property
    def _kmer_k(self):
        """K-mer seeding depth: 12 for genomes where 12-mers are selective
        (table build cost is amortized); 0 disables (tiny genomes/tests)."""
        return 12 if self.di.n >= (1 << 24) else 0

    @property
    def _lock(self):
        # lazy so from_arrays/__init__ need no shared boilerplate; guards
        # the lazy jit/table inits against align_stream's worker threads
        # (ADVICE r3: duplicate kmer-table builds waste device memory)
        import threading
        lk = self.__dict__.get("_init_lock")
        if lk is None:
            lk = self.__dict__.setdefault("_init_lock", threading.RLock())
        return lk

    def _kmer_tables(self):
        with self._lock:
            return self._kmer_tables_locked()

    def _kmer_tables_locked(self):
        if not hasattr(self, "_ktabs"):
            import jax.numpy as jnp
            from .search.exact import kmer_table
            path = (os.path.join(self.index_dir, f"kmer{self._kmer_k}.npz")
                    if self.index_dir else None)
            if path and os.path.exists(path):
                z = np.load(path)
                self._ktabs = (jnp.asarray(z["tk"]), jnp.asarray(z["tl"]))
            else:
                self._ktabs = kmer_table(self.dev, self._kmer_k)
                if path:
                    try:
                        np.savez(path, tk=np.asarray(self._ktabs[0]),
                                 tl=np.asarray(self._ktabs[1]))
                    except OSError:
                        pass  # read-only index dir: rebuild next session
        return self._ktabs

    def _pigeon_search_fn(self, n_seg, prof="base", seg_phase=False):
        with self._lock:
            return self._pigeon_search_fn_locked(n_seg, prof, seg_phase)

    def _pigeon_search_fn_locked(self, n_seg, prof="base", seg_phase=False):
        key = (n_seg, prof, seg_phase)
        f = self._pigeon_jit.get(key)
        if f is None:
            import jax
            from .search.jitcache import split_idx, join_idx
            from .search import pigeon as pg
            arrays, meta = split_idx(self.dev)
            opt = self.opt
            seg_cap, CC, pool_mult = self._pigeon_caps(prof)
            if self._text_rows is None:
                import jax.numpy as jnp
                self._text_rows = jnp.asarray(pg.pack_text_rows(self.text))
            trows = self._text_rows
            with_kmer = self._kmer_k > 0

            import functools

            @functools.partial(jax.jit, static_argnums=(0,))
            def core(shape, arrs, trows, buf, *tabs):
                idx = join_idx(meta, arrs)
                (segs_rev, seg_lens, seg_off, kmer, kmer_ok, seg_short,
                 rw, nmask, lens, md) = pg.unpack_pigeon_upload(buf, shape)
                seed = ((tabs[0], tabs[1], kmer, kmer_ok, seg_short)
                        if tabs else None)
                B2 = shape[2]
                # vmask/seedmask derived on device; the whole batch rides
                # in ONE fused upload buffer (per-array upload overhead on
                # the tunnel dominates otherwise — docs/TPU_NOTES.md v3)
                return pg.pigeon_search(idx, trows, segs_rev, seg_lens,
                                        seg_off, rw, nmask, None, None,
                                        lens, md, opt, n_seg=n_seg,
                                        cand_cap=CC, gpool=B2,
                                        pool=pool_mult * B2,
                                        seg_cap=seg_cap,
                                        kmer_seed=seed,
                                        seg_phase=seg_phase)

            def f_buf(buf, shape):
                tabs = self._kmer_tables() if with_kmer else ()
                return core(shape, arrays, trows, buf, *tabs)

            def f(b, md):
                return f_buf(*pg.pack_pigeon_upload(b, md))
            f = (f, f_buf)
            self._pigeon_jit[key] = f
        return f

    def _pigeon_raw(self, reads, n_seg, prof="base", seg_phase=False):
        """Pack both strands, run the device pigeon search -> PigeonResult
        (host arrays; the fetch overlaps its transfers).

        The batch pack (revcomp lanes, anchors, packed words, fused
        upload buffer) runs in native C++ when librefpack is available
        (~10x the numpy path); both produce bit-identical buffers.
        ``seg_phase=True`` packs the half-shifted alternate partition
        (numpy path only — the retry batches that use it are small).
        """
        from . import refpack
        from .search import pigeon as pg
        from .search.pigeon import fetch_result
        rb = ReadBatch.from_reads(reads)
        lens = rb.lens
        budg = {int(L): self.opt.diff_budget(int(L))
                for L in np.unique(lens).tolist()}
        md_fwd = np.fromiter((budg[int(L)] for L in lens), np.int32,
                             len(lens))
        K = self._kmer_k
        tail = pg.auto_anchor_tail(int(self.di.n), K)
        f, f_buf = self._pigeon_search_fn(n_seg, prof, seg_phase)
        if not seg_phase:
            native = refpack.pigeon_pack(rb.mat, lens, md_fwd, n_seg, K,
                                         tail)
            if native is not None:
                return fetch_result(f_buf(*native))
        Rf, lens = rb.padded()
        Lmax = Rf.shape[1]
        # vectorized reverse-complement lanes (comp of 0..3; N/PAD carried)
        t = np.arange(Lmax)[None, :]
        cols = np.clip(lens[:, None] - 1 - t, 0, max(Lmax - 1, 0))
        Rr = np.take_along_axis(Rf, cols, axis=1)
        Rr = np.where(Rr <= 3, 3 - Rr, Rr).astype(np.uint8)
        Rr = np.where(t < lens[:, None], Rr, 5).astype(np.uint8)
        both = (np.vstack([Rf, Rr]), np.concatenate([lens, lens]))
        batch = pg.pack_pigeon_batch(both, n_seg=n_seg,
                                     seed_len=self.opt.seed_len,
                                     kmer_k=K, anchor_tail=tail,
                                     device_masks=True, seg_phase=seg_phase)
        md = np.concatenate([md_fwd, md_fwd])
        return fetch_result(f(batch, md))

    def pigeon_occurrences(self, reads, n_seg):
        """Pigeon search of reads (both strands):
        (occs[B], fallback[B], missed[B])."""
        from .search import pigeon as pg
        res = self._pigeon_raw(reads, n_seg)
        return pg.pigeon_occurrences(res, len(reads), self.opt,
                                     self._PIGEON_CAND_CAP)

    def pigeon_occ_arrays(self, reads, n_seg):
        """Vectorized twin of :meth:`pigeon_occurrences`:
        (occ dict, fb, missed)."""
        from .search import pigeon as pg
        res = self._pigeon_raw(reads, n_seg)
        return pg.pigeon_occ_arrays(res, len(reads), self.opt,
                                    self._PIGEON_CAND_CAP)

    def _pigeon_split(self, reads):
        """Per-read router: (n_seg, eligible read indices).

        A read takes the pigeon path iff it fits the engine shape (length
        <= MAX_READ_LEN, segments >= _PIGEON_MIN_SEG for its own diff
        budget); the rest of the batch runs on the beam — one long read
        no longer demotes the whole batch.
        """
        if self.engine == "beam" or not len(reads):
            return None, []
        from .search.pigeon import MAX_READ_LEN
        if self.opt.max_gapo > 1:
            if self.engine == "pigeon":
                raise ValueError("pigeon engine requires max_gapo <= 1 "
                                 f"(got {self.opt.max_gapo})")
            return None, []
        lens = (reads.lens.tolist() if isinstance(reads, ReadBatch)
                else [len(r) for r in reads])
        budg = {L: self.opt.diff_budget(L) for L in set(lens)}
        elig = [i for i, L in enumerate(lens)
                if L <= MAX_READ_LEN
                and L // (budg[L] + 1) >= self._PIGEON_MIN_SEG]
        if self.engine == "pigeon" and len(elig) < len(reads):
            raise ValueError("batch contains pigeon-ineligible reads "
                             "(engine='pigeon' forces the fast path)")
        if not elig:
            return None, []
        n_seg = max(budg[lens[i]] for i in elig) + 1
        return n_seg, elig

    def _pigeon_retry(self, sub, ridx, n_seg):
        """Alternate-partition (seg_phase) pigeon pass over the capacity-
        fallback subset: reads truncated with no verified candidate.

        Runs at the WIDE retry caps (the subset is small, so wide caps
        cost little) on the half-shifted partition — a read missed by
        pass 1's capped enumeration usually anchors on a narrower
        segment of the shifted partition.  Returns (occ dict with rid
        local to ridx order, fb bool[n], missed int64[n]); pads per
        :func:`_beam_pad` to bound the compile-shape set.
        """
        from .search import pigeon as pg
        reads = [sub[int(j)] for j in ridx]
        n = len(reads)
        # quantized padding (_beam_pad: pow2 up to 64, then pow4 from
        # 512) — each distinct retry shape costs a pigeon compile, and
        # per-batch retry counts vary
        tgt = _beam_pad(n)
        reads = reads + [reads[0]] * (tgt - n)
        cc = self._PIGEON_RETRY_CAPS[1]
        res = self._pigeon_raw(reads, n_seg, prof="retry", seg_phase=True)
        occ, fb, missed = pg.pigeon_occ_arrays(res, tgt, self.opt, cc)
        keep = occ["rid"] < n
        if not keep.all():
            occ = {k: v[keep] for k, v in occ.items()}
        return occ, fb[:n], missed[:n]

    def _retry_merge(self, sub, occ, fb, missed, has_occ, n_seg):
        """Run the seg_phase retry for capacity-fallback reads and merge.

        Mutates nothing; returns updated (occ, fb, missed, has_occ,
        retry_frac).  ``fb`` on entry must be the ENGINE (structural)
        fallback only.
        """
        if not self._PIGEON_RETRY:
            # no retry load when the pass is disabled (the candidates
            # fall straight to the beam and count as fallback)
            return occ, fb, missed, has_occ, 0.0
        retry = (missed > 0) & ~has_occ & ~fb
        rfrac = float(retry.mean()) if len(retry) else 0.0
        if not retry.any():
            return occ, fb, missed, has_occ, rfrac
        ridx = np.nonzero(retry)[0]
        occ2, fb2, missed2 = self._pigeon_retry(sub, ridx, n_seg)
        if occ2["rid"].size:
            occ = _occ_merge(occ, occ2, ridx)
            has_occ = has_occ.copy()
            has_occ[ridx[np.unique(occ2["rid"])]] = True
        # a COMPLETE (untruncated, non-structural) retry enumerated every
        # alignment of the shifted partition — its result set is exact,
        # so clear the truncation; otherwise keep the larger shortfall
        complete2 = (missed2 == 0) & ~fb2
        missed = missed.copy()
        missed[ridx] = np.where(complete2, 0,
                                np.maximum(missed[ridx], missed2))
        fb = fb.copy()
        fb[ridx[fb2]] = True
        return occ, fb, missed, has_occ, rfrac

    def _profile_update(self, load_frac):
        """Sticky repeat-profile upshift + round-5 downshift hysteresis.

        ``load_frac``: this batch's fallback + truncation fraction.
        Upshift when it exceeds the threshold; downshift back to the
        lean base caps after ``_PIGEON_DOWNSHIFT_N`` consecutive batches
        under threshold/2 (a transient repeat region should not tax the
        rest of a clean stream with the ~1.7x repeat-profile step).
        """
        if self._pigeon_profile == "base":
            if load_frac > self._PIGEON_REPEAT_THRESH:
                self._pigeon_profile = "repeat"
                self._profile_clean = 0
        else:
            if load_frac < self._PIGEON_REPEAT_THRESH / 2:
                self._profile_clean += 1
                if self._profile_clean >= self._PIGEON_DOWNSHIFT_N:
                    self._pigeon_profile = "base"
                    self._profile_clean = 0
            else:
                self._profile_clean = 0

    # -- search ------------------------------------------------------------
    def search_batch_device(self, reads, beam_width=None, max_hits=32,
                            ladder=None):
        """Phase A: both-strand beam search, results LEFT ON DEVICE.

        Returns an opaque handle for :meth:`hits_from_device`.  Keeping
        phase A/B split lets callers batch several searches per readback;
        per-batch readbacks are cheap in sync mode (docs/TPU_NOTES.md v2:
        the round-1 "readback poisoning" model is disproven).
        """
        from .search.beam import pack_read_batch, search_device
        rc = [alphabet.revcomp(r) for r in reads]
        fwd, lens = pack_read_batch(list(reads) + rc)
        res = search_device(self.dev, fwd, lens, self.opt,
                            beam_width=beam_width, max_hits=max_hits,
                            ladder=ladder or self.ladder)
        return (res, len(reads))

    def hits_from_device(self, handle):
        """Phase B: read a search handle back -> (hits_fwd, hits_rc)."""
        from .search.beam import result_to_hits
        from .search.adaptive import finalize_any
        raw, B = handle
        res = finalize_any(raw, self.opt.s_mm)
        hits_all = result_to_hits(res)
        self.last_overflow = (np.asarray(res.n_live_dropped),
                              np.asarray(res.n_hits_dropped))
        return hits_all[:B], hits_all[B:]

    def search_batch(self, reads, beam_width=None, max_hits=32, ladder=None):
        """Both-strand beam search: returns (hits_fwd, hits_rc) per read.

        ``ladder``: adaptive beam escalation widths (see search.adaptive);
        overrides beam_width when given.
        """
        return self.hits_from_device(self.search_batch_device(
            reads, beam_width=beam_width, max_hits=max_hits, ladder=ladder))

    def locate_fn(self, ranks: np.ndarray) -> np.ndarray:
        import jax
        import jax.numpy as jnp
        from .search import fm
        if not hasattr(self, "_locate_jit"):
            from .search.jitcache import jit_over_idx
            self._locate_jit = jit_over_idx(self.dev, fm.locate)
        n = len(ranks)
        if n == 0:
            return np.zeros(0, np.uint32)
        # pad to a power of two so recompiles are O(log n) distinct shapes
        m = 1 << (int(n - 1).bit_length())
        padded = np.zeros(m, np.uint32)
        padded[:n] = ranks
        return np.asarray(self._locate_jit(jnp.asarray(padded)))[:n]

    # -- full pipeline -----------------------------------------------------
    def align(self, reads, names=None, quals=None, *, read_offset: int = 0,
              beam_width=None, max_hits=32, sopt: SamseOpt | None = None):
        """reads: ReadBatch or list of int8 code arrays -> list of AlnRecord.

        Per-read engine routing (engine="auto"): pigeon-eligible reads
        take the seed-and-verify fast path; ineligible reads and pigeon
        fallbacks re-run on the beam ladder, and the two hit sources
        merge into one flat occurrence-array resolution pass.
        """
        h = self._align_device(reads, beam_width=beam_width,
                               max_hits=max_hits)
        return self._align_finish(h, names, quals, read_offset=read_offset,
                                  sopt=sopt, beam_width=beam_width,
                                  max_hits=max_hits)

    def _align_device(self, reads, *, beam_width=None, max_hits=32):
        """Phase A: pack + device search (+ result fetch) for one batch."""
        rb = ReadBatch.from_reads(reads)
        n_seg, elig = self._pigeon_split(rb)
        if n_seg is None:
            h = self.search_batch_device(rb, beam_width=beam_width,
                                         max_hits=max_hits)
            return ("beam", rb, h)
        sub = rb.subset(elig) if len(elig) < len(rb) else rb
        prof = self._pigeon_profile
        res = self._pigeon_raw(sub, n_seg, prof)
        return ("pigeon", rb, elig, sub, res, self._pigeon_caps(prof)[1],
                n_seg)

    def _align_occ(self, handle, *, beam_width=None, max_hits=32,
                   defer_fb=False, defer_retry=False):
        """Search-phase finalization: handle -> (occ dict, truncated[B],
        c2_extra[B]).

        Everything record resolution needs except reads/names/quals —
        the payload of the two-phase (``aln`` -> ``.sai`` -> ``samse``)
        flow, shared with the fused ``align`` path so both produce
        identical records.  Includes the rare beam re-run of fallback
        reads; ``occ["rid"]`` is batch-local.

        ``defer_fb=True`` skips the beam re-run and returns
        (occ, truncated, c2_extra, fb_ids) so a streaming caller can
        pool fallback reads ACROSS batches into one wide beam run — the
        beam's cost is dominated by fixed per-run latency (measured:
        2K lanes 1.3s vs 32K lanes 2.1s), so grouping is ~4x cheaper on
        repeat-dense inputs than per-batch re-runs.  ``defer_retry=True``
        (requires defer_fb) ALSO skips the in-batch seg_phase retry and
        appends a fifth element ``retry_list`` of (read_id, missed1) —
        a per-batch retry is a device call that queues behind the
        stream's prefetched searches (measured ~400 ms of queue delay),
        so the stream pools retries across batches too.
        """
        from .resolve.samse import collect_occurrences
        from .search import pigeon as pg
        if handle[0] == "beam":
            _, rb, h = handle
            B = len(rb)
            hf, hr = self.hits_from_device(h)
            occs, tr = collect_occurrences(hf, hr, self.locate_fn)
            self.last_fallback_frac = 0.0
            self.last_ineligible_frac = 1.0
            self.last_trunc_frac = 0.0
            self.last_retry_frac = 0.0
            out = (pg.occ_lists_to_arrays(occs), list(tr),
                   np.zeros(B, np.int64))
            if defer_fb:
                return out + ([], []) if defer_retry else out + ([],)
            return out
        _, rb, elig, sub, res, cc, n_seg = handle
        B = len(rb)
        occ, fb, missed = pg.pigeon_occ_arrays(res, len(sub), self.opt, cc)
        # truncated reads (capped repeat enumeration) keep their verified
        # subset; a truncated read with NO surviving occurrence first
        # retries on the seg_phase alternate partition (round 5), and
        # only a dual failure re-runs on the beam
        has_occ = np.zeros(len(sub), bool)
        if occ["rid"].size:
            has_occ[np.unique(occ["rid"])] = True
        emap = np.asarray(elig, np.int64)
        retry_list = []
        if defer_retry and self._PIGEON_RETRY:
            retry_cand = (missed > 0) & ~has_occ & ~fb
            self.last_retry_frac = (float(retry_cand.mean())
                                    if len(retry_cand) else 0.0)
            ridx = np.nonzero(retry_cand)[0]
            retry_list = list(zip(emap[ridx].tolist(),
                                  missed[ridx].tolist()))
            # deferred reads leave the batch as placeholders: no
            # occurrences, no trunc — the flush patches their records
            missed = missed.copy()
            missed[ridx] = 0
        else:
            occ, fb, missed, has_occ, self.last_retry_frac = \
                self._retry_merge(sub, occ, fb, missed, has_occ, n_seg)
        fb = fb | ((missed > 0) & ~has_occ)   # such reads have no entries
        occ["rid"] = emap[occ["rid"]]
        inelig = sorted(set(range(B)) - set(elig))
        fb_ids = sorted([elig[i] for i in np.nonzero(fb)[0]] + inelig)
        self.last_fallback_frac = float(fb.mean()) if len(fb) else 0.0
        self.last_ineligible_frac = len(inelig) / B
        keep_trunc = (missed > 0) & ~fb & has_occ
        self.last_trunc_frac = float(keep_trunc.mean()) if len(fb) else 0.0
        self._profile_update(self.last_fallback_frac + self.last_trunc_frac
                             + self.last_retry_frac)
        c2_extra = np.zeros(B, np.int64)
        c2_extra[emap[np.nonzero(keep_trunc)[0]]] = missed[keep_trunc]
        truncated = np.zeros(B, bool)
        truncated[emap[np.nonzero(keep_trunc)[0]]] = True
        truncated = truncated.tolist()
        if defer_fb:
            self.last_overflow = (np.zeros(B, np.int32), np.zeros(B, np.int32))
            if defer_retry:
                return occ, truncated, c2_extra, fb_ids, retry_list
            return occ, truncated, c2_extra, fb_ids
        ld = np.zeros(B, np.int32)
        hd = np.zeros(B, np.int32)
        if fb_ids:
            sub_occs, sub_trunc, sld, shd = self._beam_rerun(
                [rb[j] for j in fb_ids], beam_width, max_hits)
            occ, truncated = self._merge_fb_batch(
                occ, truncated, ld, hd, fb_ids, sub_occs, sub_trunc,
                sld, shd)
        self.last_overflow = (ld, hd)
        return occ, truncated, c2_extra

    # occurrence budget per fallback read in the beam re-run: fallback
    # reads are high-copy repeats (measured ~180 occurrences each);
    # locating all 512 (the default collect cap) costs more than the
    # beam itself at pooled-flush sizes.  256 keeps c1/c2 saturated
    # (MAPQ pins at 0 far earlier) and halves the locate bill; the
    # truncation flag and capped MAPQ apply as for any capacity miss.
    _FB_MAX_OCC = int(os.environ.get("HSA_FB_MAX_OCC", "256"))

    def _beam_rerun(self, bsub, beam_width=None, max_hits=32):
        """Widest-rung beam over a fallback read list (padded per
        :func:`_beam_pad`).

        Fallback reads are here BECAUSE the screen found them hard
        (repeat-dense or structural): the narrow ladder rungs almost
        always escalate, and each escalation chunk is a serial device
        round trip — go straight to the widest rung.  Returns
        (occs, trunc, low_drops, high_drops) trimmed to ``len(bsub)``.
        """
        from .resolve.samse import collect_occurrences
        n = len(bsub)
        bsub = list(bsub) + [bsub[0]] * (_beam_pad(n) - n)
        hf, hr = self.search_batch(bsub, beam_width=beam_width,
                                   max_hits=max_hits,
                                   ladder=self.ladder[-1:] if self.ladder
                                   else None)
        sub_occs, sub_trunc = collect_occurrences(hf, hr, self.locate_fn,
                                                  self._FB_MAX_OCC)
        sld, shd = self.last_overflow
        half = len(bsub)
        ld = np.asarray([max(sld[i], sld[half + i] if len(sld) > half else 0)
                         for i in range(n)], np.int32)
        hd = np.asarray([max(shd[i], shd[half + i] if len(shd) > half else 0)
                         for i in range(n)], np.int32)
        return sub_occs[:n], list(sub_trunc[:n]), ld, hd

    @staticmethod
    def _merge_fb_batch(occ, truncated, ld, hd, fb_ids, sub_occs, sub_trunc,
                        sld, shd):
        """Merge a batch's beam-fallback results into its pigeon occ dict
        (occ["rid"] batch-local; sub_* indexed like fb_ids)."""
        from .search import pigeon as pg
        for i, j in enumerate(fb_ids):
            truncated[j] = sub_trunc[i]
            ld[j] = sld[i]
            hd[j] = shd[i]
        socc = pg.occ_lists_to_arrays(sub_occs)
        fmap = np.asarray(fb_ids, np.int64)
        socc["rid"] = fmap[socc["rid"]] if socc["rid"].size else socc["rid"]
        occ = {k: np.concatenate([occ[k], socc[k]]) for k in occ}
        order = np.lexsort((occ["pos"], occ["strand"], occ["score"],
                            occ["rid"]))
        return {k: v[order] for k, v in occ.items()}, truncated

    def _align_finish(self, handle, names, quals, *, read_offset: int = 0,
                      sopt=None, beam_width=None, max_hits=32,
                      emit: str = "records"):
        """Phase B: finalize + (rare) beam fallback + record resolution.

        ``emit="sam"`` returns (sam_lines, flags) with the common record
        shapes formatted directly (skips AlnRecord construction + the
        second to_sam pass — the dominant host cost at full batch rate).
        """
        occ, truncated, c2_extra = self._align_occ(
            handle, beam_width=beam_width, max_hits=max_hits)
        return self._resolve_occ(handle[1], names, quals, occ, truncated,
                                 c2_extra, read_offset=read_offset,
                                 sopt=sopt, emit=emit)

    def _resolve_occ(self, rb, names, quals, occ, truncated, c2_extra, *,
                     read_offset: int = 0, sopt=None, emit: str = "records"):
        from .resolve.samse import resolve_from_occ_arrays
        B = len(rb)
        names = names or [f"read{read_offset + i}" for i in range(B)]
        return resolve_from_occ_arrays(self.text, self.meta, rb, names,
                                       quals, occ, truncated, self.opt,
                                       sopt, read_offset=read_offset,
                                       emit=emit, c2_extra=c2_extra)

    # fallback pooling: fb_flush bounds the pooled beam size, fb_group
    # bounds reader lag (staged batches).  16 batches x ~1% fallback
    # amortizes one ~3 s widest-rung beam run over ~16 batches; on clean
    # streams batches never stage, so the knobs cost nothing there.
    _FB_FLUSH = int(os.environ.get("HSA_FB_FLUSH", "4096"))
    _FB_GROUP = int(os.environ.get("HSA_FB_GROUP", "16"))

    def align_stream(self, batches, *, beam_width=None, max_hits=32,
                     sopt: SamseOpt | None = None, emit: str = "records",
                     fb_flush: int | None = None, fb_group: int | None = None):
        """Pipelined alignment over (start, names, reads, quals) batches.

        Up to TWO batches run ahead on worker threads while the main
        thread resolves records: with depth 2, batch n+2's host pack and
        upload overlap batch n+1's device execution (the device
        serializes execution; transfers ride alongside) — numpy and the
        jax dispatch/transfer paths release the GIL in their C regions.

        Beam fallbacks are POOLED across batches: a batch with fallback
        reads is staged (pigeon results kept) until ``fb_flush`` pending
        fallback reads or ``fb_group`` staged batches, then ONE wide
        beam run covers them all — the beam is latency-dominated (2K
        lanes 1.3s vs 32K lanes 2.1s measured), so per-batch re-runs on
        repeat-dense input waste ~4x.  Batches with no fallbacks flush
        immediately; yields stay in input order (a reader lags at most
        fb_group batches on repeat-dense input, zero otherwise).
        """
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor
        from .resolve.samse import resolve_from_occ_arrays
        fb_flush = self._FB_FLUSH if fb_flush is None else fb_flush
        fb_group = self._FB_GROUP if fb_group is None else fb_group
        DEPTH = int(os.environ.get("HSA_SE_DEPTH", "2"))
        ex = ThreadPoolExecutor(max_workers=DEPTH)
        # resolve-at-stage, patch-at-flush (round 5): a batch with
        # fallback reads is resolved IMMEDIATELY with those reads as
        # unmapped placeholders (they have no occurrences yet), so the
        # expensive per-batch resolution keeps overlapping the next
        # batch's device step; the flush runs ONE pooled widest-rung
        # beam over the group's fallback reads, resolves just those
        # (~1% of reads) in one patch pass, and splices the records in
        # place.  Record content is identical to per-batch re-runs —
        # the patch pass hashes tie-breaks by GLOBAL read id.
        staged = []  # (start, payload, rb, names, quals, fb_ids,
        #               retry_list, n_seg, stats)
        fb_pending = 0

        def flush():
            nonlocal fb_pending
            if not staged:
                return
            from .search import pigeon as pg
            # ---- 1. pooled seg_phase retry (grouped by n_seg) ----------
            retry_groups: dict = {}
            for si, ent in enumerate(staged):
                for j, m1 in ent[6]:
                    retry_groups.setdefault(ent[7], []).append((si, j, m1))
            patch_items = []     # (si, j) in patch-slot order
            occ_parts = []       # occ dicts, rid already = patch slot
            trunc_p: list = []
            c2x_p: list = []
            beam_items = []      # (si, j) needing the beam
            for n_seg_g, items in retry_groups.items():
                reads_r = [staged[si][2][j] for si, j, _m in items]
                occ2, fb2, missed2 = self._pigeon_retry(
                    reads_r, np.arange(len(reads_r)), n_seg_g)
                has2 = np.zeros(len(items), bool)
                if occ2["rid"].size:
                    has2[np.unique(occ2["rid"])] = True
                rmap = np.full(len(items), -1, np.int64)
                for i, (si, j, m1) in enumerate(items):
                    if fb2[i] or (missed2[i] > 0 and not has2[i]):
                        beam_items.append((si, j))
                    elif has2[i]:
                        rmap[i] = len(patch_items)
                        patch_items.append((si, j))
                        mfin = (0 if (missed2[i] == 0 and not fb2[i])
                                else max(m1, int(missed2[i])))
                        trunc_p.append(mfin > 0)
                        c2x_p.append(mfin)
                    # else: complete-and-empty — proven unmapped, the
                    # stage-time placeholder record is already correct
                if occ2["rid"].size:
                    keep = rmap[occ2["rid"]] >= 0
                    occ2 = {k: v[keep] for k, v in occ2.items()}
                    occ2["rid"] = rmap[occ2["rid"]]
                    occ_parts.append(occ2)
            # ---- 2. pooled widest-rung beam (structural + dual fails) --
            for si, ent in enumerate(staged):
                beam_items.extend((si, j) for j in ent[5])
            sld = shd = None
            if beam_items:
                reads_fb = [staged[si][2][j] for si, j in beam_items]
                sub_occs, sub_trunc, sld, shd = self._beam_rerun(
                    reads_fb, beam_width, max_hits)
                base = len(patch_items)
                patch_items.extend(beam_items)
                trunc_p.extend(bool(t) for t in sub_trunc)
                c2x_p.extend(0 for _ in beam_items)
                socc = pg.occ_lists_to_arrays(sub_occs)
                socc["rid"] = socc["rid"] + base
                occ_parts.append(socc)
            # ---- 3. one patch resolve over every pooled read -----------
            if patch_items:
                occ_all = (occ_parts[0] if len(occ_parts) == 1 else
                           {k: np.concatenate([p[k] for p in occ_parts])
                            for k in occ_parts[0]})
                order = np.lexsort((occ_all["pos"], occ_all["strand"],
                                    occ_all["score"], occ_all["rid"]))
                occ_all = {k: v[order] for k, v in occ_all.items()}
                reads_p, names_p, quals_p, gids = [], [], [], []
                for si, j in patch_items:
                    s, _pl, rb, bn, bq = staged[si][:5]
                    reads_p.append(rb[j])
                    names_p.append(bn[j] if bn else f"read{s + j}")
                    quals_p.append(bq[j] if bq else "*")
                    gids.append(s + j)
                patch = resolve_from_occ_arrays(
                    self.text, self.meta, reads_p, names_p, quals_p,
                    occ_all, trunc_p, self.opt, sopt, emit=emit,
                    c2_extra=np.asarray(c2x_p, np.int64),
                    hash_ids=np.asarray(gids, np.int64))
            # ---- 4. splice + yield in input order ----------------------
            slot_of = {sj: o for o, sj in enumerate(patch_items)}
            beam_of = {sj: o for o, sj in enumerate(beam_items)}
            for si, ent in enumerate(staged):
                s, payload, rb, bn, bq, fb_ids, retry_list, _ns, st = ent
                B = len(rb)
                # device-search counters (beam-routed batches carry real
                # drops — ADVICE r4); pooled re-run overwrites its reads
                ld, hd = (np.asarray(st[4][0], np.int32).copy(),
                          np.asarray(st[4][1], np.int32).copy())
                for j in list(fb_ids) + [j for j, _m in retry_list]:
                    o = slot_of.get((si, j))
                    if o is None:       # proven-unmapped retry read
                        continue
                    if emit == "sam":
                        payload[0][j] = patch[0][o]
                        payload[1][j] = patch[1][o]
                    else:
                        payload[j] = patch[o]
                    bo = beam_of.get((si, j))
                    if bo is not None:
                        ld[j] = sld[bo]
                        hd[j] = shd[bo]
                (self.last_fallback_frac, self.last_ineligible_frac,
                 self.last_trunc_frac, self.last_retry_frac) = st[:4]
                self.last_overflow = (ld, hd)
                yield s, payload
            staged.clear()
            fb_pending = 0

        try:
            pending = deque()
            it = iter(batches)
            exhausted = False
            while True:
                while not exhausted and len(pending) < DEPTH:
                    nxt = next(it, None)
                    if nxt is None:
                        exhausted = True
                        break
                    s, bn, br, bq = nxt
                    pending.append((s, bn, bq, ex.submit(
                        self._align_device, br, beam_width=beam_width,
                        max_hits=max_hits)))
                if not pending:
                    break
                ps, pn, pq, pfut = pending.popleft()
                handle = pfut.result()
                occ, trunc, c2x, fb_ids, retry_list = self._align_occ(
                    handle, beam_width=beam_width, max_hits=max_hits,
                    defer_fb=True, defer_retry=True)
                stats = (self.last_fallback_frac,
                         self.last_ineligible_frac,
                         self.last_trunc_frac, self.last_retry_frac,
                         self.last_overflow)
                payload = self._resolve_occ(handle[1], pn, pq, occ, trunc,
                                            c2x, read_offset=ps, sopt=sopt,
                                            emit=emit)
                n_seg_b = handle[6] if handle[0] == "pigeon" else None
                staged.append((ps, payload, handle[1], pn, pq, fb_ids,
                               retry_list, n_seg_b, stats))
                fb_pending += len(fb_ids) + len(retry_list)
                if (fb_pending == 0 or fb_pending >= fb_flush
                        or len(staged) >= fb_group):
                    yield from flush()
            yield from flush()
        finally:
            ex.shutdown(wait=True)

    def resolve_handle(self, handle, reads, names=None, quals=None, *,
                       read_offset: int = 0, sopt: SamseOpt | None = None):
        """Phase B of the two-phase flow: handle -> list of AlnRecord."""
        names = names or [f"read{read_offset + i}" for i in range(len(reads))]
        hf, hr = self.hits_from_device(handle)
        return resolve_batch_se(self.text, self.meta, reads, names, quals,
                                hf, hr, self.locate_fn, self.opt, sopt,
                                read_offset=read_offset)

    def align_pe(self, reads1, reads2, names=None, quals1=None, quals2=None, *,
                 read_offset: int = 0, beam_width=None, max_hits=32,
                 peopt=None, emit: str = "records"):
        """Paired ends -> interleaved [rec1, rec2, ...] records.

        Routes through the pigeon engine when eligible, exactly like
        :meth:`align`; both ends of a fallback pair re-run on the beam.
        ``emit="sam"`` returns (lines, flags) formatted directly.
        """
        h = self._align_pe_device(reads1, reads2, beam_width=beam_width,
                                  max_hits=max_hits)
        return self._align_pe_finish(h, reads1, reads2, names, quals1,
                                     quals2, read_offset=read_offset,
                                     beam_width=beam_width,
                                     max_hits=max_hits, peopt=peopt,
                                     emit=emit)

    def _align_pe_device(self, reads1, reads2, *, beam_width=None,
                         max_hits=32):
        """Phase A of the paired flow: both ends' pigeon search."""
        B = len(reads1)
        all_reads = list(reads1) + list(reads2)
        n_seg, elig = self._pigeon_split(all_reads)
        if n_seg is None:
            return ("beam", B, self.search_batch_device(
                all_reads, beam_width=beam_width, max_hits=max_hits))
        psub = [j for j in elig]
        prof = self._pigeon_profile
        res = (self._pigeon_raw([all_reads[j] for j in psub], n_seg, prof)
               if psub else None)
        return ("pigeon", B, n_seg, elig, psub, res,
                self._pigeon_caps(prof)[1])

    def _align_pe_occ(self, handle, all_reads, *, beam_width=None,
                      max_hits=32, defer: bool = False, peopt=None):
        """PE search-phase finalization: handle -> (occ dict in [0, 2B)
        read space, trunc[2B], c2x[2B], fb_ids, retry_list).

        With ``defer=False`` the seg_phase retry and the widest-rung
        beam run in-batch and fb_ids/retry_list come back empty; with
        ``defer=True`` both escalations are left to the caller
        (``align_pe_stream`` pools them across batches exactly like the
        single-end stream — a per-batch escalation is a device call
        queued behind the prefetched searches).
        """
        from .config import PEOpt
        from .resolve.samse import collect_occurrences
        from .search import pigeon as pg
        B = len(all_reads) // 2
        if handle[0] == "beam":
            cap = min((peopt or PEOpt()).max_occ, 256)
            hf, hr = self.hits_from_device(handle[2])
            occs_all, trunc_all = collect_occurrences(hf, hr,
                                                      self.locate_fn, cap)
            self.last_fallback_frac = 0.0
            self.last_ineligible_frac = 1.0
            self.last_retry_frac = 0.0
            return (pg.occ_lists_to_arrays(occs_all),
                    np.asarray(trunc_all, bool),
                    np.zeros(2 * B, np.int64), [], [])
        _, _, n_seg, elig, psub, res, pe_cc = handle
        trunc = np.zeros(2 * B, bool)
        c2x = np.zeros(2 * B, np.int64)
        retry_list = []
        if psub:
            occ, fb, missed = pg.pigeon_occ_arrays(res, len(psub), self.opt,
                                                   pe_cc)
            has_occ = np.zeros(len(psub), bool)
            if occ["rid"].size:
                has_occ[np.unique(occ["rid"])] = True
            sub = [all_reads[j] for j in psub]
            psub_arr = np.asarray(psub, np.int64)
            if defer and self._PIGEON_RETRY:
                retry_cand = (missed > 0) & ~has_occ & ~fb
                self.last_retry_frac = (float(retry_cand.mean())
                                        if len(retry_cand) else 0.0)
                ridx = np.nonzero(retry_cand)[0]
                retry_list = list(zip(psub_arr[ridx].tolist(),
                                      missed[ridx].tolist()))
                missed = missed.copy()
                missed[ridx] = 0
            else:
                occ, fb, missed, has_occ, self.last_retry_frac = \
                    self._retry_merge(sub, occ, fb, missed, has_occ, n_seg)
            fb = fb | ((missed > 0) & ~has_occ)
            occ["rid"] = psub_arr[occ["rid"]]
            keep_trunc = (missed > 0) & ~fb & has_occ
            trunc[psub_arr[keep_trunc]] = True
            c2x[psub_arr[keep_trunc]] = missed[keep_trunc]
            fb_set = set(psub_arr[fb].tolist())
        else:
            occ = pg.occ_lists_to_arrays([])
            fb = np.zeros(0, bool)
            fb_set = set()
        fb_ids = sorted(fb_set | (set(range(2 * B)) - set(elig)))
        self.last_fallback_frac = (float(fb.mean()) if len(fb) else 0.0)
        self.last_ineligible_frac = (2 * B - len(elig)) / (2 * B)
        self._profile_update(self.last_fallback_frac + float(trunc.mean())
                             + self.last_retry_frac)
        if defer:
            return occ, trunc, c2x, fb_ids, retry_list
        if fb_ids:
            sub_occs, sub_trunc, _ld, _hd = self._beam_rerun(
                [all_reads[j] for j in fb_ids], beam_width, max_hits)
            occ = _occ_merge(occ, pg.occ_lists_to_arrays(sub_occs),
                             np.asarray(fb_ids, np.int64))
            for i, j in enumerate(fb_ids):
                trunc[j] = sub_trunc[i]
        return occ, trunc, c2x, [], []

    def _align_pe_finish(self, handle, reads1, reads2, names=None,
                         quals1=None, quals2=None, *, read_offset: int = 0,
                         beam_width=None, max_hits=32, peopt=None,
                         emit: str = "records"):
        """Phase B of the paired flow: finalize + fallback + pairing.

        Array-native end-to-end (round 5): pigeon occurrence ARRAYS feed
        the vectorized paired resolver directly — no per-read Occurrence
        lists on the hot path (the ``occ_arrays_to_lists`` conversion
        plus per-pair Python dominated paired resolution; VERDICT r4
        weak #2).  ``emit="sam"`` returns (lines, flags).
        """
        from .resolve.sampe import resolve_pe_from_occ_arrays
        names = names or [f"pair{read_offset + i}" for i in range(len(reads1))]
        all_reads = list(reads1) + list(reads2)
        occ, trunc, c2x, _fb, _rt = self._align_pe_occ(
            handle, all_reads, beam_width=beam_width, max_hits=max_hits,
            peopt=peopt)
        return resolve_pe_from_occ_arrays(
            self.text, self.meta, reads1, reads2, names, quals1, quals2,
            occ, self.opt, peopt, read_offset=read_offset, trunc=trunc,
            c2x=c2x, emit=emit)

    def align_pe_stream(self, batches, *, beam_width=None, max_hits=32,
                        peopt=None, emit: str = "records",
                        fb_flush: int | None = None,
                        fb_group: int | None = None):
        """Depth-2 pipelined paired alignment over
        (start, names, reads1, quals1, reads2, quals2) batches — the
        paired twin of :meth:`align_stream`.  Yields (start, records)
        (or (start, (lines, flags)) with ``emit="sam"``).

        Escalations POOL across batches (round 5): a batch with
        seg_phase-retry or beam-fallback reads is STAGED (unresolved —
        pairing needs the complete per-batch occurrence set, so unlike
        the single-end stream the whole batch resolution waits for the
        flush); the flush runs one pooled retry pass and one pooled
        widest-rung beam, merges each batch's results, and resolves the
        staged batches.  Record content is identical to per-batch
        escalation — only the grouping differs.  Clean batches resolve
        and yield immediately.
        """
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor
        from .resolve.sampe import resolve_pe_from_occ_arrays
        from .search import pigeon as pg
        fb_flush = self._FB_FLUSH if fb_flush is None else fb_flush
        fb_group = self._FB_GROUP if fb_group is None else fb_group
        DEPTH = int(os.environ.get("HSA_PE_DEPTH", "2"))
        ex = ThreadPoolExecutor(max_workers=DEPTH)
        # staged: (s, names, r1, q1, r2, q2, all_reads, occ, trunc, c2x,
        #          fb_ids, retry_list, n_seg, stats)
        staged = []
        fb_pending = 0

        def resolve_one(ent):
            (s, n1, r1, q1, r2, q2, _ar, occ, trunc, c2x, _fb, _rt,
             _ns, st) = ent
            (self.last_fallback_frac, self.last_ineligible_frac,
             self.last_retry_frac) = st
            names = n1 or [f"pair{s + i}" for i in range(len(r1))]
            return s, resolve_pe_from_occ_arrays(
                self.text, self.meta, r1, r2, names, q1, q2, occ,
                self.opt, peopt, read_offset=s, trunc=trunc, c2x=c2x,
                emit=emit)

        def flush():
            nonlocal fb_pending
            if not staged:
                return
            # pooled seg_phase retry, grouped by n_seg
            retry_groups: dict = {}
            for si, ent in enumerate(staged):
                for j, m1 in ent[11]:
                    retry_groups.setdefault(ent[12], []).append((si, j, m1))
            beam_items = [(si, j) for si, ent in enumerate(staged)
                          for j in ent[10]]
            merged: dict = {}      # si -> list of (occ_part, fb-style id)
            for n_seg_g, items in retry_groups.items():
                reads_r = [staged[si][6][j] for si, j, _m in items]
                occ2, fb2, missed2 = self._pigeon_retry(
                    reads_r, np.arange(len(reads_r)), n_seg_g)
                has2 = np.zeros(len(items), bool)
                if occ2["rid"].size:
                    has2[np.unique(occ2["rid"])] = True
                for i, (si, j, m1) in enumerate(items):
                    ent = staged[si]
                    if fb2[i] or (missed2[i] > 0 and not has2[i]):
                        beam_items.append((si, j))
                    elif has2[i]:
                        mfin = (0 if (missed2[i] == 0 and not fb2[i])
                                else max(m1, int(missed2[i])))
                        ent[8][j] = mfin > 0        # trunc
                        ent[9][j] = mfin            # c2x
                if occ2["rid"].size:
                    # scatter retry occurrences back per staged batch
                    item_si = np.asarray([si for si, _j, _m in items])
                    item_j = np.asarray([j for _si, j, _m in items])
                    osi = item_si[occ2["rid"]]
                    oj = item_j[occ2["rid"]]
                    for si in np.unique(osi):
                        sel = osi == si
                        part = {k: v[sel] for k, v in occ2.items()}
                        part["rid"] = oj[sel]
                        merged.setdefault(int(si), []).append(part)
            if beam_items:
                sub_occs, _bt, _ld, _hd = self._beam_rerun(
                    [staged[si][6][j] for si, j in beam_items],
                    beam_width, max_hits)
                for (si, j), occs_r in zip(beam_items, sub_occs):
                    socc = pg.occ_lists_to_arrays([occs_r])
                    socc["rid"] = np.full(socc["rid"].size, j, np.int64)
                    merged.setdefault(si, []).append(socc)
                for i, (si, j) in enumerate(beam_items):
                    staged[si][8][j] = bool(_bt[i])
            for si, parts in merged.items():
                ent = staged[si]
                occ = ent[7]
                allp = [occ] + parts
                occ = {k: np.concatenate([p[k] for p in allp]) for k in occ}
                order = np.lexsort((occ["pos"], occ["strand"],
                                    occ["score"], occ["rid"]))
                staged[si] = ent[:7] + ({k: v[order] for k, v in
                                         occ.items()},) + ent[8:]
            for ent in staged:
                yield resolve_one(ent)
            staged.clear()
            fb_pending = 0

        try:
            pending = deque()
            it = iter(batches)
            exhausted = False
            while True:
                while not exhausted and len(pending) < DEPTH:
                    nxt = next(it, None)
                    if nxt is None:
                        exhausted = True
                        break
                    s, n1, r1, q1, r2, q2 = nxt
                    pending.append((s, n1, r1, q1, r2, q2, ex.submit(
                        self._align_pe_device, r1, r2,
                        beam_width=beam_width, max_hits=max_hits)))
                if not pending:
                    break
                ps, n1, r1, q1, r2, q2, pfut = pending.popleft()
                handle = pfut.result()
                all_reads = list(r1) + list(r2)
                occ, trunc, c2x, fb_ids, retry_list = self._align_pe_occ(
                    handle, all_reads, beam_width=beam_width,
                    max_hits=max_hits, defer=True, peopt=peopt)
                stats = (self.last_fallback_frac,
                         self.last_ineligible_frac, self.last_retry_frac)
                n_seg_b = handle[2] if handle[0] == "pigeon" else None
                ent = (ps, n1, r1, q1, r2, q2, all_reads, occ, trunc,
                       c2x, fb_ids, retry_list, n_seg_b, stats)
                if not fb_ids and not retry_list:
                    yield from flush()      # keep output in input order
                    yield resolve_one(ent)
                else:
                    staged.append(ent)
                    fb_pending += len(fb_ids) + len(retry_list)
                    if fb_pending >= fb_flush or len(staged) >= fb_group:
                        yield from flush()
            yield from flush()
        finally:
            ex.shutdown(wait=True)


def oracle_align_pe(text, meta, reads1, reads2, names, quals1, quals2, opt,
                    peopt=None, read_offset=0):
    """Reference-path paired alignment: oracle search + shared resolution.

    Ground truth for end-to-end PE record parity (SURVEY.md §4.1).
    """
    from .fmcore import FMIndex
    from .oracle.bnb import align_read
    from .resolve.sampe import resolve_batch_pe

    fm_f = FMIndex.build(np.asarray(text, np.int8))
    fm_r = FMIndex.build(np.asarray(text, np.int8)[::-1].copy())

    def side(reads):
        hf, hr = [], []
        for r in reads:
            hf.append(align_read(fm_f, fm_r, np.asarray(r, np.int8), opt))
            hr.append(align_read(fm_f, fm_r,
                                 alphabet.revcomp(np.asarray(r, np.int8)), opt))
        return hf, hr

    def locate_fn(ranks):
        return np.array([fm_f.locate(int(r)) for r in ranks], dtype=np.int64)

    h1 = side(reads1)
    h2 = side(reads2)
    return resolve_batch_pe(text, meta, reads1, reads2, names, quals1,
                            quals2, h1, h2, locate_fn, opt, peopt,
                            read_offset=read_offset)


def oracle_align(text, meta, reads, names, quals, opt, sopt=None, read_offset=0):
    """Reference-path alignment: oracle search + the same resolution layer.

    Ground truth for end-to-end record parity tests (SURVEY.md §4.1).
    """
    from .fmcore import FMIndex
    from .oracle.bnb import align_read

    fm_f = FMIndex.build(np.asarray(text, np.int8))
    fm_r = FMIndex.build(np.asarray(text, np.int8)[::-1].copy())
    hf, hr = [], []
    for r in reads:
        hf.append(align_read(fm_f, fm_r, np.asarray(r, np.int8), opt))
        hr.append(align_read(fm_f, fm_r, alphabet.revcomp(np.asarray(r, np.int8)), opt))

    def locate_fn(ranks):
        return np.array([fm_f.locate(int(r)) for r in ranks], dtype=np.int64)

    return resolve_batch_se(text, meta, reads, names, quals, hf, hr,
                            locate_fn, opt, sopt, read_offset=read_offset)
