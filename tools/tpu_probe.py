"""TPU cleanliness probe: which pipeline stage degrades the process?

Usage: python tools/tpu_probe.py [stage ...]

Stages (cumulative compile+run, probe after each):
  width beam8 beam64 ladder locate exact occ

Background (docs/TPU_NOTES.md): on the axon/v5e backend, compiling or
running an executable containing certain constructs (closure-table
gathers, small-minor-dim broadcast compute) permanently degrades every
subsequent dispatch of the process to a ~1.5-5 ms floor.  This harness
compiles and runs each production stage, then times a canonical clean
probe; a "POISONED" verdict after a stage means that stage reintroduced
such a construct.  Run after any change to fm.py/beam.py/widths.py.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
from jax import lax

CACHE = os.path.expanduser("~/.cache/hsa_tpu_bench")
GENOME_MBP = int(os.environ.get("HSA_PROBE_GENOME_MBP", "64"))
B = int(os.environ.get("HSA_PROBE_BATCH", "8192"))
L = 100


def make_probe():
    rs = np.random.RandomState(11)
    keys0 = jnp.asarray(rs.randint(0, 1 << 20, (8192, 72)).astype(np.int32))

    @jax.jit
    def probe_fn(keys):
        vals, idxs = lax.top_k(keys, 8)
        return keys + jnp.zeros_like(keys).at[:, :8].set(vals ^ idxs)

    y = probe_fn(keys0)
    jax.block_until_ready(y)

    def run(tag):
        y = probe_fn(keys0)
        jax.block_until_ready(y)
        t0 = time.time()
        for _ in range(20):
            y = probe_fn(y)
        jax.block_until_ready(y)
        dt = (time.time() - t0) / 20
        verdict = "POISONED" if dt > 5e-4 else "clean"
        print(f"  probe after {tag:8s}: {dt*1e3:7.3f} ms  {verdict}", flush=True)
        return verdict == "clean"

    return run


def main():
    stages = sys.argv[1:] or ["width", "beam8", "beam64", "ladder", "locate",
                              "exact", "occ"]
    from hsa_tpu.index.layout import DeviceIndex, build_device_index
    from hsa_tpu.config import AlnOpt
    from hsa_tpu.search.jitcache import jit_over_idx
    from hsa_tpu.search import fm
    from hsa_tpu.search.beam import beam_search
    from hsa_tpu.search.widths import cal_width_device
    from hsa_tpu.search.exact import exact_search

    os.makedirs(os.path.join(CACHE, "xla"), exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    idx_path = os.path.join(CACHE, f"idx_{GENOME_MBP}M.npz")
    txt_path = os.path.join(CACHE, f"txt_{GENOME_MBP}M.npy")
    n = GENOME_MBP * 1_000_000
    if os.path.exists(idx_path):
        try:
            di = DeviceIndex.load(idx_path)
        except ValueError:
            di = None
    else:
        di = None
    if di is None:
        t = np.random.RandomState(7).randint(0, 4, n).astype(np.int8)
        di = build_device_index(t, sa_intv=32, with_reverse=True)
        di.save(idx_path)
        np.save(txt_path, t)
    dev = di.as_jax()

    rs = np.random.RandomState(1)
    fwd = jnp.asarray(rs.randint(0, 4, (B, L)).astype(np.uint8))
    lens = jnp.full(B, L, jnp.int32)
    md = jnp.full(B, 2, jnp.int32)
    opt = AlnOpt(max_diff=2)

    probe = make_probe()
    probe("baseline")

    D = None
    for st in stages:
        t0 = time.time()
        if st == "width":
            f = jit_over_idx(dev, cal_width_device)
            D = f(fwd, lens)
            jax.block_until_ready(D)
        elif st in ("beam8", "beam64"):
            W = 8 if st == "beam8" else 64
            if D is None:
                D = jnp.zeros((B, L), jnp.int32)
            f = jit_over_idx(dev, lambda ix, a, b_, c, d: beam_search(
                ix, a, b_, c, d, opt, beam_width=W, max_hits=16))
            r = f(fwd, lens, D, md)
            jax.block_until_ready(r)
        elif st == "ladder":
            from hsa_tpu.search.adaptive import AdaptiveBeam
            ab = AdaptiveBeam(dev, opt, ladder=(8, 64), max_hits=16)
            if D is None:
                D = jnp.zeros((B, L), jnp.int32)
            r = ab(fwd, lens, D, md)
            jax.block_until_ready(r)
        elif st == "locate":
            f = jit_over_idx(dev, fm.locate)
            ranks = jnp.asarray(rs.randint(0, n, B).astype(np.uint32))
            jax.block_until_ready(f(ranks))
        elif st == "exact":
            f = jit_over_idx(dev, exact_search)
            jax.block_until_ready(f(fwd, lens)[0])
        elif st == "occ":
            f = jit_over_idx(dev, fm.occ_lt4)
            qs = jnp.asarray(rs.randint(0, n, 1 << 20).astype(np.uint32))
            o = f(qs)
            jax.block_until_ready(o)
            t1 = time.time()
            for _ in range(5):
                o = f(qs)
            jax.block_until_ready(o)
            print(f"  occ_lt4: {(1 << 20) * 5 / (time.time() - t1) / 1e6:.0f} Mq/s")
        dt = time.time() - t0
        print(f"stage {st}: compiled+ran in {dt:.1f}s", flush=True)
        probe(st)


if __name__ == "__main__":
    main()
