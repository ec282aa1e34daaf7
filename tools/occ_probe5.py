"""Round-5 occ-gather headroom probe (VERDICT r4 weak #4).

Questions, against the real fused-row tables:
 1. locality — does sorting/coalescing the rank batch change the
    row-gather throughput (static indices, no chain)?
 2. chain length — how much of the chained-scan rate is dispatch
    amortization (length 8 / 32 / 128)?
 3. size droop — the same measurements on the 3.1 Gbp table isolate
    "bigger working set" from tunnel variance.

Usage: python tools/occ_probe5.py [64|3100]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MBP = int(sys.argv[1]) if len(sys.argv) > 1 else 64
CACHE = os.path.expanduser("~/.cache/hsa_tpu_bench")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(CACHE, "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from jax import lax
    import jax.numpy as jnp
    from hsa_tpu.index.layout import DeviceIndex
    from hsa_tpu.pipeline import force_sync_mode
    from hsa_tpu.search import fm
    from hsa_tpu.search.jitcache import split_idx, join_idx

    force_sync_mode()
    di = DeviceIndex.load(os.path.join(CACHE, f"idx_{MBP}M_v4b_s8.npz"))
    dev = di.as_jax()
    arrays, meta_ = split_idx(dev)
    n = int(di.n)
    Q = 1 << 20
    MASK = (1 << 25) - 1          # chained pointer domain (bench formula)
    rs = np.random.RandomState(3)
    qs_rand = rs.randint(0, n, Q).astype(np.uint32)
    qs_sort = np.sort(qs_rand)
    # block-coalesced: random 128-query blocks of CONSECUTIVE ranks
    # (adjacent queries share or neighbor a fused row)
    nblk = Q // 128
    base = rs.randint(0, max(n - 129, 1), nblk).astype(np.uint32)
    qs_blk = ((base[:, None] + np.arange(128, dtype=np.uint32)[None, :])
              .reshape(-1) % np.uint32(n))

    def bench(fn, *args, iters=4, inner=1):
        np.asarray(fn(*args))[:2]          # compile + sync
        ts = []
        for _ in range(iters):
            t0 = time.time()
            np.asarray(fn(*args))[:2]      # readback = honest sync
            ts.append(time.time() - t0)
        return min(ts) / inner

    @jax.jit
    def occ_once(arrs, p):
        idx = join_idx(meta_, arrs)
        o = fm.occ_lt4_flat(idx, p)
        return (o[0] ^ o[3]) & jnp.uint32(0xFFFFFF)

    for name, q in (("random", qs_rand), ("sorted", qs_sort),
                    ("blocked", qs_blk)):
        dt = bench(occ_once, arrays, jnp.asarray(q))
        print(f"[{MBP}M] static occ [{name:8s}] {Q / dt / 1e6:7.1f} Mq/s",
              flush=True)

    # NOTE: bench.py's historical chain masks pointers to 2^25, so its
    # "3.1 Gbp droop" was measured on a 33M-rank FOOTPRINT of the big
    # table — the full-range variant below separates footprint effects
    # from table-size effects.
    for tag, redux in (("mask25", lambda o, np_: o & jnp.uint32(MASK)),
                       ("full", lambda o, np_: o % np_)):
        for LEN in (8, 32, 128):
            @jax.jit
            def occ_chain(arrs, p, _len=LEN, _r=redux):
                idx = join_idx(meta_, arrs)
                np_ = jnp.uint32(n)

                def body(p, _):
                    o = fm.occ_lt4_flat(idx, p)
                    return _r(o[0] ^ o[3], np_), None
                p, _ = lax.scan(body, p, None, length=_len)
                return p
            dt = bench(occ_chain, arrays, jnp.asarray(qs_rand), inner=LEN)
            print(f"[{MBP}M] chained occ [{tag} len={LEN:3d}] "
                  f"{Q / dt / 1e6:7.1f} Mq/s", flush=True)


if __name__ == "__main__":
    main()
