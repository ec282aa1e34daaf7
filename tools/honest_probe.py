"""Verify whether async dispatch timing lies on this backend, and measure
the HONEST rate of the constructs that matter (matmul, standalone gather,
in-scan gather) in the synchronous regime.

Usage: python tools/honest_probe.py [lie|sync]

  lie   fresh-process test: time a matmul chain via block_until_ready, then
        time the first readback.  If the readback costs ~the whole chain,
        block_until_ready lied and every no-readback measurement is fiction.
  sync  enter sync mode up front (one readback), then measure honest rates:
        matmul flops, standalone batched gather, gather chained in lax.scan.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
from jax import lax


def test_lie():
    n = 2048
    x = jnp.asarray(np.random.RandomState(0).rand(n, n).astype(np.float32))

    @jax.jit
    def chain(x):
        for _ in range(8):
            x = x @ x * 1e-3
        return x

    y = chain(x)
    y.block_until_ready()  # compile
    iters = 25
    t0 = time.time()
    for _ in range(iters):
        y = chain(y)
    y.block_until_ready()
    t_async = time.time() - t0
    flops = 2 * n**3 * 8 * iters
    print(f"block_until_ready says: {t_async*1e3:.1f} ms "
          f"({flops/t_async/1e12:.1f} Tflop/s)")
    t0 = time.time()
    v = float(np.asarray(y[0, 0]))
    t_rb = time.time() - t0
    print(f"first readback after:   {t_rb*1e3:.1f} ms (value {v:.3g})")
    print(f"verdict: {'LIED' if t_rb > 5 * t_async else 'honest'} "
          f"(readback {t_rb/max(t_async,1e-9):.1f}x the async-claimed time)")
    # now in sync mode: same chain timed honestly
    t0 = time.time()
    for _ in range(iters):
        y = chain(y)
    _ = float(np.asarray(y[0, 0]))
    t_sync = time.time() - t0
    print(f"sync-mode same chain:   {t_sync*1e3:.1f} ms "
          f"({flops/t_sync/1e12:.1f} Tflop/s)")


def test_sync():
    _ = np.asarray(jnp.arange(8) * 2)  # enter sync mode

    # matmul rate
    n = 2048
    x = jnp.asarray(np.random.RandomState(0).rand(n, n).astype(np.float32))

    @jax.jit
    def chain(x):
        for _ in range(8):
            x = x @ x * 1e-3
        return x

    y = chain(x)
    _ = float(np.asarray(y[0, 0]))
    t0 = time.time()
    iters = 25
    for _ in range(iters):
        y = chain(y)
    _ = float(np.asarray(y[0, 0]))
    dt = time.time() - t0
    print(f"matmul f32 {n}: {2*n**3*8*iters/dt/1e12:.1f} Tflop/s")

    # gather: one big standalone batched row gather, fresh indices each call
    nb = 1 << 20
    tab = jnp.asarray(np.random.RandomState(1).randint(0, 1 << 30, (nb, 8)).astype(np.uint32))
    q0 = jnp.asarray(np.random.RandomState(2).randint(0, nb, 1 << 20).astype(np.int32))

    @jax.jit
    def g1(tab, q):
        rows = lax.optimization_barrier(jnp.take(tab, q, axis=0))
        return (rows[:, 0] ^ rows[:, 7]) & jnp.uint32(nb - 1)

    q = g1(tab, q0)
    _ = np.asarray(q[:4])
    t0 = time.time()
    R = 16
    for _ in range(R):
        q = g1(tab, q.astype(jnp.int32))
    _ = np.asarray(q[:4])
    dt = time.time() - t0
    print(f"standalone gather (dispatch-chained): {R * (1<<20) / dt / 1e6:.1f} Mq/s")

    # gather chained inside ONE scan executable
    @jax.jit
    def gscan(tab, q):
        def body(q, _):
            rows = lax.optimization_barrier(jnp.take(tab, q, axis=0))
            return ((rows[:, 0] ^ rows[:, 7]) & jnp.uint32(nb - 1)).astype(jnp.int32), None
        q, _ = lax.scan(body, q, None, length=32)
        return q

    q = gscan(tab, q0)
    _ = np.asarray(q[:4])
    t0 = time.time()
    q = gscan(tab, q)
    _ = np.asarray(q[:4])
    dt = time.time() - t0
    print(f"in-scan gather (32 steps, 1 dispatch): {32 * (1<<20) / dt / 1e6:.1f} Mq/s")

    # dispatch floor
    @jax.jit
    def tiny(v):
        return v * jnp.uint32(3)

    v = tiny(jnp.arange(128, dtype=jnp.uint32))
    _ = np.asarray(v[:2])
    t0 = time.time()
    for _ in range(50):
        v = tiny(v)
    _ = np.asarray(v[:2])
    print(f"dispatch+readback floor: {(time.time()-t0)/50*1e3:.2f} ms")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "lie"
    {"lie": test_lie, "sync": test_sync}[mode]()
