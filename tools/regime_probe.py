"""Nail the axon backend's execution-regime rules.

Observed contradictions (2026-08-20):
  - process A (honest_probe lie): compiled matmul chain BEFORE first
    readback; after a giant first readback the same executable ran at
    81 Tflop/s with queued execution + final readback.
  - process B (sync_probe): did readbacks first (wait_idle), compiled
    after; the same matmul chain ran at 0.1 Tflop/s per-call-synced, and
    the dispatch floor was 25 ms.

Hypotheses to separate:
  H1 readback poisons all subsequently COMPILED executables (compile-time
     regime matters)
  H2 readback poisons all subsequent EXECUTION (execution-time regime
     matters) — contradicted by process A unless giant-readback differs
  H3 per-call readback cadence itself is slow (tunnel RTT ~25 ms) and
     queued+final-readback is the fast path regardless of regime

Method: one flag selects the scenario; run each in a FRESH process.
  A: compile (no rb) -> rb -> time chained (final rb only) -> time per-call rb
  B: rb -> compile -> time chained -> time per-call
Each timing prints chain-of-25 wall time (honest: data-dependent chain,
one final readback) and per-call-synced wall time.

Usage: python tools/regime_probe.py A|B
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def build():
    n = 2048
    x = jnp.asarray(np.random.RandomState(0).rand(n, n).astype(np.float32))

    @jax.jit
    def chain(x):
        for _ in range(8):
            x = x @ x * 1e-3
        return x

    nb = 1 << 20
    tab = jnp.asarray(np.random.RandomState(1).randint(
        0, 1 << 30, (nb, 8)).astype(np.uint32))
    q0 = jnp.asarray(np.random.RandomState(2).randint(
        0, nb, 1 << 20).astype(np.int32))

    @jax.jit
    def gscan(tab, q):
        def body(q, _):
            r = lax.optimization_barrier(jnp.take(tab, q, axis=0))
            return ((r[:, 0] ^ r[:, 7]) & jnp.uint32(nb - 1)).astype(jnp.int32), None
        q, _ = lax.scan(body, q, None, length=32)
        return q

    return chain, x, gscan, tab, q0


def compile_all(chain, x, gscan, tab, q0):
    t0 = time.time()
    y = chain(x)
    q = gscan(tab, q0)
    # block_until_ready is a lie on this backend but it does force compile
    y.block_until_ready(); q.block_until_ready()
    print(f"[compile] {time.time()-t0:.1f}s")
    return y, q


def readback():
    t0 = time.time()
    v = np.asarray(jnp.arange(8) * 2)[:2]
    print(f"[readback] {time.time()-t0:.2f}s {v}")


def wait_idle():
    while True:
        t0 = time.time()
        _ = np.asarray(jnp.arange(8) * 2)[:2]
        dt = time.time() - t0
        print(f"[idle-check] {dt:.2f}s")
        if dt < 0.05:
            return


def measure(chain, x, gscan, tab, q0):
    n = 2048
    flops = 2 * n**3 * 8
    # chained, final readback only (honest via data dependence)
    y = chain(x)
    _ = np.asarray(y[:1, :1])
    t0 = time.time()
    for _ in range(25):
        y = chain(y)
    _ = np.asarray(y[:1, :1])
    dt = time.time() - t0
    print(f"matmul chained25+finalrb: {dt*1e3:8.1f} ms "
          f"({25*flops/dt/1e12:6.1f} Tflop/s)")
    # per-call readback
    t0 = time.time()
    for _ in range(8):
        y = chain(y)
        _ = np.asarray(y[:1, :1])
    dt = time.time() - t0
    print(f"matmul percall-rb:        {dt/8*1e3:8.1f} ms/call "
          f"({flops/(dt/8)/1e12:6.1f} Tflop/s)")
    # gather: chained, final rb
    q = gscan(tab, q0)
    _ = np.asarray(q[:2])
    t0 = time.time()
    for _ in range(4):
        q = gscan(tab, q)
    _ = np.asarray(q[:2])
    dt = time.time() - t0
    print(f"gather chained4+finalrb:  {4*32*(1<<20)/dt/1e6:8.1f} Mq/s")
    t0 = time.time()
    for _ in range(4):
        q = gscan(tab, q)
        _ = np.asarray(q[:2])
    dt = time.time() - t0
    print(f"gather percall-rb:        {4*32*(1<<20)/dt/1e6:8.1f} Mq/s")
    # dispatch floor
    @jax.jit
    def tiny(v):
        return v * jnp.uint32(3)
    v = tiny(jnp.arange(128, dtype=jnp.uint32))
    _ = np.asarray(v[:2])
    t0 = time.time()
    for _ in range(20):
        v = tiny(v)
        _ = np.asarray(v[:2])
    print(f"dispatch floor percall:   {(time.time()-t0)/20*1e3:8.2f} ms")


def main():
    mode = sys.argv[1]
    if mode == "A":
        chain, x, gscan, tab, q0 = build()
        compile_all(chain, x, gscan, tab, q0)
        readback()
        measure(chain, x, gscan, tab, q0)
    elif mode == "B":
        wait_idle()
        chain, x, gscan, tab, q0 = build()
        compile_all(chain, x, gscan, tab, q0)
        measure(chain, x, gscan, tab, q0)
    print("done")


if __name__ == "__main__":
    main()
