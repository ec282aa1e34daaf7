"""Honest per-dispatch-synced microbenchmarks for the axon TPU backend.

Round-2 measurement discipline (supersedes round-1 probes): on this
backend, *queued* execution — any dispatch not immediately followed by a
device->host readback — runs ~10,000x slower than synchronous execution
(measured: 25x8 chained 2048^3 matmuls = 3.4 TFLOP took 506 s queued vs
42 ms sync).  Every timing here therefore syncs (reads back a few bytes)
after EVERY dispatch; what we measure is the sync-regime rate, which is
the only regime production code may use.

Also: killed processes leave their queue draining on the shared device for
minutes; wait_idle() spins until a trivial readback is fast before any
measurement.

Usage: python tools/sync_probe.py [test ...]
tests: idle matmul take scan dispatch dma vmemtake onehot sort
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def rb(x):
    """Sync: read back a few elements of x (flattened leading slice)."""
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:2]


def wait_idle(limit_s=900):
    """Block until the device queue is drained (trivial readback < 50 ms)."""
    t_start = time.time()
    while True:
        t0 = time.time()
        rb(jnp.arange(8) * 2)
        dt = time.time() - t0
        if dt < 0.05:
            print(f"[idle] device responsive ({dt*1e3:.1f} ms)")
            return
        print(f"[idle] device busy: trivial readback {dt:.1f}s; retrying")
        if time.time() - t_start > limit_s:
            raise RuntimeError("device never went idle")


def timeit_sync(fn, *args, iters=8, warm=2):
    """Time fn with a readback after EVERY call; returns s/call."""
    for _ in range(warm):
        rb(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        rb(fn(*args))
    return (time.time() - t0) / iters


def test_idle():
    wait_idle()


def test_matmul():
    n = 2048
    x = jnp.asarray(np.random.RandomState(0).rand(n, n).astype(np.float32))

    @jax.jit
    def chain(x):
        for _ in range(8):
            x = x @ x * 1e-3
        return x

    dt = timeit_sync(chain, x, iters=16)
    print(f"matmul f32 {n} (8-chain, synced): {2*n**3*8/dt/1e12:.1f} Tflop/s "
          f"({dt*1e3:.2f} ms/call)")


def test_dispatch():
    v = jnp.arange(128, dtype=jnp.uint32)

    @jax.jit
    def tiny(v):
        return v * jnp.uint32(3)

    dt = timeit_sync(tiny, v, iters=50)
    print(f"dispatch+readback floor: {dt*1e3:.2f} ms")


def test_take():
    # standalone row gather, one dispatch per measurement, synced
    for nb_log, tag in ((20, "32MB"), (23, "256MB")):
        nb = 1 << nb_log
        tab = jnp.asarray(np.random.RandomState(1).randint(
            0, 1 << 30, (nb, 8)).astype(np.uint32))
        for q_log in (16, 20):
            Q = 1 << q_log
            q = jnp.asarray(np.random.RandomState(2).randint(
                0, nb, Q).astype(np.int32))

            @jax.jit
            def g(tab, q):
                r = lax.optimization_barrier(jnp.take(tab, q, axis=0))
                return (r[:, 0] ^ r[:, 7])

            dt = timeit_sync(g, tab, q)
            print(f"take [{tag} x8w] Q=2^{q_log}: {Q/dt/1e6:8.1f} Mq/s "
                  f"({Q*32/dt/1e9:6.2f} GB/s) {dt*1e3:.2f} ms")


def test_scan():
    # gather chained inside ONE executable (the beam-search shape), synced
    nb = 1 << 20
    tab = jnp.asarray(np.random.RandomState(1).randint(
        0, 1 << 30, (nb, 8)).astype(np.uint32))
    for q_log in (16, 20):
        Q = 1 << q_log
        q0 = jnp.asarray(np.random.RandomState(2).randint(
            0, nb, Q).astype(np.int32))

        @jax.jit
        def gscan(tab, q):
            def body(q, _):
                r = lax.optimization_barrier(jnp.take(tab, q, axis=0))
                return ((r[:, 0] ^ r[:, 7]) & jnp.uint32(nb - 1)).astype(jnp.int32), None
            q, _ = lax.scan(body, q, None, length=32)
            return q

        dt = timeit_sync(gscan, tab, q0, iters=4)
        print(f"in-scan take [32MB x8w] Q=2^{q_log} (32 steps): "
              f"{32*Q/dt/1e6:8.1f} Mq/s ({dt*1e3:.1f} ms/call)")


def test_dma():
    # Pallas: per-query 32B row DMA pipeline from an HBM-resident table.
    nb = 1 << 20
    tab = jnp.asarray(np.random.RandomState(1).randint(
        0, 1 << 30, (nb, 8)).astype(np.uint32))
    for NQ in (4096, 65536):
        q = jnp.asarray(np.random.RandomState(2).randint(
            0, nb, NQ).astype(np.int32))
        PIPE = 16

        def kern(q_ref, tab_ref, out_ref, rows, sems):
            def issue(i, slot):
                return pltpu.make_async_copy(
                    tab_ref.at[q_ref[i]], rows.at[slot], sems.at[slot])

            for i in range(PIPE):
                issue(i, i).start()

            def body(i, _):
                slot = lax.rem(i, PIPE)
                # wait on a shape-matched descriptor for this slot
                pltpu.make_async_copy(
                    tab_ref.at[q_ref[i]], rows.at[slot], sems.at[slot]).wait()
                out_ref[i, :] = rows[slot]

                @pl.when(i + PIPE < NQ)
                def _():
                    issue(i + PIPE, lax.rem(i + PIPE, PIPE)).start()
                return 0

            lax.fori_loop(0, NQ, body, 0)

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.VMEM((PIPE, 8), jnp.uint32),
                            pltpu.SemaphoreType.DMA((PIPE,))],
        )

        @jax.jit
        def g(q, tab):
            return pl.pallas_call(
                kern, grid_spec=gs,
                out_shape=jax.ShapeDtypeStruct((NQ, 8), jnp.uint32),
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(q, tab)

        try:
            dt = timeit_sync(g, q, tab, iters=4)
            r = np.asarray(g(q, tab))
            ok = np.array_equal(r, np.asarray(tab)[np.asarray(q)])
            print(f"pallas DMA gather NQ={NQ}: {NQ/dt/1e6:8.2f} Mq/s "
                  f"(correct={ok}) {dt*1e3:.2f} ms")
        except Exception as e:
            print(f"pallas DMA gather NQ={NQ}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")


def test_vmemtake():
    # take() lowered by Mosaic inside a kernel, table VMEM-resident
    for nb_log, tag in ((15, "1MB"), (17, "4MB")):
        nb = 1 << nb_log
        Q = 1 << 17
        tab = jnp.asarray(np.random.RandomState(1).randint(
            0, 1 << 30, (nb, 8)).astype(np.uint32))
        q = jnp.asarray(np.random.RandomState(2).randint(
            0, nb, Q).astype(np.int32))

        def kern(q_ref, tab_ref, out_ref):
            out_ref[:] = jnp.take(tab_ref[:], q_ref[:], axis=0)

        @jax.jit
        def g(q, tab):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((Q, 8), jnp.uint32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(q, tab)

        try:
            dt = timeit_sync(g, q, tab, iters=4)
            r = np.asarray(g(q, tab))
            ok = np.array_equal(r, np.asarray(tab)[np.asarray(q)])
            print(f"pallas VMEM take [{tag}] Q=2^17: {Q/dt/1e6:8.1f} Mq/s "
                  f"(correct={ok}) {dt*1e3:.2f} ms")
        except Exception as e:
            print(f"pallas VMEM take [{tag}]: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")


def test_onehot():
    # one-hot MXU gather-equivalent: queries bucketed 128/chunk (ideal)
    for CH in (256, 512):
        nq = 1 << 17
        chunks = nq // 128
        oh = jnp.asarray(np.random.RandomState(4).rand(
            chunks, 128, CH).astype(np.float32))
        tabs = jnp.asarray(np.random.RandomState(5).rand(
            chunks, CH, 16).astype(np.float32))

        @jax.jit
        def mm(oh, tabs):
            return lax.dot_general(
                oh, tabs, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)

        dt = timeit_sync(mm, oh, tabs)
        print(f"onehot chunk={CH:4d}: {nq/dt/1e6:8.1f} Mq/s-equiv "
              f"({2*chunks*128*CH*16/dt/1e12:.2f} Tflop/s)")


def test_sort():
    Q = 1 << 20
    keys = jnp.asarray(np.random.RandomState(3).randint(
        0, 1 << 31, Q).astype(np.uint32))
    vals = jnp.asarray(np.arange(Q, dtype=np.uint32))

    @jax.jit
    def s2(k, v):
        return lax.sort((k, v))

    dt = timeit_sync(s2, keys, vals)
    print(f"lax.sort 1M u32 k+v: {dt*1e3:7.2f} ms ({Q/dt/1e6:.1f} Mkeys/s)")


TESTS = dict(idle=test_idle, matmul=test_matmul, dispatch=test_dispatch,
             take=test_take, scan=test_scan, dma=test_dma,
             vmemtake=test_vmemtake, onehot=test_onehot, sort=test_sort)

if __name__ == "__main__":
    wait_idle()
    names = sys.argv[1:] or ["matmul", "dispatch", "take", "scan"]
    for nm in names:
        print(f"--- {nm}")
        TESTS[nm]()
