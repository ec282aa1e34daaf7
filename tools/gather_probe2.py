"""Round-2 gather mechanism shootout (honest, synced, idle-checked).

Finding so far (regime_probe, 2026-08-20): XLA take() executes at ~75 Mq/s
for 32B rows (1M-query calls), independent of readback cadence — a hard
execution-rate limit, not overhead.  This probe measures every mechanism
that could beat it, each printed immediately:

  widthscale   take() Mq/s vs row width (is cost per-row or per-byte?)
  saturate     take() Mq/s vs query-vector length (amortization curve)
  dmapipe      Pallas per-query 32B-row DMA pipeline (VMEM out)
  rowloop      Pallas fori_loop scalar-indexed VMEM row loads
  onehot       Pallas one-hot MXU gather from a VMEM-resident chunk
  vmemsize     max VMEM table a kernel can hold (bisect, coarse)

Usage: python tools/gather_probe2.py [test ...]
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
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:2]


def wait_idle(limit_s=1200):
    t_start = time.time()
    while True:
        t0 = time.time()
        rb(jnp.arange(8) * 2)
        dt = time.time() - t0
        if dt < 0.05:
            return
        print(f"[idle] busy ({dt:.1f}s readback); retrying")
        if time.time() - t_start > limit_s:
            raise RuntimeError("device never went idle")


def timeit_sync(fn, *args, iters=6, warm=2):
    for _ in range(warm):
        rb(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        rb(fn(*args))
    return (time.time() - t0) / iters


def test_widthscale():
    Q = 1 << 20
    for w in (1, 2, 4, 8, 16, 32):
        nb = (32 << 20) // (4 * w)  # constant 32MB table
        tab = jnp.asarray(np.random.RandomState(1).randint(
            0, 1 << 30, (nb, w)).astype(np.uint32))
        q = jnp.asarray(np.random.RandomState(2).randint(
            0, nb, Q).astype(np.int32))

        @jax.jit
        def g(tab, q):
            r = lax.optimization_barrier(jnp.take(tab, q, axis=0))
            acc = r[:, 0]
            for j in range(1, r.shape[1]):
                acc = acc ^ r[:, j]
            return acc

        dt = timeit_sync(g, tab, q)
        print(f"take w={w:2d} [32MB]: {Q/dt/1e6:8.1f} Mq/s "
              f"({Q*4*w/dt/1e9:6.2f} GB/s) {dt*1e3:7.2f} ms")


def test_saturate():
    nb = 1 << 20
    tab = jnp.asarray(np.random.RandomState(1).randint(
        0, 1 << 30, (nb, 8)).astype(np.uint32))
    for q_log in (14, 16, 18, 20, 22):
        Q = 1 << q_log
        q = jnp.asarray(np.random.RandomState(2).randint(
            0, nb, Q).astype(np.int32))

        @jax.jit
        def g(tab, q):
            r = lax.optimization_barrier(jnp.take(tab, q, axis=0))
            return r[:, 0] ^ r[:, 7]

        dt = timeit_sync(g, tab, q)
        print(f"take Q=2^{q_log}: {Q/dt/1e6:8.1f} Mq/s  {dt*1e3:7.2f} ms")


def test_dmapipe():
    nb = 1 << 20
    tab = jnp.asarray(np.random.RandomState(1).randint(
        0, 1 << 30, (nb, 8)).astype(np.uint32))
    NQ = 1 << 14  # 16K queries; out = 512KB VMEM
    q = jnp.asarray(np.random.RandomState(2).randint(
        0, nb, NQ).astype(np.int32))
    for PIPE in (8, 32):
        def kern(q_ref, tab_ref, out_ref, sems):
            def issue(i, slot):
                return pltpu.make_async_copy(
                    tab_ref.at[q_ref[i]], out_ref.at[i], sems.at[slot])

            for i in range(PIPE):
                issue(i, i).start()

            def body(i, _):
                slot = lax.rem(i, PIPE)
                pltpu.make_async_copy(
                    tab_ref.at[q_ref[i]], out_ref.at[i], sems.at[slot]).wait()

                @pl.when(i + PIPE < NQ)
                def _():
                    issue(i + PIPE, lax.rem(i + PIPE, PIPE)).start()
                return 0

            lax.fori_loop(0, NQ, body, 0)

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((PIPE,))],
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
            print(f"dma pipe={PIPE:2d} NQ=16K: {NQ/dt/1e6:8.2f} Mq/s "
                  f"(correct={ok}) {dt*1e3:.2f} ms")
        except Exception as e:
            print(f"dma pipe={PIPE}: FAILED {type(e).__name__}: {str(e)[:160]}")


def test_rowloop():
    # VMEM-resident table; fori_loop of dynamically indexed row loads
    nb = 1 << 15  # 1MB
    Q = 1 << 14
    tab = jnp.asarray(np.random.RandomState(1).randint(
        0, 1 << 30, (nb, 8)).astype(np.uint32))
    q = jnp.asarray(np.random.RandomState(2).randint(
        0, nb, Q).astype(np.int32))

    def kern(q_ref, tab_ref, out_ref):
        def body(i, _):
            out_ref[i, :] = tab_ref[q_ref[i], :]
            return 0
        lax.fori_loop(0, Q, body, 0)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def g(q, tab):
        return pl.pallas_call(
            kern, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((Q, 8), jnp.uint32),
        )(q, tab)

    try:
        dt = timeit_sync(g, q, tab, iters=4)
        r = np.asarray(g(q, tab))
        ok = np.array_equal(r, np.asarray(tab)[np.asarray(q)])
        print(f"rowloop [1MB] Q=16K: {Q/dt/1e6:8.2f} Mq/s "
              f"(correct={ok}) {dt*1e3:.2f} ms")
    except Exception as e:
        print(f"rowloop: FAILED {type(e).__name__}: {str(e)[:160]}")


def test_onehot():
    # Pallas one-hot MXU gather: table chunk in VMEM, queries pre-bucketed.
    # Measures the ideal-case rate ONLY (bucketing cost excluded).
    for R in (512, 2048):     # chunk rows
        Q = 1 << 14
        tab = jnp.asarray(np.random.RandomState(1).randint(
            0, 1 << 30, (R, 8)).astype(np.uint32))
        q = jnp.asarray(np.random.RandomState(2).randint(
            0, R, Q).astype(np.int32))

        def kern(q_ref, tab_ref, out_ref):
            # [Q, R] one-hot f32 @ [R, 8] f32
            qv = q_ref[:]                          # int32 [Q]
            rows = jax.lax.broadcasted_iota(jnp.int32, (Q, R), 1)
            oh = (rows == qv[:, None]).astype(jnp.float32)
            t = tab_ref[:].astype(jnp.float32)     # lossy >2^24: rate only
            out_ref[:] = jnp.dot(
                oh, t, preferred_element_type=jnp.float32).astype(jnp.uint32)

        @jax.jit
        def g(q, tab):
            return pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((Q, 8), jnp.uint32),
            )(q, tab)

        try:
            dt = timeit_sync(g, q, tab, iters=4)
            print(f"onehot-mxu R={R:4d} Q=16K: {Q/dt/1e6:8.2f} Mq/s "
                  f"({2*Q*R*8/dt/1e12:.2f} Tflop/s) {dt*1e3:.2f} ms")
        except Exception as e:
            print(f"onehot-mxu R={R}: FAILED {type(e).__name__}: {str(e)[:160]}")


def test_vmemsize():
    # how big can a VMEM-resident input be?
    for mb in (2, 4, 8, 16, 32, 64, 96):
        nb = (mb << 20) // 32
        tab = jnp.asarray(np.zeros((nb, 8), np.uint32))

        def kern(tab_ref, out_ref):
            out_ref[:] = tab_ref[0:8, :]

        @jax.jit
        def g(tab):
            return pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 8), jnp.uint32),
            )(tab)

        try:
            rb(g(tab))
            print(f"vmem table {mb} MB: OK")
        except Exception as e:
            print(f"vmem table {mb} MB: FAILED {type(e).__name__}")
            break


TESTS = dict(widthscale=test_widthscale, saturate=test_saturate,
             dmapipe=test_dmapipe, rowloop=test_rowloop,
             onehot=test_onehot, vmemsize=test_vmemsize)

if __name__ == "__main__":
    wait_idle()
    names = sys.argv[1:] or list(TESTS)
    for nm in names:
        print(f"--- {nm}", flush=True)
        TESTS[nm]()
