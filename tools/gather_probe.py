"""Calibrate candidate gather mechanisms in the honest (sync) regime.

The FM-index hot loop is a random row gather; XLA's take() runs ~500x below
HBM roofline on this backend, so this probe measures every alternative:

  rowscale   take() q/s vs row width and table size
  colmajor   gather along the minor axis of a [W, nb] table
  sort       lax.sort rate (enables sorted/coalesced strategies)
  onehot     MXU one-hot chunk-gather equivalent rate
  dma        Pallas per-query DMA gather from HBM
  vmemtake   take() from a small (VMEM-sized) table inside a Pallas kernel

Usage: python tools/gather_probe.py [test ...]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q = 1 << 20


def sync():
    _ = np.asarray(jnp.arange(8) * 2)


def timeit(fn, *args, iters=8, warm=1):
    for _ in range(warm):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:2]
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:2]
    return (time.time() - t0) / iters


def test_rowscale():
    for nb_log, tag in ((15, "1M"), (20, "32M")):
        nb = 1 << nb_log
        for w in (1, 2, 4, 8, 16):
            tab = jnp.asarray(
                np.random.RandomState(1).randint(0, 1 << 30, (nb, w)).astype(np.uint32))
            q = jnp.asarray(np.random.RandomState(2).randint(0, nb, Q).astype(np.int32))

            @jax.jit
            def g(tab, q):
                r = lax.optimization_barrier(jnp.take(tab, q, axis=0))
                acc = r[:, 0]
                for j in range(1, r.shape[1]):
                    acc = acc ^ r[:, j]
                return acc

            dt = timeit(g, tab, q)
            print(f"take rows[{tag} x {w:2d}w]: {Q/dt/1e6:8.1f} Mq/s "
                  f"({Q*w*4/dt/1e9:6.2f} GB/s)")


def test_flat():
    nb = 1 << 23
    tab = jnp.asarray(np.random.RandomState(1).randint(0, 1 << 30, nb).astype(np.uint32))
    q = jnp.asarray(np.random.RandomState(2).randint(0, nb, Q).astype(np.int32))

    @jax.jit
    def g(tab, q):
        return lax.optimization_barrier(jnp.take(tab, q))

    dt = timeit(g, tab, q)
    print(f"take flat [32MB x 1w]: {Q/dt/1e6:8.1f} Mq/s")


def test_colmajor():
    nb = 1 << 20
    for w in (8,):
        tab = jnp.asarray(
            np.random.RandomState(1).randint(0, 1 << 30, (w, nb)).astype(np.uint32))
        q = jnp.asarray(np.random.RandomState(2).randint(0, nb, Q).astype(np.int32))

        @jax.jit
        def g(tab, q):
            r = lax.optimization_barrier(jnp.take(tab, q, axis=1))  # [w, Q]
            acc = r[0]
            for j in range(1, w):
                acc = acc ^ r[j]
            return acc

        dt = timeit(g, tab, q)
        print(f"take cols [{w}w x 1M]: {Q/dt/1e6:8.1f} Mq/s ({Q*w*4/dt/1e9:6.2f} GB/s)")


def test_sort():
    keys = jnp.asarray(np.random.RandomState(3).randint(0, 1 << 31, Q).astype(np.uint32))

    @jax.jit
    def s1(k):
        return lax.sort(k)

    dt = timeit(s1, keys)
    print(f"lax.sort 1M u32 keys: {dt*1e3:7.2f} ms ({Q/dt/1e6:.1f} Mkeys/s)")

    vals = jnp.asarray(np.arange(Q, dtype=np.uint32))

    @jax.jit
    def s2(k, v):
        return lax.sort((k, v))

    dt = timeit(s2, keys, vals)
    print(f"lax.sort 1M u32 k+v:  {dt*1e3:7.2f} ms ({Q/dt/1e6:.1f} Mkeys/s)")

    @jax.jit
    def ak(k):
        return jnp.argsort(k)

    dt = timeit(ak, keys)
    print(f"argsort 1M u32:       {dt*1e3:7.2f} ms ({Q/dt/1e6:.1f} Mkeys/s)")


def test_onehot():
    # equivalent-gather rate of onehot @ chunk for CH-row chunks:
    # queries presorted into buckets of 128 per chunk (ideal case).
    for CH in (128, 256, 512):
        nq = Q // 8  # 128K queries
        chunks = nq // 128
        oh = jnp.asarray(
            np.random.RandomState(4).rand(chunks, 128, CH).astype(np.float32))
        tabs = jnp.asarray(
            np.random.RandomState(5).rand(chunks, CH, 16).astype(np.float32))

        @jax.jit
        def mm(oh, tabs):
            return lax.dot_general(
                oh, tabs, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)

        dt = timeit(mm, oh, tabs)
        print(f"onehot chunk={CH:4d}: {nq/dt/1e6:8.1f} Mq/s-equiv "
              f"({2*chunks*128*CH*16/dt/1e12:.2f} Tflop/s)")


def test_dma():
    # Pallas: per-query 32B row DMA from an HBM-resident table.
    nb = 1 << 20
    NQ = 4096
    tab = jnp.asarray(np.random.RandomState(1).randint(0, 1 << 30, (nb, 8)).astype(np.uint32))
    q = jnp.asarray(np.random.RandomState(2).randint(0, nb, NQ).astype(np.int32))

    PIPE = 8

    def kern(q_ref, tab_ref, out_ref, rows, sems):
        def issue(i, slot):
            return pltpu.make_async_copy(
                tab_ref.at[q_ref[i]], rows.at[slot], sems.at[slot])

        for i in range(PIPE):
            issue(i, i).start()

        def body(i, _):
            slot = lax.rem(i, PIPE)
            pltpu.make_async_copy(tab_ref.at[0], rows.at[slot], sems.at[slot]).wait()
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
        dt = timeit(g, q, tab)
        r = np.asarray(g(q, tab))
        ok = np.array_equal(r, np.asarray(tab)[np.asarray(q)])
        print(f"pallas DMA gather: {NQ/dt/1e6:8.2f} Mq/s (correct={ok})")
    except Exception as e:
        print(f"pallas DMA gather: FAILED {type(e).__name__}: {str(e)[:200]}")


def test_vmemtake():
    # take() lowered by Mosaic inside a kernel, table VMEM-resident
    nb = 1 << 15  # 32K rows x 32B = 1MB
    tab = jnp.asarray(np.random.RandomState(1).randint(0, 1 << 30, (nb, 8)).astype(np.uint32))
    q = jnp.asarray(np.random.RandomState(2).randint(0, nb, Q // 8).astype(np.int32))

    def kern(q_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], q_ref[:], axis=0)

    @jax.jit
    def g(q, tab):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((Q // 8, 8), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(q, tab)

    try:
        dt = timeit(g, q, tab)
        r = np.asarray(g(q, tab))
        ok = np.array_equal(r, np.asarray(tab)[np.asarray(q)])
        print(f"pallas VMEM take [1MB]: {(Q//8)/dt/1e6:8.1f} Mq/s (correct={ok})")
    except Exception as e:
        print(f"pallas VMEM take: FAILED {type(e).__name__}: {str(e)[:200]}")


TESTS = dict(rowscale=test_rowscale, flat=test_flat, colmajor=test_colmajor,
             sort=test_sort, onehot=test_onehot, dma=test_dma,
             vmemtake=test_vmemtake)

if __name__ == "__main__":
    sync()
    names = sys.argv[1:] or list(TESTS)
    for nm in names:
        TESTS[nm]()
