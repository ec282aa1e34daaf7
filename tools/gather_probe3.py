"""Round-3 Pallas DMA-gather retry (VERDICT #5).

Round 2's `gather_probe2 dmapipe` died with a single "Mosaic HTTP 500"
compile failure and was abandoned.  This probe reproduces it and sweeps
the plausible causes one axis at a time, each variant printed (and
flushed) immediately so a partial run still documents failure modes:

  orig       round-2 kernel verbatim (repro of the HTTP 500)
  pow2       slot = i & (PIPE-1) instead of lax.rem (mod lowering)
  unroll     fori over chunks, PIPE copies with STATIC slot ids per step
  grid       grid=(NQ/CHUNK,): per-program burst of CHUNK static DMAs
  scoped     pl.run_scoped semaphore allocation instead of scratch_shapes
  wide       128B rows (is 32B below the DMA granularity sweet spot?)
  batchrow   one DMA per 8 consecutive out rows (gather->scatter shape)

Each prints Mrows/s vs the ~75 Mrows/s XLA take() machinery ceiling
(docs/TPU_NOTES.md v2).  Usage: python tools/gather_probe3.py [test ...]
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


def wait_idle(limit_s=2400):
    t_start = time.time()
    while True:
        t0 = time.time()
        rb(jnp.arange(8) * 2)
        if time.time() - t0 < 0.05:
            return
        print(f"[idle] busy; retrying", flush=True)
        if time.time() - t_start > limit_s:
            raise RuntimeError("device never went idle")
        time.sleep(5)


def timeit_sync(fn, *args, iters=4, warm=2):
    for _ in range(warm):
        rb(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        rb(fn(*args))
    return (time.time() - t0) / iters


NB = 1 << 20
NQ = 1 << 14


def _mktab(width=8):
    return jnp.asarray(np.random.RandomState(1).randint(
        0, 1 << 30, (NB, width)).astype(np.uint32))


def _mkq():
    return jnp.asarray(np.random.RandomState(2).randint(
        0, NB, NQ).astype(np.int32))


def _check(g, q, tab, label, dt):
    r = np.asarray(g(q, tab))
    ok = np.array_equal(r, np.asarray(tab)[np.asarray(q)])
    print(f"{label}: {NQ/dt/1e6:8.2f} Mrows/s (correct={ok}) "
          f"{dt*1e3:.2f} ms", flush=True)


def _run(label, build):
    try:
        g = build()
        q, tab = g._probe_args
        dt = timeit_sync(g, q, tab, iters=4)
        _check(g, q, tab, label, dt)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:2500]}",
              flush=True)


def test_orig():
    tab, q = _mktab(), _mkq()
    for PIPE in (8, 32):
        def build(PIPE=PIPE):
            def kern(q_ref, tab_ref, out_ref, sems):
                def issue(i, slot):
                    return pltpu.make_async_copy(
                        tab_ref.at[q_ref[i]], out_ref.at[i], sems.at[slot])
                for i in range(PIPE):
                    issue(i, i).start()

                def body(i, _):
                    slot = lax.rem(i, PIPE)
                    pltpu.make_async_copy(
                        tab_ref.at[q_ref[i]], out_ref.at[i],
                        sems.at[slot]).wait()

                    @pl.when(i + PIPE < NQ)
                    def _():
                        issue(i + PIPE, lax.rem(i + PIPE, PIPE)).start()
                    return 0
                lax.fori_loop(0, NQ, body, 0)

            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.SemaphoreType.DMA((PIPE,))])

            @jax.jit
            def g(q, tab):
                return pl.pallas_call(
                    kern, grid_spec=gs,
                    out_shape=jax.ShapeDtypeStruct((NQ, 8), jnp.uint32),
                    compiler_params=pltpu.CompilerParams(
                        has_side_effects=True))(q, tab)
            g._probe_args = (q, tab)
            return g
        _run(f"orig pipe={PIPE}", build)


def test_pow2():
    tab, q = _mktab(), _mkq()
    PIPE = 8
    def build():
        def kern(q_ref, tab_ref, out_ref, sems):
            def issue(i, slot):
                return pltpu.make_async_copy(
                    tab_ref.at[q_ref[i]], out_ref.at[i], sems.at[slot])
            for i in range(PIPE):
                issue(i, i).start()

            def body(i, _):
                slot = i & (PIPE - 1)
                pltpu.make_async_copy(
                    tab_ref.at[q_ref[i]], out_ref.at[i], sems.at[slot]).wait()

                @pl.when(i + PIPE < NQ)
                def _():
                    issue(i + PIPE, (i + PIPE) & (PIPE - 1)).start()
                return 0
            lax.fori_loop(0, NQ, body, 0)

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((PIPE,))])

        @jax.jit
        def g(q, tab):
            return pl.pallas_call(
                kern, grid_spec=gs,
                out_shape=jax.ShapeDtypeStruct((NQ, 8), jnp.uint32),
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True))(q, tab)
        g._probe_args = (q, tab)
        return g
    _run("pow2 pipe=8", build)


def test_unroll():
    tab, q = _mktab(), _mkq()
    for PIPE in (8, 16):
        def build(PIPE=PIPE):
            NCH = NQ // PIPE

            def kern(q_ref, tab_ref, out_ref, sems):
                # chunk c waits chunk c's copies; issues chunk c+1's.
                # slots are STATIC (python loop over PIPE) — only the row
                # index is dynamic.
                for k in range(PIPE):
                    pltpu.make_async_copy(
                        tab_ref.at[q_ref[k]], out_ref.at[k],
                        sems.at[k]).start()

                def body(c, _):
                    base = c * PIPE
                    nxt = base + PIPE
                    for k in range(PIPE):
                        pltpu.make_async_copy(
                            tab_ref.at[q_ref[base + k]],
                            out_ref.at[base + k], sems.at[k]).wait()

                        @pl.when(c + 1 < NCH)
                        def _():
                            pltpu.make_async_copy(
                                tab_ref.at[q_ref[nxt + k]],
                                out_ref.at[nxt + k], sems.at[k]).start()
                    return 0
                lax.fori_loop(0, NCH, body, 0)

            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.SemaphoreType.DMA((PIPE,))])

            @jax.jit
            def g(q, tab):
                return pl.pallas_call(
                    kern, grid_spec=gs,
                    out_shape=jax.ShapeDtypeStruct((NQ, 8), jnp.uint32),
                    compiler_params=pltpu.CompilerParams(
                        has_side_effects=True))(q, tab)
            g._probe_args = (q, tab)
            return g
        _run(f"unroll pipe={PIPE}", build)


def test_grid():
    tab, q = _mktab(), _mkq()
    for CHUNK in (8, 32):
        def build(CHUNK=CHUNK):
            def kern(q_ref, tab_ref, out_ref, sems):
                c = pl.program_id(0)
                base = c * CHUNK
                for k in range(CHUNK):
                    pltpu.make_async_copy(
                        tab_ref.at[q_ref[base + k]], out_ref.at[k],
                        sems.at[k]).start()
                for k in range(CHUNK):
                    pltpu.make_async_copy(
                        tab_ref.at[q_ref[base + k]], out_ref.at[k],
                        sems.at[k]).wait()

            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(NQ // CHUNK,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((CHUNK, 8), lambda i, q: (i, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.SemaphoreType.DMA((CHUNK,))])

            @jax.jit
            def g(q, tab):
                return pl.pallas_call(
                    kern, grid_spec=gs,
                    out_shape=jax.ShapeDtypeStruct((NQ, 8), jnp.uint32),
                    compiler_params=pltpu.CompilerParams(
                        has_side_effects=True))(q, tab)
            g._probe_args = (q, tab)
            return g
        _run(f"grid chunk={CHUNK}", build)


def test_scoped():
    tab, q = _mktab(), _mkq()
    PIPE = 8
    def build():
        def kern(q_ref, tab_ref, out_ref):
            def inner(sems):
                for k in range(PIPE):
                    pltpu.make_async_copy(
                        tab_ref.at[q_ref[k]], out_ref.at[k],
                        sems.at[k]).start()

                def body(c, _):
                    base = c * PIPE
                    for k in range(PIPE):
                        pltpu.make_async_copy(
                            tab_ref.at[q_ref[base + k]],
                            out_ref.at[base + k], sems.at[k]).wait()

                        @pl.when(base + PIPE + k < NQ)
                        def _():
                            pltpu.make_async_copy(
                                tab_ref.at[q_ref[base + PIPE + k]],
                                out_ref.at[base + PIPE + k],
                                sems.at[k]).start()
                    return 0
                lax.fori_loop(0, NQ // PIPE, body, 0)
            pl.run_scoped(inner, pltpu.SemaphoreType.DMA((PIPE,)))

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))

        @jax.jit
        def g(q, tab):
            return pl.pallas_call(
                kern, grid_spec=gs,
                out_shape=jax.ShapeDtypeStruct((NQ, 8), jnp.uint32),
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True))(q, tab)
        g._probe_args = (q, tab)
        return g
    _run("scoped pipe=8", build)


def test_wide():
    # 128B rows: fewer, fatter DMAs for the same byte traffic
    tabw = jnp.asarray(np.random.RandomState(1).randint(
        0, 1 << 30, (NB // 4, 32)).astype(np.uint32))
    qw = jnp.asarray(np.random.RandomState(2).randint(
        0, NB // 4, NQ).astype(np.int32))
    PIPE = 8

    def build():
        def kern(q_ref, tab_ref, out_ref, sems):
            for k in range(PIPE):
                pltpu.make_async_copy(
                    tab_ref.at[q_ref[k]], out_ref.at[k], sems.at[k]).start()

            def body(c, _):
                base = c * PIPE
                for k in range(PIPE):
                    pltpu.make_async_copy(
                        tab_ref.at[q_ref[base + k]], out_ref.at[base + k],
                        sems.at[k]).wait()

                    @pl.when(base + PIPE + k < NQ)
                    def _():
                        pltpu.make_async_copy(
                            tab_ref.at[q_ref[base + PIPE + k]],
                            out_ref.at[base + PIPE + k], sems.at[k]).start()
                return 0
            lax.fori_loop(0, NQ // PIPE, body, 0)

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((PIPE,))])

        @jax.jit
        def g(q, tab):
            return pl.pallas_call(
                kern, grid_spec=gs,
                out_shape=jax.ShapeDtypeStruct((NQ, 32), jnp.uint32),
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True))(q, tab)
        g._probe_args = (qw, tabw)
        return g
    _run("wide 128B pipe=8", build)


TESTS = dict(orig=test_orig, pow2=test_pow2, unroll=test_unroll,
             grid=test_grid, scoped=test_scoped, wide=test_wide)

if __name__ == "__main__":
    wait_idle()
    names = sys.argv[1:] or list(TESTS)
    for nm in names:
        print(f"--- {nm}", flush=True)
        TESTS[nm]()
