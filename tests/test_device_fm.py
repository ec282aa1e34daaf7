"""Device (jnp) FM primitives and exact engine vs the numpy core."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hsa_tpu.fmcore import FMIndex
from hsa_tpu.index.layout import build_device_index
from hsa_tpu.search import fm as dfm
from hsa_tpu.search.exact import exact_search, locate_all, pack_reads


def make(n=5000, seed=3, sa_intv=32):
    t = np.random.RandomState(seed).randint(0, 4, size=n).astype(np.int8)
    ref = FMIndex.build(t, sa_intv=sa_intv)
    dev = build_device_index(t, sa_intv=sa_intv).as_jax()
    return t, ref, dev


T, REF, DEV = make()


def test_occ_lt4_matches_reference():
    ps = np.concatenate([np.arange(0, 300), [REF.primary, REF.primary + 1, REF.n, REF.n + 1],
                         np.random.RandomState(0).randint(0, REF.n + 2, 500)])
    got = np.asarray(dfm.occ_lt4(DEV, jnp.asarray(ps, jnp.uint32)))
    for a in range(4):
        expect = [int(REF.occ(a, int(p) - 1)) for p in ps]
        np.testing.assert_array_equal(got[:, a], expect)


def test_occ_lt_single_base():
    rs = np.random.RandomState(1)
    ps = rs.randint(0, REF.n + 2, 300)
    bases = rs.randint(0, 4, 300)
    got = np.asarray(dfm.occ_lt(DEV, jnp.asarray(bases, jnp.uint32), jnp.asarray(ps, jnp.uint32)))
    expect = [int(REF.occ(int(a), int(p) - 1)) for a, p in zip(bases, ps)]
    np.testing.assert_array_equal(got, expect)


def test_extend_matches_reference():
    rs = np.random.RandomState(2)
    # random valid intervals from random short patterns
    for plen in [1, 3, 6]:
        ks, ls, bases = [], [], []
        expect = []
        for _ in range(100):
            p = rs.randint(0, REF.n - plen)
            pat = T[p:p + plen]
            k, l = REF.exact_interval(pat)
            a = rs.randint(0, 4)
            k2, l2 = REF.extend(a, k, l)
            ks.append(k); ls.append(l); bases.append(a)
            expect.append((int(k2), int(l2)))
        gk, gl = dfm.extend(DEV, jnp.asarray(bases, jnp.uint32),
                            jnp.asarray(ks, jnp.uint32), jnp.asarray(ls, jnp.uint32))
        for i, (ek, el) in enumerate(expect):
            if ek <= el:  # non-empty: values must match exactly
                assert (int(gk[i]), int(gl[i])) == (ek, el)
            else:
                assert int(gk[i]) > int(gl[i])


def test_extend4_matches_reference():
    rs = np.random.RandomState(7)
    ks, ls = [], []
    for _ in range(50):
        p = rs.randint(0, REF.n - 4)
        k, l = REF.exact_interval(T[p:p + 4])
        ks.append(k); ls.append(l)
    gk, gl = dfm.extend4(DEV, jnp.asarray(ks, jnp.uint32), jnp.asarray(ls, jnp.uint32))
    for i in range(50):
        for a in range(4):
            ek, el = REF.extend(a, ks[i], ls[i])
            if ek <= el:
                assert (int(gk[i, a]), int(gl[i, a])) == (int(ek), int(el))
            else:
                assert int(gk[i, a]) > int(gl[i, a])


def test_bwt_char_and_lf():
    ranks = [r for r in range(0, REF.n + 1, 13) if r != REF.primary]
    got_c = np.asarray(dfm.bwt_char(DEV, jnp.asarray(ranks, jnp.uint32)))
    expect_c = [REF.bwt_char(r) for r in ranks]
    np.testing.assert_array_equal(got_c, expect_c)
    got_lf = np.asarray(dfm.lf(DEV, jnp.asarray(ranks + [REF.primary], jnp.uint32)))
    expect_lf = [REF.lf(r) for r in ranks] + [0]
    np.testing.assert_array_equal(got_lf, expect_lf)


def test_locate_matches_sa():
    rs = np.random.RandomState(5)
    ranks = rs.randint(0, REF.n + 1, 400)
    got = np.asarray(dfm.locate(DEV, jnp.asarray(ranks, jnp.uint32)))
    np.testing.assert_array_equal(got, REF.sa[ranks])


def test_exact_search_end_to_end():
    rs = np.random.RandomState(11)
    reads, expects = [], []
    for _ in range(64):
        L = rs.choice([36, 50, 75, 100])
        p = rs.randint(0, REF.n - L)
        reads.append(T[p:p + L].copy())
        expects.append((p, L))
    # one read that cannot match (contains N) and one absent read
    reads.append(np.full(40, 4, dtype=np.int8))
    expects.append(None)
    rr, lens = pack_reads(reads, 128)
    k, l, matched = jax.jit(lambda a, b: exact_search(DEV, a, b))(
        jnp.asarray(rr), jnp.asarray(lens))
    pos, cnt = locate_all(DEV, k, l, matched, cap=8)
    pos, cnt = np.asarray(pos), np.asarray(cnt)
    for i, exp in enumerate(expects):
        if exp is None:
            assert not bool(matched[i]) and cnt[i] == 0
        else:
            p, L = exp
            assert bool(matched[i])
            naive = np.nonzero(np.all(
                np.lib.stride_tricks.sliding_window_view(T, L) == reads[i], axis=1))[0]
            assert cnt[i] == naive.size
            got = sorted(int(x) for x in pos[i, :min(cnt[i], 8)])
            np.testing.assert_array_equal(got, naive[:len(got)] if cnt[i] > 8 else naive)


def test_exact_search_block_edges():
    # patterns that put ranks near occ-block boundaries (multiples of 128)
    t = np.random.RandomState(21).randint(0, 4, size=128 * 40 + 7).astype(np.int8)
    ref = FMIndex.build(t)
    dev = build_device_index(t).as_jax()
    rs = np.random.RandomState(22)
    reads = [t[p:p + 30].copy() for p in rs.randint(0, len(t) - 30, 32)]
    rr, lens = pack_reads(reads, 32)
    k, l, matched = exact_search(dev, jnp.asarray(rr), jnp.asarray(lens))
    for i, r in enumerate(reads):
        ek, el = ref.exact_interval(r)
        assert bool(matched[i]) == (ek <= el)
        if ek <= el:
            assert (int(k[i]), int(l[i])) == (ek, el)
