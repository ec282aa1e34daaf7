"""Sharded (shard_map) paths on the 8-device CPU mesh vs single-device results."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hsa_tpu.config import AlnOpt
from hsa_tpu.dist.mesh import ShardedIndex, make_mesh
from hsa_tpu.index.layout import build_device_index
from hsa_tpu.search import fm as dfm
from hsa_tpu.search.beam import beam_search
from hsa_tpu.search.exact import exact_search, pack_reads
from hsa_tpu.search.widths import cal_width_device


@pytest.fixture(scope="module")
def env():
    t = np.random.RandomState(42).randint(0, 4, 30_000).astype(np.int8)
    di = build_device_index(t)
    dev = di.as_jax()
    mesh = make_mesh(2, 4)
    sidx = ShardedIndex(di, mesh)
    return t, di, dev, mesh, sidx


def reads_from(t, rs, n, L, mm=0):
    out = []
    for _ in range(n):
        p = rs.randint(0, len(t) - L)
        r = t[p:p + L].copy()
        for _ in range(mm):
            j = rs.randint(0, L)
            r[j] = (r[j] + 1) % 4
        out.append(r)
    return out


def test_sharded_exact_matches_single(env):
    t, di, dev, mesh, sidx = env
    rs = np.random.RandomState(0)
    reads = reads_from(t, rs, 16, 60)
    rr, lens = pack_reads(reads, 64)
    rr, lens = jnp.asarray(rr), jnp.asarray(lens)
    k1, l1, m1 = exact_search(dev, rr, lens)
    k2, l2, m2 = sidx.exact_fn()(rr, lens)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_sharded_locate_matches_single(env):
    t, di, dev, mesh, sidx = env
    rs = np.random.RandomState(1)
    ranks = jnp.asarray(rs.randint(0, len(t) + 1, 64), jnp.uint32)
    p1 = dfm.locate(dev, ranks)
    p2 = sidx.locate_fn()(ranks)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_sharded_beam_matches_single(env):
    t, di, dev, mesh, sidx = env
    rs = np.random.RandomState(2)
    reads = reads_from(t, rs, 8, 50, mm=1)
    B, Lmax = len(reads), 50
    fwd = np.full((B, Lmax), 5, np.uint8)
    lens = np.zeros(B, np.int32)
    for j, r in enumerate(reads):
        fwd[j, :len(r)] = r
        lens[j] = len(r)
    opt = AlnOpt(max_diff=1, max_gapo=0)
    fwd_j, lens_j = jnp.asarray(fwd), jnp.asarray(lens)
    md = jnp.full(B, 1, jnp.int32)

    D1 = cal_width_device(dev, fwd_j, lens_j)
    D2 = sidx.width_fn()(fwd_j, lens_j)
    np.testing.assert_array_equal(np.asarray(D1), np.asarray(D2))

    r1 = beam_search(dev, fwd_j, lens_j, D1, md, opt, beam_width=128, max_hits=16)
    r2 = sidx.beam_fn(opt, beam_width=128, max_hits=16)(fwd_j, lens_j, D2, md)
    for a, b in zip(r1, r2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_data_axis_actually_shards(env):
    t, di, dev, mesh, sidx = env
    rs = np.random.RandomState(3)
    reads = reads_from(t, rs, 16, 40)
    rr, lens = pack_reads(reads, 40)
    k, l, m = sidx.exact_fn()(jnp.asarray(rr), jnp.asarray(lens))
    # output sharded over data axis
    assert "data" in str(k.sharding.spec) or k.sharding.is_fully_replicated is False
