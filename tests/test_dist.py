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


def test_sharded_pigeon_matches_single(env):
    """The flagship pigeon engine on the sharded index == single-device,
    including the gapped pool-2 results (occurrence-set equality)."""
    from hsa_tpu import alphabet
    from hsa_tpu.search import pigeon as pg

    t, di, dev, mesh, sidx = env
    rs = np.random.RandomState(7)
    reads = reads_from(t, rs, 12, 60, mm=2)
    # two reads with a planted deletion/insertion (exercise pool-2)
    for kind in (0, 1):
        p = rs.randint(0, len(t) - 70)
        if kind:
            r = np.concatenate([t[p:p + 30], t[p + 32:p + 62]])
        else:
            r = np.concatenate([t[p:p + 30], [1, 2], t[p + 30:p + 58]])
        reads.append(r.astype(np.int8))
    rc = [alphabet.revcomp(r) for r in reads]
    both = list(reads) + rc
    # pad lanes to a multiple of the data axis (2)
    while len(both) % 2:
        both.append(both[-1])
    opt = AlnOpt(max_diff=2, max_gapo=1)
    n_seg = 3
    batch = pg.pack_pigeon_batch(both, n_seg=n_seg, seed_len=opt.seed_len)
    md = np.full(len(both), 2, np.int32)
    trows = jnp.asarray(pg.pack_text_rows(t))

    r1 = pg.pigeon_search(
        dev, trows, jnp.asarray(batch["segs_rev"]),
        jnp.asarray(batch["seg_lens"]), jnp.asarray(batch["seg_off"]),
        jnp.asarray(batch["rw"]), jnp.asarray(batch["nmask"]),
        jnp.asarray(batch["vmask"]), jnp.asarray(batch["seedmask"]),
        jnp.asarray(batch["lens"]), jnp.asarray(md), opt, n_seg=n_seg,
        cand_cap=16)
    r2 = sidx.pigeon_fn(opt, n_seg, trows, cand_cap=16)(batch, md)

    for field in ("fallback", "n_cand", "n_missed"):
        np.testing.assert_array_equal(np.asarray(getattr(r1, field)),
                                      np.asarray(getattr(r2, field)),
                                      err_msg=field)
    # pool-1 entries: compaction order differs across data slices (each
    # slice owns its own pool), so compare the (slot id, pos, nmm) SETS
    def pool_set(res):
        v = np.asarray(res.valid)
        ci = np.asarray(res.cidx)[v]
        return set(zip(ci.tolist(), np.asarray(res.pos)[v].tolist(),
                       np.asarray(res.nmm)[v].tolist()))
    assert pool_set(r1) == pool_set(r2)
    # gapped entries: pool-2 compaction order differs across data slices,
    # so compare the per-lane occurrence SETS
    def gap_sets(res, n_lanes):
        out = {}
        gr = np.asarray(res.g_read)
        gk = np.asarray(res.g_key)
        gq = np.asarray(res.g_q)
        for i in np.nonzero(gr < n_lanes)[0]:
            for s in range(gk.shape[1]):
                if gk[i, s] != 0xFFFFFFFF:
                    out.setdefault(int(gr[i]), set()).add(
                        (int(gq[i, s]), int(gk[i, s])))
        return out
    assert gap_sets(r1, len(both)) == gap_sets(r2, len(both))
    n_lanes = len(both)
    occ1, fb1, _m1 = pg.pigeon_occurrences(r1, n_lanes // 2, opt, 16)
    occ2, fb2, _m2 = pg.pigeon_occurrences(r2, n_lanes // 2, opt, 16)
    assert (fb1 == fb2).all()
    for a, b in zip(occ1, occ2):
        assert [(o.pos, o.strand, o.score, o.nmm, o.ngapo, o.ngape)
                for o in a] == \
               [(o.pos, o.strand, o.score, o.nmm, o.ngapo, o.ngape)
                for o in b]
