"""Native refpack builder vs the numpy reference core."""

import numpy as np
import pytest

from hsa_tpu import refpack
from hsa_tpu.fmcore import FMIndex, suffix_array as np_suffix_array


def rand_text(n, seed):
    return np.random.RandomState(seed).randint(0, 4, size=n).astype(np.int8)


def test_native_library_builds():
    # g++ is in the image; the native path must actually be exercised in CI
    assert refpack.available()


@pytest.mark.parametrize("n,seed", [(1, 0), (2, 1), (17, 2), (1000, 3), (100_000, 4)])
def test_sais_matches_numpy(n, seed):
    t = rand_text(n, seed)
    np.testing.assert_array_equal(refpack.suffix_array(t), np_suffix_array(t))


def test_sais_repetitive_text():
    t = np.tile(np.array([0, 1, 0, 0, 1, 2], dtype=np.int8), 5000)
    np.testing.assert_array_equal(refpack.suffix_array(t), np_suffix_array(t))


def test_sais_homopolymer():
    t = np.zeros(10_000, dtype=np.int8)
    sa = refpack.suffix_array(t)
    # suffixes of A^n + $ sort longest-last: SA = [n, n-1, ..., 0]
    np.testing.assert_array_equal(sa, np.arange(10_000, -1, -1))


def test_fused_build_matches_fmindex():
    t = rand_text(5000, 7)
    fm = FMIndex.build(t, sa_intv=16)
    sa, bwt, primary, marks, samples = refpack.build(t, sa_intv=16, want_sa=True)
    np.testing.assert_array_equal(sa, fm.sa)
    np.testing.assert_array_equal(bwt.astype(np.int8), fm.bwt)
    assert primary == fm.primary
    np.testing.assert_array_equal(marks.astype(bool), fm.marks)
    np.testing.assert_array_equal(samples, fm.samples)


def test_pack_unpack_roundtrip():
    t = rand_text(1001, 9).astype(np.uint8)
    packed = refpack.pack_2bit(t)
    assert packed.size == (1001 + 3) // 4
    np.testing.assert_array_equal(refpack.unpack_2bit(packed, 1001), t)


def test_int64_instantiation_matches_int32():
    # the >2^31 production path, exercised at small scale via the test hook
    for n, seed in [(1000, 1), (50_000, 2)]:
        t = rand_text(n, seed)
        np.testing.assert_array_equal(refpack.suffix_array_force64(t),
                                      refpack.suffix_array(t))
