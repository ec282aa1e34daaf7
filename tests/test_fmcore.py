"""Property tests for the numpy FM-index core (SURVEY.md §4.2)."""

import numpy as np
import pytest

from hsa_tpu import alphabet
from hsa_tpu.fmcore import FMIndex, cal_width, suffix_array


def naive_sa(t):
    n = len(t)
    suf = [tuple(t[i:]) + (-1,) for i in range(n)] + [(-1,)]
    return np.array(sorted(range(n + 1), key=lambda i: suf[i]), dtype=np.int64)


def rand_text(n, seed):
    return np.random.RandomState(seed).randint(0, 4, size=n).astype(np.int8)


@pytest.mark.parametrize("n,seed", [(1, 0), (2, 1), (13, 2), (100, 3), (257, 4), (1000, 5)])
def test_suffix_array_matches_naive(n, seed):
    t = rand_text(n, seed)
    np.testing.assert_array_equal(suffix_array(t), naive_sa(t))


def test_suffix_array_repetitive():
    t = np.tile(np.array([0, 1, 0, 0, 1], dtype=np.int8), 50)
    np.testing.assert_array_equal(suffix_array(t), naive_sa(t))


def test_occ_matches_naive_scan():
    t = rand_text(500, 7)
    fm = FMIndex.build(t)
    # reconstruct bwt_full from the real SA and count naively
    sa = fm.sa
    bwt_full = np.where(sa > 0, t[sa - 1], -1)  # -1 at primary ($)
    for a in range(4):
        naive = np.cumsum(bwt_full == a)
        for r in [-1, 0, 1, fm.primary - 1, fm.primary, fm.primary + 1, 250, fm.n]:
            expect = 0 if r < 0 else int(naive[r])
            assert int(fm.occ(a, r)) == expect, (a, r)


def test_backward_extension_counts_occurrences():
    t = rand_text(2000, 11)
    fm = FMIndex.build(t)
    rs = np.random.RandomState(13)
    for plen in [1, 2, 4, 8, 12]:
        for _ in range(20):
            pos = rs.randint(0, fm.n - plen)
            pat = t[pos:pos + plen]
            k, l = fm.exact_interval(pat)
            # count occurrences by naive scan
            windows = np.lib.stride_tricks.sliding_window_view(t, plen)
            cnt = int(np.sum(np.all(windows == pat, axis=1)))
            assert l - k + 1 == cnt
            if cnt:
                positions = fm.locate_interval(k, l)
                naive_pos = np.nonzero(np.all(windows == pat, axis=1))[0]
                np.testing.assert_array_equal(positions, naive_pos)


def test_absent_pattern_empty_interval():
    t = np.zeros(100, dtype=np.int8)  # all A
    fm = FMIndex.build(t)
    k, l = fm.exact_interval(np.array([1], dtype=np.int8))  # C absent
    assert k > l


def test_locate_matches_sa():
    t = rand_text(1234, 17)
    fm = FMIndex.build(t, sa_intv=8)
    for r in range(0, fm.n + 1, 7):
        assert fm.locate(r) == int(fm.sa[r])


def test_lf_walk_bound():
    t = rand_text(777, 19)
    intv = 16
    fm = FMIndex.build(t, sa_intv=intv)
    for r in range(fm.n + 1):
        steps, rr = 0, r
        while not fm.marks[rr]:
            rr = fm.lf(rr)
            steps += 1
        assert steps < intv


def test_cal_width_lower_bound():
    # D[i] must never exceed the true minimal Hamming distance of prefix matches
    t = rand_text(3000, 23)
    fm_rev = FMIndex.build(t[::-1].copy())
    rs = np.random.RandomState(29)
    pos = rs.randint(0, len(t) - 40)
    read = t[pos:pos + 40].copy()
    read[10] = (read[10] + 1) % 4  # one planted mismatch
    D = cal_width(fm_rev, read)
    assert D[-1] <= 1  # at most one diff needed for the full prefix
    assert (np.diff(D) >= 0).all()  # monotone
    clean = t[pos:pos + 40]
    assert cal_width(fm_rev, clean).max() == 0


def test_alphabet_roundtrip():
    s = "ACGTNacgtn"
    codes = alphabet.encode(s)
    np.testing.assert_array_equal(codes, [0, 1, 2, 3, 4, 0, 1, 2, 3, 4])
    assert alphabet.decode(codes[:5]) == "ACGTN"
    rc = alphabet.revcomp(alphabet.encode("ACGTN"))
    assert alphabet.decode(rc) == "NACGT"


def test_substitute_ambiguous_deterministic():
    codes = alphabet.encode("ACNNNGTNAC")
    c1, runs1 = alphabet.substitute_ambiguous(codes)
    c2, runs2 = alphabet.substitute_ambiguous(codes)
    np.testing.assert_array_equal(c1, c2)
    assert runs1 == runs2 == [(2, 3), (7, 1)]
    assert c1.max() <= 3
