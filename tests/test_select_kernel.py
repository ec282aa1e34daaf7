"""Pallas select_topk kernel (interpret mode) vs the XLA sort reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from hsa_tpu.kernels.select import (KEY_SH, SENT, select_topk,
                                    select_topk_reference)


def make_case(C, B, K, seed, frac_valid=0.7, with_window=False):
    rs = np.random.RandomState(seed)
    score = rs.randint(0, 50, (C, B)).astype(np.uint32)
    col = np.arange(C, dtype=np.uint32)[:, None]
    key = (score << KEY_SH) | col
    invalid = rs.rand(C, B) > frac_valid
    key = np.where(invalid, (SENT | col).astype(np.uint32), key)
    p1 = rs.randint(0, 2**31, (C, B)).astype(np.uint32)
    p2 = rs.randint(0, 2**31, (C, B)).astype(np.uint32)
    win = rs.randint(5, 40, B).astype(np.uint32) if with_window else None
    return jnp.asarray(key), (jnp.asarray(p1), jnp.asarray(p2)), (
        jnp.asarray(win) if win is not None else None)


@pytest.mark.parametrize("C,B,K,window", [
    (32, 64, 8, False), (72, 128, 8, True), (56, 96, 16, False),
    (17, 33, 4, True),  # odd shapes exercise lane padding
])
def test_kernel_matches_reference(C, B, K, window):
    key, pays, win = make_case(C, B, K, seed=C + B, with_window=window)
    rk, rp, rd = select_topk_reference(key, pays, K, win)
    kkd, kp, kd = select_topk(key, pays, K, win, interpret=True, lanes=32)
    rk, kk = np.asarray(rk), np.asarray(kkd)[:K]
    np.testing.assert_array_equal(np.asarray(kkd)[K], np.asarray(rd))
    # valid slots must agree exactly (keys unique); invalid slots only in mask
    rvalid = rk < SENT
    kvalid = kk < SENT
    np.testing.assert_array_equal(rvalid, kvalid)
    np.testing.assert_array_equal(np.where(rvalid, rk, 0),
                                  np.where(kvalid, kk, 0))
    for a, b in zip(rp, kp):
        np.testing.assert_array_equal(np.where(rvalid, np.asarray(a), 0),
                                      np.where(kvalid, np.asarray(b), 0))
    np.testing.assert_array_equal(np.asarray(rd).reshape(-1),
                                  np.asarray(kd).reshape(-1))


def test_all_invalid_column():
    key, pays, _ = make_case(16, 32, 4, seed=1, frac_valid=0.0)
    rk, _, rd = select_topk_reference(key, pays, 4, None)
    kkd, _, kd = select_topk(key, pays, 4, None, interpret=True, lanes=32)
    assert not (np.asarray(kkd)[:4] < SENT).any()
    np.testing.assert_array_equal(np.asarray(rd).reshape(-1),
                                  np.asarray(kd).reshape(-1))
    assert (np.asarray(kd) == 0).all()
