"""Run the native SA-IS/BWT battery under AddressSanitizer + UBSan.

SURVEY.md §5 sanitizer row: the C++ builder gets an ASan job.  The asan
shared object cannot be dlopen'd into a running CPython (ASan must be
preloaded), so the battery runs in a SUBPROCESS with LD_PRELOAD pointing
at the asan runtime; any heap error or UB aborts that process non-zero.
"""

import os
import subprocess
import sys

import pytest

_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "hsa_tpu", "refpack")

_BATTERY = r"""
import ctypes, os, sys
import numpy as np
sys.path.insert(0, %(root)r)
os.environ["HSA_REFPACK_SO"] = %(so)r
from hsa_tpu import refpack
# force the asan lib
refpack._SO = %(so)r
refpack._lib = None
assert refpack.available(), "asan librefpack failed to load"
from hsa_tpu.fmcore import suffix_array as np_sa, bwt_from_sa

rs = np.random.RandomState(0)
for n in (0, 1, 2, 37, 500, 5000):
    t = rs.randint(0, 4, n).astype(np.uint8)
    sa = refpack.suffix_array(t)
    ref = np_sa(t.astype(np.int8))
    assert np.array_equal(sa, ref), n
    sa64 = refpack.suffix_array_force64(t)
    assert np.array_equal(sa64, ref), ("force64", n)
    _, bwt, primary, marks, samples = refpack.build(t, sa_intv=8)
    if n:
        rbwt, rprim = bwt_from_sa(t.astype(np.int8), ref)
        assert np.array_equal(bwt, rbwt.astype(np.uint8)) and primary == rprim
    p = refpack.pack_2bit(t)
    assert np.array_equal(refpack.unpack_2bit(p, n), t & 3)
# repetitive stress (SA-IS LMS recursion depth)
t = np.tile(rs.randint(0, 4, 13).astype(np.uint8), 400)
assert np.array_equal(refpack.suffix_array(t), np_sa(t.astype(np.int8)))
# glocal rescue DP battery (round 5): threaded path + edge shapes
if hasattr(refpack._load(), "rp_glocal_batch"):
    text = rs.randint(0, 4, 5000).astype(np.int8)
    NJ, Lm = 100, 40
    rbuf = np.zeros((NJ, Lm), np.uint8)
    r_off = np.arange(NJ, dtype=np.int64) * Lm
    r_len = np.zeros(NJ, np.int32)
    w_off = np.zeros(NJ, np.int64)
    w_len = np.zeros(NJ, np.int32)
    for i in range(NJ):
        L = int(rs.randint(1, Lm + 1))
        G = int(rs.randint(0, 300))
        p = int(rs.randint(0, len(text) - max(G, 1)))
        rbuf[i, :L] = rs.randint(0, 5, L)   # incl. N codes
        r_len[i] = L
        w_off[i] = p
        w_len[i] = G
    cost, start, ops = refpack.glocal_batch(rbuf, r_off, r_len, text,
                                            w_off, w_len, 3, 11, 4)
    assert len(ops) == NJ
print("ASAN-BATTERY-OK")
"""


def _find_asan_rt():
    out = subprocess.run(["g++", "-print-file-name=libasan.so"],
                         capture_output=True, text=True)
    p = out.stdout.strip()
    return p if p and os.path.sep in p else None


@pytest.mark.slow
def test_refpack_battery_under_asan(tmp_path):
    rc = subprocess.run(["make", "-C", _DIR, "-s", "asan"],
                        capture_output=True, text=True)
    assert rc.returncode == 0, rc.stderr
    so = os.path.join(_DIR, "librefpack_asan.so")
    asan_rt = _find_asan_rt()
    if asan_rt is None:
        pytest.skip("libasan runtime not found")
    script = tmp_path / "battery.py"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script.write_text(_BATTERY % dict(root=root, so=so))
    env = dict(os.environ, LD_PRELOAD=asan_rt,
               ASAN_OPTIONS="detect_leaks=0",  # CPython itself "leaks"
               JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, str(script)], env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])
    assert "ASAN-BATTERY-OK" in r.stdout
