"""Locate the pool-size/batch-size superlinearity (VERDICT r3 Weak #8 +
round-4 repeat-profile cliff): device-step time vs (B, seg_cap, cc, pm)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from common import setup_jax  # noqa: E402

CASES = [
    # (B, seg_cap, cc, pm)
    (16384, 96, 160, 16),    # sweep point that measured 416ms
    (32768, 96, 160, 8),
    (32768, 96, 160, 12),
    (32768, 96, 160, 16),    # the 5.2s cliff
    (32768, 32, 48, 16),     # big pool, small slots: isolate POOL
    (32768, 96, 48, 16),     # big seg_cap, small CC: isolate CC
]


def main():
    setup_jax()
    from hsa_tpu.config import AlnOpt
    from hsa_tpu.pipeline import Aligner, ReadBatch
    from hsa_tpu.index.layout import DeviceIndex

    cache = os.path.expanduser("~/.cache/hsa_tpu_bench")
    di = DeviceIndex.load(os.path.join(cache, "idx_64M_repeats_v4b_s8.npz"))
    text = np.asarray(np.load(os.path.join(cache, "txt_64M_repeats.npy"),
                              mmap_mode="r"), np.int8)
    opt = AlnOpt(max_diff=2)
    kdir = os.path.join(cache, "idxdir_64M_repeats_s8")
    rs = np.random.RandomState(1)
    n_genome = len(text)
    Bmax = max(c[0] for c in CASES)
    L = 100
    mat = np.empty((Bmax, L), np.uint8)
    for j in range(Bmax):
        p = rs.randint(0, n_genome - L)
        r = np.asarray(text[p:p + L]).copy()
        for _ in range(2):
            q = rs.randint(0, L)
            r[q] = (r[q] + rs.randint(1, 4)) % 4
        if j % 2:
            r = (3 - r)[::-1].copy()
        mat[j] = r
    for B, seg_cap, cc, pm in CASES:
        al = Aligner.from_arrays(di, text, opt=opt, ladder=[8, 64],
                                 engine="auto", index_dir=kdir)
        al._PIGEON_SEG_CAP = seg_cap
        al._PIGEON_CAND_CAP = cc
        al._PIGEON_POOL_MULT = pm
        reads = ReadBatch(mat[:B], np.full(B, L, np.int32))
        n_seg, _ = al._pigeon_split(reads)
        res = al._pigeon_raw(reads, n_seg)
        t0 = time.time()
        for _ in range(3):
            res = al._pigeon_raw(reads, n_seg)
        dt = (time.time() - t0) / 3
        print(f"B={B:6d} seg_cap={seg_cap:3d} cc={cc:3d} pm={pm:2d} "
              f"POOL={pm*2*B:8d} device_ms={dt*1e3:7.1f}", flush=True)


if __name__ == "__main__":
    main()
