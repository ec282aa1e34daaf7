"""CLI end-to-end: index -> aln -> samse == align, on a small FASTA/FASTQ."""

import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    rs = np.random.RandomState(3)
    chrom = "".join("ACGT"[i] for i in rs.randint(0, 4, 5000))
    (tmp / "ref.fa").write_text(f">seq1\n{chrom}\n")
    reads = []
    for i in range(20):
        p = rs.randint(0, 5000 - 60)
        s = list(chrom[p:p + 60])
        if i % 3 == 1:
            j = rs.randint(5, 55)
            s[j] = "ACGT"[("ACGT".index(s[j]) + 1) % 4]
        reads.append((f"r{i}", "".join(s), "I" * 60))
    with open(tmp / "reads.fq", "w") as fh:
        for name, seq, qual in reads:
            fh.write(f"@{name}\n{seq}\n+\n{qual}\n")
    return tmp


def run(args, cwd):
    env = dict(JAX_PLATFORMS="cpu")
    import os
    e = os.environ.copy()
    e.update(env)
    r = subprocess.run([sys.executable, "-m", "hsa_tpu.cli"] + args + ["--platform", "cpu"],
                       capture_output=True, text=True, cwd=cwd, env=e, timeout=500)
    assert r.returncode == 0, r.stderr[-2000:]
    return r


def test_cli_end_to_end(workdir):
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    run(["index", str(workdir / "ref.fa")], cwd=repo)
    run(["aln", str(workdir / "ref.fa"), str(workdir / "reads.fq"),
         "-f", str(workdir / "out.sai.npz"), "-n", "2", "-W", "512"], cwd=repo)
    r1 = run(["samse", str(workdir / "ref.fa"), str(workdir / "out.sai.npz"),
              str(workdir / "reads.fq"), "-f", str(workdir / "out1.sam")], cwd=repo)
    r2 = run(["align", str(workdir / "ref.fa"), str(workdir / "reads.fq"),
              "-n", "2", "-W", "512", "-f", str(workdir / "out2.sam")], cwd=repo)
    sam1 = (workdir / "out1.sam").read_text()
    sam2 = (workdir / "out2.sam").read_text()
    body1 = [l for l in sam1.splitlines() if not l.startswith("@")]
    body2 = [l for l in sam2.splitlines() if not l.startswith("@")]
    assert body1 == body2
    assert len(body1) == 20
    # every read maps (they were sampled from the reference)
    for line in body1:
        f = line.split("\t")
        assert f[2] == "seq1" and f[1] in ("0", "16")
        assert f[5] == "60M"


def test_cli_bad_usage(workdir):
    import os, subprocess, sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-m", "hsa_tpu.cli", "frobnicate"],
                       capture_output=True, text=True, cwd=repo, timeout=60)
    assert r.returncode == 1 and "usage" in r.stderr
