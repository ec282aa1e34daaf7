"""Resume manifest + metrics: interrupted align run continues batch-granular."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("resume")
    rs = np.random.RandomState(4)
    chrom = "".join("ACGT"[i] for i in rs.randint(0, 4, 4000))
    (tmp / "ref.fa").write_text(f">s\n{chrom}\n")
    with open(tmp / "reads.fq", "w") as fh:
        for i in range(12):
            p = rs.randint(0, 4000 - 50)
            fh.write(f"@r{i}\n{chrom[p:p + 50]}\n+\n{'I' * 50}\n")
    return tmp


def run(args, cwd, check=True):
    import os as _os
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-m", "hsa_tpu.cli"] + args
                       + ["--platform", "cpu"],
                       capture_output=True, text=True, cwd=repo, timeout=500)
    if check:
        assert r.returncode == 0, r.stderr[-1500:]
    return r


def test_align_metrics_and_resume(workdir):
    run(["index", str(workdir / "ref.fa")], cwd=None)
    out = str(workdir / "out.sam")
    met = str(workdir / "met.json")
    run(["align", str(workdir / "ref.fa"), str(workdir / "reads.fq"),
         "-f", out, "-n", "1", "-W", "128", "--batch", "4",
         "--metrics", met], cwd=None)
    m = json.load(open(met))
    assert m["reads_in"] == 12 and m["reads_mapped"] == 12
    assert m["records_out"] == 12
    assert "t_align_s" in m and m["wall_s"] > 0
    full = open(out).read()

    # simulate a crash after batch 2: truncate manifest to 8 reads and rerun
    manifest = out + ".manifest.json"
    mf = json.load(open(manifest))
    assert mf["completed_reads"] == 12
    mf["completed_reads"] = 8
    json.dump(mf, open(manifest, "w"))
    # truncate SAM to the records of the first 8 reads
    lines = full.splitlines(keepends=True)
    hdr = [l for l in lines if l.startswith("@")]
    body = [l for l in lines if not l.startswith("@")]
    with open(out, "w") as fh:
        fh.writelines(hdr + body[:8])
    r = run(["align", str(workdir / "ref.fa"), str(workdir / "reads.fq"),
             "-f", out, "-n", "1", "-W", "128", "--batch", "4", "--resume"],
            cwd=None)
    assert "resuming at read 8" in r.stderr
    assert open(out).read() == full  # byte-identical to the uninterrupted run


def test_resume_ignores_mismatched_args(workdir):
    out = str(workdir / "out2.sam")
    run(["align", str(workdir / "ref.fa"), str(workdir / "reads.fq"),
         "-f", out, "-n", "1", "-W", "128", "--batch", "4"], cwd=None)
    # different batch size -> manifest key mismatch -> full rerun, no crash
    r = run(["align", str(workdir / "ref.fa"), str(workdir / "reads.fq"),
             "-f", out, "-n", "1", "-W", "128", "--batch", "6", "--resume"],
            cwd=None)
    assert "resuming" not in r.stderr


def test_aln_resume_parts(workdir):
    """aln --resume skips completed part shards and produces an identical
    final .sai.npz."""
    out = str(workdir / "r.sai.npz")
    run(["aln", str(workdir / "ref.fa"), str(workdir / "reads.fq"),
         "-f", out, "-n", "1", "-W", "128", "--batch", "4"], cwd=None)
    ref = dict(np.load(out))
    # simulate a crash: roll the manifest back to 8 reads and recreate the
    # first two part shards (the run consumed them; resume must reuse them)
    manifest = json.load(open(out + ".manifest.json"))
    manifest["completed_reads"] = 8
    json.dump(manifest, open(out + ".manifest.json", "w"))
    os.makedirs(out + ".parts", exist_ok=True)
    r = run(["aln", str(workdir / "ref.fa"), str(workdir / "reads.fq"),
             "-f", out, "-n", "1", "-W", "128", "--batch", "4", "--resume"],
            cwd=None)
    assert "resuming at read 8" in r.stderr
    got = dict(np.load(out))
    for k in ref:
        assert np.array_equal(ref[k], got[k]), k


def test_align_pe_metrics_and_resume(workdir):
    """align-pe supports --metrics and batch-granular --resume."""
    rs = np.random.RandomState(9)
    chrom = open(workdir / "ref.fa").read().splitlines()[1]
    def rc(s):
        return s[::-1].translate(str.maketrans("ACGT", "TGCA"))
    with open(workdir / "p1.fq", "w") as f1, \
         open(workdir / "p2.fq", "w") as f2:
        for i in range(8):
            p = rs.randint(0, len(chrom) - 260)
            f1.write(f"@p{i}\n{chrom[p:p + 50]}\n+\n{'I' * 50}\n")
            f2.write(f"@p{i}\n{rc(chrom[p + 150:p + 200])}\n+\n{'I' * 50}\n")
    out = str(workdir / "pe.sam")
    met = str(workdir / "pemet.json")
    run(["align-pe", str(workdir / "ref.fa"), str(workdir / "p1.fq"),
         str(workdir / "p2.fq"), "-f", out, "-n", "1", "--batch", "4",
         "--metrics", met], cwd=None)
    m = json.load(open(met))
    assert m["reads_in"] == 16 and m["records_out"] == 16
    full = open(out).read()
    # crash after first batch (4 pairs = 8 records)
    mf = json.load(open(out + ".manifest.json"))
    assert mf["completed_reads"] == 8
    mf["completed_reads"] = 4
    json.dump(mf, open(out + ".manifest.json", "w"))
    lines = full.splitlines(keepends=True)
    hdr = [l for l in lines if l.startswith("@")]
    body = [l for l in lines if not l.startswith("@")]
    with open(out, "w") as fh:
        fh.writelines(hdr + body[:8])
    r = run(["align-pe", str(workdir / "ref.fa"), str(workdir / "p1.fq"),
             str(workdir / "p2.fq"), "-f", out, "-n", "1", "--batch", "4",
             "--resume"], cwd=None)
    assert "resuming at pair 4" in r.stderr
    assert open(out).read() == full
