"""Native FASTQ batch reader vs the simple Python reader."""

import gzip

import numpy as np
import pytest

from hsa_tpu import alphabet
from hsa_tpu.io.fastx import read_fastq
from hsa_tpu.io.fastq_fast import FastqBatcher


def write_fastq(path, n=37, seed=0, varlen=True, crlf=False):
    rs = np.random.RandomState(seed)
    eol = "\r\n" if crlf else "\n"
    recs = []
    with open(path, "w", newline="") as fh:
        for i in range(n):
            L = rs.randint(30, 90) if varlen else 50
            seq = "".join("ACGTN"[c] for c in rs.randint(0, 5, L))
            qual = "".join(chr(33 + q) for q in rs.randint(0, 40, L))
            fh.write(f"@read{i} extra comment{eol}{seq}{eol}+{eol}{qual}{eol}")
            recs.append((f"read{i}", seq, qual))
    return recs


@pytest.mark.parametrize("crlf", [False, True])
def test_batcher_matches_reference_reader(tmp_path, crlf):
    path = tmp_path / "r.fq"
    recs = write_fastq(path, n=37, crlf=crlf)
    got = []
    for names, codes, lens, quals in FastqBatcher(str(path), batch=10, max_len=128):
        for j in range(len(names)):
            seq = alphabet.decode(codes[j, :lens[j]])
            got.append((names[j], seq, quals[j]))
    assert len(got) == 37
    for (gn, gs, gq), (en, es, eq) in zip(got, recs):
        assert gn == en
        assert gs == es.upper().replace("N", "N")
        assert gq == eq


def test_batcher_gzip(tmp_path):
    plain = tmp_path / "r.fq"
    recs = write_fastq(plain, n=11)
    gz = tmp_path / "r.fq.gz"
    with open(plain, "rb") as src, gzip.open(gz, "wb") as dst:
        dst.write(src.read())
    got = []
    for names, codes, lens, quals in FastqBatcher(str(gz), batch=4, max_len=128):
        got.extend(names)
    assert got == [r[0] for r in recs]


def test_batcher_truncates_overlong_reads(tmp_path):
    path = tmp_path / "r.fq"
    seq = "ACGT" * 100  # 400bp
    path.write_text(f"@long\n{seq}\n+\n{'I' * 400}\n")
    (names, codes, lens, quals), = list(FastqBatcher(str(path), batch=4, max_len=64))
    assert names == ["long"]
    assert lens[0] == 64  # clamped to max_len in the returned lens
    assert alphabet.decode(codes[0]) == seq[:64]


def test_batcher_empty_file(tmp_path):
    path = tmp_path / "e.fq"
    path.write_text("")
    assert list(FastqBatcher(str(path))) == []


def test_batcher_malformed(tmp_path):
    path = tmp_path / "bad.fq"
    path.write_text("not a fastq\n")
    with pytest.raises(Exception):
        list(FastqBatcher(str(path), batch=4))
