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


def test_batcher_gzip_streaming_bounded_window(tmp_path):
    """Round 5: .gz input streams through a rolling window — full record
    parity with the plain reader AND the decompressed window stays
    O(batch) (the old fallback decompressed the WHOLE file to memory)."""
    plain = tmp_path / "big.fq"
    recs = write_fastq(plain, n=4000, varlen=False)
    gz = tmp_path / "big.fq.gz"
    with open(plain, "rb") as src, gzip.open(gz, "wb") as dst:
        dst.write(src.read())
    b = FastqBatcher(str(gz), batch=64, max_len=128)
    window_cap = b._gz_target + (1 << 20) * 4   # target + chunk slack
    got = []
    max_window = 0
    for names, codes, lens, quals in b:
        max_window = max(max_window, len(b._buf))
        for j in range(len(names)):
            got.append((names[j], alphabet.decode(codes[j, :lens[j]]),
                        quals[j]))
    assert [g[0] for g in got] == [r[0] for r in recs]
    assert [g[1] for g in got] == [r[1] for r in recs]
    assert [g[2] for g in got] == [r[2] for r in recs]
    # bounded RSS proxy: the rolling window never approached file size
    file_bytes = plain.stat().st_size
    assert max_window < min(window_cap, file_bytes)
    assert max_window < file_bytes / 2


def test_batcher_gzip_multimember(tmp_path):
    """Catted .gz members (bgzf-style) parse seamlessly across the
    member boundary."""
    p1 = tmp_path / "a.fq"
    p2 = tmp_path / "b.fq"
    r1 = write_fastq(p1, n=7, seed=1)
    r2 = write_fastq(p2, n=9, seed=2)
    gz = tmp_path / "cat.fq.gz"
    with open(gz, "wb") as dst:
        for p in (p1, p2):
            dst.write(gzip.compress(p.read_bytes()))
    got = [n for names, _c, _l, _q in FastqBatcher(str(gz), batch=5,
                                                   max_len=128)
           for n in names]
    assert got == [r[0] for r in r1] + [r[0] for r in r2]


def test_batcher_gzip_truncated_raises(tmp_path):
    """A .gz cut mid-stream raises EOFError instead of silently
    yielding a shorter file (parity with gzip.open's behavior)."""
    plain = tmp_path / "r.fq"
    write_fastq(plain, n=100, varlen=False)
    gz = tmp_path / "r.fq.gz"
    data = gzip.compress(plain.read_bytes())
    gz.write_bytes(data[:len(data) // 2])
    b = FastqBatcher(str(gz), batch=16, max_len=128)
    with pytest.raises(EOFError):
        for _ in b:
            pass
