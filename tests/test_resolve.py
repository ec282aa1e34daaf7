"""Resolution layer: CIGAR DP, MAPQ, and end-to-end record parity
(device beam pipeline vs oracle pipeline, shared resolution)."""

import numpy as np
import pytest

from hsa_tpu import alphabet
from hsa_tpu.config import AlnOpt, SamseOpt
from hsa_tpu.io.fastx import RefMeta
from hsa_tpu.pipeline import oracle_align
from hsa_tpu.resolve.cigar import banded_global, cigar_stats, cigar_string
from hsa_tpu.resolve.mapq import approx_mapq


def test_cigar_exact_match():
    r = np.array([0, 1, 2, 3, 0, 1], np.int8)
    cost, cig, glen = banded_global(r, r.copy(), 3, 11, 4, band=2)
    assert cost == 0 and cig == [("M", 6)] and glen == 6
    nm, md = cigar_stats(cig, r, r)
    assert nm == 0 and md == "6"


def test_cigar_mismatch():
    r = np.array([0, 1, 2, 3, 0, 1], np.int8)
    ref = r.copy(); ref[2] = 3
    cost, cig, _ = banded_global(r, ref, 3, 11, 4, band=2)
    assert cost == 3 and cig == [("M", 6)]
    nm, md = cigar_stats(cig, r, ref)
    assert nm == 1 and md == "2T3"


def test_cigar_deletion():
    ref = np.array([0, 1, 2, 3, 0, 1, 2, 3, 2, 1, 0, 3], np.int8)
    read = np.concatenate([ref[:6], ref[7:]])  # delete ref[6]
    cost, cig, glen = banded_global(read, ref, 3, 11, 4, band=3)
    assert cost == 11
    assert cigar_string(cig) == "6M1D5M"
    assert glen == 12
    nm, md = cigar_stats(cig, read, ref)
    assert nm == 1 and md == "6^G5"


def test_cigar_insertion():
    ref = np.array([0, 1, 2, 3, 0, 1, 2, 3, 2, 1, 0, 3], np.int8)
    read = np.concatenate([ref[:6], [2], ref[6:]])  # extra base in read
    cost, cig, glen = banded_global(read, ref, 3, 11, 4, band=3)
    assert cost == 11
    assert cigar_string(cig) == "6M1I6M" or cigar_string(cig) == "7M1I5M"
    assert glen == 12
    nm, _ = cigar_stats(cig, read, ref)
    assert nm == 1


def test_cigar_n_read_base_mismatches():
    r = np.array([0, 1, 4, 3], np.int8)
    ref = np.array([0, 1, 2, 3], np.int8)
    cost, cig, _ = banded_global(r, ref, 3, 11, 4, band=2)
    assert cost == 3 and cig == [("M", 4)]


def test_mapq_formula():
    assert approx_mapq(1, 0, 0, 2) == 37
    assert approx_mapq(2, 0, 0, 2) == 0
    assert approx_mapq(1, 0, 2, 2) == 25
    assert approx_mapq(1, 1, 0, 2) == 23
    assert approx_mapq(1, 10, 0, 2) == 23 - 10  # g_log_n(10) = 10
    assert approx_mapq(0, 0, 0, 2) == 23


# ---------- end-to-end record parity: device pipeline vs oracle pipeline ----

def make_genome(tmp_path):
    rs = np.random.RandomState(7)
    chr1 = "".join("ACGT"[i] for i in rs.randint(0, 4, 3000))
    chr2 = "".join("ACGT"[i] for i in rs.randint(0, 4, 2000))
    fa = tmp_path / "ref.fa"
    fa.write_text(f">chr1\n{chr1}\n>chr2 extra description\n{chr2}\n")
    return fa, chr1, chr2


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    from hsa_tpu.pipeline import Aligner, build_index
    tmp = tmp_path_factory.mktemp("idx")
    fa, chr1, chr2 = make_genome(tmp)
    build_index(str(fa), str(tmp / "ref"))
    al = Aligner(str(tmp / "ref.hsa"))
    return al, chr1, chr2


def planted_reads(chr1, chr2, rs):
    text = chr1 + chr2
    reads, names = [], []

    def add(seq, name):
        reads.append(alphabet.encode(seq))
        names.append(name)

    add(chr1[100:160], "clean_chr1")
    add(chr2[500:560], "clean_chr2")
    m = list(chr1[700:760])
    m[20] = "ACGT"[(("ACGT".index(m[20])) + 1) % 4]
    add("".join(m), "mm1")
    rc = alphabet.decode(alphabet.revcomp(alphabet.encode(chr2[900:960])))
    add(rc, "revstrand")
    w = chr1[1500:1561]
    add(w[:30] + w[31:], "deletion")
    add(chr2[1200:1230] + "A" + chr2[1230:1259], "insertion")
    add("".join("ACGT"[i] for i in rs.randint(0, 4, 50)), "junk")
    # read crossing the chr1/chr2 boundary: must be unmapped or boundary-filtered
    add(text[2970:3030], "boundary")
    return reads, names


def test_record_parity_device_vs_oracle(pipe):
    al, chr1, chr2 = pipe
    rs = np.random.RandomState(11)
    reads, names = planted_reads(chr1, chr2, rs)
    opt = AlnOpt(max_diff=2)
    al.opt = opt
    dev_recs = al.align(reads, names, None, beam_width=512)
    ora_recs = oracle_align(al.text, al.meta, reads, names, None, opt)
    assert int(al.last_overflow[0].sum()) == 0
    for d, o in zip(dev_recs, ora_recs):
        assert d.to_sam() == o.to_sam(), (d.to_sam(), o.to_sam())


def test_record_fields_sane(pipe):
    al, chr1, chr2 = pipe
    rs = np.random.RandomState(13)
    reads, names = planted_reads(chr1, chr2, rs)
    al.opt = AlnOpt(max_diff=2)
    recs = {r.qname: r for r in al.align(reads, names, None, beam_width=512)}
    r = recs["clean_chr1"]
    assert (r.rname, r.pos, r.cigar, r.flag) == ("chr1", 101, "60M", 0)
    assert r.tags["NM"] == 0 and r.tags["X0"] == 1 and r.mapq == 37
    r = recs["clean_chr2"]
    assert (r.rname, r.pos) == ("chr2", 501)
    r = recs["mm1"]
    assert r.tags["NM"] == 1 and r.tags["XM"] == 1 and r.cigar == "60M"
    r = recs["revstrand"]
    assert r.flag == 16 and r.rname == "chr2" and r.pos == 901
    r = recs["deletion"]
    assert "D" in r.cigar and r.rname == "chr1" and r.pos == 1501
    r = recs["insertion"]
    assert "I" in r.cigar and r.rname == "chr2"
    assert recs["junk"].flag == 4
    assert recs["boundary"].flag == 4


def test_sam_output_format(pipe):
    import io as _io
    from hsa_tpu.io.sam import write_sam
    al, chr1, chr2 = pipe
    al.opt = AlnOpt(max_diff=1)
    recs = al.align([alphabet.encode(chr1[10:70])], ["r1"], ["I" * 60], beam_width=256)
    buf = _io.StringIO()
    write_sam(buf, al.meta, recs)
    out = buf.getvalue()
    assert "@SQ\tSN:chr1\tLN:3000" in out
    assert "@SQ\tSN:chr2\tLN:2000" in out
    line = [l for l in out.splitlines() if l.startswith("r1")][0]
    f = line.split("\t")
    assert f[1] == "0" and f[2] == "chr1" and f[3] == "11" and f[5] == "60M"
    assert f[10] == "I" * 60


def test_trim_read_length():
    from hsa_tpu.io.fastx import trim_read_length
    # high-quality read: no trim
    assert trim_read_length("I" * 50, 15) == 50
    # 3' tail of low quality ('#' = Q2) trimmed at threshold 15
    q = "I" * 40 + "#" * 10
    assert trim_read_length(q, 15) == 40
    assert trim_read_length(q, 0) == 50  # disabled
    assert trim_read_length("#" * 30, 15) == 1  # keeps at least one base
    assert trim_read_length("*", 15) == 1 or trim_read_length("*", 15) == 1


def test_xn_tag_counts_ambiguous_bases(tmp_path):
    from hsa_tpu.pipeline import Aligner, build_index
    from hsa_tpu.config import AlnOpt
    rs = np.random.RandomState(3)
    g = "".join("ACGT"[i] for i in rs.randint(0, 4, 3000))
    g = g[:1000] + "NNN" + g[1003:]
    (tmp_path / "r.fa").write_text(f">c\n{g}\n")
    build_index(str(tmp_path / "r.fa"), str(tmp_path / "r"))
    al = Aligner(str(tmp_path / "r.hsa"), AlnOpt(max_diff=2))
    # read overlapping the N run (Ns were substituted deterministically, so
    # take the read from the CLEANED text to guarantee a hit)
    read = al.text[980:1040].copy()
    recs = al.align([read], ["q"], None, beam_width=256)
    assert recs[0].pos == 981
    assert recs[0].tags.get("XN") == 3
    # read away from the run has no XN
    recs2 = al.align([al.text[2000:2060].copy()], ["q2"], None, beam_width=256)
    assert "XN" not in recs2[0].tags


def test_collect_occurrences_vectorized_matches_reference():
    from hsa_tpu.oracle.bnb import Hit
    from hsa_tpu.resolve.samse import collect_occurrences, collect_occurrences_ref
    rs = np.random.RandomState(5)
    # fake locate: position = rank * 7 % 1000 (forces collisions/dedup)
    locate = lambda ranks: (np.asarray(ranks, np.int64) * 7) % 1000
    for trial in range(20):
        B = rs.randint(1, 8)
        hf, hr = [], []
        for _ in range(B):
            def mk():
                out = []
                for _ in range(rs.randint(0, 4)):
                    k = rs.randint(0, 900)
                    w = rs.randint(1, 30)
                    out.append(Hit(int(rs.randint(0, 4)) * 3, 1, 0, 0, k, k + w - 1))
                return out
            hf.append(mk()); hr.append(mk())
        cap = int(rs.choice([3, 10, 512]))
        a_occ, a_tr = collect_occurrences(hf, hr, locate, cap)
        b_occ, b_tr = collect_occurrences_ref(hf, hr, locate, cap)
        assert a_tr == b_tr, trial
        assert a_occ == b_occ, trial
