import gzip

import pytest

from vechat_tpu.io import read_fastx, write_fasta, write_fastx, read_paf, write_paf
from vechat_tpu.io.fastx import sniff_format, format_from_suffix
from vechat_tpu.io.paf import PafRecord


def test_fasta_roundtrip(tmp_path):
    p = tmp_path / "x.fa"
    p.write_text(">r1 desc ignored\nACGT\nacgt\n>r2\nTTTT\n")
    recs = read_fastx(p)
    assert [r.name for r in recs] == ["r1", "r2"]
    assert recs[0].data == "ACGTACGT"  # multi-line + uppercased
    assert recs[0].quality is None
    out = tmp_path / "o.fa"
    write_fasta(recs, out)
    assert out.read_text() == ">r1\nACGTACGT\n>r2\nTTTT\n"


def test_fastq_parse_and_dummy_quality(tmp_path):
    p = tmp_path / "x.fq"
    p.write_text("@r1\nACGT\n+\nIIII\n@r2\nGGGG\n+\n!!!!\n")
    recs = read_fastx(p)
    assert recs[0].quality == "IIII"
    # all-'!' quality treated as absent (reference: src/sequence.cpp:34-42)
    assert recs[1].quality is None


def test_fastq_gz_and_sniff(tmp_path):
    p = tmp_path / "x.custom.gz"
    with gzip.open(p, "wt") as fw:
        fw.write("@r1\nACGT\n+\nIIII\n")
    assert sniff_format(p) == "fq"
    recs = read_fastx(p)
    assert recs[0].data == "ACGT"


def test_format_from_suffix():
    assert format_from_suffix("a.fasta.gz") == "fa"
    assert format_from_suffix("a.fq") == "fq"
    with pytest.raises(ValueError):
        format_from_suffix("a.paf")


def test_reverse_complement():
    recs = read_fastx  # silence lint
    from vechat_tpu.io import SeqRecord

    r = SeqRecord(name="x", data="AACGTN", quality="012345")
    assert r.reverse_complement == "NACGTT"
    assert r.reverse_quality == "543210"


def test_write_fastq(tmp_path):
    from vechat_tpu.io import SeqRecord

    p = tmp_path / "o.fq"
    write_fastx([SeqRecord("a", "ACG", "III"), SeqRecord("b", "TT")], p, fmt="fq")
    assert p.read_text() == "@a\nACG\n+\nIII\n@b\nTT\n+\n!!\n"


def test_paf_roundtrip(tmp_path):
    p = tmp_path / "x.paf"
    line = "q1\t100\t5\t95\t-\tt1\t200\t10\t105\t80\t95\t60\tcg:Z:90M5I\n"
    p.write_text(line)
    recs = read_paf(p)
    r = recs[0]
    assert (r.q_name, r.t_name) == ("q1", "t1")
    assert r.strand is True
    assert r.cigar == "90M5I"
    assert r.length == 95
    assert abs(r.error - (1 - 90 / 95)) < 1e-12
    out = tmp_path / "o.paf"
    write_paf(recs, out)
    assert out.read_text() == line


def test_sam(tmp_path):
    p = tmp_path / "x.sam"
    p.write_text(
        "@HD\tVN:1.6\n"
        "q1\t0\tt1\t11\t60\t5S10M2I3M1D4M\t*\t0\t0\t*\t*\n"
        "q2\t16\tt1\t1\t60\t10M\t*\t0\t0\t*\t*\n"
        "q3\t4\tt1\t1\t60\t*\t*\t0\t0\t*\t*\n"
    )
    recs = read_paf(p)
    assert len(recs) == 2  # unmapped q3 dropped (flag 0x4)
    r = recs[0]
    # reference semantics: src/overlap.cpp:44-108
    assert (r.q_begin, r.q_end, r.q_length) == (5, 24, 24)
    assert (r.t_begin, r.t_end) == (10, 28)
    assert not r.strand and r.cigar == "5S10M2I3M1D4M"
    assert recs[1].strand


def test_mhap(tmp_path):
    p = tmp_path / "x.mhap"
    p.write_text("1 2 0.05 17 0 5 95 100 1 10 105 200\n")
    r = read_paf(p)[0]
    assert (r.q_name, r.t_name) == ("#0", "#1")
    assert r.strand is True  # 0 ^ 1
    assert (r.q_begin, r.t_end) == (5, 105)
