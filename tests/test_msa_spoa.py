import numpy as np

from vechat_tpu.io.fastx import write_fastx, SeqRecord
from vechat_tpu.ops.encode import encode
from vechat_tpu.ops.graph_align import LinearAligner
from vechat_tpu.ops.poagraph import PoaGraph


def build(seqs, engine=None):
    eng = engine or LinearAligner("nw", 5, -4, -8)
    g = PoaGraph()
    for s in seqs:
        codes = encode(s)
        aln = eng.align(codes, g) if g.num_nodes() else []
        g.add_alignment(aln, codes, np.ones(len(codes), dtype=np.uint32))
    return g


def test_msa_identical():
    g = build(["ACGT", "ACGT", "ACGT"])
    assert g.generate_msa() == ["ACGT"] * 3


def test_msa_with_mismatch_shares_column():
    g = build(["ACGT", "AGGT"])
    msa = g.generate_msa()
    assert msa[0] == "ACGT"
    assert msa[1] == "AGGT"
    assert len(msa[0]) == len(msa[1]) == 4


def test_msa_with_insertion():
    g = build(["ACGT", "ACGGT"])
    msa = g.generate_msa(include_consensus=True)
    assert len(msa) == 3
    width = len(msa[0])
    assert all(len(r) == width for r in msa)
    assert msa[0].replace("-", "") == "ACGT"
    assert msa[1].replace("-", "") == "ACGGT"


def test_gfa_output():
    g = build(["ACGT", "ACGT"])
    g.generate_consensus()
    gfa = g.to_gfa(["s1", "s2"], include_consensus=True)
    lines = gfa.strip().split("\n")
    assert lines[0] == "H\tVN:Z:1.0"
    assert sum(1 for l in lines if l.startswith("S\t")) == 4
    assert sum(1 for l in lines if l.startswith("L\t")) == 3
    paths = [l for l in lines if l.startswith("P\t")]
    assert len(paths) == 3
    assert paths[0] == "P\ts1\t1+,2+,3+,4+\t*"
    assert paths[2].startswith("P\tConsensus\t")


def test_dot_output():
    g = build(["ACG"])
    g.generate_consensus()
    dot = g.to_dot()
    assert dot.startswith("digraph 1 {")
    assert "0 -> 1" in dot


def test_spoa_cli(tmp_path, capsys):
    from vechat_tpu.cli.spoa_main import main

    p = tmp_path / "seqs.fa"
    write_fastx(
        [SeqRecord("s1", "ACGTACGT"), SeqRecord("s2", "ACGTTCGT"), SeqRecord("s3", "ACGTACGT")],
        p,
    )
    rc = main([str(p), "-l", "1", "-r", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    lines = out.strip().split("\n")
    assert lines[0] == ">s1"
    assert ">Consensus" in out
    rows = [lines[i] for i in range(1, len(lines), 2)]
    assert len(set(len(r) for r in rows)) == 1


def test_spoa_cli_strand_ambiguous(tmp_path, capsys):
    from vechat_tpu.cli.spoa_main import main

    fwd = "ACGTACGTACGTAAATTTCCC"
    rc_seq = fwd.translate(str.maketrans("ACGT", "TGCA"))[::-1]
    p = tmp_path / "seqs.fa"
    write_fastx([SeqRecord("f", fwd), SeqRecord("r", rc_seq)], p)
    rc = main([str(p), "-l", "1", "-s", "-r", "0"])
    assert rc == 0
    out = capsys.readouterr().out
    # with strand-ambiguity the consensus matches the forward sequence
    assert fwd in out


def test_spoa_cli_pallas_backend_matches_host(tmp_path, capsys):
    """Device engine (linear/affine/convex kernels) through the spoa CLI must
    reproduce the host engine byte-for-byte (interpret mode on CPU)."""
    import contextlib
    import io

    import vechat_tpu.cli.spoa_main as spoa_main
    import vechat_tpu.ops.kernels.graph_engine as ge

    fa = tmp_path / "in.fa"
    fa.write_text(
        ">a\nACGTACGTAGCTAGCATCGA\n>b\nACGTACGTAGCTAGCATCGA\n"
        ">c\nACGTTACGTAGCTAGCTCGA\n"
    )
    outs = {}
    orig = ge.PallasGraphEngine.__init__

    def patched(self, *a, **k):
        k["interpret"] = True
        orig(self, *a, **k)

    ge.PallasGraphEngine.__init__ = patched
    try:
        for be in ("host", "pallas"):
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                spoa_main.main([str(fa), "--backend", be, "-r", "0", "-r", "1"])
            outs[be] = buf.getvalue()
    finally:
        ge.PallasGraphEngine.__init__ = orig
    assert outs["host"] == outs["pallas"]
    assert ">Consensus" in outs["host"]
