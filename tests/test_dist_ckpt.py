"""Distribution helpers + graph checkpoint round-trip."""

import numpy as np

from vechat_tpu.io.fastx import SeqRecord
from vechat_tpu.ops.encode import encode, decode
from vechat_tpu.ops.graph_align import LinearAligner
from vechat_tpu.ops.poagraph import PoaGraph
from vechat_tpu.parallel.dist import (
    ProcessGroup,
    merge_shard_files,
    shard_bounds,
    shard_output_path,
    shard_targets,
)


def test_shard_bounds_cover_all():
    for n in (0, 1, 7, 8, 100):
        got = []
        for pid in range(8):
            b, e = shard_bounds(n, ProcessGroup(pid, 8))
            got.extend(range(b, e))
        assert got == list(range(n))


def test_shard_targets():
    reads = [SeqRecord(f"r{i}", "ACGT") for i in range(10)]
    g0 = shard_targets(reads, ProcessGroup(0, 3))
    g1 = shard_targets(reads, ProcessGroup(1, 3))
    g2 = shard_targets(reads, ProcessGroup(2, 3))
    assert [r.name for r in g0 + g1 + g2] == [r.name for r in reads]


def test_merge_shard_files(tmp_path):
    out = str(tmp_path / "out.fa")
    for pid in range(3):
        with open(shard_output_path(out, ProcessGroup(pid, 3)), "w") as fw:
            fw.write(f">r{pid}\nACGT\n")
    merge_shard_files(out, ProcessGroup(0, 3))
    assert open(out).read() == ">r0\nACGT\n>r1\nACGT\n>r2\nACGT\n"


def test_graph_checkpoint_roundtrip(tmp_path):
    eng = LinearAligner("nw", 5, -4, -8)
    g = PoaGraph()
    for s in ["ACGTACGT", "ACGTTCGT", "AGGTACGT"]:
        codes = encode(s)
        aln = eng.align(codes, g) if g.num_nodes() else []
        g.add_alignment(aln, codes, np.ones(len(codes), dtype=np.uint32))
    g.generate_consensus()

    path = tmp_path / "graph.npz"
    g.save(path)
    g2 = PoaGraph.load(path)

    assert g2.codes == g.codes
    assert g2.rank_to_node == g.rank_to_node
    assert g2.aligned == g.aligned
    assert [(e.tail, e.head, e.weight, e.labels) for e in g2.edges] == [
        (e.tail, e.head, e.weight, e.labels) for e in g.edges
    ]
    # behaviour after reload: same consensus, same alignment results
    assert decode(g2.generate_consensus()) == decode(g.generate_consensus())
    q = encode("ACGTACGA")
    assert eng.align(q, g2) == eng.align(q, g)
    # MSA still works (uses labels + sequences)
    assert g2.generate_msa() == g.generate_msa()
