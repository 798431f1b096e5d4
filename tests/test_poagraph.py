import numpy as np
import pytest

from vechat_tpu.ops.encode import encode, decode
from vechat_tpu.ops.graph_align import LinearAligner, make_engine
from vechat_tpu.ops.poagraph import PoaGraph


def build_graph(seqs, engine=None, weights=None):
    """Incremental POA build like spoa's CLI: align then fuse, in order."""
    if engine is None:
        engine = LinearAligner("nw", 5, -4, -8)
    g = PoaGraph()
    for idx, s in enumerate(seqs):
        codes = encode(s)
        w = (
            np.ones(len(codes), dtype=np.uint32)
            if weights is None
            else np.asarray(weights[idx], dtype=np.uint32)
        )
        aln = engine.align(codes, g) if g.num_nodes() else []
        g.add_alignment(aln, codes, w)
    return g


def naive_nw(a, b, m, n, g):
    """Independent sequence-to-sequence NW for cross-checking chain graphs."""
    H = np.zeros((len(a) + 1, len(b) + 1), dtype=np.int64)
    H[0, :] = np.arange(len(b) + 1) * g
    H[:, 0] = np.arange(len(a) + 1) * g
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            sub = m if a[i - 1] == b[j - 1] else n
            H[i, j] = max(H[i - 1, j - 1] + sub, H[i - 1, j] + g, H[i, j - 1] + g)
    return int(H[len(a), len(b)])


def alignment_score(aln, graph, codes, m, n, g):
    s = 0
    for node_id, pos in aln:
        if node_id == -1 or pos == -1:
            s += g
        else:
            s += m if graph.codes[node_id] == codes[pos] else n
    return s


def test_single_sequence_graph():
    g = build_graph(["ACGT"])
    assert g.num_nodes() == 4
    assert len(g.edges) == 3
    assert g.rank_to_node == [0, 1, 2, 3]
    assert decode(g.generate_consensus()) == "ACGT"


def test_identical_sequence_merges():
    g = build_graph(["ACGT", "ACGT"])
    assert g.num_nodes() == 4
    assert len(g.edges) == 3
    assert all(e.weight == 2 + 2 for e in g.edges)  # 1+1 twice
    assert decode(g.generate_consensus()) == "ACGT"


def test_mismatch_creates_aligned_node():
    g = build_graph(["ACGT", "AGGT"])
    assert g.num_nodes() == 5
    # node 1 (C) and node 4 (G) are aligned partners
    assert g.aligned[1] == [4]
    assert g.aligned[4] == [1]
    # aligned bundle stays adjacent in rank order
    r = g.rank_to_node
    assert abs(r.index(1) - r.index(4)) == 1


def test_majority_consensus():
    g = build_graph(["ACGT", "AGGT", "AGGT"])
    assert decode(g.generate_consensus()) == "AGGT"


def test_insertion_and_deletion():
    g = build_graph(["ACGT", "ACGGT", "ACGGT"])
    assert decode(g.generate_consensus()) == "ACGGT"
    g = build_graph(["ACGGT", "ACGT", "ACGT"])
    assert decode(g.generate_consensus()) == "ACGT"


@pytest.mark.parametrize("seed", range(5))
def test_nw_score_matches_naive_on_chain(seed):
    rng = np.random.default_rng(seed)
    a = "".join(rng.choice(list("ACGT"), size=rng.integers(5, 40)))
    b = "".join(rng.choice(list("ACGT"), size=rng.integers(5, 40)))
    g = build_graph([a])
    eng = LinearAligner("nw", 3, -5, -4)
    aln, score = eng.align(encode(b), g, return_score=True)
    assert score == naive_nw(a, b, 3, -5, -4)
    assert score == alignment_score(aln, g, encode(b), 3, -5, -4)


def test_nw_alignment_path_valid():
    g = build_graph(["ACGTACGT"])
    eng = LinearAligner("nw", 3, -5, -4)
    aln = eng.align(encode("ACGTTACGT"), g)
    # every sequence position appears exactly once, in order
    positions = [p for _, p in aln if p != -1]
    assert positions == list(range(9))
    # node ids strictly follow graph edges for consecutive non-gap nodes
    nodes = [v for v, _ in aln if v != -1]
    assert nodes == sorted(nodes)


def test_sw_local_alignment():
    g = build_graph(["TTTTACGTACGTTTTT"])
    eng = LinearAligner("sw", 3, -5, -4)
    aln, score = eng.align(encode("ACGTACGT"), g, return_score=True)
    assert score == 8 * 3
    nodes = [v for v, _ in aln if v != -1]
    assert decode([g.codes[v] for v in nodes]) == "ACGTACGT"


def test_ov_alignment():
    g = build_graph(["AAAACGT"])
    eng = LinearAligner("ov", 3, -5, -4)
    aln, score = eng.align(encode("ACGTTTT"), g, return_score=True)
    # overlap alignment finds the ACGT overlap
    assert score > 0


def test_empty_inputs():
    g = PoaGraph()
    eng = LinearAligner("nw", 3, -5, -4)
    assert eng.align(encode("ACGT"), g) == []
    g = build_graph(["ACGT"])
    assert eng.align(np.asarray([], dtype=np.uint8), g) == []


def test_subgraph_and_update_alignment():
    g = build_graph(["ACGTACGTAC"])
    sub, mapping = g.subgraph(2, 5)
    assert sub.num_nodes() == 4  # backbone nodes 2..5
    eng = LinearAligner("nw", 3, -5, -4)
    aln = eng.align(encode("GTAC"), sub)
    aln = PoaGraph.update_alignment(mapping, aln)
    nodes = [v for v, _ in aln if v != -1]
    assert nodes == [2, 3, 4, 5]


def test_prune_graph():
    # backbone A-C-G-T plus a heavy alternate path A-G(G)-G-T via mismatch
    g = build_graph(["ACGT"] + ["AGGT"] * 9)
    total_before = len(g.edges)
    # C-node edges have weight 2 each; G-path edges weight 18
    # average weight chosen so support kills only the weak edges
    g.prune_graph(0, 0.22, 0.19, 2.0 * (4 + 9 * 4) / 4)
    assert len(g.edges) < total_before
    kept_nodes = {e.tail for e in g.edges} | {e.head for e in g.edges}
    assert 1 not in kept_nodes  # the C node lost all edges


def test_largest_subgraph_after_prune():
    g = build_graph(["ACGT"] + ["AGGT"] * 9)
    g.prune_graph(0, 0.22, 0.19, 2.0 * 40 / 4)
    sub = g.largest_subgraph()
    assert sub.num_nodes() == 4
    assert decode([sub.codes[v] for v in sub.rank_to_node]) == "AGGT"
    # weights reset to zero (reference: graph.cpp:1082)
    assert all(e.weight == 0 for e in sub.edges)


def test_add_weights_and_corrected_sequence():
    g = build_graph(["ACGT"] + ["AGGT"] * 9)
    g.prune_graph(0, 0.22, 0.19, 2.0 * 40 / 4)
    sub = g.largest_subgraph()
    local = LinearAligner("sw", 3, -5, -4)
    codes = encode("AGGT")
    aln = local.align(codes, sub)
    assert sub.add_weights(aln, codes, np.ones(4, dtype=np.uint32))
    assert sum(e.weight for e in sub.edges) > 0
    # empty alignment -> read skipped
    assert not sub.add_weights([], codes, np.ones(4, dtype=np.uint32))
    corrected = sub.generate_corrected_sequence(local.align(encode("ACGT"), sub))
    # SW of ACGT vs AGGT: best local score 6 = the trailing "GT" match
    assert decode(corrected) == "GT"


def test_generate_consensus_with_coverage():
    g = build_graph(["ACGT", "ACGT", "ACGT"])
    codes, cov = g.generate_consensus_with_coverage()
    assert decode(codes) == "ACGT"
    assert cov == [3, 3, 3, 3]


def test_make_engine_subtype_selection():
    from vechat_tpu.ops.graph_align import AffineAligner, ConvexAligner

    assert isinstance(make_engine("nw", 3, -5, -4), LinearAligner)
    # g < e with defaults q=g, c=e -> affine
    assert isinstance(make_engine("nw", 5, -4, -8, -6), AffineAligner)
    # spoa CLI defaults -> convex (g>q and e<c)
    assert isinstance(make_engine("sw", 5, -4, -8, -6, -10, -4), ConvexAligner)
