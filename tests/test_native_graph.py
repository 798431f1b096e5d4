"""Native C++ graph runtime vs the Python oracle — full behavioural parity."""

import numpy as np
import pytest

from vechat_tpu.ops.encode import encode, decode
from vechat_tpu.ops.graph_align import LinearAligner
from vechat_tpu.ops.kernels.poa_jax import graph_to_dense
from vechat_tpu.ops.native_graph import NativePoaGraph, native_available
from vechat_tpu.ops.poagraph import PoaGraph

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def mutate(rng, seq, rate=0.12):
    out = []
    for c in seq:
        r = rng.random()
        if r < rate * 0.5:
            out.append(rng.choice([b for b in "ACGT" if b != c]))
        elif r < rate * 0.7:
            continue
        elif r < rate:
            out.append(c)
            out.append(rng.choice(list("ACGT")))
        else:
            out.append(c)
    return "".join(out)


def build_pair(rng, n_seqs=5, length=60):
    """Build Python + native graphs with identical alignment inputs."""
    eng = LinearAligner("nw", 3, -5, -4)
    base = rand_seq(rng, length)
    py = PoaGraph()
    nat = NativePoaGraph()
    for i in range(n_seqs):
        codes = encode(mutate(rng, base))
        w = rng.integers(1, 1000, size=len(codes)).astype(np.uint32)
        aln = eng.align(codes, py) if py.num_nodes() else []
        py.add_alignment(aln, codes, w)
        nat.add_alignment(aln, codes, w)
    return py, nat, base


@pytest.mark.parametrize("seed", range(4))
def test_build_and_dense_parity(seed):
    rng = np.random.default_rng(seed)
    py, nat, _ = build_pair(rng)
    assert nat.num_nodes() == py.num_nodes()
    assert nat.num_edges() == len(py.edges)
    assert nat.max_in_degree() == max(len(v) for v in py.inedges)

    d_py = graph_to_dense(py, 256, 8)
    d_nat = nat.dense(256, 8)
    assert d_nat is not None
    assert (d_nat["codes"] == d_py["codes"]).all()
    assert (d_nat["preds_pn"] == d_py["preds"].T).all()
    assert (d_nat["node_id"] == d_py["node_id"]).all()
    assert (d_nat["is_sink"] == d_py["is_sink"]).all()
    assert d_nat["n_nodes"] == d_py["n_nodes"]


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("mode", ["nw", "sw", "ov"])
def test_native_aligner_parity(seed, mode):
    rng = np.random.default_rng(seed + 10)
    py, nat, base = build_pair(rng)
    host = LinearAligner(mode, 3, -5, -4)
    for _ in range(3):
        q = encode(mutate(rng, base))
        assert nat.align_host(q, mode, 3, -5, -4) == host.align(q, py)


def test_consensus_and_coverage_parity():
    rng = np.random.default_rng(42)
    py, nat, _ = build_pair(rng, n_seqs=6)
    c_py, cov_py = py.generate_consensus_with_coverage()
    c_nat, cov_nat = nat.generate_consensus_with_coverage()
    assert c_nat == c_py
    assert cov_nat == cov_py


@pytest.mark.parametrize("seed", range(3))
def test_prune_largest_addweights_corrected_parity(seed):
    rng = np.random.default_rng(seed + 50)
    py, nat, base = build_pair(rng, n_seqs=6)
    avg = 2.0 * 6 * 60 / 60  # arbitrary but same for both
    py.prune_graph(0, 0.22, 0.19, avg)
    nat.prune_graph(0, 0.22, 0.19, avg)
    assert nat.num_edges() == len(py.edges)

    py2 = py.largest_subgraph()
    nat2 = nat.largest_subgraph()
    assert nat2.num_nodes() == py2.num_nodes()
    d_py = graph_to_dense(py2, 512, 16)
    d_nat = nat2.dense(512, 16)
    assert (d_nat["codes"] == d_py["codes"]).all()
    assert (d_nat["preds_pn"] == d_py["preds"].T).all()

    # realign + AddWeights on both
    sw = LinearAligner("sw", 3, -5, -4)
    for _ in range(3):
        q = encode(mutate(rng, base))
        w = np.ones(len(q), dtype=np.uint32)
        aln = sw.align(q, py2)
        assert nat2.align_host(q, "sw", 3, -5, -4) == aln
        assert py2.add_weights(aln, q, w) == nat2.add_weights(aln, q, w)
    assert nat2.total_edge_weight() == sum(e.weight for e in py2.edges)

    # corrected sequence emit
    q = encode(base)
    aln = sw.align(q, py2)
    assert nat2.generate_corrected_sequence(aln) == py2.generate_corrected_sequence(aln)


def test_subgraph_parity():
    rng = np.random.default_rng(7)
    py, nat, base = build_pair(rng, n_seqs=4, length=80)
    sub_py, map_py = py.subgraph(10, 40)
    sub_nat, map_nat = nat.subgraph(10, 40)
    assert map_nat == map_py
    assert sub_nat.num_nodes() == sub_py.num_nodes()
    q = encode(mutate(rng, base)[:40])
    host = LinearAligner("nw", 3, -5, -4)
    assert sub_nat.align_host(q, "nw", 3, -5, -4) == host.align(q, sub_py)


def test_empty_alignment_addweights_skipped():
    nat = NativePoaGraph()
    nat.add_alignment([], encode("ACGT"), np.ones(4, dtype=np.uint32))
    assert not nat.add_weights([], encode("ACGT"), np.ones(4, dtype=np.uint32))


@pytest.mark.parametrize("mode", ["nw", "sw", "ov"])
def test_lane_batched_aligner_parity(mode):
    """align_host_batch (csrc align_linear_batch, one SIMD lane per seq)
    must be byte-identical to per-sequence align_host — including ragged
    lengths, empty sequences, and batches above the 32-lane chunk size."""
    rng = np.random.default_rng(77)
    _, nat, base = build_pair(rng)
    seqs = [encode(mutate(rng, base)) for _ in range(37)]
    seqs = [s[: int(rng.integers(5, len(s) + 1))] for s in seqs]
    seqs[3] = np.zeros(0, dtype=np.uint8)  # empty lane
    got = nat.align_host_batch(seqs, mode, 3, -5, -4)
    want = [nat.align_host(s, mode, 3, -5, -4) for s in seqs]
    assert got == want


def test_host_backend_groups_same_graph_items():
    """HostAlignerBackend.align_batch routes same-(graph, mode) runs through
    the lane-batched native DP; output order and bytes must match the
    per-item path."""
    from vechat_tpu.pipeline.windows import HostAlignerBackend

    rng = np.random.default_rng(5)
    _, nat_a, base_a = build_pair(rng)
    _, nat_b, base_b = build_pair(rng)
    be = HostAlignerBackend(3, -5, -4, threads=2)
    items = []
    for k in range(14):
        graph, base = (nat_a, base_a) if k % 3 else (nat_b, base_b)
        mode = "sw" if k % 2 else "nw"
        items.append((encode(mutate(rng, base)), graph, mode))
    got = be.align_batch(items)
    want = [be._align_one(it) for it in items]
    assert got == want


def test_lane_batched_aligner_int32_fallback():
    """Scores whose worst case exceeds int16 range must route to the int32
    template instantiation and still match the scalar path byte-for-byte."""
    rng = np.random.default_rng(21)
    _, nat, base = build_pair(rng)
    seqs = [encode(mutate(rng, base)) for _ in range(8)]
    got = nat.align_host_batch(seqs, "nw", 25, -25, -25)
    want = [nat.align_host(s, "nw", 25, -25, -25) for s in seqs]
    assert got == want
