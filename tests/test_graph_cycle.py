"""Oracle-parity tests for the device-resident graph ops (graph_cycle.py).

Every op of the haplotype prune cycle — PruneGraph, largest-CC renumbering,
topological ranking, mixed-mode realignment, AddWeights, corrected emit —
is compared against the host oracle (ops/poagraph.PoaGraph), whose semantics
are byte-verified against the reference binary (scripts/diff_reference.py).
"""

import copy
import os

import numpy as np
import pytest

import jax.numpy as jnp

from vechat_tpu.ops.encode import encode
from vechat_tpu.ops.graph_align import LinearAligner
from vechat_tpu.ops.kernels import graph_cycle as gc
from vechat_tpu.ops.kernels.poa_jax import graph_to_dense
from vechat_tpu.ops.poagraph import PoaGraph

ENG = LinearAligner("nw", 3, -5, -4)
SW = LinearAligner("sw", 3, -5, -4)
N, E, P, A = 192, 384, 16, 32


def _noisy(rng, base, sub=0.05, dele=0.03, ins=0.02):
    out = []
    for c in base:
        r = rng.random()
        if r < sub:
            out.append(rng.choice(list("ACGT")))
        elif r < sub + dele:
            continue
        else:
            out.append(c)
        if rng.random() < ins:
            out.append(rng.choice(list("ACGT")))
    return "".join(out)


def _build_window(rng, base_len=50, depth=6):
    base = "".join(rng.choice(list("ACGT"), size=base_len))
    strain2 = list(base)
    for i in range(5, base_len, 13):
        strain2[i] = rng.choice(list("ACGT"))
    strain2 = "".join(strain2)
    g = PoaGraph()
    seqs = []
    backbone = encode(_noisy(rng, base))
    g.add_alignment([], backbone, np.ones(len(backbone), np.uint32))
    seqs.append(backbone)
    for k in range(depth - 1):
        src = strain2 if k % 2 else base
        q = encode(_noisy(rng, src))
        aln = ENG.align(q, g)
        g.add_alignment(aln, q, np.ones(len(q), np.uint32))
        seqs.append(q)
    return g, seqs


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(11)
    B = 3
    graphs, seqlists = [], []
    for _ in range(B):
        g, seqs = _build_window(rng)
        graphs.append(g)
        seqlists.append(seqs)
    packs = [gc.graph_to_edges(g, N, E) for g in graphs]
    assert all(p is not None for p in packs)
    arr = lambda k, dt: jnp.asarray(np.stack([p[k] for p in packs]).astype(dt))
    d = dict(
        graphs=graphs,
        seqlists=seqlists,
        tails=arr("tails", np.int32),
        heads=arr("heads", np.int32),
        weights=arr("weights", np.int32),
        codes=arr("codes", np.int32),
        n_nodes=jnp.asarray([p["n_nodes"] for p in packs], jnp.int32),
        n_edges=jnp.asarray([p["n_edges"] for p in packs], jnp.int32),
        avg=jnp.asarray(
            [
                2.0 * sum(len(q) for q in sl) / len(sl[0])
                for sl in seqlists
            ],
            jnp.float32,
        ),
    )
    d["valid"] = jnp.arange(E)[None, :] < d["n_edges"][:, None]
    d["alive"] = jnp.arange(N)[None, :] < d["n_nodes"][:, None]
    return d


@pytest.fixture(scope="module")
def pruned(batch):
    """Device prune + rebuild chain, with the oracle run alongside."""
    keep = gc.prune_edges(
        batch["tails"], batch["heads"], batch["weights"], batch["valid"],
        N, batch["avg"], jnp.float32(0.2), jnp.float32(0.2),
    )
    oracle = []
    for b, g in enumerate(batch["graphs"]):
        go = copy.deepcopy(g)
        go.prune_graph(0, 0.2, 0.2, float(batch["avg"][b]))
        oracle.append(go)
    labels = gc.cc_min_labels(batch["tails"], batch["heads"], keep, batch["alive"])
    comp, root = gc.select_component(labels, batch["alive"])
    adj, deg, ovf = gc.build_undirected_adjacency(
        batch["tails"], batch["heads"], keep, N, A
    )
    assert not bool(jnp.any(ovf))
    new_id, order, n_sub = gc.dfs_preorder(adj, deg, comp, root)
    t2, h2, w2, v2, ne2, codes2 = gc.renumber_subgraph(
        batch["tails"], batch["heads"], keep, new_id, order, batch["codes"]
    )
    in_nbr, indeg, out_deg, ovf_p = gc.build_in_slots(t2, h2, v2, N, P)
    assert not bool(jnp.any(ovf_p))
    rank_of, rank_to_node = gc.topo_ranks(in_nbr, indeg, n_sub)
    codes_dp, preds_dp, is_sink = gc.build_dp_arrays(
        rank_of, rank_to_node, in_nbr, indeg, out_deg, codes2, n_sub
    )
    return dict(
        keep=keep, oracle=oracle, subs=[g.largest_subgraph() for g in oracle],
        n_sub=n_sub, t2=t2, h2=h2, w2=w2, v2=v2, ne2=ne2, codes2=codes2,
        rank_of=rank_of, rank_to_node=rank_to_node,
        codes_dp=codes_dp, preds_dp=preds_dp, is_sink=is_sink,
    )


def test_prune_parity(batch, pruned):
    keep = np.asarray(pruned["keep"])
    for b, go in enumerate(pruned["oracle"]):
        kept = [(e.tail, e.head, e.weight) for e in go.edges]
        dev = [
            (
                int(batch["tails"][b, i]),
                int(batch["heads"][b, i]),
                int(batch["weights"][b, i]),
            )
            for i in range(int(batch["n_edges"][b]))
            if keep[b, i]
        ]
        assert kept == dev
        assert len(kept) > 0  # the fixture must exercise real pruning


def test_largest_subgraph_renumber_parity(pruned):
    for b, sub in enumerate(pruned["subs"]):
        n = int(pruned["n_sub"][b])
        assert n == sub.num_nodes()
        assert list(np.asarray(pruned["codes2"][b, :n])) == list(sub.codes)
        or_edges = [(e.tail, e.head, e.weight) for e in sub.edges]
        dev_edges = [
            (
                int(pruned["t2"][b, i]),
                int(pruned["h2"][b, i]),
                int(pruned["w2"][b, i]),
            )
            for i in range(int(pruned["ne2"][b]))
        ]
        assert or_edges == dev_edges


def test_topo_rank_parity(pruned):
    for b, sub in enumerate(pruned["subs"]):
        n = int(pruned["n_sub"][b])
        dev = [int(x) for x in pruned["rank_to_node"][b, :n]]
        assert dev == list(sub.rank_to_node)


def test_dp_array_parity(pruned):
    for b, sub in enumerate(pruned["subs"]):
        dref = graph_to_dense(sub, N, P)
        n = int(pruned["n_sub"][b])
        assert list(np.asarray(pruned["codes_dp"][b, :n])) == list(
            dref["codes"][:n]
        )
        assert np.array_equal(
            np.asarray(pruned["preds_dp"][b, :n]), dref["preds"][:n]
        )
        assert np.array_equal(
            np.asarray(pruned["is_sink"][b, :n]), dref["is_sink"][:n]
        )


@pytest.fixture(scope="module")
def realigned(batch, pruned):
    seqlists = batch["seqlists"]
    B = len(seqlists)
    D = max(len(sl) for sl in seqlists)
    S = max(max(len(q) for q in sl) for sl in seqlists) + 8
    seq_arr = np.full((B, D, S), 0xFF, np.int32)
    slen = np.ones((B, D), np.int32)
    is_sw = np.zeros((B, D), bool)
    d_used = np.zeros(B, np.int32)
    for b, sl in enumerate(seqlists):
        d_used[b] = len(sl)
        for i, q in enumerate(sl):
            seq_arr[b, i, : len(q)] = q
            slen[b, i] = len(q)
            is_sw[b, i] = i % 2 == 1
    pairs, count, _ = gc.poa_align_mixed(
        pruned["codes_dp"], pruned["preds_dp"], pruned["is_sink"],
        pruned["n_sub"], jnp.asarray(seq_arr), jnp.asarray(slen),
        jnp.asarray(is_sw), 3, -5, -4,
    )
    pairs_ids = gc.ranks_to_ids(pairs, pruned["rank_to_node"])
    return dict(
        pairs_ids=pairs_ids, count=np.asarray(count), seq_arr=seq_arr,
        slen=slen, is_sw=is_sw, d_used=d_used, S=S, D=D,
    )


def test_mixed_mode_align_parity(batch, pruned, realigned):
    pairs_ids = np.asarray(realigned["pairs_ids"])
    L = pairs_ids.shape[2]
    for b, sub in enumerate(pruned["subs"]):
        for i in range(int(realigned["d_used"][b])):
            q = batch["seqlists"][b][i]
            eng = SW if realigned["is_sw"][b, i] else ENG
            ref = eng.align(q, sub)
            c = int(realigned["count"][b, i])
            dev = [
                tuple(int(v) for v in row) for row in pairs_ids[b, i, L - c:]
            ]
            assert dev == ref


def test_add_weights_parity(batch, pruned, realigned):
    B = len(batch["seqlists"])
    D, S = realigned["D"], realigned["S"]
    or2 = [copy.deepcopy(s) for s in pruned["subs"]]
    for b, sub in enumerate(or2):
        for i in range(int(realigned["d_used"][b])):
            q = batch["seqlists"][b][i]
            eng = SW if realigned["is_sw"][b, i] else ENG
            aln = eng.align(q, sub)
            sub.add_weights(aln, q, np.ones(len(q), np.uint32))
    seq_w = np.ones((B, D, S), np.int32)
    masked = np.where(
        np.arange(D)[None, :, None, None]
        < realigned["d_used"][:, None, None, None],
        np.asarray(realigned["pairs_ids"]),
        -2,
    )
    t3, h3, w3, v3, ne3, ovf = gc.add_weights_batch(
        pruned["t2"], pruned["h2"], pruned["w2"], pruned["v2"],
        pruned["ne2"], jnp.asarray(masked), jnp.asarray(seq_w), N,
    )
    assert not bool(jnp.any(ovf))
    for b, sub in enumerate(or2):
        or_edges = [(e.tail, e.head, e.weight) for e in sub.edges]
        dev_edges = [
            (int(t3[b, i]), int(h3[b, i]), int(w3[b, i]))
            for i in range(int(ne3[b]))
            if bool(v3[b, i])
        ]
        assert or_edges == dev_edges


def test_add_weights_new_edge_creation():
    """AddWeights re-creates a missing edge between surviving nodes via
    AddEdge, appended after existing edges in first-occurrence order
    (graph.cpp:1104-1165); weights accumulate across sequences."""
    # chain 0->1->2->3 plus a detour 0->4->3; alignments will traverse the
    # non-existent shortcut 1->3 (as if node 2 had been pruned away)
    g = PoaGraph()
    for c in [0, 1, 2, 3, 1]:
        g.add_node(c)
    g.add_edge(0, 1, 0)
    g.add_edge(1, 2, 0)
    g.add_edge(2, 3, 0)
    g.add_edge(0, 4, 0)
    g.add_edge(4, 3, 0)
    g.sequences.append(0)
    g.topological_sort()

    # two sequences: both walk 0 -> 1 -> 3 (pair stream order fixed), the
    # second also walks 4 -> 1 (a second new edge, created later)
    aln1 = [(0, 0), (1, 1), (3, 2)]
    aln2 = [(0, 0), (4, 1), (1, 2), (3, 3)]
    go = copy.deepcopy(g)
    go.add_weights(aln1, np.zeros(3, np.uint8), np.ones(3, np.uint32))
    go.add_weights(aln2, np.zeros(4, np.uint8), np.ones(4, np.uint32))

    ed = gc.graph_to_edges(g, 8, 16)
    L = 6
    pairs = np.full((1, 2, L, 2), -2, np.int32)
    pairs[0, 0, L - 3:] = [[0, 0], [1, 1], [3, 2]]
    pairs[0, 1, L - 4:] = [[0, 0], [4, 1], [1, 2], [3, 3]]
    seq_w = np.ones((1, 2, 8), np.int32)
    t3, h3, w3, v3, ne3, ovf = gc.add_weights_batch(
        jnp.asarray(ed["tails"][None]), jnp.asarray(ed["heads"][None]),
        jnp.asarray(ed["weights"][None]),
        jnp.asarray((np.arange(16) < ed["n_edges"])[None]),
        jnp.asarray([ed["n_edges"]], jnp.int32),
        jnp.asarray(pairs), jnp.asarray(seq_w), 8,
    )
    assert not bool(ovf[0])
    or_edges = [(e.tail, e.head, e.weight) for e in go.edges]
    dev_edges = [
        (int(t3[0, i]), int(h3[0, i]), int(w3[0, i]))
        for i in range(int(ne3[0]))
        if bool(v3[0, i])
    ]
    assert or_edges == dev_edges
    assert int(ne3[0]) == ed["n_edges"] + 2  # 1->3 then 4->1 appended


def test_corrected_emit_parity(batch, pruned, realigned):
    B = len(batch["seqlists"])
    seq_arr = realigned["seq_arr"]
    slen = realigned["slen"]
    bb_pairs, _, _ = gc.poa_align_mixed(
        pruned["codes_dp"], pruned["preds_dp"], pruned["is_sink"],
        pruned["n_sub"], jnp.asarray(seq_arr[:, :1]),
        jnp.asarray(slen[:, :1]), jnp.ones((B, 1), bool), 3, -5, -4,
    )
    bb_ids = gc.ranks_to_ids(bb_pairs, pruned["rank_to_node"])
    out, out_len = gc.corrected_emit(bb_ids[:, 0], pruned["codes2"])
    for b, sub in enumerate(pruned["subs"]):
        aln = SW.align(batch["seqlists"][b][0], sub)
        ref = sub.generate_corrected_sequence(aln)
        dev = list(np.asarray(out[b, : int(out_len[b])]))
        assert dev == list(ref)


def test_full_driver_parity():
    """generate_consensus_haplotype: host path vs device cycle must be
    byte-identical across windows with partial layers and mixed modes."""
    from vechat_tpu.ops.kernels.poa_jax import JaxAlignerBackend
    from vechat_tpu.pipeline.windows import (
        HostAlignerBackend,
        Window,
        generate_consensus_haplotype,
    )

    rng = np.random.default_rng(23)
    wins = []
    for k in range(4):
        base_len = 60 + 10 * k
        base = "".join(rng.choice(list("ACGT"), size=base_len))
        strain2 = list(base)
        for i in range(5, base_len, 19):
            strain2[i] = rng.choice(list("ACGT"))
        strain2 = "".join(strain2)
        w = Window(
            target_id=0, rank=k, window_type=1,
            backbone_codes=encode(_noisy(rng, base)),
            backbone_quality=None, if_fasta=True,
        )
        blen = len(w.backbone_codes)
        for j in range(6):
            src = strain2 if j % 2 else base
            b0 = int(rng.integers(0, 5))
            e0 = blen - 1 - int(rng.integers(0, 5))
            seg = src[
                int(b0 / blen * len(src)) : int((e0 + 1) / blen * len(src))
            ]
            codes = encode(_noisy(rng, seg))
            if len(codes) == 0 or b0 >= e0:
                continue
            w.add_layer(codes, None, b0, e0)
        wins.append(w)

    host_wins = copy.deepcopy(wins)
    generate_consensus_haplotype(
        host_wins, HostAlignerBackend(3, -5, -4), 0.2, 0.2, 3
    )

    dev_wins = copy.deepcopy(wins)
    os.environ["VECHAT_DEVICE_CYCLE"] = "1"
    try:
        generate_consensus_haplotype(
            dev_wins, JaxAlignerBackend(3, -5, -4), 0.2, 0.2, 3
        )
    finally:
        del os.environ["VECHAT_DEVICE_CYCLE"]

    for hw, dw in zip(host_wins, dev_wins):
        assert list(hw.consensus_codes) == list(dw.consensus_codes)
        assert hw.polished == dw.polished
