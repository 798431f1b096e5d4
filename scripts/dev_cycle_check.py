"""Dev scratch: validate graph_cycle device ops against the host oracle,
step by step. Run with JAX_PLATFORMS=cpu."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from vechat_tpu.ops.encode import encode
from vechat_tpu.ops.graph_align import LinearAligner
from vechat_tpu.ops.poagraph import PoaGraph
from vechat_tpu.ops.kernels import graph_cycle as gc
from vechat_tpu.ops.kernels.poa_jax import graph_to_dense

rng = np.random.default_rng(7)
ENG = LinearAligner("nw", 3, -5, -4)
SW = LinearAligner("sw", 3, -5, -4)


def noisy(base, sub=0.05, dele=0.03, ins=0.02):
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


def build_window(base_len=60, depth=6, two_strain=True):
    base = "".join(rng.choice(list("ACGT"), size=base_len))
    strain2 = list(base)
    for i in range(5, base_len, 17):
        strain2[i] = rng.choice(list("ACGT"))
    strain2 = "".join(strain2)
    g = PoaGraph()
    seqs = []
    backbone = encode(noisy(base))
    g.add_alignment([], backbone, np.ones(len(backbone), np.uint32))
    seqs.append(backbone)
    for k in range(depth - 1):
        src = strain2 if (two_strain and k % 2) else base
        q = encode(noisy(src))
        aln = ENG.align(q, g)
        g.add_alignment(aln, q, np.ones(len(q), np.uint32))
        seqs.append(q)
    return g, seqs


def main():
    N, E, P, A = 256, 512, 16, 32
    B = 3
    graphs, seqlists = [], []
    for _ in range(B):
        g, seqs = build_window()
        graphs.append(g)
        seqlists.append(seqs)

    packs = [gc.graph_to_edges(g, N, E) for g in graphs]
    assert all(p is not None for p in packs)
    tails = jnp.asarray(np.stack([p["tails"] for p in packs]))
    heads = jnp.asarray(np.stack([p["heads"] for p in packs]))
    weights = jnp.asarray(np.stack([p["weights"] for p in packs]))
    codes = jnp.asarray(np.stack([p["codes"] for p in packs]))
    n_nodes = jnp.asarray(np.array([p["n_nodes"] for p in packs], np.int32))
    n_edges = jnp.asarray(np.array([p["n_edges"] for p in packs], np.int32))
    valid = jnp.arange(E)[None, :] < n_edges[:, None]

    d, s = 0.2, 0.2
    # FASTA semantics: total_bases_weight = sum of lengths (weight 1/base),
    # average_weight = 2 * total / window_len (src/window.cpp:301-309)
    avg_w = jnp.asarray(
        np.array(
            [2.0 * sum(len(q) for q in sl) / len(sl[0]) for sl in seqlists],
            np.float32,
        )
    )

    # ---- 1. prune parity
    keep = np.asarray(
        gc.prune_edges(tails, heads, weights, valid, N, avg_w,
                       jnp.float32(d), jnp.float32(s))
    )
    import copy
    pruned_or = []
    for b, g in enumerate(graphs):
        go = copy.deepcopy(g)
        go.prune_graph(0, d, s, float(avg_w[b]))
        pruned_or.append(go)
        kept = [(e.tail, e.head, e.weight) for e in go.edges]
        dev = [
            (int(tails[b, i]), int(heads[b, i]), int(weights[b, i]))
            for i in range(int(n_edges[b]))
            if keep[b, i]
        ]
        assert kept == dev, (b, kept[:5], dev[:5])
    print("prune parity OK", [len(p.edges) for p in pruned_or])

    # ---- 2. CC + selection + DFS renumber + rebuild parity
    keep_j = jnp.asarray(keep)
    labels = gc.cc_min_labels(tails, heads, keep_j, None or (jnp.arange(N)[None, :] < n_nodes[:, None]))
    comp, root = gc.select_component(labels, jnp.arange(N)[None, :] < n_nodes[:, None])
    adj, deg, ovf = gc.build_undirected_adjacency(tails, heads, keep_j, N, A)
    assert not bool(jnp.any(ovf))
    new_id, order, n_sub = gc.dfs_preorder(adj, deg, comp, root)
    t2, h2, w2, v2, ne2, codes2 = gc.renumber_subgraph(
        tails, heads, keep_j, new_id, order, codes
    )
    subs = [p.largest_subgraph() for p in pruned_or]
    for b, sub in enumerate(subs):
        assert int(n_sub[b]) == sub.num_nodes(), (b, int(n_sub[b]), sub.num_nodes())
        dev_codes = np.asarray(codes2[b, : int(n_sub[b])])
        assert list(dev_codes) == list(sub.codes), b
        or_edges = [(e.tail, e.head, e.weight) for e in sub.edges]
        dev_edges = [
            (int(t2[b, i]), int(h2[b, i]), int(w2[b, i]))
            for i in range(int(ne2[b]))
        ]
        assert or_edges == dev_edges, (b, or_edges[:8], dev_edges[:8])
    print("largest-subgraph renumber parity OK", [int(x) for x in n_sub])

    # ---- 3. topo rank parity
    in_nbr, indeg, out_deg, ovf_p = gc.build_in_slots(t2, h2, v2, N, P)
    assert not bool(jnp.any(ovf_p))
    rank_of, rank_to_node = gc.topo_ranks(in_nbr, indeg, n_sub)
    for b, sub in enumerate(subs):
        dev = [int(x) for x in rank_to_node[b, : int(n_sub[b])]]
        assert dev == list(sub.rank_to_node), (b, dev[:10], sub.rank_to_node[:10])
    print("topo rank parity OK")

    # ---- 4. DP arrays parity
    codes_dp, preds_dp, is_sink = gc.build_dp_arrays(
        rank_of, rank_to_node, in_nbr, indeg, out_deg, codes2, n_sub
    )
    for b, sub in enumerate(subs):
        dref = graph_to_dense(sub, N, P)
        n = int(n_sub[b])
        assert list(np.asarray(codes_dp[b, :n])) == list(dref["codes"][:n]), b
        assert np.array_equal(np.asarray(preds_dp[b, :n]), dref["preds"][:n]), b
        assert np.array_equal(np.asarray(is_sink[b, :n]), dref["is_sink"][:n]), b
    print("DP array parity OK")

    # ---- 5. mixed-mode aligner parity vs host engines
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
            is_sw[b, i] = i % 2 == 1  # exercise both modes
    pairs, count, score = gc.poa_align_mixed(
        codes_dp, preds_dp, is_sink, n_sub,
        jnp.asarray(seq_arr), jnp.asarray(slen), jnp.asarray(is_sw),
        3, -5, -4,
    )
    pairs_ids = np.asarray(gc.ranks_to_ids(pairs, rank_to_node))
    count = np.asarray(count)
    L = pairs.shape[2]
    for b, sub in enumerate(subs):
        for i in range(int(d_used[b])):
            q = seqlists[b][i]
            eng = SW if is_sw[b, i] else ENG
            ref = eng.align(q, sub)
            c = int(count[b, i])
            dev = [tuple(int(v) for v in row) for row in pairs_ids[b, i, L - c:]]
            assert dev == ref, (b, i, dev[:6], ref[:6])
    print("mixed-mode aligner parity OK")

    # ---- 6. AddWeights parity
    or2 = [copy.deepcopy(s) for s in subs]
    for b, sub in enumerate(or2):
        for i in range(int(d_used[b])):
            q = seqlists[b][i]
            eng = SW if is_sw[b, i] else ENG
            aln = eng.align(q, sub)
            sub.add_weights(aln, q, np.ones(len(q), np.uint32))
    seq_w = np.ones((B, D, S), np.int32)
    t3, h3, w3, v3, ne3, ovf_w = gc.add_weights_batch(
        t2, h2, w2, v2, ne2,
        jnp.asarray(np.where(
            (np.arange(D)[None, :, None, None] < d_used[:, None, None, None]),
            pairs_ids, -2)),
        jnp.asarray(seq_w), N,
    )
    assert not bool(jnp.any(ovf_w))
    for b, sub in enumerate(or2):
        or_edges = [(e.tail, e.head, e.weight) for e in sub.edges]
        dev_edges = [
            (int(t3[b, i]), int(h3[b, i]), int(w3[b, i]))
            for i in range(int(ne3[b]))
            if bool(v3[b, i])
        ]
        assert or_edges == dev_edges, (
            b, len(or_edges), len(dev_edges),
            or_edges[:6], dev_edges[:6],
        )
    print("AddWeights parity OK", [int(x) for x in ne3])

    # ---- 7. corrected emit parity
    bb_pairs, bb_count, _ = gc.poa_align_mixed(
        codes_dp, preds_dp, is_sink, n_sub,
        jnp.asarray(seq_arr[:, :1]), jnp.asarray(slen[:, :1]),
        jnp.ones((B, 1), bool), 3, -5, -4,
    )
    bb_ids = gc.ranks_to_ids(bb_pairs, rank_to_node)
    out, out_len = gc.corrected_emit(bb_ids[:, 0], codes2)
    for b, sub in enumerate(subs):
        aln = SW.align(seqlists[b][0], sub)
        ref = sub.generate_corrected_sequence(aln)
        dev = list(np.asarray(out[b, : int(out_len[b])]))
        assert dev == list(ref), (b, dev[:10], ref[:10])
    print("corrected emit parity OK")

    print("ALL STEP CHECKS PASSED")


def main_e2e():
    """Full-driver check: generate_consensus_haplotype host vs device cycle
    must produce byte-identical consensus for every window."""
    import copy

    from vechat_tpu.pipeline.windows import (
        HostAlignerBackend,
        Window,
        generate_consensus_haplotype,
    )

    wins = []
    for k in range(5):
        base_len = 80 + 10 * k
        base = "".join(rng.choice(list("ACGT"), size=base_len))
        strain2 = list(base)
        for i in range(5, base_len, 23):
            strain2[i] = rng.choice(list("ACGT"))
        strain2 = "".join(strain2)
        w = Window(
            target_id=0, rank=k, window_type=1,
            backbone_codes=encode(noisy(base)),
            backbone_quality=None, if_fasta=True,
        )
        blen = len(w.backbone_codes)
        for j in range(7):
            src = strain2 if j % 2 else base
            b0 = int(rng.integers(0, 6))
            e0 = blen - 1 - int(rng.integers(0, 6))
            frac0 = b0 / blen
            frac1 = (e0 + 1) / blen
            seg = src[int(frac0 * len(src)) : int(frac1 * len(src))]
            codes = encode(noisy(seg))
            if len(codes) == 0 or b0 >= e0:
                continue
            w.add_layer(codes, None, b0, e0)
        wins.append(w)

    host_wins = copy.deepcopy(wins)
    generate_consensus_haplotype(
        host_wins, HostAlignerBackend(3, -5, -4), 0.2, 0.2, 3
    )

    from vechat_tpu.ops.kernels.poa_jax import JaxAlignerBackend

    dev_wins = copy.deepcopy(wins)
    os.environ["VECHAT_DEVICE_CYCLE"] = "1"
    generate_consensus_haplotype(
        dev_wins, JaxAlignerBackend(3, -5, -4), 0.2, 0.2, 3
    )

    for k, (hw, dw) in enumerate(zip(host_wins, dev_wins)):
        h = list(hw.consensus_codes)
        dv = list(dw.consensus_codes)
        assert h == dv, (k, len(h), len(dv), h[:20], dv[:20])
    print("FULL-DRIVER HOST vs DEVICE-CYCLE PARITY OK "
          f"({len(wins)} windows)")


if __name__ == "__main__":
    main()
    main_e2e()
