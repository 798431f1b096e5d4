"""Parity tests: CONVEX Pallas kernel (interpret mode) vs host ConvexAligner
oracle (locked to vendor/spoa/src/sisd_alignment_engine.cpp:678-923)."""

import os

import numpy as np
import pytest

heavy = pytest.mark.skipif(
    os.environ.get("VECHAT_SKIP_KERNEL_TESTS") == "1",
    reason="skipped by VECHAT_SKIP_KERNEL_TESTS=1",
)

import jax.numpy as jnp

from vechat_tpu.ops.encode import encode
from vechat_tpu.ops.graph_align import ConvexAligner, LinearAligner
from vechat_tpu.ops.kernels.poa_jax import graph_to_dense
from vechat_tpu.ops.kernels.poa_pallas_convex import poa_align_pallas_convex
from vechat_tpu.ops.poagraph import PoaGraph

# kConvex: g < e (not linear), g > q and e < c (not affine)
M, X, G, E, Q, C = 3, -5, -8, -6, -10, -2


def build_graph(seqs):
    eng = LinearAligner("nw", 3, -5, -4)
    gr = PoaGraph()
    for s in seqs:
        codes = encode(s)
        aln = eng.align(codes, gr) if gr.num_nodes() else []
        gr.add_alignment(aln, codes, np.ones(len(codes), dtype=np.uint32))
    return gr


def rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def mutate(rng, seq, rate=0.15):
    out = []
    for ch in seq:
        r = rng.random()
        if r < rate * 0.5:
            out.append(rng.choice([b for b in "ACGT" if b != ch]))
        elif r < rate * 0.7:
            continue
        elif r < rate:
            out.append(ch)
            out.append(rng.choice(list("ACGT")))
        else:
            out.append(ch)
    return "".join(out)


def pack_and_run(graphs, seq_lists, mode, N, P, W):
    B = len(graphs)
    D = max(len(s) for s in seq_lists)
    codes = np.zeros((B, 1, N), np.int32)
    preds = np.zeros((B, P, N), np.int32)
    sink = np.zeros((B, 1, N), np.int32)
    nid = np.zeros((B, 1, N), np.int32)
    nn = np.zeros((B, 1, 1), np.int32)
    seqp = np.full((B, D, W), 0xFF, np.int32)
    slen = np.ones((B, 1, D), np.int32)
    seqp[:, :, 1] = 0
    for b, (gr, seqs) in enumerate(zip(graphs, seq_lists)):
        d = graph_to_dense(gr, N, P)
        assert d is not None
        codes[b, 0] = d["codes"]
        preds[b] = d["preds"].T
        sink[b, 0] = d["is_sink"].astype(np.int32)
        nid[b, 0] = d["node_id"]
        nn[b, 0, 0] = d["n_nodes"]
        for di, qq in enumerate(seqs):
            seqp[b, di, 1 : 1 + len(qq)] = qq
            seqp[b, di, 1 + len(qq) :] = 0xFF
            slen[b, 0, di] = len(qq)
    pn, pp, count, score = poa_align_pallas_convex(
        jnp.asarray(codes), jnp.asarray(preds), jnp.asarray(sink),
        jnp.asarray(nid), jnp.asarray(nn), jnp.asarray(seqp),
        jnp.asarray(slen),
        align_type=mode, m=M, x=X, g=G, e=E, q=Q, c=C,
        interpret=True,
    )
    pn, pp, count = np.asarray(pn), np.asarray(pp), np.asarray(count)
    L = pn.shape[2]
    out = []
    for b in range(B):
        row = []
        for di in range(len(seq_lists[b])):
            cc = int(count[b, 0, di])
            row.append(
                list(
                    zip(
                        pn[b, di, L - cc :].tolist(),
                        pp[b, di, L - cc :].tolist(),
                    )
                )
            )
        out.append(row)
    return out, np.asarray(score)


@heavy
@pytest.mark.parametrize("mode", ["nw", "sw", "ov"])
def test_convex_pallas_matches_host_small(mode):
    rng = np.random.default_rng(0)
    base = rand_seq(rng, 24)
    graphs = [
        build_graph([mutate(rng, base) for _ in range(2)]) for _ in range(2)
    ]
    seq_lists = [
        [encode(mutate(rng, base)) for _ in range(2)] for _ in range(2)
    ]
    got, score = pack_and_run(graphs, seq_lists, mode, N=64, P=4, W=32)

    host = ConvexAligner(mode, M, X, G, E, Q, C)
    for b, gr in enumerate(graphs):
        for di, qq in enumerate(seq_lists[b]):
            want, wscore = host.align(qq, gr, return_score=True)
            assert got[b][di] == want, f"mode={mode} b={b} d={di}"
            assert int(score[b, 0, di]) == wscore


@heavy
@pytest.mark.parametrize("mode", ["nw", "sw"])
def test_convex_pallas_deep_graph(mode):
    rng = np.random.default_rng(2)
    base = rand_seq(rng, 30)
    gr = build_graph([mutate(rng, base) for _ in range(5)])
    qs = [encode(mutate(rng, base)) for _ in range(3)]
    got, score = pack_and_run([gr], [qs], mode, N=96, P=8, W=64)
    host = ConvexAligner(mode, M, X, G, E, Q, C)
    for di, qq in enumerate(qs):
        want, wscore = host.align(qq, gr, return_score=True)
        assert got[0][di] == want, f"mode={mode} d={di}"
        assert int(score[0, 0, di]) == wscore


@heavy
def test_convex_pallas_long_gaps():
    """Long indels flip the optimum to the (q, c) channel — exercises the
    O-chain and Q-chain walks that distinguish convex from affine."""
    rng = np.random.default_rng(3)
    base = rand_seq(rng, 48)
    gr = build_graph([base, mutate(rng, base, 0.08)])
    qs = [
        encode(base[:10] + base[38:]),  # 28-base deletion -> q/c channel
        encode(base[:24] + rand_seq(rng, 20) + base[24:]),  # 20-base insert
        encode(base[:20] + base[23:]),  # short 3-base deletion -> g/e
    ]
    got, score = pack_and_run([gr], [qs], "nw", N=64, P=4, W=96)
    host = ConvexAligner("nw", M, X, G, E, Q, C)
    for di, qq in enumerate(qs):
        want, wscore = host.align(qq, gr, return_score=True)
        assert got[0][di] == want, f"d={di}"
        assert int(score[0, 0, di]) == wscore
