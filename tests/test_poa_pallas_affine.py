"""Parity tests: AFFINE Pallas kernel (interpret mode) vs host AffineAligner
oracle (which is itself parity-locked to the reference SISD affine engine,
vendor/spoa/src/sisd_alignment_engine.cpp:462-676)."""

import os

import numpy as np
import pytest

heavy = pytest.mark.skipif(
    os.environ.get("VECHAT_SKIP_KERNEL_TESTS") == "1",
    reason="skipped by VECHAT_SKIP_KERNEL_TESTS=1",
)

import jax.numpy as jnp

from vechat_tpu.ops.encode import encode
from vechat_tpu.ops.graph_align import AffineAligner, LinearAligner
from vechat_tpu.ops.kernels.poa_jax import graph_to_dense
from vechat_tpu.ops.kernels.poa_pallas_affine import poa_align_pallas_affine
from vechat_tpu.ops.poagraph import PoaGraph

M, X, G, E = 3, -5, -8, -6  # affine scores (g < e selects kAffine)


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
        for di, q in enumerate(seqs):
            seqp[b, di, 1 : 1 + len(q)] = q
            seqp[b, di, 1 + len(q) :] = 0xFF
            slen[b, 0, di] = len(q)
    pn, pp, count, score = poa_align_pallas_affine(
        jnp.asarray(codes),
        jnp.asarray(preds),
        jnp.asarray(sink),
        jnp.asarray(nid),
        jnp.asarray(nn),
        jnp.asarray(seqp),
        jnp.asarray(slen),
        align_type=mode,
        m=M,
        x=X,
        g=G,
        e=E,
        interpret=True,
    )
    pn, pp, count = np.asarray(pn), np.asarray(pp), np.asarray(count)
    L = pn.shape[2]
    out = []
    for b in range(B):
        row = []
        for di in range(len(seq_lists[b])):
            c = int(count[b, 0, di])
            row.append(
                list(
                    zip(
                        pn[b, di, L - c :].tolist(),
                        pp[b, di, L - c :].tolist(),
                    )
                )
            )
        out.append(row)
    return out, np.asarray(score)


@heavy
@pytest.mark.parametrize("mode", ["nw", "sw", "ov"])
def test_affine_pallas_matches_host_small(mode):
    rng = np.random.default_rng(0)
    base = rand_seq(rng, 24)
    graphs = [
        build_graph([mutate(rng, base) for _ in range(2)]) for _ in range(2)
    ]
    seq_lists = [
        [encode(mutate(rng, base)) for _ in range(2)] for _ in range(2)
    ]
    got, score = pack_and_run(graphs, seq_lists, mode, N=64, P=4, W=32)

    host = AffineAligner(mode, M, X, G, E)
    for b, gr in enumerate(graphs):
        for di, q in enumerate(seq_lists[b]):
            want, wscore = host.align(q, gr, return_score=True)
            assert got[b][di] == want, f"mode={mode} b={b} d={di}"
            assert int(score[b, 0, di]) == wscore


@heavy
@pytest.mark.parametrize("mode", ["nw", "sw"])
def test_affine_pallas_deep_graph(mode):
    rng = np.random.default_rng(2)
    base = rand_seq(rng, 30)
    gr = build_graph([mutate(rng, base) for _ in range(5)])
    qs = [encode(mutate(rng, base)) for _ in range(3)]
    got, score = pack_and_run([gr], [qs], mode, N=96, P=8, W=64)
    host = AffineAligner(mode, M, X, G, E)
    for di, q in enumerate(qs):
        want, wscore = host.align(q, gr, return_score=True)
        assert got[0][di] == want, f"mode={mode} d={di}"
        assert int(score[0, 0, di]) == wscore


@heavy
def test_affine_pallas_gap_heavy():
    """Sequences with long indels exercise the F/E chain walks."""
    rng = np.random.default_rng(3)
    base = rand_seq(rng, 40)
    gr = build_graph([base, mutate(rng, base)])
    qs = [
        encode(base[:12] + base[30:]),  # 18-base deletion
        encode(base[:20] + rand_seq(rng, 14) + base[20:]),  # 14-base insert
    ]
    got, score = pack_and_run([gr], [qs], "nw", N=64, P=4, W=64)
    host = AffineAligner("nw", M, X, G, E)
    for di, q in enumerate(qs):
        want, wscore = host.align(q, gr, return_score=True)
        assert got[0][di] == want, f"d={di}"
        assert int(score[0, 0, di]) == wscore


@heavy
def test_affine_pallas_ring_buffer():
    rng = np.random.default_rng(4)
    base = rand_seq(rng, 30)
    gr = build_graph([mutate(rng, base) for _ in range(4)])
    qs = [encode(mutate(rng, base)) for _ in range(2)]
    from vechat_tpu.ops.kernels.poa_pallas import max_pred_distance
    from vechat_tpu.ops.kernels.poa_jax import graph_to_dense as g2d

    d = g2d(gr, 96, 8)
    dist = max_pred_distance(d["preds"], d["n_nodes"])
    assert dist < 64

    # run with ring=64 vs full history: identical results
    import vechat_tpu.ops.kernels.poa_pallas_affine as aff

    def run(ring):
        import jax.numpy as jnp

        codes = np.zeros((1, 1, 96), np.int32)
        preds = np.zeros((1, 8, 96), np.int32)
        sink = np.zeros((1, 1, 96), np.int32)
        nid = np.zeros((1, 1, 96), np.int32)
        nn = np.zeros((1, 1, 1), np.int32)
        seqp = np.full((1, 2, 64), 0xFF, np.int32)
        slen = np.ones((1, 1, 2), np.int32)
        codes[0, 0] = d["codes"]
        preds[0] = d["preds"].T
        sink[0, 0] = d["is_sink"].astype(np.int32)
        nid[0, 0] = d["node_id"]
        nn[0, 0, 0] = d["n_nodes"]
        for di, q in enumerate(qs):
            seqp[0, di, 1 : 1 + len(q)] = q
            slen[0, 0, di] = len(q)
        return aff.poa_align_pallas_affine(
            jnp.asarray(codes), jnp.asarray(preds), jnp.asarray(sink),
            jnp.asarray(nid), jnp.asarray(nn), jnp.asarray(seqp),
            jnp.asarray(slen), align_type="nw", m=M, x=X, g=G, e=E,
            interpret=True, ring=ring,
        )

    full = run(0)
    ringed = run(64)
    for a, b in zip(full, ringed):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
