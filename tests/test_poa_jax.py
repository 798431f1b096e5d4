"""Parity tests: device (JAX) POA aligner vs the host oracle."""

import numpy as np
import pytest

from vechat_tpu.ops.encode import encode
from vechat_tpu.ops.graph_align import LinearAligner
from vechat_tpu.ops.kernels.poa_jax import JaxAlignerBackend, graph_to_dense
from vechat_tpu.ops.poagraph import PoaGraph


def build_graph(seqs, m=5, n=-4, g=-8):
    eng = LinearAligner("nw", m, n, g)
    gr = PoaGraph()
    for s in seqs:
        codes = encode(s)
        aln = eng.align(codes, gr) if gr.num_nodes() else []
        gr.add_alignment(aln, codes, np.ones(len(codes), dtype=np.uint32))
    return gr


def rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def mutate(rng, seq, rate=0.1):
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


@pytest.mark.parametrize("mode", ["nw", "sw"])
@pytest.mark.parametrize("seed", range(4))
def test_device_matches_host_random_graphs(mode, seed):
    rng = np.random.default_rng(seed)
    base = rand_seq(rng, 80)
    graph = build_graph([mutate(rng, base) for _ in range(4)])
    queries = [encode(mutate(rng, base)) for _ in range(3)]

    backend = JaxAlignerBackend(3, -5, -4)
    items = [(q, graph, mode) for q in queries]
    got = backend.align_batch(items)
    assert backend.fallbacks == 0

    host_nw = LinearAligner("nw", 3, -5, -4)
    host_sw = LinearAligner("sw", 3, -5, -4)
    for q, aln in zip(queries, got):
        want = (host_nw if mode == "nw" else host_sw).align(q, graph)
        assert aln == want


def test_device_matches_host_chain_ov():
    rng = np.random.default_rng(7)
    graph = build_graph([rand_seq(rng, 50)])
    q = encode(rand_seq(rng, 40))
    from vechat_tpu.ops.kernels.poa_jax import poa_align_batch_device
    import jax.numpy as jnp

    d = graph_to_dense(graph, 64, 4)
    seq = np.full((1, 63), 0xFF, np.uint8)
    seq[0, : len(q)] = q
    pairs, count, score = poa_align_batch_device(
        jnp.asarray(d["codes"][None]),
        jnp.asarray(d["preds"][None]),
        jnp.asarray(d["node_id"][None]),
        jnp.asarray(d["is_sink"][None]),
        jnp.asarray(np.array([d["n_nodes"]], np.int32)),
        jnp.asarray(seq),
        jnp.asarray(np.array([len(q)], np.int32)),
        align_type="ov",
        m=3,
        x=-5,
        g=-4,
    )
    want, wscore = LinearAligner("ov", 3, -5, -4).align(q, graph, return_score=True)
    c = int(count[0])
    got = [tuple(int(v) for v in r) for r in np.asarray(pairs)[0, pairs.shape[1] - c :]]
    assert got == want
    assert int(score[0]) == wscore


def test_batched_mixed_sizes():
    rng = np.random.default_rng(11)
    graphs = [
        build_graph([mutate(rng, rand_seq(rng, n)) for _ in range(3)])
        for n in (20, 100, 300)
    ]
    queries = [encode(rand_seq(rng, n)) for n in (25, 90, 310)]
    backend = JaxAlignerBackend(3, -5, -4)
    items = [(q, g, "nw") for q, g in zip(queries, graphs)]
    got = backend.align_batch(items)
    host = LinearAligner("nw", 3, -5, -4)
    for q, g, aln in zip(queries, graphs, got):
        assert aln == host.align(q, g)


def test_empty_and_fallback():
    backend = JaxAlignerBackend(3, -5, -4)
    g = build_graph(["ACGT"])
    out = backend.align_batch([(np.array([], np.uint8), g, "nw")])
    assert out == [[]]


def test_end_to_end_with_jax_backend():
    """Full haplotype polisher with the device backend == host backend."""
    from vechat_tpu.io.fastx import SeqRecord
    from vechat_tpu.io.paf import PafRecord
    from vechat_tpu.pipeline.polisher import Polisher

    rng = np.random.default_rng(21)
    truth = rand_seq(rng, 400)
    reads = []
    for i in range(8):
        d = mutate(rng, truth, 0.08)
        reads.append(SeqRecord(f"r{i}", d, "I" * len(d)))
    overlaps = [
        PafRecord(
            q_name=q.name,
            q_length=len(q.data),
            q_begin=0,
            q_end=len(q.data),
            strand=False,
            t_name=reads[0].name,
            t_length=len(reads[0].data),
            t_begin=0,
            t_end=len(reads[0].data),
            num_matches=300,
            alignment_length=400,
            mapq=60,
        )
        for q in reads[1:]
    ]

    def run(backend):
        p = Polisher(
            polisher_type="f",
            haplotype=True,
            min_confidence=0.2,
            min_support=0.2,
            backend=backend,
        )
        p.initialize(reads, reads, overlaps)
        return p.polish()

    host_out = run(None)
    dev = JaxAlignerBackend(3, -5, -4)
    dev_out = run(dev)
    # the device path ran: either through per-batch aligner dispatches (the
    # classic backend) or the fully in-jit build+cycle programs (round 4's
    # device polish, which never calls align_batch for round 1)
    assert dev.device_alignments > 0 or dev.n_cycle_dispatches > 0
    assert [r.data for r in dev_out] == [r.data for r in host_out]
    assert [r.name for r in dev_out] == [r.name for r in host_out]
