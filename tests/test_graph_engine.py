"""PallasGraphEngine: device drop-in engine routing + fallback behavior."""

import numpy as np

from vechat_tpu.ops.encode import encode
from vechat_tpu.ops.graph_align import LinearAligner, make_engine
from vechat_tpu.ops.kernels.graph_engine import PallasGraphEngine
from vechat_tpu.ops.poagraph import PoaGraph


def build_graph(seqs):
    eng = LinearAligner("nw", 3, -5, -4)
    gr = PoaGraph()
    for s in seqs:
        codes = encode(s)
        aln = eng.align(codes, gr) if gr.num_nodes() else []
        gr.add_alignment(aln, codes, np.ones(len(codes), dtype=np.uint32))
    return gr


def test_subtype_selection_matches_factory():
    # (m, n, g, e, q, c) -> expected subtype per alignment_engine.cpp:57-66
    cases = [
        ((3, -5, -4, -4, -4, -4), "linear"),
        ((3, -5, -8, -6, -8, -6), "affine"),
        ((3, -5, -8, -6, -10, -2), "convex"),
        ((5, -4, -8, -6, -10, -4), "convex"),  # spoa CLI defaults
    ]
    for (m, n, g, e, q, c), want in cases:
        eng = PallasGraphEngine("nw", m, n, g, e, q, c, interpret=True)
        assert eng.subtype == want, (m, n, g, e, q, c)
        host = make_engine("nw", m, n, g, e, q, c)
        assert type(host).__name__.lower().startswith(want[:4])


def test_engine_matches_host_all_subtypes():
    rng = np.random.default_rng(0)
    base = "".join(rng.choice(list("ACGT"), size=30))
    gr = build_graph([base])
    q = encode(base[:12] + base[18:])  # 6-base deletion
    for scores in [(3, -5, -4, -4, -4, -4), (3, -5, -8, -6, -8, -6),
                   (3, -5, -8, -6, -10, -2)]:
        dev = PallasGraphEngine("nw", *scores, interpret=True)
        host = make_engine("nw", *scores)
        got, gs = dev.align(q, gr, return_score=True)
        want, ws = host.align(q, gr, return_score=True)
        assert got == want and gs == ws, scores
        assert dev.device_alignments == 1


def test_oversize_graph_falls_back_to_host():
    rng = np.random.default_rng(1)
    # graph beyond the largest N bucket -> host fallback
    big = "".join(rng.choice(list("ACGT"), size=2100))
    gr = build_graph([big])
    dev = PallasGraphEngine("nw", 3, -5, -4, interpret=True)
    host = make_engine("nw", 3, -5, -4)
    q = encode(big[:100])
    assert dev.align(q, gr) == host.align(q, gr)
    assert dev.fallbacks == 1 and dev.device_alignments == 0


def test_probe_device_health_cpu_env(monkeypatch):
    import vechat_tpu.cli.racon_main as rm

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    rm._PROBE_CACHE.clear()
    assert rm.probe_device_health() == "cpu"
    rm._PROBE_CACHE.clear()
