"""Oracle-parity tests for the device round-2 consensus
(graph_consensus.py): heaviest-bundle traversal + branch completion,
coverage, the kTGS trim, and the one-dispatch device_linear program wired
through windows.generate_consensus_linear."""

import numpy as np

import jax.numpy as jnp

from vechat_tpu.ops.encode import encode
from vechat_tpu.ops.graph_align import LinearAligner
from vechat_tpu.ops.kernels.graph_consensus import (
    build_in_slots_weighted,
    build_out_slots,
    heaviest_bundle,
)
from vechat_tpu.ops.kernels.graph_cycle import graph_to_edges
from vechat_tpu.ops.poagraph import PoaGraph
from vechat_tpu.pipeline.windows import (
    WINDOW_TYPE_NGS,
    WINDOW_TYPE_TGS,
    HostAlignerBackend,
    Window,
    generate_consensus_linear,
)

ENG = LinearAligner("nw", 3, -5, -4)


def _noisy(rng, base, sub=0.06, dele=0.03, ins=0.03):
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


def _oracle_build(bb, layer_codes):
    g = PoaGraph()
    g.add_alignment([], bb, np.zeros(len(bb), np.uint32))
    for codes in layer_codes:
        aln = ENG.align(codes, g)
        g.add_alignment(aln, codes, np.ones(len(codes), np.uint32))
    return g


def test_heaviest_bundle_matches_oracle():
    rng = np.random.default_rng(5)
    for seed in range(4):
        rng = np.random.default_rng(seed)
        base = "".join(rng.choice(list("ACGT"), size=40))
        bb = encode(_noisy(rng, base))
        layers = [encode(_noisy(rng, base)) for _ in range(5)]
        g = _oracle_build(bb, layers)

        N, E, P = 128, 256, 16
        ed = graph_to_edges(g, N, E)
        tails = jnp.asarray(ed["tails"][None, :])
        heads = jnp.asarray(ed["heads"][None, :])
        weights = jnp.asarray(ed["weights"][None, :])
        valid = jnp.arange(E)[None, :] < ed["n_edges"]
        in_nbr, in_w, indeg, ovf1 = build_in_slots_weighted(
            tails, heads, weights, valid, N, P
        )
        out_nbr, out_deg, ovf2 = build_out_slots(tails, heads, valid, N, P)
        assert not bool(ovf1[0]) and not bool(ovf2[0])
        rank_of = np.zeros((1, N), np.int32)
        rank_to_node = np.zeros((1, N), np.int32)
        for i, v in enumerate(g.rank_to_node):
            rank_of[0, v] = i
            rank_to_node[0, i] = v
        cons, k, ovf = heaviest_bundle(
            in_nbr, in_w, indeg, out_nbr, out_deg,
            jnp.asarray(rank_of), jnp.asarray(rank_to_node),
            jnp.asarray(np.array([g.num_nodes()], np.int32)),
        )
        assert not bool(ovf[0])
        g.generate_consensus()
        dev_path = list(np.asarray(cons[0, : int(k[0])]))
        assert dev_path == list(g.consensus), (seed, dev_path, g.consensus)


class _DevBackend:
    """Minimal backend carrier for run_device_linear (scores only)."""

    def __init__(self, m=3, x=-5, g=-4):
        self.match, self.mismatch, self.gap = m, x, g
        self.supports_graph_cycle = True


def _mk_window(rng, base, depth, wtype, quality=True):
    bb_str = _noisy(rng, base)
    bb = encode(bb_str)
    w = Window(
        target_id=0,
        rank=0,
        window_type=wtype,
        backbone_codes=bb,
        backbone_quality="5" * len(bb) if quality else None,
        if_fasta=not quality,
    )
    blen = len(bb)
    for _ in range(depth):
        codes = encode(_noisy(rng, base))
        b0 = 0
        e0 = blen - 1
        if rng.random() < 0.4:  # partial layer
            b0 = int(rng.integers(0, max(1, blen // 6)))
            e0 = blen - 1 - int(rng.integers(0, max(1, blen // 6)))
            codes = codes[: max(4, len(codes) - (b0 + blen - 1 - e0))]
        w.add_layer(
            codes, "5" * len(codes) if quality else None, b0, e0
        )
    return w


def _windows_equal(ws_a, ws_b):
    for a, b in zip(ws_a, ws_b):
        assert a.polished == b.polished
        assert list(a.consensus_codes) == list(b.consensus_codes)


def test_device_linear_matches_host_path():
    """Full-program parity: device round-2 consensus == host path for a
    batch of mixed windows (TGS trim, NGS no-trim, FASTA mode)."""
    rng = np.random.default_rng(13)
    base = "".join(rng.choice(list("ACGT"), size=60))
    cases = [
        (WINDOW_TYPE_TGS, True),
        (WINDOW_TYPE_TGS, False),
        (WINDOW_TYPE_NGS, True),
    ]
    host_ws = []
    dev_ws = []
    for wtype, quality in cases:
        for depth in (4, 7):
            seed_rng = np.random.default_rng(
                1000 + wtype * 10 + depth + int(quality)
            )
            host_ws.append(_mk_window(seed_rng, base, depth, wtype, quality))
            seed_rng = np.random.default_rng(
                1000 + wtype * 10 + depth + int(quality)
            )
            dev_ws.append(_mk_window(seed_rng, base, depth, wtype, quality))

    host_backend = HostAlignerBackend(3, -5, -4)
    generate_consensus_linear(host_ws, host_backend, trim=True)

    from vechat_tpu.pipeline.device_cycle import run_device_linear

    handled = run_device_linear(dev_ws, _DevBackend(), trim=True)
    assert all(handled), handled
    _windows_equal(host_ws, dev_ws)


def test_device_linear_through_driver_env():
    """windows.generate_consensus_linear routes through the device path when
    the backend supports it, falling back cleanly for <3-seq windows."""
    rng = np.random.default_rng(21)
    base = "".join(rng.choice(list("ACGT"), size=50))
    ws_host = [_mk_window(np.random.default_rng(7), base, 5, WINDOW_TYPE_TGS)]
    ws_dev = [_mk_window(np.random.default_rng(7), base, 5, WINDOW_TYPE_TGS)]
    # a <3-sequence window passes through unpolished on both paths
    thin_h = _mk_window(np.random.default_rng(8), base, 1, WINDOW_TYPE_TGS)
    thin_d = _mk_window(np.random.default_rng(8), base, 1, WINDOW_TYPE_TGS)
    ws_host.append(thin_h)
    ws_dev.append(thin_d)

    import os

    generate_consensus_linear(ws_host, HostAlignerBackend(3, -5, -4), True)
    os.environ["VECHAT_DEVICE_LINEAR"] = "1"  # device placement is opt-in
    try:
        generate_consensus_linear(ws_dev, _DevBackend(), True)
    finally:
        del os.environ["VECHAT_DEVICE_LINEAR"]
    _windows_equal(ws_host, ws_dev)
    assert not ws_dev[1].polished
