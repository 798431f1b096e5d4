"""Dev scratch: validate the device build phase (graph_build.device_build)
against the host oracle build (_build_phase). Run with JAX_PLATFORMS=cpu."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from vechat_tpu.ops.encode import encode
from vechat_tpu.pipeline.windows import (
    HostAlignerBackend,
    Window,
    _build_phase,
    _layer_order,
)
from vechat_tpu.ops.kernels.graph_build import device_build
from vechat_tpu.ops.kernels.graph_cycle import graph_to_edges

rng = np.random.default_rng(31)


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


def make_windows(n_windows=4, base_len=70, depth=6):
    wins = []
    for k in range(n_windows):
        base = "".join(rng.choice(list("ACGT"), size=base_len + 7 * k))
        w = Window(
            target_id=0, rank=k, window_type=1,
            backbone_codes=encode(noisy(base)),
            backbone_quality=None, if_fasta=True,
        )
        blen = len(w.backbone_codes)
        for j in range(depth):
            b0 = int(rng.integers(0, 8))
            e0 = blen - 1 - int(rng.integers(0, 8))
            seg = base[int(b0 / blen * len(base)): int((e0 + 1) / blen * len(base))]
            codes = encode(noisy(seg))
            if len(codes) and b0 < e0:
                w.add_layer(codes, None, b0, e0)
        wins.append(w)
    return wins


def main():
    wins = make_windows()
    backend = HostAlignerBackend(3, -5, -4)
    graphs, totals, orders = _build_phase(wins, backend, collect_weight=True)

    B = len(wins)
    N, E, R, W = 256, 512, 8, 160
    SMAX = max(len(w.layers) for w in wins)
    bb_codes = np.zeros((B, W), np.int32)
    bb_w = np.zeros((B, W), np.int32)
    bb_len = np.zeros(B, np.int32)
    lseqs = np.full((B, SMAX, W), 0xFF, np.int32)
    lwt = np.ones((B, SMAX, W), np.int32)
    llen = np.ones((B, SMAX), np.int32)
    lbegin = np.zeros((B, SMAX), np.int32)
    lend = np.zeros((B, SMAX), np.int32)
    lfull = np.zeros((B, SMAX), bool)
    n_layers = np.zeros(B, np.int32)
    for b, w in enumerate(wins):
        bb = w.backbone_codes
        bb_codes[b, : len(bb)] = bb
        bb_w[b, : len(bb)] = 0  # FASTA backbone: dummy '!' weight 0
        bb_len[b] = len(bb)
        blen = len(bb)
        offset = int(0.01 * blen)
        order = _layer_order(w)
        n_layers[b] = len(order)
        for s, oi in enumerate(order):
            l = w.layers[oi]
            lseqs[b, s, : len(l.codes)] = l.codes
            lwt[b, s, : len(l.codes)] = 1  # FASTA layers: weight 1
            llen[b, s] = len(l.codes)
            lbegin[b, s] = l.begin
            lend[b, s] = l.end
            lfull[b, s] = l.begin < offset and l.end > blen - offset

    out = device_build(
        jnp.asarray(bb_codes), jnp.asarray(bb_w), jnp.asarray(bb_len),
        jnp.asarray(lseqs), jnp.asarray(lwt), jnp.asarray(llen),
        jnp.asarray(lbegin), jnp.asarray(lend), jnp.asarray(lfull),
        jnp.asarray(n_layers), N, E, R, 3, -5, -4,
    )
    assert not bool(jnp.any(out["overflow"])), "overflow"
    for b, g in enumerate(graphs):
        ed = graph_to_edges(g, N, E)
        nn = int(out["n_nodes"][b])
        assert nn == ed["n_nodes"], (b, nn, ed["n_nodes"])
        dev_codes = list(np.asarray(out["codes"][b, :nn]))
        assert dev_codes == list(ed["codes"][:nn]), b
        ne = int(out["n_edges"][b])
        assert ne == ed["n_edges"], (b, ne, ed["n_edges"])
        dev_edges = [
            (int(out["tails"][b, i]), int(out["heads"][b, i]),
             int(out["weights"][b, i]))
            for i in range(ne)
        ]
        or_edges = [
            (int(ed["tails"][i]), int(ed["heads"][i]), int(ed["weights"][i]))
            for i in range(ne)
        ]
        assert dev_edges == or_edges, (
            b,
            [e for e in dev_edges if e not in or_edges][:5],
            [e for e in or_edges if e not in dev_edges][:5],
        )
        # rings
        if hasattr(g, "aligned"):
            al = g.aligned
        else:
            # native graph: pull rings via save
            import tempfile

            fd, p = tempfile.mkstemp(suffix=".npz")
            os.close(fd)
            g.save_npz(p)
            d = np.load(p)
            al_off, alf = d["al_off"], d["al"]
            al = [list(alf[al_off[i]:al_off[i + 1]]) for i in range(nn)]
            os.unlink(p)
        for v in range(nn):
            dev_ring = list(
                np.asarray(out["aligned"][b, v, : int(out["acount"][b, v])])
            )
            assert dev_ring == list(al[v]), (b, v, dev_ring, list(al[v]))
    print(f"DEVICE BUILD PARITY OK ({B} windows, "
          f"nodes {[int(x) for x in out['n_nodes']]})")


if __name__ == "__main__":
    main()
