#!/usr/bin/env python
"""Benchmark: POA sequence-to-graph DP+traceback throughput on the local chip.

Prints ONE JSON line: {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Measures the Pallas correction kernel end to end (DP + in-kernel traceback +
result fetch) over realistic window-graph batches. Baseline bar: 10 GCUPS —
roughly a full reference node of spoa SIMD cores (the reference's per-core
SIMD DP sustains ~1-2 GCUPS; simd_alignment_engine_implementation.hpp).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

BASELINE_GCUPS = 10.0


def synth_graph_batch(B, N, P, D, W, seed=0):
    """Window-graph batch shaped like real correction work: POA graphs built
    from noisy reads, D query sequences per graph."""
    from vechat_tpu.ops.encode import encode
    from vechat_tpu.ops.graph_align import LinearAligner
    from vechat_tpu.ops.kernels.poa_jax import graph_to_dense
    from vechat_tpu.ops.poagraph import PoaGraph

    rng = np.random.default_rng(seed)
    eng = LinearAligner("nw", 3, -5, -4)
    base_len = int((W - 1) * 0.9)

    def noisy(base):
        out = []
        for c in base:
            r = rng.random()
            if r < 0.04:
                out.append(rng.choice(list("ACGT")))
            elif r < 0.06:
                continue
            else:
                out.append(c)
                if rng.random() < 0.02:
                    out.append(rng.choice(list("ACGT")))
        return "".join(out)[: W - 1]

    codes = np.zeros((B, 1, N), np.int32)
    preds = np.zeros((B, P, N), np.int32)
    sink = np.ones((B, 1, N), np.int32)
    nid = np.zeros((B, 1, N), np.int32)
    nn = np.ones((B, 1, 1), np.int32)
    seqp = np.full((B, D, W), 0xFF, np.int32)
    seqp[:, :, 1] = 0
    slen = np.ones((B, 1, D), np.int32)

    built = []
    for u in range(min(B, 4)):
        base = "".join(rng.choice(list("ACGT"), size=base_len))
        g = PoaGraph()
        while True:
            q = encode(noisy(base))
            aln = eng.align(q, g) if g.num_nodes() else []
            g.add_alignment(aln, q, np.ones(len(q), dtype=np.uint32))
            if g.num_nodes() > N - 80 or len(g.sequences) >= 8:
                break
        d = graph_to_dense(g, N, P)
        if d is None:
            continue
        qs = [encode(noisy(base)) for _ in range(D)]
        built.append((d, qs))

    for b in range(B):
        d, qs = built[b % len(built)]
        codes[b, 0] = d["codes"]
        preds[b] = d["preds"].T
        sink[b, 0] = d["is_sink"].astype(np.int32)
        nid[b, 0] = d["node_id"]
        nn[b, 0, 0] = d["n_nodes"]
        for di, q in enumerate(qs):
            seqp[b, di, 1 : 1 + len(q)] = q
            slen[b, 0, di] = len(q)
    cells = int((nn[:, 0, 0].astype(np.int64) * slen[:, 0].sum(axis=1)).sum())
    return [codes, preds, sink, nid, nn, seqp, slen], cells


def main():
    import jax
    import jax.numpy as jnp

    from vechat_tpu.ops.kernels.poa_pallas import poa_align_pallas

    B, N, P, D, W = 64, 640, 8, 8, 512
    sets = []
    total_cells = 0
    for s in range(2):
        args_np, cells = synth_graph_batch(B, N, P, D, W, seed=s)
        sets.append([jnp.asarray(a) for a in args_np])
        total_cells += cells

    def run(a):
        return poa_align_pallas(*a, align_type="nw", m=3, x=-5, g=-4)

    # compile + warm
    out = run(sets[0])
    np.asarray(out[2])

    # pipelined dispatch: queue all batches, then drain results (overlaps
    # host<->device latency the way the real correction driver does)
    iters = 6
    t0 = time.perf_counter()
    outs = [run(sets[i % 2]) for i in range(iters)]
    for out in outs:
        np.asarray(out[2])
    dt = (time.perf_counter() - t0) / iters

    cells = total_cells / 2
    gcups = cells / dt / 1e9

    print(
        json.dumps(
            {
                "metric": "poa_dp_traceback_gcups",
                "value": round(gcups, 3),
                "unit": "GCUPS",
                "vs_baseline": round(gcups / BASELINE_GCUPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
