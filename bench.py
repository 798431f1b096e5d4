#!/usr/bin/env python
"""Benchmark: POA sequence-to-graph DP throughput (GCUPS) on the local chip.

Prints ONE JSON line: {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

The reference's hot loop is spoa's SIMD DP; on a modern x86 core it sustains
roughly 1-2 GCUPS (8x int16 lanes, SSE4.1 — see
vendor/spoa/src/simd_alignment_engine_implementation.hpp:87-126). We take
10 GCUPS as the baseline bar (a full reference node's worth of cores) and
report vs_baseline against it.
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


def synth_batch(B, N, S, P, depth=8, seed=0):
    """Realistic window-graph batch: POA graphs of `depth` noisy 500 bp reads."""
    from vechat_tpu.ops.encode import encode
    from vechat_tpu.ops.graph_align import LinearAligner
    from vechat_tpu.ops.kernels.poa_jax import graph_to_dense
    from vechat_tpu.ops.poagraph import PoaGraph

    rng = np.random.default_rng(seed)
    eng = LinearAligner("nw", 3, -5, -4)
    base_len = int(S * 0.9)

    codes_arr = np.zeros((B, N), dtype=np.uint8)
    preds_arr = np.zeros((B, N, P), dtype=np.int32)
    node_id_arr = np.zeros((B, N), dtype=np.int32)
    sink_arr = np.ones((B, N), dtype=bool)
    nn_arr = np.ones(B, dtype=np.int32)
    seq_arr = np.full((B, S), 0xFF, dtype=np.uint8)
    seq_arr[:, 0] = 0
    sl_arr = np.ones(B, dtype=np.int32)

    # build a handful of distinct graphs and tile them across the batch
    n_unique = min(B, 4)
    built = []
    for u in range(n_unique):
        base = "".join(rng.choice(list("ACGT"), size=base_len))
        g = PoaGraph()
        for _ in range(depth):
            mut = []
            for c in base:
                r = rng.random()
                if r < 0.04:
                    mut.append(rng.choice(list("ACGT")))
                elif r < 0.06:
                    continue
                else:
                    mut.append(c)
                    if rng.random() < 0.02:
                        mut.append(rng.choice(list("ACGT")))
            q = encode("".join(mut)[: S - 1])
            aln = eng.align(q, g) if g.num_nodes() else []
            g.add_alignment(aln, q, np.ones(len(q), dtype=np.uint32))
            if g.num_nodes() > N - 60:
                break
        d = graph_to_dense(g, N, P)
        if d is None:
            continue
        q = encode(
            "".join(rng.choice(list("ACGT"), size=base_len))
        )
        built.append((d, q))

    for b in range(B):
        d, q = built[b % len(built)]
        codes_arr[b] = d["codes"]
        preds_arr[b] = d["preds"]
        node_id_arr[b] = d["node_id"]
        sink_arr[b] = d["is_sink"]
        nn_arr[b] = d["n_nodes"]
        seq_arr[b, : len(q)] = q
        sl_arr[b] = len(q)

    return codes_arr, preds_arr, node_id_arr, sink_arr, nn_arr, seq_arr, sl_arr


def main():
    import jax
    import jax.numpy as jnp

    from vechat_tpu.ops.kernels.poa_jax import poa_align_batch_device

    B, N, S, P = 64, 1024, 511, 8
    args_np = synth_batch(B, N, S, P)
    args = [jnp.asarray(a) for a in args_np]

    def run():
        return poa_align_batch_device(
            *args, align_type="nw", m=3, x=-5, g=-4
        )

    # compile + warm
    out = run()
    jax.block_until_ready(out)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    # cell updates actually computed: full padded grid drives the work
    cells = B * N * (S + 1)
    gcups = cells / dt / 1e9

    print(
        json.dumps(
            {
                "metric": "poa_dp_gcups",
                "value": round(gcups, 3),
                "unit": "GCUPS",
                "vs_baseline": round(gcups / BASELINE_GCUPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
