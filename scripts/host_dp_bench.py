#!/usr/bin/env python
"""Host C++ POA DP throughput microbenchmark.

The host path is what long CPU-bound runs (config #4 scale) spend their wall
on; this measures native align_linear cells/sec on realistic window shapes so
compiler-flag changes (e.g. -O3 vs -march=native AVX-512 auto-vectorization
of the candidate loop, csrc/poagraph.cpp align_linear) can be A/B'd.

Usage: python scripts/host_dp_bench.py [--repeat 3] [--windows 40]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=40)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--len", type=int, default=500, dest="blen")
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    from vechat_tpu.ops.encode import encode
    from vechat_tpu.ops.native_graph import make_graph

    rng = np.random.default_rng(0)

    def noisy(base, e=0.08):
        out = []
        for c in base:
            r = rng.random()
            if r < e * 0.4:
                out.append("ACGT"[rng.integers(4)])
            elif r < e * 0.7:
                continue
            else:
                out.append(c)
            if rng.random() < e * 0.3:
                out.append("ACGT"[rng.integers(4)])
        return "".join(out)

    # build graphs once (build itself also exercises align; timed separately)
    t_build0 = time.perf_counter()
    graphs = []
    layer_sets = []
    cells = 0
    for _ in range(args.windows):
        base = "".join(rng.choice(list("ACGT"), size=args.blen))
        g = make_graph()
        bb = encode(noisy(base))
        g.add_alignment([], bb, np.zeros(len(bb), np.uint32))
        layers = []
        for _ in range(args.depth):
            q = encode(noisy(base))
            aln = g.align_host(q, "nw", 3, -5, -4)
            g.add_alignment(aln, q, np.ones(len(q), np.uint32))
            layers.append(q)
        graphs.append(g)
        layer_sets.append(layers)
    t_build = time.perf_counter() - t_build0

    # timed phase: re-align every layer against its final graph (the
    # AddWeights realign workload of the prune cycle)
    best = None
    for _ in range(args.repeat):
        t0 = time.perf_counter()
        cells = 0
        for g, layers in zip(graphs, layer_sets):
            n = g.num_nodes()
            for q in layers:
                g.align_host(q, "nw", 3, -5, -4)
                cells += n * len(q)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(
        f"build {t_build:.2f}s | realign best {best:.3f}s "
        f"{cells / best / 1e6:.1f} Mcell/s "
        f"({args.windows} windows x {args.depth} layers x ~{args.blen} bp)"
    )


if __name__ == "__main__":
    main()
