#!/usr/bin/env python
"""vechat_tpu twin of refbuild/spoa_trace: replays linear window consensus
for ONE window fed on stdin in dump_state format, printing each layer's
alignment path and graph sizes after each add — diff against spoa_trace to
localize consensus divergences. Engine selectable: --engine host|native.
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from vechat_tpu.ops.encode import decode, encode  # noqa: E402
from vechat_tpu.ops.graph_align import LinearAligner  # noqa: E402
from vechat_tpu.ops.poagraph import PoaGraph  # noqa: E402
from vechat_tpu.pipeline.windows import phred_weights  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-trim", action="store_true")
    ap.add_argument("--engine", default="native", choices=["host", "native"])
    ap.add_argument(
        "--order",
        default="",
        help="comma-separated explicit layer order (1-based seq indices) "
        "to replay the reference's unstable-sort order",
    )
    args = ap.parse_args()

    seqs, quals, positions = [], [], []
    backbone = bqual = None
    for line in sys.stdin:
        f = line.split()
        if not f:
            continue
        if f[0] == "B":
            backbone, bqual = f[3], (None if f[4] == "-" else f[4])
            seqs.append(f[3])
            quals.append(bqual)
            positions.append((0, 0))
        elif f[0] == "L":
            seqs.append(f[3])
            quals.append(None if f[4] == "-" else f[4])
            positions.append((int(f[1]), int(f[2])))

    if args.engine == "native":
        from vechat_tpu.ops.native_graph import make_graph

        g = make_graph()
    else:
        g = PoaGraph()
    bw = (
        phred_weights(bqual, len(backbone))
        if bqual is not None
        else np.zeros(len(backbone), dtype=np.uint32)
    )
    bcodes = encode(backbone)
    g.add_alignment([], bcodes, bw)
    print(f"GRAPH 0 nodes={g.num_nodes()} edges={g.num_edges()}")

    if args.order:
        order = [int(v) for v in args.order.split(",")]
    else:
        from vechat_tpu.ops.native_graph import layer_sort_order

        idx = layer_sort_order([positions[i][0] for i in range(1, len(seqs))])
        order = [int(i) + 1 for i in idx]
    print("ORDER " + " ".join(str(v) for v in order))

    eng = LinearAligner("nw", 3, -5, -4)
    offset = int(0.01 * len(backbone))
    for j, i in enumerate(order, start=1):
        codes = encode(seqs[i])
        full = positions[i][0] < offset and positions[i][1] > len(backbone) - offset
        if full:
            if hasattr(g, "align_host"):
                aln = g.align_host(codes, "nw", 3, -5, -4)
            else:
                aln = eng.align(codes, g)
        else:
            sub, mapping = g.subgraph(positions[i][0], positions[i][1])
            if hasattr(sub, "align_host"):
                aln = sub.align_host(codes, "nw", 3, -5, -4)
            else:
                aln = eng.align(codes, sub)
            aln = PoaGraph.update_alignment(mapping, aln)
        print(
            f"ALN {i} {'full' if full else 'sub'} "
            + " ".join(f"{a}:{b}" for a, b in aln)
        )
        w = phred_weights(quals[i], len(codes)) if quals[i] is not None else np.full(len(codes), 1, np.uint32)
        # NOTE: reference AddAlignment without quality uses weight 1 per base
        g.add_alignment(aln, codes, w)
        print(f"GRAPH {j} nodes={g.num_nodes()} edges={g.num_edges()}")

    codes, coverages = g.generate_consensus_with_coverage()
    codes = np.asarray(codes, dtype=np.uint8)
    print("RAWCONS " + decode(codes))
    print("COV " + " ".join(str(int(c)) for c in coverages))
    if not args.no_trim:
        average_coverage = (len(seqs) - 1) // 2
        begin, end = 0, len(codes) - 1
        while begin < len(codes) and coverages[begin] < average_coverage:
            begin += 1
        while end >= 0 and coverages[end] < average_coverage:
            end -= 1
        if begin < end:
            codes = codes[begin : end + 1]
    print("CONS " + decode(codes))
    return 0


if __name__ == "__main__":
    sys.exit(main())
