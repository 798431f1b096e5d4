#!/usr/bin/env python
"""Pipeline-level device profiling: where does the e2e device wall go?

Times, with warm caches:
  1. PallasAlignerBackend.align_batch on a realistic window bucket
     (pack + kernel + walk + decode, then the same split out)
  2. DevicePairwiseAligner.edit_align_batch on realistic overlap segments
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    from vechat_tpu.ops.encode import encode
    from vechat_tpu.ops.graph_align import LinearAligner
    from vechat_tpu.ops.kernels.backend import PallasAlignerBackend
    from vechat_tpu.ops.poagraph import PoaGraph

    rng = np.random.default_rng(0)

    def rand_seq(n):
        return "".join(rng.choice(list("ACGT"), size=n))

    def mutate(seq, rate=0.08):
        out = []
        for ch in seq:
            r = rng.random()
            if r < rate * 0.5:
                out.append(rng.choice(list("ACGT")))
            elif r < rate * 0.7:
                continue
            else:
                out.append(ch)
        return "".join(out)

    # ---- 1. window-consensus align_batch (the _build_phase inner call)
    eng = LinearAligner("nw", 3, -5, -4)
    graphs = []
    for _ in range(32):
        base = rand_seq(450)
        g = PoaGraph()
        for _ in range(4):
            q = encode(mutate(base))
            aln = eng.align(q, g) if g.num_nodes() else []
            g.add_alignment(aln, q, np.ones(len(q), dtype=np.uint32))
        graphs.append((g, base))
    be = PallasAlignerBackend(3, -5, -4)
    items = []
    for g, base in graphs:
        for _ in range(8):
            items.append((encode(mutate(base)), g, "nw"))
    print(f"align_batch: {len(items)} items over {len(graphs)} graphs")
    for it in range(3):
        t0 = time.perf_counter()
        be.align_batch(items)
        print(f"  iter{it}: {time.perf_counter()-t0:.2f}s "
              f"(dev_aligns={be.device_alignments} fallbacks={be.fallbacks})")

    # ---- 2. pairwise overlap batch
    from vechat_tpu.ops.kernels.pairwise_pallas import DevicePairwiseAligner

    pw = DevicePairwiseAligner()
    pairs = []
    for _ in range(128):
        t = encode(rand_seq(2200))
        q = encode(mutate("".join("ACGT"[c] for c in t), 0.1))
        pairs.append((q, t))
    print(f"pairwise: {len(pairs)} pairs ~2.2kb")
    for it in range(3):
        t0 = time.perf_counter()
        pw.edit_align_batch(pairs)
        print(f"  iter{it}: {time.perf_counter()-t0:.2f}s "
              f"(tiles={pw.device_tiles} fallbacks={pw.host_fallbacks})")


if __name__ == "__main__":
    main()
