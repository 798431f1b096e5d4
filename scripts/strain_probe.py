#!/usr/bin/env python
"""Root-cause probe for strain-preservation misses at high coverage
(VERDICT r3 #4: config-#4-lite preserved 294/300 at 40x vs 36/36 at ~16x).

Simulates a 2-strain community at a configurable coverage, runs round-1
haplotype correction, and for every read that ends closer to the OTHER
strain, reports the per-window strain composition of its layers — testing
the hypothesis that collapse happens where the local layer mix leaves the
read's own allele below the pruning thresholds (conf d=0.2 / support
s=0.19, graph.cpp:811-982), which keeps exactly one allele branch.

Usage: python scripts/strain_probe.py [--reads N] [--genome-len L]
"""

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=100)
    ap.add_argument("--genome-len", type=int, default=6000)
    ap.add_argument("--read-len", type=int, default=2500)
    ap.add_argument("--error-rate", type=float, default=0.08)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-t", "--threads", type=int, default=1)
    ap.add_argument(
        "--ratio",
        type=float,
        default=0.5,
        help="fraction of reads from strain A (uneven mixes reproduce the "
        "collapse: where a strain's local layer fraction drops below the "
        "pruning confidence d, its allele branch is pruned and its reads "
        "correct toward the majority strain)",
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "e2e", os.path.join(os.path.dirname(__file__), "e2e_bench.py")
    )
    e2e = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(e2e)

    from vechat_tpu.cli.vechat_main import build_parser, run_round
    from vechat_tpu.io.fastx import SeqRecord
    from vechat_tpu.ops.encode import encode
    from vechat_tpu.ops.pairwise import edit_distance_infix
    from vechat_tpu.utils.logger import Logger

    rng = np.random.default_rng(args.seed)
    L = args.genome_len
    strain_a = e2e.rand_seq(rng, L)
    b = list(strain_a)
    var_pos = sorted(rng.choice(L, size=max(1, L // 100), replace=False))
    for p in var_pos:
        b[p] = rng.choice([c for c in "ACGT" if c != b[p]])
    strain_b = "".join(b)

    er = args.error_rate
    fsub, fins, fdel = 0.45, 0.30, 0.25
    reads, meta = [], {}
    n_a = int(round(args.reads * args.ratio))
    for i in range(args.reads):
        is_a = i < n_a
        src = strain_a if is_a else strain_b
        start = int(rng.integers(0, max(1, L - args.read_len)))
        frag = src[start : start + args.read_len]
        data = e2e.mutate(rng, frag, er * fsub, er * fins, er * fdel)
        reads.append(SeqRecord(f"r{i}", data, "5" * len(data)))
        meta[f"r{i}"] = (start, is_a)
    cov = args.reads * args.read_len / L
    print(f"coverage ~{cov:.0f}x total (A:{n_a} B:{args.reads - n_a} reads), "
          f"{len(var_pos)} variant sites")

    cli = build_parser().parse_args(
        ["x", "--platform", "ont", "--backend", "host", "-t", str(args.threads)]
    )
    log = Logger(open(os.devnull, "w"))
    corrected = run_round(reads, 1, cli, log)

    PAD = 120
    misses = []
    for rec in corrected:
        name = rec.name.split()[0].rstrip("r")
        start, is_a = meta[name]
        own_src = strain_a if is_a else strain_b
        oth_src = strain_b if is_a else strain_a
        own = edit_distance_infix(
            encode(rec.data),
            encode(own_src[max(0, start - PAD): start + args.read_len + PAD]),
        )
        oth = edit_distance_infix(
            encode(rec.data),
            encode(oth_src[max(0, start - PAD): start + args.read_len + PAD]),
        )
        if own > oth:
            misses.append((name, start, is_a, own, oth))
    print(f"strain preservation: {len(corrected) - len(misses)}/"
          f"{len(corrected)}")

    if not misses:
        print("no misses at this scale; raise --reads for higher coverage")
        return

    # which variant sites fall inside each missed read, and what was the
    # local strain mix of reads covering those sites?
    for name, start, is_a, own, oth in misses:
        end = start + args.read_len
        sites = [p for p in var_pos if start <= p < end]
        mix = collections.Counter()
        for rn, (s2, a2) in meta.items():
            if s2 < end and s2 + args.read_len > start:
                mix["A" if a2 else "B"] += 1
        print(
            f"read {name} (strain {'A' if is_a else 'B'}, span {start}-{end}):"
            f" own-dist={own} other-dist={oth}, {len(sites)} variant sites,"
            f" local mix A:{mix['A']} B:{mix['B']}"
            f" -> own fraction {mix['A' if is_a else 'B'] / max(1, sum(mix.values())):.2f}"
        )


if __name__ == "__main__":
    main()
