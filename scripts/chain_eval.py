#!/usr/bin/env python
"""Recall/precision of the overlapper's chaining strategies against ground
truth on synthetic 2-strain reads (VERDICT r2 item 8 measurement).

Truth: unordered read pairs whose source genome intervals overlap >= min_ov
bases (strains are ~1% diverged so cross-strain overlaps count as true).
Compares the greedy monotone accept-set vs the scored chain DP at several
noise rates.

Usage: python scripts/chain_eval.py [--reads N] [--genome-len L]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=80)
    ap.add_argument("--genome-len", type=int, default=20000)
    ap.add_argument("--read-len", type=int, default=2500)
    ap.add_argument("--min-ov", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--error-profile", default="pb", choices=["balanced", "pb", "ont"]
    )
    ap.add_argument(
        "--platform", default=None, choices=["pb", "ont"],
        help="overlapper preset (defaults to --error-profile's platform)",
    )
    ap.add_argument("--sensitive", action="store_true")
    args = ap.parse_args()
    PROFILES = {
        "balanced": (0.45, 0.30, 0.25),
        "pb": (0.10, 0.55, 0.35),
        "ont": (0.35, 0.25, 0.40),
    }
    fsub, fins, fdel = PROFILES[args.error_profile]

    from scripts.e2e_bench import mutate, rand_seq  # reuse simulators
    from vechat_tpu.io.fastx import SeqRecord
    from vechat_tpu.pipeline.overlapper import (
        OverlapParams,
        filter_fpa,
        filter_length_identity,
        find_overlaps,
    )

    rng = np.random.default_rng(args.seed)
    strain_a = rand_seq(rng, args.genome_len)
    b = list(strain_a)
    for p in rng.choice(args.genome_len, size=args.genome_len // 100, replace=False):
        b[p] = rng.choice([c for c in "ACGT" if c != b[p]])
    strain_b = "".join(b)

    for noise in (0.05, 0.08, 0.10, 0.15):
        reads = []
        iv = []
        for i in range(args.reads):
            src = strain_a if i % 2 == 0 else strain_b
            start = int(rng.integers(0, max(1, len(src) - args.read_len)))
            frag = src[start : start + args.read_len]
            data = mutate(rng, frag, noise * fsub, noise * fins, noise * fdel)
            reads.append(SeqRecord(f"r{i}", data, None))
            iv.append((start, start + args.read_len))

        truth = set()
        for i in range(args.reads):
            for j in range(i + 1, args.reads):
                lo = max(iv[i][0], iv[j][0])
                hi = min(iv[i][1], iv[j][1])
                if hi - lo >= args.min_ov:
                    # normalize exactly like the found-set below (string
                    # sort): numeric-ordered keys silently mismatch pairs
                    # like (r2, r18) and understate BOTH recall & precision
                    truth.add(tuple(sorted((f"r{i}", f"r{j}"))))

        line = [f"noise={noise:.0%} truth={len(truth)}"]
        for label, dp in (("greedy", False), ("chainDP", True)):
            platform = args.platform or ("ont" if args.error_profile == "ont" else "pb")
            params = OverlapParams.for_platform(platform, sensitive=args.sensitive)
            params.use_chain_dp = dp
            ov = find_overlaps(reads, params)
            ov = filter_length_identity(ov, min_block=args.min_ov)
            ov = filter_fpa(ov)
            found = set()
            for o in ov:
                pair = tuple(sorted((o.q_name, o.t_name)))
                found.add(pair)
            tp = len(found & truth)
            rec = tp / max(len(truth), 1)
            prec = tp / max(len(found), 1)
            line.append(
                f"{label}: recall={rec:.3f} precision={prec:.3f} "
                f"reported={len(found)}"
            )
        print(" | ".join(line))


if __name__ == "__main__":
    main()
