#!/usr/bin/env python
"""End-to-end pipeline benchmark + accuracy report on a synthetic 2-strain
mixture (the small-scale version of BASELINE.json config #4).

Generates a two-strain community (divergence ~1%), simulates noisy long
reads, runs the full two-round vechat pipeline, and reports:
  * corrected reads/sec (wall clock, whole pipeline)
  * mean per-base error before/after correction
  * strain preservation: fraction of corrected reads closer to their own
    strain than to the other (the capability the reference exists for)

Usage: python scripts/e2e_bench.py [--reads N] [--genome-len L] [--backend auto|host|pallas]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np  # noqa: E402


def rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def mutate(rng, seq, sub, ins, dele):
    out = []
    for c in seq:
        r = rng.random()
        if r < sub:
            out.append(rng.choice([b for b in "ACGT" if b != c]))
        elif r < sub + dele:
            continue
        else:
            out.append(c)
            if rng.random() < ins:
                out.append(rng.choice(list("ACGT")))
    return "".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=60)
    ap.add_argument("--genome-len", type=int, default=6000)
    ap.add_argument("--read-len", type=int, default=2500)
    ap.add_argument("--error-rate", type=float, default=0.08)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-t", "--threads", type=int, default=1)
    args = ap.parse_args()

    from vechat_tpu.io.fastx import SeqRecord, write_fastx
    from vechat_tpu.ops.encode import encode
    from vechat_tpu.ops.pairwise import edit_distance, edit_distance_infix
    from vechat_tpu.cli.vechat_main import main as vechat_main
    from vechat_tpu.io.fastx import read_fastx

    rng = np.random.default_rng(args.seed)
    strain_a = rand_seq(rng, args.genome_len)
    # strain B: ~1% divergence
    b = list(strain_a)
    n_var = max(1, args.genome_len // 100)
    var_pos = rng.choice(args.genome_len, size=n_var, replace=False)
    for p in var_pos:
        b[p] = rng.choice([c for c in "ACGT" if c != b[p]])
    strain_b = "".join(b)

    er = args.error_rate
    reads = []
    truth = []
    for i in range(args.reads):
        src = strain_a if i % 2 == 0 else strain_b
        start = int(rng.integers(0, max(1, len(src) - args.read_len)))
        frag = src[start : start + args.read_len]
        data = mutate(rng, frag, er * 0.45, er * 0.3, er * 0.25)
        reads.append(SeqRecord(f"r{i}", data, "5" * len(data)))  # Q20
        truth.append((frag, src is strain_a))

    import tempfile

    tmp = tempfile.mkdtemp()
    inp = os.path.join(tmp, "reads.fq")
    outp = os.path.join(tmp, "corrected.fa")
    write_fastx(reads, inp, fmt="fq")

    t0 = time.perf_counter()
    rc = vechat_main(
        [inp, "-o", outp, "--platform", "ont", "--backend", args.backend,
         "-t", str(args.threads)]
    )
    dt = time.perf_counter() - t0
    assert rc == 0
    corrected = read_fastx(outp)

    name_to_truth = {f"r{i}": truth[i] for i in range(args.reads)}

    def err(seq, ref):
        # infix metric: corrected reads are coverage-trimmed (racon kTGS
        # semantics), so align them with free reference ends
        if not seq:
            return 1.0
        return edit_distance_infix(encode(seq), encode(ref)) / max(len(seq), 1)

    before = []
    after = []
    own_strain = 0
    n_scored = 0
    for rec in corrected:
        base_name = rec.name.split()[0].rstrip("r")
        if base_name not in name_to_truth:
            continue
        frag, is_a = name_to_truth[base_name]
        after.append(err(rec.data, strain_a if is_a else strain_b))
        n_scored += 1
        # strain preservation: infix-closer to own strain than the other
        own = edit_distance_infix(encode(rec.data), encode(strain_a if is_a else strain_b))
        oth = edit_distance_infix(encode(rec.data), encode(strain_b if is_a else strain_a))
        if own <= oth:
            own_strain += 1
    for i, r in enumerate(reads):
        before.append(
            edit_distance(encode(r.data), encode(truth[i][0])) / max(len(r.data), 1)
        )

    print(
        f"reads={args.reads} corrected={len(corrected)} "
        f"wall={dt:.1f}s reads/sec={len(corrected) / dt:.2f}"
    )
    print(
        f"mean error before={np.mean(before) * 100:.2f}% "
        f"after={np.mean(after) * 100:.2f}% "
        f"(reduction {np.mean(before) / max(np.mean(after), 1e-9):.1f}x)"
    )
    print(f"strain preservation: {own_strain}/{n_scored}")


if __name__ == "__main__":
    main()
