#!/usr/bin/env python
"""Differential test: REFERENCE vechat_racon binary vs vechat_tpu racon CLI.

Builds the reference binary offline (refbuild/build.sh — reference sources +
local edlib/thread_pool shims whose tie-breaks match ops/pairwise.py), feeds
BOTH implementations identical (reads, PAF, targets) inputs, and byte-diffs
the emitted FASTA across a matrix of flag combinations. Every divergence is
a semantics bug that self-generated goldens cannot see (VERDICT r2 missing
#2; BASELINE.md correctness target is byte-identity to the reference binary).

Usage: python scripts/diff_reference.py [--keep] [--reads PATH]
Exit 0 = all cases byte-identical.
"""

import argparse
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

REF_BIN = os.path.join(REPO, "refbuild", "bin", "vechat_racon")

# flag matrix: (case name, extra argv shared by both surfaces)
CASES = [
    ("haplo_wrapper", ["-f", "-p", "-d", "0.2", "-s", "0.2"]),
    ("haplo_binary_defaults", ["-f", "-p"]),
    ("haplo_k2", ["-f", "-p", "-k", "2"]),
    ("linear", ["-f"]),
    # 'T' is long-option-only in the reference getopt table (main.cpp:24,68)
    ("linear_no_trim", ["-f", "--no-trimming"]),
    ("linear_unpolished", ["-f", "-u"]),
    ("haplo_q_neg", ["-f", "-p", "-q", "-1"]),
    ("haplo_w300", ["-f", "-p", "-w", "300"]),
]


def ensure_ref_binary():
    if os.path.exists(REF_BIN):
        return
    print("[diff] building reference binary...", file=sys.stderr)
    subprocess.run(
        ["bash", os.path.join(REPO, "refbuild", "build.sh")],
        check=True,
        capture_output=True,
        text=True,
    )


def make_paf(reads_path: str, platform: str, out_path: str) -> int:
    """Round-1 overlap generation through our own overlapper + filters
    (scripts/vechat:37-39 pipeline: ava | block>=500 | fpa drop)."""
    from vechat_tpu.io.fastx import read_fastx
    from vechat_tpu.io.paf import write_paf
    from vechat_tpu.pipeline.overlapper import (
        OverlapParams,
        filter_fpa,
        filter_length_identity,
        find_overlaps,
    )

    reads = read_fastx(reads_path)
    ov = find_overlaps(reads, OverlapParams.for_platform(platform))
    ov = filter_length_identity(ov, min_block=500)
    ov = filter_fpa(ov)
    write_paf(ov, out_path)
    return len(ov)


def run_case(name, extra, reads, paf, workdir):
    ref_out = os.path.join(workdir, f"{name}.ref.fa")
    our_out = os.path.join(workdir, f"{name}.ours.fa")
    with open(ref_out, "w") as fh:
        r = subprocess.run(
            [REF_BIN, *extra, "-t", "1", reads, paf, reads],
            stdout=fh,
            stderr=subprocess.PIPE,
            text=True,
            timeout=600,
        )
    if r.returncode != 0:
        return f"REF-FAIL rc={r.returncode}: {r.stderr[-200:]}"
    with open(our_out, "w") as fh:
        r = subprocess.run(
            [
                sys.executable,
                "-m",
                "vechat_tpu.cli.racon_main",
                *extra,
                "-t",
                "1",
                "--backend",
                "host",
                reads,
                paf,
                reads,
            ],
            stdout=fh,
            stderr=subprocess.PIPE,
            text=True,
            timeout=600,
            cwd=REPO,
        )
    if r.returncode != 0:
        return f"OURS-FAIL rc={r.returncode}: {r.stderr[-200:]}"
    with open(ref_out, "rb") as a, open(our_out, "rb") as b:
        da, db = a.read(), b.read()
    if da == db:
        return None
    # locate first divergence for the report
    n = min(len(da), len(db))
    pos = next((i for i in range(n) if da[i] != db[i]), n)
    return (
        f"DIVERGE at byte {pos} (ref {len(da)}B vs ours {len(db)}B): "
        f"ref[..]={da[max(0,pos-30):pos+30]!r} ours[..]={db[max(0,pos-30):pos+30]!r}"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", default=os.path.join(REPO, "tests", "data", "golden2_reads.fq"))
    ap.add_argument("--platform", default="pb")
    ap.add_argument("--keep", action="store_true", help="keep work dir")
    ap.add_argument("--cases", nargs="*", help="subset of case names")
    args = ap.parse_args()

    ensure_ref_binary()
    workdir = tempfile.mkdtemp(prefix="diffref_")
    paf = os.path.join(workdir, "overlaps.paf")
    n = make_paf(args.reads, args.platform, paf)
    print(f"[diff] {n} overlaps -> {paf}", file=sys.stderr)

    failures = 0
    for name, extra in CASES:
        if args.cases and name not in args.cases:
            continue
        msg = run_case(name, extra, args.reads, paf, workdir)
        status = "OK " if msg is None else "FAIL"
        print(f"[diff] {status} {name}" + (f" — {msg}" if msg else ""))
        failures += msg is not None
    if args.keep or failures:
        print(f"[diff] artifacts in {workdir}", file=sys.stderr)
    else:
        import shutil

        shutil.rmtree(workdir, ignore_errors=True)
    print(f"[diff] {failures} failing case(s)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
