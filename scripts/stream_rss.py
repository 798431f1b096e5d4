#!/usr/bin/env python
"""Peak-RSS measurement for the bounded-memory input path (VERDICT r3 #7).

Generates a synthetic FASTA of --gbp gigabases, then measures ru_maxrss in
separate subprocesses for:
  full   : read_fastx (whole pool resident — the non-stream driver's profile)
  stream : fastx_names + one chunk's subset_fastx (the --stream driver's
           per-chunk profile)

The reference parses in 1 GiB chunks (src/polisher.cpp:30,234-272) but keeps
every record; --stream goes further: the correction phase holds one chunk's
working set only (see cli/vechat_main.run_round_stream).

Usage: python scripts/stream_rss.py [--gbp 1.0] [--read-len 20000]
"""

import argparse
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def generate(path: str, gbp: float, read_len: int) -> int:
    import numpy as np

    rng = np.random.default_rng(0)
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    n_reads = int(gbp * 1e9 / read_len)
    with open(path, "w") as fw:
        for i in range(n_reads):
            seq = rng.choice(acgt, size=read_len).tobytes().decode()
            fw.write(f">r{i}\n{seq}\n")
    return n_reads


def _rss_child(mode: str, path: str, chunk: int):
    import resource

    from vechat_tpu.io.fastx import fastx_names, read_fastx, subset_fastx

    if mode == "full":
        pool = read_fastx(path)
        n = len(pool)
    else:
        names = fastx_names(path)
        sub = subset_fastx(path, names[:chunk])
        n = len(sub)
    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(f"RSS_RESULT {mode} records={n} peak_rss_mb={peak_mb:.0f}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gbp", type=float, default=1.0)
    ap.add_argument("--read-len", type=int, default=20000)
    ap.add_argument("--chunk", type=int, default=500, help="reads per chunk")
    ap.add_argument("--child", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--path", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child:
        _rss_child(args.child, args.path, args.chunk)
        return

    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "pool.fa")
    n = generate(path, args.gbp, args.read_len)
    sz = os.path.getsize(path) / 1e9
    print(f"generated {n} reads, {sz:.2f} GB at {path}")
    for mode in ("stream", "full"):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", mode,
             "--path", path, "--chunk", str(args.chunk),
             "--read-len", str(args.read_len)],
            capture_output=True, text=True,
        )
        print(r.stdout.strip() or r.stderr[-300:])
    os.unlink(path)


if __name__ == "__main__":
    main()
