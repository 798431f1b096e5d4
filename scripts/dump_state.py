#!/usr/bin/env python
"""vechat_tpu-side state dumper, format-compatible with refbuild/dump_state
(the reference-introspection harness). Diff the two outputs to localize
where the pipelines diverge: window construction vs per-window consensus.

Usage mirrors dump_state: dump_state.py <seqs> <paf> <target> [--haplotype]
[-d F] [-s F] [-k N] [-w N] [-q F] [-e F] [--no-trim] [--windows-only]
"""

import argparse
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from vechat_tpu.io.fastx import read_fastx  # noqa: E402
from vechat_tpu.io.paf import read_paf  # noqa: E402
from vechat_tpu.ops.encode import decode  # noqa: E402
from vechat_tpu.pipeline.polisher import (  # noqa: E402
    POLISHER_FRAGMENT,
    Polisher,
)
from vechat_tpu.pipeline.windows import (  # noqa: E402
    WINDOW_TYPE_NGS,
    HostAlignerBackend,
    generate_consensus_haplotype,
    generate_consensus_linear,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sequences")
    ap.add_argument("overlaps")
    ap.add_argument("target")
    ap.add_argument("--haplotype", action="store_true")
    ap.add_argument("-d", type=float, default=0.22)
    ap.add_argument("-s", type=float, default=0.19)
    ap.add_argument("-k", type=int, default=3)
    ap.add_argument("-w", type=int, default=500)
    ap.add_argument("-q", type=float, default=10.0)
    ap.add_argument("-e", type=float, default=0.3)
    ap.add_argument("--no-trim", action="store_true")
    ap.add_argument("--windows-only", action="store_true")
    args = ap.parse_args()

    backend = HostAlignerBackend(3, -5, -4)
    p = Polisher(
        polisher_type=POLISHER_FRAGMENT,
        haplotype=args.haplotype,
        min_confidence=args.d,
        min_support=args.s,
        num_prune=args.k,
        window_length=args.w,
        quality_threshold=args.q,
        error_threshold=args.e,
        trim=not args.no_trim,
        match=3,
        mismatch=-5,
        gap=-4,
        backend=backend,
    )
    p.initialize(
        read_fastx(args.target),
        read_fastx(args.sequences),
        read_paf(args.overlaps),
    )

    print(f"NWIN {len(p.windows)}")
    for w in p.windows:
        wt = "NGS" if w.window_type == WINDOW_TYPE_NGS else "TGS"
        print(f"WINDOW {w.target_id} {w.rank} {wt}")
        bq = w.backbone_quality
        if bq is None:
            # reference backbone quality for FASTA targets is the dummy
            # '!'-string span (polisher.cpp:399-400)
            bq = "!" * len(w.backbone_codes)
        # reference positions_[0] is (0, 0) (window.cpp:40)
        print(f"B 0 0 {decode(w.backbone_codes)} {bq}")
        for layer in w.layers:
            ql = layer.quality if layer.quality else "-"
            print(
                f"L {layer.begin} {layer.end} {decode(layer.codes)} {ql}"
            )
    if args.windows_only:
        return 0
    if args.haplotype:
        generate_consensus_haplotype(
            p.windows, backend, args.d, args.s, args.k
        )
    else:
        generate_consensus_linear(p.windows, backend, not args.no_trim)
    for w in p.windows:
        cons = decode(w.consensus_codes) if w.consensus_codes is not None else ""
        print(f"CONSENSUS {w.target_id} {w.rank} {1 if w.polished else 0} {cons}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
