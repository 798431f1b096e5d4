"""`vechat` — the two-round correction pipeline CLI
(reference: scripts/vechat:206-397).

Round 1: overlap (native minimizer overlapper or external PAF) -> filter ->
haplotype-aware variation-graph correction.
Round 2: overlap corrected reads at base level -> keep >=1000 bp, >=0.99
identity -> linear racon consensus.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional

from ..io.fastx import SeqRecord, read_fastx, write_fasta
from ..io.paf import read_paf, write_paf
from ..pipeline.overlapper import (
    OverlapParams,
    filter_fpa,
    filter_length_identity,
    find_overlaps,
    find_overlaps_auto,
    refine_identity,
    scrub_reads,
)
from ..pipeline.polisher import POLISHER_FRAGMENT, Polisher
from ..utils.logger import Logger


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="vechat",
        description="Haplotype-aware error correction for noisy long reads "
        "using variation graphs (TPU-native)",
    )
    p.add_argument("sequences", help="FASTA/FASTQ(.gz) reads to correct")
    p.add_argument("-o", "--outfile", default="reads.corrected.fa")
    p.add_argument("--platform", default="pb", choices=["pb", "ont"])
    p.add_argument(
        "--sensitive", action="store_true",
        help="high-error-rate overlap presets (shorter k, denser "
        "minimizers) for >=15%%-error reads",
    )
    p.add_argument(
        "--no-auto-sensitive", action="store_true",
        help="disable automatic escalation to the sensitive presets when "
        "round-1 overlap health looks degraded (high divergence or thin "
        "per-read coverage)",
    )
    p.add_argument("--split", action="store_true", help="chunk targets")
    p.add_argument("--split-size", type=int, default=1000000)
    p.add_argument(
        "--stream",
        action="store_true",
        help="bounded-memory chunked mode: rounds pass FASTA/PAF files, each "
        "chunk loads only its own targets + overlapping queries (the "
        "reference's extract_sub_sequences flow, scripts/vechat:99-169, "
        "with bioparser's chunked-parse memory profile, "
        "src/polisher.cpp:234-272). Implies --split. Peak RSS = full read "
        "set ONLY during the global overlap-discovery phase (the minimap2 "
        "index analog); correction holds one chunk's working set",
    )
    p.add_argument(
        "--resume-dir",
        default=None,
        metavar="DIR",
        help="with --split: checkpoint each corrected chunk into DIR and "
        "skip already-completed chunks on restart (the reference's "
        "chunk-level manual restart, scripts/vechat_hpc.fast.sh:62, "
        "made automatic)",
    )
    p.add_argument("--scrub", action="store_true", help="scrub chimeric reads")
    p.add_argument("-u", "--include-unpolished", action="store_true")
    p.add_argument("--linear", action="store_true", help="linear correction only")
    p.add_argument("-d", "--min-confidence", type=float, default=0.2)
    p.add_argument("-s", "--min-support", type=float, default=0.2)
    p.add_argument("--min-ovlplen-cns", type=int, default=1000)
    p.add_argument("--min-identity-cns", type=float, default=0.99)
    p.add_argument("-w", "--window-length", type=int, default=500)
    p.add_argument("-q", "--quality-threshold", type=float, default=10.0)
    p.add_argument("-e", "--error-threshold", type=float, default=0.3)
    p.add_argument("-t", "--threads", type=int, default=1)
    p.add_argument("-m", "--match", type=int, default=3)
    p.add_argument("-x", "--mismatch", type=int, default=-5)
    p.add_argument("-g", "--gap", type=int, default=-4)
    p.add_argument(
        "--base",
        action="store_true",
        help="round 1 uses base-level overlaps filtered by --min-identity "
        "(reference: scripts/vechat:246-248, minimap2 -cx + identity>=0.8)",
    )
    p.add_argument(
        "--min-identity",
        type=float,
        default=0.8,
        help="min overlap identity for --base round-1 overlaps "
        "(reference: scripts/vechat:41-45)",
    )
    p.add_argument(
        "--overlaps",
        default=None,
        help="use a precomputed PAF instead of the native overlapper (round 1)",
    )
    p.add_argument("--backend", choices=["auto", "host", "jax", "pallas"], default="auto")
    p.add_argument("--keep-paf", default=None, help="write round-1 overlaps here")
    p.add_argument(
        "--profile",
        default=None,
        metavar="DIR",
        help="capture a jax profiler trace of the run into DIR "
        "(view with tensorboard / xprof)",
    )
    p.add_argument(
        "--consensus-only",
        action="store_true",
        help="run only the >=0.99-identity linear consensus round on the "
        "input (the scripts/vechat.iter2.py standalone driver)",
    )
    p.add_argument(
        "--min-corrected-length",
        type=int,
        default=0,
        help="drop corrected reads shorter than this "
        "(the scripts/filter_fa post-filter; HPC flow used 1000)",
    )
    return p


def _discover_overlaps(reads, args, iteration, logger, target_names=None):
    """Round-aware native overlap discovery. Round 1 auto-escalates to the
    sensitive presets when overlap health is degraded (find_overlaps_auto;
    VERDICT r4 item 8) unless --no-auto-sensitive or --sensitive was given;
    round 2 runs on corrected reads where the default presets are fine."""
    params = OverlapParams.for_platform(
        args.platform, sensitive=getattr(args, "sensitive", False)
    )
    if iteration == 1 and not getattr(args, "no_auto_sensitive", False):
        overlaps, _ = find_overlaps_auto(
            reads, params, target_names=target_names, log=logger.log
        )
        return overlaps
    return find_overlaps(reads, params, target_names=target_names)


def _correction_sane(
    targets: List[SeqRecord],
    corrected: List[SeqRecord],
    logger: Logger,
    sample: int = 8,
    max_norm_dist: float = 0.4,
) -> bool:
    """Cheap output-corruption detector (VERDICT r4 item 10). A corrected
    read is the error-corrected, coverage-trimmed version of its raw self,
    so its infix edit distance to the raw read stays within the raw error
    envelope (error_threshold caps overlaps at 30% divergence,
    src/main.cpp:48), while unrelated/garbage content sits at the random-
    sequence null of ~0.49 normalized — 0.4 splits the two regimes. The r4 worker-instability event produced output so
    corrupted that the round-2 overlapper found 0 of ~362 overlaps — reads
    that would fail this check by a wide margin. Samples evenly spaced
    corrected reads; corrupt = majority insane."""
    if not corrected:
        return True
    from ..ops.encode import encode
    from ..ops.pairwise import edit_distance_infix

    raw_by_name = {t.name: t for t in targets}
    idx = range(0, len(corrected), max(1, len(corrected) // sample))
    checked = insane = 0
    for i in list(idx)[:sample]:
        c = corrected[i]
        base = c.name.split()[0]
        raw = raw_by_name.get(base[:-1] if base.endswith("r") else base)
        if raw is None or len(c.data) == 0:
            continue
        checked += 1
        d = edit_distance_infix(encode(c.data), encode(raw.data))
        if d / max(1, len(c.data)) > max_norm_dist:
            insane += 1
    if checked and insane * 2 > checked:
        logger.log(
            f"correction sanity check FAILED: {insane}/{checked} sampled "
            f"reads do not resemble their raw selves"
        )
        return False
    return True


def _polish_guarded(
    targets: List[SeqRecord],
    queries: List[SeqRecord],
    overlaps,
    linear: bool,
    args,
    logger: Logger,
) -> List[SeqRecord]:
    """Build the polisher, polish, and retry ONCE with a fresh backend when
    the output fails the corruption guard (the r4 worker-instability
    signature: a degraded remote device worker silently emitting garbage —
    reference analog: per-window CPU fallback on GPU consensus failure,
    src/cuda/cudapolisher.cpp:355-374)."""
    from .racon_main import make_backend

    def one_pass() -> List[SeqRecord]:
        polisher = Polisher(
            polisher_type=POLISHER_FRAGMENT,
            haplotype=not linear,
            min_confidence=args.min_confidence,
            min_support=args.min_support,
            num_prune=3,
            window_length=args.window_length,
            quality_threshold=args.quality_threshold,
            error_threshold=args.error_threshold,
            trim=True,
            match=args.match,
            mismatch=args.mismatch,
            gap=args.gap,
            backend=make_backend(
                args.backend, args.match, args.mismatch, args.gap,
                threads=args.threads,
            ),
            logger=logger,
            threads=args.threads,
        )
        polisher.initialize(targets, queries, overlaps)
        return polisher.polish(
            drop_unpolished_sequences=not args.include_unpolished
        )

    corrected = one_pass()
    if not _correction_sane(targets, corrected, logger):
        logger.log("retrying correction pass with a fresh backend")
        corrected = one_pass()
        if not _correction_sane(targets, corrected, logger):
            logger.log(
                "correction sanity check failed twice; emitting the retry "
                "result — inspect the device worker"
            )
    return corrected


def run_round(
    reads: List[SeqRecord],
    iteration: int,
    args,
    logger: Logger,
    overlaps_path: Optional[str] = None,
) -> List[SeqRecord]:
    """One correction round (reference: scripts/vechat:17-97)."""
    linear = args.linear or iteration == 2

    if overlaps_path:
        overlaps = read_paf(overlaps_path)
    else:
        overlaps = _discover_overlaps(reads, args, iteration, logger)
        if iteration == 1:
            # minimap2 | awk '$11>=500' | fpa drop (scripts/vechat:37-39)
            overlaps = filter_length_identity(overlaps, min_block=500)
            overlaps = filter_fpa(overlaps)
            if args.base:
                # base-level round 1: minimap2 -cx + identity >= min_identity
                # (scripts/vechat:41-45,246-248)
                from .racon_main import make_backend as _mb

                be = _mb(args.backend, args.match, args.mismatch, args.gap)
                overlaps = refine_identity(overlaps, reads, be)
                overlaps = filter_length_identity(
                    overlaps, min_block=500, min_identity=args.min_identity
                )
        else:
            # >=1000bp, >=0.99 identity consensus round (scripts/vechat:47-49):
            # base-level identity like minimap2 -c, via exact re-alignment
            overlaps = filter_length_identity(
                overlaps, min_block=args.min_ovlplen_cns
            )
            overlaps = filter_fpa(overlaps)
            from .racon_main import make_backend as _mb

            be = _mb(args.backend, args.match, args.mismatch, args.gap)
            overlaps = refine_identity(overlaps, reads, be)
            overlaps = filter_length_identity(
                overlaps,
                min_block=args.min_ovlplen_cns,
                min_identity=args.min_identity_cns,
            )
        if args.keep_paf and iteration == 1:
            write_paf(overlaps, args.keep_paf)
    logger.log(f"round {iteration}: {len(overlaps)} overlaps")

    return _polish_guarded(reads, reads, overlaps, linear, args, logger)


def run_round_split(
    reads: List[SeqRecord],
    iteration: int,
    args,
    logger: Logger,
    overlaps_path: Optional[str] = None,
    orig_fastq: bool = False,
) -> List[SeqRecord]:
    """Chunked targets: correct a chunk at a time against the full query set,
    concatenate chunk outputs in order (reference: scripts/vechat:300-361,
    where `split -l N` makes line-count chunks and results are `cat`-merged
    in filename order)."""
    fmt_lines = 4 if any(r.quality is not None for r in reads) else 2
    split_size = args.split_size
    if iteration > 1:
        # round >1 inputs are FASTA (2 lines/record); the reference halves the
        # split line count when the ORIGINAL input was fastq so the number of
        # reads per chunk stays constant across rounds (scripts/vechat:319-320)
        split_size = args.split_size // 2 if orig_fastq else args.split_size
        fmt_lines = 2
    reads_per_chunk = max(1, split_size // fmt_lines)

    resume_dir = getattr(args, "resume_dir", None)
    if resume_dir:
        os.makedirs(resume_dir, exist_ok=True)

    out: List[SeqRecord] = []
    for off in range(0, len(reads), reads_per_chunk):
        chunk = reads[off : off + reads_per_chunk]
        ck = off // reads_per_chunk + 1
        ck_path = (
            os.path.join(resume_dir, f"round{iteration}.chunk{ck:05d}.rec")
            if resume_dir
            else None
        )
        if ck_path and os.path.exists(ck_path):
            from ..parallel.dist import read_records_blob

            logger.log(
                f"round {iteration}: chunk {ck} resumed from checkpoint"
            )
            out.extend(read_records_blob(ck_path))
            continue
        logger.log(
            f"round {iteration}: chunk {ck} ({len(chunk)} targets)"
        )
        corrected = run_round_targets(
            chunk, reads, iteration, args, logger, overlaps_path
        )
        if ck_path:
            from ..parallel.dist import write_records_blob

            write_records_blob(corrected, ck_path)
        out.extend(corrected)
    return out


def run_round_targets(
    targets: List[SeqRecord],
    queries: List[SeqRecord],
    iteration: int,
    args,
    logger: Logger,
    overlaps_path: Optional[str] = None,
    overlaps_records: Optional[List] = None,
) -> List[SeqRecord]:
    """One correction pass with distinct target/query sets."""
    linear = args.linear or iteration == 2
    if overlaps_records is not None:
        overlaps = overlaps_records
    elif overlaps_path:
        overlaps = read_paf(overlaps_path)
    else:
        # overlap chunk targets vs all queries (both roles present);
        # target_names restricts pair expansion so each chunk does ~1/K of
        # the all-vs-all work instead of recomputing the full matrix
        # (reference per-chunk query subsetting, scripts/vechat:99-169)
        pool = {r.name: r for r in queries}
        for t in targets:
            pool.setdefault(t.name, t)
        tnames_set = {t.name for t in targets}
        all_reads = list(pool.values())
        restrict = tnames_set if len(targets) < len(all_reads) else None
        overlaps = _discover_overlaps(
            all_reads, args, iteration, logger, target_names=restrict
        )
        if iteration == 1:
            overlaps = filter_length_identity(overlaps, min_block=500)
            overlaps = filter_fpa(overlaps)
            if args.base:
                from .racon_main import make_backend as _mb

                be = _mb(args.backend, args.match, args.mismatch, args.gap)
                overlaps = refine_identity(overlaps, list(pool.values()), be)
                overlaps = filter_length_identity(
                    overlaps, min_block=500, min_identity=args.min_identity
                )
        else:
            overlaps = filter_length_identity(
                overlaps, min_block=args.min_ovlplen_cns
            )
            overlaps = filter_fpa(overlaps)
            from .racon_main import make_backend as _mb

            be = _mb(args.backend, args.match, args.mismatch, args.gap)
            overlaps = refine_identity(overlaps, list(pool.values()), be)
            overlaps = filter_length_identity(
                overlaps,
                min_block=args.min_ovlplen_cns,
                min_identity=args.min_identity_cns,
            )
        # keep only overlaps whose target is in this chunk
        tnames = {t.name for t in targets}
        overlaps = [ov for ov in overlaps if ov.t_name in tnames]

    if not overlaps:
        # a chunk whose targets attracted no overlaps after filtering (thin
        # coverage): nothing can be polished — matches racon's default
        # drop-unpolished semantics instead of failing the whole run. With
        # -u/--include-unpolished the targets pass through unpolished with
        # the same header tags polish() would emit for a zero-coverage read
        # (reference: racon -u keeps unpolished sequences, src/main.cpp:86-88)
        logger.log(
            f"round {iteration}: no overlaps for this chunk; "
            f"{len(targets)} targets left unpolished"
        )
        if args.include_unpolished:
            return [
                SeqRecord(
                    name=f"{t.name}r LN:i:{len(t.data)} RC:i:0 XC:f:0.000000",
                    data=t.data,
                )
                for t in targets
            ]
        return []

    return _polish_guarded(targets, queries, overlaps, linear, args, logger)


def run_round_stream(
    reads_path: str,
    iteration: int,
    args,
    logger: Logger,
    out_path: str,
    overlaps_path: Optional[str] = None,
    orig_fastq: bool = False,
) -> int:
    """Bounded-memory chunked round: rounds exchange FILES, each chunk loads
    only its targets plus the queries its overlaps name (the reference's
    per-chunk extract_sub_sequences flow, scripts/vechat:54-55,99-169).

    Memory profile: the full read set is resident only during the global
    overlap-discovery phase (reads only — the minimap2 index analog); every
    correction chunk holds one chunk's targets, its overlapping queries and
    its overlap records. The inter-round corrected pool lives on disk.

    Per-chunk window-type selection (NGS/TGS by mean query length,
    src/polisher.cpp:284-285) sees the chunk's query subset — exactly like
    the reference's per-chunk racon invocation, and unlike the in-memory
    --split path which sees the full pool.

    Returns the number of corrected reads written to out_path.
    """
    import tempfile

    from ..io.paf import iter_paf, write_paf

    tmp_paf = None
    if overlaps_path is None:
        # global overlap phase: the one O(total reads) resident phase
        reads = read_fastx(reads_path)
        overlaps = _discover_overlaps(reads, args, iteration, logger)
        if iteration == 1:
            overlaps = filter_length_identity(overlaps, min_block=500)
            overlaps = filter_fpa(overlaps)
            if args.base:
                from .racon_main import make_backend as _mb

                be = _mb(args.backend, args.match, args.mismatch, args.gap)
                overlaps = refine_identity(overlaps, reads, be)
                overlaps = filter_length_identity(
                    overlaps, min_block=500, min_identity=args.min_identity
                )
        else:
            overlaps = filter_length_identity(
                overlaps, min_block=args.min_ovlplen_cns
            )
            overlaps = filter_fpa(overlaps)
            from .racon_main import make_backend as _mb

            be = _mb(args.backend, args.match, args.mismatch, args.gap)
            overlaps = refine_identity(overlaps, reads, be)
            overlaps = filter_length_identity(
                overlaps,
                min_block=args.min_ovlplen_cns,
                min_identity=args.min_identity_cns,
            )
        fd, tmp_paf = tempfile.mkstemp(suffix=".paf")
        os.close(fd)
        write_paf(overlaps, tmp_paf)
        logger.log(
            f"round {iteration}: {len(overlaps)} overlaps -> {tmp_paf}"
        )
        del reads, overlaps  # free the pool before chunked correction
        overlaps_path = tmp_paf

    from ..io.fastx import fastx_names, subset_fastx

    names = fastx_names(reads_path)
    fmt_lines = 4 if (orig_fastq and iteration == 1) else 2
    split_size = args.split_size
    if iteration > 1 and orig_fastq:
        split_size = args.split_size // 2
    reads_per_chunk = max(1, split_size // fmt_lines)

    resume_dir = getattr(args, "resume_dir", None)
    if resume_dir:
        os.makedirs(resume_dir, exist_ok=True)

    n_out = 0
    with open(out_path, "w") as fw:
        for off in range(0, len(names), reads_per_chunk):
            chunk_names = names[off : off + reads_per_chunk]
            chunk_set = set(chunk_names)
            ck = off // reads_per_chunk + 1
            ck_path = (
                os.path.join(
                    resume_dir, f"round{iteration}.chunk{ck:05d}.rec"
                )
                if resume_dir
                else None
            )
            if ck_path and os.path.exists(ck_path):
                from ..parallel.dist import read_records_blob

                corrected = read_records_blob(ck_path)
                logger.log(
                    f"round {iteration}: chunk {ck} resumed from checkpoint"
                )
            else:
                chunk_ovl = [
                    ov
                    for ov in iter_paf(overlaps_path)
                    if ov.t_name in chunk_set
                ]
                qnames = {ov.q_name for ov in chunk_ovl} | chunk_set
                recs = subset_fastx(reads_path, qnames)
                by_name = {r.name: r for r in recs}
                targets = [
                    by_name[n] for n in chunk_names if n in by_name
                ]
                logger.log(
                    f"round {iteration}: chunk {ck} ({len(targets)} targets, "
                    f"{len(recs)} resident reads, {len(chunk_ovl)} overlaps)"
                )
                corrected = run_round_targets(
                    targets, recs, iteration, args, logger,
                    overlaps_records=chunk_ovl,
                )
                if ck_path:
                    from ..parallel.dist import write_records_blob

                    write_records_blob(corrected, ck_path)
            write_fasta(corrected, fw)
            n_out += len(corrected)
    if tmp_paf:
        os.unlink(tmp_paf)
    return n_out


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logger = Logger()
    logger.tick()

    profiler_ctx = None
    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)
        profiler_ctx = args.profile

    reads = read_fastx(args.sequences)
    logger.log(f"loaded {len(reads)} reads")

    if args.scrub:
        params = OverlapParams.for_platform(args.platform, sensitive=getattr(args, 'sensitive', False))
        min_cov = 3 if args.platform == "pb" else 4
        scrub_overlaps = find_overlaps(reads, params)
        reads = scrub_reads(reads, scrub_overlaps, min_coverage=min_cov)
        logger.log(f"scrubbed to {len(reads)} reads")

    if args.consensus_only:
        # standalone consensus round (reference: scripts/vechat.iter2.py)
        rounds = [2]
    elif args.linear:
        rounds = [1]
    else:
        rounds = [1, 2]
    iterations = len(rounds)
    orig_fastq = any(r.quality is not None for r in reads)

    # multi-host sharding (reference: scripts/vechat_hpc.fast.sh:28-60):
    # JAX_NUM_PROCESSES/JAX_PROCESS_ID shard the TARGET reads per round; the
    # corrected set is re-merged in rank order between rounds so round 2 sees
    # the full round-1 output, exactly like the reference's cat merge
    from ..parallel.dist import (
        ProcessGroup,
        exchange_records,
        finish_exchange,
        shard_targets,
    )

    group = ProcessGroup.from_env()
    if group.num_processes > 1 and os.environ.get("VECHAT_DIST_INIT") == "1":
        group.initialize_jax()

    if args.stream and group.num_processes == 1:
        # bounded-memory file-mediated rounds (run_round_stream docstring)
        import tempfile

        cur_path = args.sequences
        if args.scrub:
            # scrubbing needs the whole pool once; write the scrubbed set out
            fd, scrubbed = tempfile.mkstemp(suffix=".fa")
            os.close(fd)
            write_fasta(reads, scrubbed)
            cur_path = scrubbed
        del reads
        tmp_outs = []
        for idx, i in enumerate(rounds, start=1):
            overlaps_path = args.overlaps if idx == 1 else None
            fd, rpath = tempfile.mkstemp(suffix=f".r{idx}.fa")
            os.close(fd)
            tmp_outs.append(rpath)
            n = run_round_stream(
                cur_path, i, args, logger, rpath, overlaps_path,
                orig_fastq=orig_fastq,
            )
            logger.log(f"round {i} complete: {n} corrected reads")
            cur_path = rpath
        # final filter + rename, streaming
        from ..io.fastx import iter_fastx

        with open(args.outfile, "w") as fw:
            for rec in iter_fastx(cur_path, shorten_names=False):
                if len(rec.data) >= args.min_corrected_length:
                    fw.write(f">{rec.name}\n{rec.data}\n")
        for p in tmp_outs:
            os.unlink(p)
        if profiler_ctx:
            import jax

            jax.profiler.stop_trace()
            logger.log(f"profiler trace written to {profiler_ctx}")
        logger.total("total =")
        return 0

    for idx, i in enumerate(rounds, start=1):
        overlaps_path = args.overlaps if idx == 1 else None
        if group.num_processes > 1:
            my_targets = shard_targets(reads, group)
            logger.log(
                f"round {i}: process {group.process_id}/{group.num_processes} "
                f"owns {len(my_targets)} targets"
            )
            mine = run_round_targets(
                my_targets, reads, i, args, logger, overlaps_path
            )
            reads = exchange_records(mine, group, f"{args.outfile}.r{idx}")
        elif args.split:
            reads = run_round_split(
                reads, i, args, logger, overlaps_path, orig_fastq=orig_fastq
            )
        else:
            reads = run_round(reads, i, args, logger, overlaps_path)
        # the reference round-trips through FASTA files between rounds, which
        # truncates names at the first whitespace (bioparser Shorten); mirror
        # that so round-2 headers match (e.g. "read0r" + new tags)
        if idx < iterations:
            reads = [
                SeqRecord(r.name.split()[0], r.data, r.quality) for r in reads
            ]
        logger.log(f"round {i} complete: {len(reads)} corrected reads")

    if args.min_corrected_length > 0:
        reads = [r for r in reads if len(r.data) >= args.min_corrected_length]
    if group.num_processes > 1:
        # every process holds the merged set; rank 0 writes, then cleans up
        # the exchange files once all ranks have checked out
        if group.process_id == 0:
            write_fasta(reads, args.outfile)
        for idx in range(1, iterations + 1):
            finish_exchange(group, f"{args.outfile}.r{idx}")
    else:
        write_fasta(reads, args.outfile)
    if profiler_ctx:
        import jax

        jax.profiler.stop_trace()
        logger.log(f"profiler trace written to {profiler_ctx}")
    logger.total("total =")
    return 0


if __name__ == "__main__":
    sys.exit(main())
