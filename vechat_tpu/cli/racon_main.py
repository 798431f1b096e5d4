"""`vechat-racon` — CLI compatible with the reference's vechat_racon binary
(reference: src/main.cpp:17-181). Reads sequences/overlaps/targets from
files, polishes, writes FASTA to stdout.
"""

from __future__ import annotations

import argparse
import sys

from ..io.fastx import read_fastx, write_fasta
from ..io.paf import read_paf
from ..pipeline.polisher import POLISHER_CONTIG, POLISHER_FRAGMENT, Polisher
from ..utils.logger import Logger


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="vechat-racon",
        description="TPU-native consensus / haplotype-aware error correction "
        "(capability-parity with the reference vechat_racon binary)",
    )
    p.add_argument("sequences", help="FASTA/FASTQ(.gz) sequences used for correction")
    p.add_argument("overlaps", help="PAF/MHAP(.gz) overlaps")
    p.add_argument("targets", help="FASTA/FASTQ(.gz) target sequences")
    p.add_argument("-u", "--include-unpolished", action="store_true")
    p.add_argument("-f", "--fragment-correction", action="store_true")
    p.add_argument("-p", "--haplotype", action="store_true")
    p.add_argument("-d", "--min-confidence", type=float, default=0.22)
    p.add_argument("-s", "--min-support", type=float, default=0.19)
    p.add_argument("-k", "--num-prune", type=int, default=3)
    p.add_argument("-w", "--window-length", type=int, default=500)
    p.add_argument("-q", "--quality-threshold", type=float, default=10.0)
    p.add_argument("-e", "--error-threshold", type=float, default=0.3)
    p.add_argument("-T", "--no-trimming", action="store_true")
    p.add_argument("-m", "--match", type=int, default=3)
    p.add_argument("-x", "--mismatch", type=int, default=-5)
    p.add_argument("-g", "--gap", type=int, default=-4)
    p.add_argument("-t", "--threads", type=int, default=1)
    p.add_argument(
        "--backend",
        choices=["auto", "host", "jax", "pallas"],
        default="auto",
        help="alignment backend: device (jax) or host oracle",
    )
    return p


_PROBE_CACHE: dict = {}


def probe_device_health(timeout_s: float = 15.0) -> str:
    """Probe, in a SUBPROCESS, whether the default jax device actually
    EXECUTES work — `jax.devices()` can enumerate a chip that then hangs
    forever at dispatch (tunneled-TPU failure mode). Returns:

    - ``"ok"``     — non-CPU device completed a small matmul
    - ``"cpu"``    — default platform is CPU (no accelerator to probe)
    - ``"wedged"`` — device enumerates but did not finish within timeout_s

    Runs before this process creates its own device client (a subprocess
    that has exited keeps the one-TPU-client-at-a-time rule). Result is
    cached per process.
    """
    import os
    import subprocess
    import sys as _sys

    if "r" in _PROBE_CACHE:
        return _PROBE_CACHE["r"]
    env_p = os.environ.get("JAX_PLATFORMS", "")
    if env_p and all(p.strip() == "cpu" for p in env_p.split(",") if p.strip()):
        _PROBE_CACHE["r"] = "cpu"
        return "cpu"
    code = (
        "import jax, jax.numpy as jnp\n"
        "p = jax.default_backend()\n"
        "print('PLATFORM', p, flush=True)\n"
        "if p != 'cpu':\n"
        "    x = jnp.ones((128, 128), jnp.float32)\n"
        "    print('EXEC_OK', float((x @ x).sum()), flush=True)\n"
    )
    status = "wedged"
    try:
        r = subprocess.run(
            [_sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
        out = r.stdout
        if "PLATFORM cpu" in out:
            status = "cpu"
        elif "EXEC_OK" in out:
            status = "ok"
    except subprocess.TimeoutExpired:
        status = "wedged"
    except Exception:
        status = "cpu"  # no usable jax at all -> host backend
    _PROBE_CACHE["r"] = status
    return status


def make_backend(name: str, match: int, mismatch: int, gap: int, threads: int = 1):
    if name == "host":
        from ..pipeline.windows import HostAlignerBackend

        return HostAlignerBackend(match, mismatch, gap, threads=threads)
    if name == "jax":
        from ..ops.kernels.poa_jax import JaxAlignerBackend

        return JaxAlignerBackend(match, mismatch, gap)
    if name == "pallas":
        from ..ops.kernels.backend import PallasAlignerBackend

        # no accelerator -> interpret mode (XLA:CPU emulation of the
        # kernels); same numerics, lets the device path run anywhere
        import jax

        interpret = jax.default_backend() == "cpu"
        return PallasAlignerBackend(match, mismatch, gap, interpret=interpret)
    # auto: Pallas kernel on a device PROVEN to execute, host oracle
    # otherwise. The probe runs in a subprocess BEFORE this process builds
    # a device client, so a wedged chip costs one bounded timeout instead
    # of hanging the pipeline (reference analog: cudapolisher's CPU
    # fallback when the GPU refuses work, src/cuda/cudapolisher.cpp:204-214).
    import os

    timeout_s = float(os.environ.get("VECHAT_DEVICE_PROBE_TIMEOUT", "60"))
    health = probe_device_health(timeout_s)
    if health == "ok":
        from ..ops.kernels.backend import PallasAlignerBackend

        return PallasAlignerBackend(match, mismatch, gap)
    if health == "wedged":
        print(
            "[vechat] WARNING: accelerator enumerates but does not execute "
            f"(probe timed out after {timeout_s:.0f}s) — falling back to "
            "host backend",
            file=sys.stderr,
        )
    from ..pipeline.windows import HostAlignerBackend

    return HostAlignerBackend(match, mismatch, gap, threads=threads)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logger = Logger()
    logger.tick()

    targets = read_fastx(args.targets)
    queries = read_fastx(args.sequences)
    overlaps = read_paf(args.overlaps)
    logger.log("loaded input")

    polisher = Polisher(
        polisher_type=POLISHER_FRAGMENT if args.fragment_correction else POLISHER_CONTIG,
        haplotype=args.haplotype,
        min_confidence=args.min_confidence,
        min_support=args.min_support,
        num_prune=args.num_prune,
        window_length=args.window_length,
        quality_threshold=args.quality_threshold,
        error_threshold=args.error_threshold,
        trim=not args.no_trimming,
        match=args.match,
        mismatch=args.mismatch,
        gap=args.gap,
        backend=make_backend(args.backend, args.match, args.mismatch, args.gap, threads=args.threads),
        logger=logger,
        threads=args.threads,
    )
    polisher.initialize(targets, queries, overlaps)
    out = polisher.polish(drop_unpolished_sequences=not args.include_unpolished)
    write_fasta(out, sys.stdout)
    logger.total("total =")
    return 0


if __name__ == "__main__":
    sys.exit(main())
