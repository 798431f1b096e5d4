"""Multi-host distribution: shard targets across processes, merge in order.

Replaces the reference's SGE job scripts (scripts/vechat_hpc.fast.sh:28-60:
`split -l` chunks + one qsub per chunk + `cat` merge) with jax.distributed
process groups:

* every process loads the full query set (or its slice of a sharded input),
  takes a contiguous block of TARGET reads (the unit of correction),
* within a process, window batches run data-parallel across the local chips
  via the mesh in .mesh,
* corrected records are merged deterministically by (target order), either
  through per-process shard files + rank-0 concatenation (the file-shaped
  analog of the reference's `cat`) or via an all-gather of encoded records
  for in-memory pipelines.

Stats (windows polished, reads/sec) reduce with psum-style collectives.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..io.fastx import SeqRecord, write_fasta


@dataclass
class ProcessGroup:
    process_id: int
    num_processes: int

    @classmethod
    def from_env(cls) -> "ProcessGroup":
        """jax.distributed-style env (JAX_PROCESS_ID / JAX_NUM_PROCESSES), or
        single-process defaults."""
        pid = int(os.environ.get("JAX_PROCESS_ID", "0"))
        n = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
        if n < 1 or not (0 <= pid < n):
            raise ValueError(
                f"invalid process group: JAX_PROCESS_ID={pid} "
                f"JAX_NUM_PROCESSES={n}"
            )
        return cls(process_id=pid, num_processes=n)

    def initialize_jax(self, coordinator: Optional[str] = None) -> None:
        if self.num_processes <= 1:
            return
        import jax

        jax.distributed.initialize(
            coordinator_address=coordinator
            or os.environ.get("JAX_COORDINATOR", "localhost:12345"),
            num_processes=self.num_processes,
            process_id=self.process_id,
        )


def shard_bounds(n_items: int, group: ProcessGroup) -> Tuple[int, int]:
    """Contiguous block [begin, end) of items owned by this process.
    Deterministic and load-balanced to within one item."""
    per, rem = divmod(n_items, group.num_processes)
    begin = group.process_id * per + min(group.process_id, rem)
    end = begin + per + (1 if group.process_id < rem else 0)
    return begin, end


def shard_targets(
    targets: Sequence[SeqRecord], group: ProcessGroup
) -> List[SeqRecord]:
    b, e = shard_bounds(len(targets), group)
    return list(targets[b:e])


def shard_output_path(outfile: str, group: ProcessGroup) -> str:
    if group.num_processes == 1:
        return outfile
    return f"{outfile}.shard{group.process_id:05d}"


def merge_shard_files(outfile: str, group: ProcessGroup) -> None:
    """Rank 0 concatenates shard files in rank order (the `cat` merge of
    scripts/vechat_hpc.fast.sh:110-117, but deterministic by construction)."""
    if group.num_processes == 1 or group.process_id != 0:
        return
    with open(outfile, "w") as fw:
        for pid in range(group.num_processes):
            shard = f"{outfile}.shard{pid:05d}"
            with open(shard) as fr:
                fw.write(fr.read())
            os.remove(shard)


def allgather_records(
    records: Sequence[SeqRecord], group: ProcessGroup
) -> List[SeqRecord]:
    """All-gather corrected records across processes (ragged strings ->
    padded uint8 + length vector, reordered by process rank). Used by
    in-memory pipelines instead of shard files."""
    if group.num_processes == 1:
        return list(records)
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    payload = "\x00".join(f"{r.name}\x01{r.data}" for r in records).encode()
    arr = np.frombuffer(payload, dtype=np.uint8)
    n = np.array([len(arr)], dtype=np.int32)
    all_n = multihost_utils.process_allgather(n)
    max_n = int(all_n.max())
    # gather in bounded slices: padding every rank to the global max and
    # gathering at once makes the transient footprint O(P * max_payload) —
    # at Gbp scale that is the largest allocation of the whole run. Slicing
    # caps the transient at O(P * CHUNK) while the assembled blobs only ever
    # hold real bytes.
    CHUNK = int(os.environ.get("VECHAT_ALLGATHER_CHUNK", 16 << 20))
    blobs = [bytearray() for _ in range(group.num_processes)]
    for off in range(0, max_n, CHUNK):
        width = min(CHUNK, max_n - off)
        piece = np.zeros(width, dtype=np.uint8)
        if off < len(arr):
            src = arr[off : off + width]
            piece[: len(src)] = src
        gathered = np.asarray(multihost_utils.process_allgather(piece))
        for pid in range(group.num_processes):
            take = min(max(int(all_n[pid][0]) - off, 0), width)
            if take:
                blobs[pid] += bytes(gathered[pid][:take])
    out: List[SeqRecord] = []
    for pid in range(group.num_processes):
        blob = blobs[pid].decode()
        if not blob:
            continue
        for item in blob.split("\x00"):
            name, data = item.split("\x01")
            out.append(SeqRecord(name, data))
    return out


def write_records_blob(records: Sequence[SeqRecord], path: str) -> None:
    """Name-preserving record serialization (FASTA round-trips truncate the
    LN/RC/XC tags at the first whitespace). Atomic via rename."""
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "w") as f:
        for r in records:
            f.write(f"{r.name}\t{r.data}\n")
    os.replace(tmp, path)


def read_records_blob(path: str) -> List[SeqRecord]:
    out: List[SeqRecord] = []
    with open(path) as f:
        for line in f:
            name, _, data = line.rstrip("\n").partition("\t")
            out.append(SeqRecord(name, data))
    return out


def _wait_for_file(path: str, timeout: float) -> None:
    import time

    deadline = time.monotonic() + timeout
    while not os.path.exists(path):
        if time.monotonic() > deadline:
            raise TimeoutError(f"timed out waiting for shard file {path}")
        time.sleep(0.05)


def exchange_records(
    records: Sequence[SeqRecord],
    group: ProcessGroup,
    prefix: str,
    timeout: float = 3600.0,
) -> List[SeqRecord]:
    """Between-round merge of per-process corrected shards.

    When jax.distributed is live, rides the ICI/DCN all-gather
    (`allgather_records`). Otherwise falls back to the filesystem handoff the
    reference uses between SGE jobs (scripts/vechat_hpc.fast.sh:110-117):
    each process writes `{prefix}.shardNNNNN` + a `.done` marker, then reads
    every shard in rank order — deterministic, coordinator-free. The blob
    format is name-preserving (FASTA round-trips would truncate the LN/RC/XC
    tags at the first whitespace)."""
    if group.num_processes == 1:
        return list(records)
    # consult jax ONLY when the driver explicitly initialized
    # jax.distributed (VECHAT_DIST_INIT=1, vechat_main.py): merely calling
    # jax.process_count() initializes the platform backend — on this
    # machine that means a ~60 s tunneled-TPU client handshake per process
    # and a two-clients-on-one-chip hazard, just to pick a merge strategy
    if os.environ.get("VECHAT_DIST_INIT") == "1":
        import jax

        if jax.process_count() == group.num_processes:
            return allgather_records(records, group)

    mypath = f"{prefix}.shard{group.process_id:05d}"
    write_records_blob(records, mypath)
    open(mypath + ".done", "w").close()
    out: List[SeqRecord] = []
    for pid in range(group.num_processes):
        p = f"{prefix}.shard{pid:05d}"
        _wait_for_file(p + ".done", timeout)
        out.extend(read_records_blob(p))
    return out


def finish_exchange(group: ProcessGroup, prefix: str, timeout: float = 3600.0):
    """Barrier + cleanup for the file-shaped exchange: every process drops an
    `.exit` marker; rank 0 waits for all of them then removes every temp file
    under the prefix."""
    if group.num_processes == 1:
        return
    open(f"{prefix}.exit{group.process_id:05d}", "w").close()
    if group.process_id != 0:
        return
    import glob

    for pid in range(group.num_processes):
        _wait_for_file(f"{prefix}.exit{pid:05d}", timeout)
    for p in glob.glob(f"{prefix}.shard*") + glob.glob(f"{prefix}.exit*"):
        try:
            os.remove(p)
        except OSError:
            pass


def run_sharded_correction(
    reads: List[SeqRecord],
    correct_fn,
    outfile: str,
    group: Optional[ProcessGroup] = None,
) -> None:
    """Full multi-host round: shard targets -> correct -> ordered merge.
    ``correct_fn(targets, queries) -> List[SeqRecord]``."""
    group = group or ProcessGroup.from_env()
    my_targets = shard_targets(reads, group)
    corrected = correct_fn(my_targets, reads)
    shard_path = shard_output_path(outfile, group)
    write_fasta(corrected, shard_path)
    if group.num_processes > 1:
        try:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("vechat_merge")
        except Exception:
            pass
    merge_shard_files(outfile, group)
