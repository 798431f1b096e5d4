"""Native all-vs-all read overlapper + overlap filters + chimera scrubbing.

Replaces the reference pipeline's external binaries
(scripts/vechat:37-49,187-201):

* minimap2 ava-pb/ont  -> minimizer extraction + hash join + diagonal
  chaining (vectorised numpy today; the sort/join structure maps 1:1 onto
  jax.lax.sort / segment ops for the device path),
* fpa drop --same-name --internalmatch -> array-ops filter,
* yacrd chimera scrubbing -> coverage-drop detector over overlap pileups.

The overlapper is approximate by nature (so is minimap2); the correction
stages downstream only need overlap candidates with rough span estimates —
exact per-base alignment happens later in the polisher.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..io.fastx import SeqRecord
from ..io.paf import PafRecord

# 2-bit encoding for ACGT; other characters get pseudo-random codes so they
# never produce spurious matches
_CODE2 = np.full(256, 4, dtype=np.int64)
for _i, _c in enumerate("ACGT"):
    _CODE2[ord(_c)] = _i


def _hash64(x: np.ndarray) -> np.ndarray:
    """Invertible splitmix64-style finalizer (same role as minimap2's
    hash64)."""
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


def minimizers(seq: str, k: int, w: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(hashes, positions, strands) of (w,k)-minimizers of seq.

    Canonical k-mers: min(forward, revcomp) with a strand flag; windows whose
    minimum is ambiguous between strands keep the forward one.
    """
    codes = _CODE2[np.frombuffer(seq.encode(), dtype=np.uint8)]
    n = len(codes) - k + 1
    if n <= 0:
        return (np.empty(0, np.uint64), np.empty(0, np.int64), np.empty(0, bool))
    valid_base = codes < 4
    # rolling 2-bit pack, forward and reverse complement
    kmers = np.zeros(n, dtype=np.uint64)
    rkmers = np.zeros(n, dtype=np.uint64)
    shift = np.uint64(2 * (k - 1))
    mask = np.uint64((1 << (2 * k)) - 1)
    fwd = np.uint64(0)
    rev = np.uint64(0)
    # vectorised rolling hash: compute via cumulative strides
    # (python loop over k is fine: k is ~15-19, each step vectorised over n)
    window = np.lib.stride_tricks.sliding_window_view(codes, k)  # [n, k]
    weights = (np.uint64(1) << (np.uint64(2) * np.arange(k - 1, -1, -1, dtype=np.uint64)))
    kmers = (window.astype(np.uint64) * weights[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    rweights = weights[::-1]
    rcodes = np.uint64(3) - window.astype(np.uint64)
    rkmers = (rcodes * rweights[None, :]).sum(axis=1, dtype=np.uint64)
    kvalid = np.lib.stride_tricks.sliding_window_view(valid_base, k).all(axis=1)

    strand = rkmers < kmers  # True = reverse strand canonical
    canon = np.where(strand, rkmers, kmers)
    h = _hash64(canon)
    h = np.where(kvalid, h, np.uint64(0xFFFFFFFFFFFFFFFF))

    if n <= w:
        best = int(np.argmin(h))
        if not kvalid[best]:
            return (np.empty(0, np.uint64), np.empty(0, np.int64), np.empty(0, bool))
        return h[best : best + 1], np.array([best]), strand[best : best + 1]

    win = np.lib.stride_tricks.sliding_window_view(h, w)  # [n-w+1, w]
    arg = np.argmin(win, axis=1)
    pos = arg + np.arange(len(arg))
    keep = np.zeros(len(h), dtype=bool)
    keep[pos] = True
    keep &= kvalid
    idx = np.flatnonzero(keep)
    return h[idx], idx.astype(np.int64), strand[idx]


@dataclass
class OverlapParams:
    k: int = 15
    w: int = 5
    max_occ: int = 200  # drop repetitive minimizer hashes
    min_anchors: int = 4
    bandwidth: int = 500  # diagonal clustering width
    min_overlap: int = 100
    platform: str = "pb"

    @classmethod
    def for_platform(cls, platform: str) -> "OverlapParams":
        # minimap2 presets: ava-pb uses k=19 (HPC), ava-ont k=15
        if platform == "pb":
            return cls(k=19, w=5, platform="pb")
        return cls(k=15, w=5, platform="ont")


def find_overlaps(
    reads: Sequence[SeqRecord], params: Optional[OverlapParams] = None
) -> List[PafRecord]:
    """All-vs-all overlap candidates (both orderings emitted like minimap2
    --dual=yes)."""
    params = params or OverlapParams()
    k = params.k

    all_h: List[np.ndarray] = []
    all_pos: List[np.ndarray] = []
    all_strand: List[np.ndarray] = []
    all_rid: List[np.ndarray] = []
    for rid, r in enumerate(reads):
        h, pos, strand = minimizers(r.data, k, params.w)
        all_h.append(h)
        all_pos.append(pos)
        all_strand.append(strand)
        all_rid.append(np.full(len(h), rid, dtype=np.int64))

    if not all_h:
        return []
    H = np.concatenate(all_h)
    POS = np.concatenate(all_pos)
    STR = np.concatenate(all_strand)
    RID = np.concatenate(all_rid)

    order = np.argsort(H, kind="stable")
    H, POS, STR, RID = H[order], POS[order], STR[order], RID[order]

    # group boundaries by hash
    boundaries = np.flatnonzero(np.diff(H)) + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [len(H)]])

    # anchors: (a_rid, b_rid, a_pos, b_pos, same_strand)
    anchors: Dict[Tuple[int, int, bool], List[Tuple[int, int]]] = {}
    for s, e in zip(starts, ends):
        size = e - s
        if size < 2 or size > params.max_occ:
            continue
        rids = RID[s:e]
        poss = POS[s:e]
        strs = STR[s:e]
        for i in range(size):
            for j in range(size):
                if rids[i] >= rids[j]:
                    continue  # emit a<b once; mirror later
                same = strs[i] == strs[j]
                key = (int(rids[i]), int(rids[j]), bool(same))
                anchors.setdefault(key, []).append((int(poss[i]), int(poss[j])))

    out: List[PafRecord] = []
    for (a, b, same), pts in anchors.items():
        if len(pts) < params.min_anchors:
            continue
        pa = np.array([p[0] for p in pts])
        pb = np.array([p[1] for p in pts])
        la, lb = len(reads[a].data), len(reads[b].data)
        if same:
            diag = pa - pb
        else:
            diag = pa + pb
        # densest diagonal band
        med = np.median(diag)
        inband = np.abs(diag - med) <= params.bandwidth
        if inband.sum() < params.min_anchors:
            continue
        pa_in, pb_in = pa[inband], pb[inband]
        a_begin, a_end = int(pa_in.min()), int(pa_in.max()) + k
        if same:
            b_begin, b_end = int(pb_in.min()), int(pb_in.max()) + k
        else:
            # reverse strand: b positions are forward coords of the k-mer
            b_begin, b_end = int(pb_in.min()), int(pb_in.max()) + k
            # report in b's forward coordinates (PAF convention)
            b_begin, b_end = lb - b_end, lb - b_begin
        span = max(a_end - a_begin, b_end - b_begin)
        if span < params.min_overlap:
            continue
        nmatch = int(inband.sum()) * k
        nmatch = min(nmatch, span)
        rec = PafRecord(
            q_name=reads[a].name,
            q_length=la,
            q_begin=a_begin,
            q_end=a_end,
            strand=not same,
            t_name=reads[b].name,
            t_length=lb,
            t_begin=b_begin,
            t_end=b_end,
            num_matches=nmatch,
            alignment_length=span,
            mapq=60,
        )
        out.append(rec)
        # mirrored record (minimap2 --dual=yes emits both orientations)
        out.append(
            PafRecord(
                q_name=reads[b].name,
                q_length=lb,
                q_begin=b_begin,
                q_end=b_end,
                strand=not same,
                t_name=reads[a].name,
                t_length=la,
                t_begin=a_begin,
                t_end=a_end,
                num_matches=nmatch,
                alignment_length=span,
                mapq=60,
            )
        )
    return out


# ------------------------------------------------------------------- filters


def filter_fpa(
    overlaps: Sequence[PafRecord],
    drop_same_name: bool = True,
    drop_internal: bool = True,
    internal_threshold: float = 0.8,
    max_overhang: int = 1000,
) -> List[PafRecord]:
    """fpa drop --same-name --internalmatch equivalent
    (reference usage: scripts/vechat:37-49). Internal-match uses the
    miniasm-style overhang rule."""
    out = []
    for ov in overlaps:
        if drop_same_name and ov.q_name == ov.t_name:
            continue
        if drop_internal:
            if ov.strand:
                q_left, q_right = ov.q_length - ov.q_end, ov.q_begin
            else:
                q_left, q_right = ov.q_begin, ov.q_length - ov.q_end
            t_left, t_right = ov.t_begin, ov.t_length - ov.t_end
            overhang = min(q_left, t_left) + min(q_right, t_right)
            span = min(ov.q_end - ov.q_begin, ov.t_end - ov.t_begin)
            if overhang > min(max_overhang, internal_threshold * span):
                continue
        out.append(ov)
    return out


def refine_identity(
    overlaps: Sequence[PafRecord],
    reads: Sequence[SeqRecord],
    aligner=None,
) -> List[PafRecord]:
    """Replace the anchor-count identity estimate with exact base-level
    identity (the minimap2 -c role for the consensus round,
    scripts/vechat:47-49). Sets num_matches/alignment_length from a real
    alignment of the overlap segments; stores the CIGAR for reuse."""
    from ..ops.encode import encode
    from ..ops.pairwise import cigar_identity, edit_align

    by_name = {r.name: r for r in reads}
    pairs = []
    for ov in overlaps:
        q = by_name[ov.q_name]
        t = by_name[ov.t_name]
        if ov.strand:
            qs = q.reverse_complement[ov.q_length - ov.q_end : ov.q_length - ov.q_begin]
        else:
            qs = q.data[ov.q_begin : ov.q_end]
        ts = t.data[ov.t_begin : ov.t_end]
        pairs.append((encode(qs), encode(ts)))

    if aligner is not None and hasattr(aligner, "edit_align_batch"):
        cigars = aligner.edit_align_batch(pairs)
    else:
        cigars = [edit_align(q, t) for q, t in pairs]

    out = []
    for ov, cigar, (qc, tc) in zip(overlaps, cigars, pairs):
        matches, block = cigar_identity(cigar, qc, tc)
        out.append(
            PafRecord(
                q_name=ov.q_name,
                q_length=ov.q_length,
                q_begin=ov.q_begin,
                q_end=ov.q_end,
                strand=ov.strand,
                t_name=ov.t_name,
                t_length=ov.t_length,
                t_begin=ov.t_begin,
                t_end=ov.t_end,
                num_matches=matches,
                alignment_length=block,
                mapq=ov.mapq,
                cigar=cigar,
            )
        )
    return out


def filter_length_identity(
    overlaps: Sequence[PafRecord],
    min_block: int = 500,
    min_identity: float = 0.0,
) -> List[PafRecord]:
    """awk '$11>=L && $10/$11>=id' equivalent (scripts/vechat:37,47)."""
    return [
        ov
        for ov in overlaps
        if ov.alignment_length >= min_block
        and (
            min_identity <= 0.0
            or ov.num_matches / max(ov.alignment_length, 1) >= min_identity
        )
    ]


# ------------------------------------------------------------------ scrubbing


def scrub_reads(
    reads: Sequence[SeqRecord],
    overlaps: Sequence[PafRecord],
    min_coverage: int = 3,
    max_bad_fraction: float = 0.4,
    min_split_length: int = 500,
) -> List[SeqRecord]:
    """yacrd-equivalent chimera scrubbing (reference usage:
    scripts/vechat:187-201, -c 3/-n 0.4 pb, -c 4 ont).

    Coverage pileup per read from its overlaps; positions with coverage <
    min_coverage are 'bad'. Reads with more than max_bad_fraction bad bases
    are dropped; otherwise bad stretches are cut out and the good pieces
    emitted as `name_begin_end` splits (single full-span pieces keep their
    name).
    """
    name_to_idx = {r.name: i for i, r in enumerate(reads)}
    cov_events: List[List[Tuple[int, int]]] = [[] for _ in reads]
    for ov in overlaps:
        qi = name_to_idx.get(ov.q_name)
        ti = name_to_idx.get(ov.t_name)
        if qi is not None:
            if ov.strand:
                cov_events[qi].append((ov.q_length - ov.q_end, ov.q_length - ov.q_begin))
            else:
                cov_events[qi].append((ov.q_begin, ov.q_end))
        if ti is not None and ti != qi:
            cov_events[ti].append((ov.t_begin, ov.t_end))

    out: List[SeqRecord] = []
    for r, events in zip(reads, cov_events):
        n = len(r.data)
        delta = np.zeros(n + 1, dtype=np.int32)
        for b, e in events:
            b = max(0, min(b, n))
            e = max(0, min(e, n))
            delta[b] += 1
            delta[e] -= 1
        cov = np.cumsum(delta[:-1])
        bad = cov < min_coverage
        if bad.mean() > max_bad_fraction:
            continue  # chimeric / junk read dropped
        if not bad.any():
            out.append(r)
            continue
        # emit good runs
        good = ~bad
        changes = np.flatnonzero(np.diff(good.astype(np.int8))) + 1
        bounds = np.concatenate([[0], changes, [n]])
        for s, e in zip(bounds[:-1], bounds[1:]):
            if not good[s]:
                continue
            if e - s < min_split_length:
                continue
            name = r.name if (s == 0 and e == n) else f"{r.name}_{s}_{e}"
            out.append(
                SeqRecord(
                    name,
                    r.data[s:e],
                    None if r.quality is None else r.quality[s:e],
                )
            )
    return out
