"""Pallas TPU kernel: batched pairwise global edit-distance alignment.

The device path for the reference's Hot Loop #1 — per-overlap edlib NW
(src/overlap.cpp:205-224). TPU-native design, not a translation:

* Long overlaps are CUT AT MINIMIZER ANCHORS into ~tile-sized sub-alignments
  (seed-and-tile, the same trust-the-anchor argument minimap2's extension
  alignment makes); each tile is a small global NW in edit-distance scoring
  (match 0, mismatch/indel -1, maximised).
* The kernel packs 8 tile pairs into the sublane axis of one program: both
  DP inputs are pure sequences, so every row step reads only the previous
  row — no dynamic gathers at all. H lives in VMEM [T+1, 8, W].
* Directions precompute during the DP (diag > vertical > horizontal — the
  same preference as ops/pairwise.py's host traceback: diag, 'D', 'I'), and
  the walks run in-kernel, emitting (ti, qi | -1) pair streams that the host
  converts to CIGAR runs.
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(2**28)
DSUB = 8  # tile pairs per program (sublane packing)


def _async_d2h(arr):
    """Start a device-to-host copy without blocking (no-op where the
    platform lacks async d2h)."""
    try:
        arr.copy_to_host_async()
    except Exception:  # noqa: BLE001
        pass


def _kernel(
    tcodes_ref,  # [1, T, 1, DSUB] int32: target codes, row-major
    tlen_ref,  # [1, 1, DSUB] int32
    qcodes_ref,  # [1, DSUB, W] int32: query codes at lane j -> pos j-1
    qlen_ref,  # [1, 1, DSUB] int32
    pairs_t_ref,  # [1, DSUB, L] int32 out: target pos | -1
    pairs_q_ref,  # [1, DSUB, L] int32 out: query pos | -1
    count_ref,  # [1, 1, DSUB] int32 out
    dist_ref,  # [1, 1, DSUB] int32 out: edit distance
    H,  # [T+1, DSUB, W] int32 scratch
    DIR,  # [T+1, DSUB, W] int8 scratch
    *,
    T: int,
    W: int,
    L: int,
):
    g = jnp.int32(-1)
    neg = jnp.int32(NEG)
    jlane = lax.broadcasted_iota(jnp.int32, (DSUB, W), 1)
    seqp = qcodes_ref[0]  # [DSUB, W]
    qlen = qlen_ref[0, 0].reshape(DSUB, 1)
    tlen = tlen_ref[0, 0].reshape(DSUB, 1)

    # row 0: all-horizontal
    H[0] = jlane * g
    DIR[0] = jnp.full((DSUB, W), 2, jnp.int8)  # 2 = horizontal

    log_w = int(np.ceil(np.log2(W)))

    def step(r, _):
        trow = tcodes_ref[0, r, 0].reshape(DSUB, 1)  # [DSUB, 1]
        prof = jnp.where(seqp == trow, jnp.int32(0), jnp.int32(-1))
        row = H[r]
        ds = pltpu.roll(row, 1, axis=1)
        diag = jnp.where(jlane == 0, neg, ds) + prof
        vert = row + g
        # rows beyond this tile's target length replicate the final row so
        # the NW answer sits at (tlen, qlen) regardless of padding
        acc = jnp.maximum(diag, vert)
        c0 = row[:, 0:1] + g
        val = jnp.where(jlane == 0, c0, acc)
        t = val - jlane * g
        for sh in range(log_w):
            s = 1 << sh
            rolled = pltpu.roll(t, s, axis=1)
            rolled = jnp.where(jlane < s, neg, rolled)
            t = jnp.maximum(t, rolled)
        run = t + jlane * g
        # freeze rows past the target end (copy previous row unchanged)
        past = r >= tlen  # [DSUB, 1]
        run = jnp.where(past, row, run)
        H[r + 1] = run

        d_dir = jnp.full((DSUB, W), 2, jnp.int32)  # horizontal
        d_dir = jnp.where(run == vert, 1, d_dir)  # vertical
        d_dir = jnp.where(run == diag, 0, d_dir)  # diagonal (top priority)
        DIR[r + 1] = jnp.where(past, DIR[r], d_dir.astype(jnp.int8))
        return 0

    # dynamic trip count: the longest target in this program's 8 tiles
    tmax = jnp.max(tlen)
    lax.fori_loop(0, tmax, step, 0)

    # result cell per tile: (tlen, qlen); score = -edit_distance
    final = H[tmax]  # [DSUB, W] (rows frozen past each tile's tlen)
    score = jnp.max(jnp.where(jlane == qlen, final, neg), axis=1, keepdims=True)
    dist_ref[0, 0] = (-score)[:, 0]

    # walks
    jl1 = lax.broadcasted_iota(jnp.int32, (1, W), 1)
    lanesL = lax.broadcasted_iota(jnp.int32, (1, L), 1)
    counts = []
    for d in range(DSUB):
        i0 = tlen[d, 0]
        j0 = qlen[d, 0]

        def cond(state):
            return state[3]

        def body(state):
            i, j, k, ok, pt, pq = state
            rowd = DIR[i, d].reshape(1, W).astype(jnp.int32)
            dirv = jnp.sum(jnp.where(jl1 == j, rowd, 0))
            is_diag = dirv == 0
            is_vert = dirv == 1
            prev_i = jnp.where(is_diag | is_vert, i - 1, i)
            prev_j = jnp.where(is_diag | (~is_vert), j - 1, j)
            upd = lanesL == (L - 1 - k)
            pt = jnp.where(upd, jnp.where(i == prev_i, -1, i - 1), pt)
            pq = jnp.where(upd, jnp.where(j == prev_j, -1, j - 1), pq)
            i, j, k = prev_i, prev_j, k + 1
            return i, j, k, ~((i == 0) & (j == 0)), pt, pq

        pt0 = jnp.full((1, L), -2, jnp.int32)
        pq0 = jnp.full((1, L), -2, jnp.int32)
        started = ~((i0 == 0) & (j0 == 0))
        _, _, k_fin, _, pt, pq = lax.while_loop(
            cond, body, (i0, j0, jnp.int32(0), started, pt0, pq0)
        )
        pairs_t_ref[0, pl.ds(d, 1), :] = pt
        pairs_q_ref[0, pl.ds(d, 1), :] = pq
        counts.append(jnp.where(started, k_fin, 0))

    count_ref[0, 0] = jnp.stack(counts)


def _pairwise_nw_pallas_impl(
    tcodes,  # [B, T, 1, DSUB] any int dtype (upcast on device)
    tlen,  # [B, 1, DSUB] int32
    qcodes,  # [B, DSUB, W] any int dtype
    qlen,  # [B, 1, DSUB] int32
    interpret: bool = False,
):
    # narrow wire dtypes: the ~10 MB/s device tunnel makes input bytes the
    # dispatch cost; int16 is safe for codes (pad 0xFF stays distinct)
    tcodes = tcodes.astype(jnp.int32)
    qcodes = qcodes.astype(jnp.int32)
    tlen = tlen.astype(jnp.int32)
    qlen = qlen.astype(jnp.int32)
    B, T = tcodes.shape[0], tcodes.shape[1]
    W = qcodes.shape[2]
    L = T + W

    kernel = functools.partial(_kernel, T=T, W=W, L=L)
    vmem = lambda shape: pl.BlockSpec(
        shape, lambda b: (b,) + (0,) * (len(shape) - 1), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            vmem((1, T, 1, DSUB)),
            vmem((1, 1, DSUB)),
            vmem((1, DSUB, W)),
            vmem((1, 1, DSUB)),
        ],
        out_specs=(
            vmem((1, DSUB, L)),
            vmem((1, DSUB, L)),
            vmem((1, 1, DSUB)),
            vmem((1, 1, DSUB)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, DSUB, L), jnp.int32),
            jax.ShapeDtypeStruct((B, DSUB, L), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, DSUB), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, DSUB), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((T + 1, DSUB, W), jnp.int32),
            pltpu.VMEM((T + 1, DSUB, W), jnp.int8),
        ],
        interpret=interpret,
    )(tcodes, tlen, qcodes, qlen)


def _pairwise_nw_pallas_wire(tcodes, tlen, qcodes, qlen, interpret=False):
    """int16-out variant: pair paths downcast before the fetch (values are
    bounded by T and W)."""
    pt, pq, count, dist = _pairwise_nw_pallas_impl(
        tcodes, tlen, qcodes, qlen, interpret=interpret
    )
    return pt.astype(jnp.int16), pq.astype(jnp.int16), count, dist


_pairwise_nw_pallas_jit = functools.partial(jax.jit, static_argnames=("interpret",))(
    _pairwise_nw_pallas_impl
)

_pairwise_nw_pallas_wire_jit = functools.partial(
    jax.jit, static_argnames=("interpret",)
)(_pairwise_nw_pallas_wire)


def pairwise_nw_pallas(*args, interpret: bool = False):
    return _pairwise_nw_pallas_jit(*args, interpret=interpret)


# ------------------------------------------------------ exact banded mode

BSUB = 4  # pairs per banded program (DIR scratch budget: (T+1)*BSUB*BW int8)


def _kernel_banded(
    tcodes_ref,  # [1, T, 1, BSUB] int32 target codes
    tlen_ref,  # [1, 1, BSUB] int32
    qwin0_ref,  # [1, BSUB, BW] int32: query window of ROW 1
    # (qwin0[d, l] = q_d[lo_d + l], 0xFF out of range)
    qent_ref,  # [1, T, 1, BSUB] int32: element entering the window when
    # advancing to row r+1 (qent[r-1, d] = q_d[r + lo_d + BW - 1]). A
    # sliding window (static roll + one masked insert per row) replaces a
    # per-row dynamic lane slice, which Mosaic only allows at multiples
    # of 128 lanes (real-silicon constraint interpret mode doesn't model)
    qlen_ref,  # [1, 1, BSUB] int32
    lo_ref,  # [1, 1, BSUB] int32: band low diagonal (j - i >= lo)
    pairs_t_ref,  # [1, BSUB, L] int32 out
    pairs_q_ref,  # [1, BSUB, L] int32 out
    count_ref,  # [1, 1, BSUB] int32 out
    dist_ref,  # [1, 1, BSUB] int32 out
    H,  # [2, BSUB, BW] int32 scratch (rolling rows)
    DIR,  # [T+1, BSUB, BW] int8 scratch
    QW,  # [BSUB, BW] int32 scratch: sliding query window
    *,
    T: int,
    BW: int,
    L: int,
):
    """Banded global edit-distance NW in band coordinates: row i = target
    position, lane l = diagonal offset (query j = i + lo + l). Exact when
    the final distance fits the band (checked by the caller — Ukkonen's
    argument: a path with d edits strays at most d diagonals from the
    corridor [min(0, lq-lt), max(0, lq-lt)]). Move priority at ties is
    M > D > I, byte-matching the host oracle (ops/pairwise.py
    _full_dp_cigar and the native Myers traceback)."""
    g = jnp.int32(-1)
    neg = jnp.int32(NEG)
    lvec = lax.broadcasted_iota(jnp.int32, (BSUB, BW), 1)
    lo = lo_ref[0, 0].reshape(BSUB, 1)
    qlen = qlen_ref[0, 0].reshape(BSUB, 1)
    tlen = tlen_ref[0, 0].reshape(BSUB, 1)
    log_bw = int(np.ceil(np.log2(BW)))

    # row 0: H(0, j) = -j for j in [0, lq]; out-of-band/neg j = NEG
    j0 = lo + lvec
    row0 = jnp.where((j0 >= 0) & (j0 <= qlen), j0 * g, neg)
    H[0] = row0
    DIR[0] = jnp.full((BSUB, BW), 2, jnp.int8)  # horizontal
    QW[:, :] = qwin0_ref[0]

    def step(i, _):
        r = i + 1  # target row 1..T
        jvec = r + lo + lvec  # query position at each lane
        valid = (jvec >= 0) & (jvec <= qlen)
        trow = tcodes_ref[0, i, 0].reshape(BSUB, 1)
        qwin = QW[:, :]  # q[r + lo + l - 1]
        prof = jnp.where(qwin == trow, jnp.int32(0), g)
        # slide the window for the next row: shift left, insert qent[r-1]
        ent = qent_ref[0, i, 0].reshape(BSUB, 1)
        QW[:, :] = jnp.where(
            lvec == BW - 1, ent, pltpu.roll(qwin, BW - 1, axis=1)
        )
        prev = H[lax.rem(i, 2)]
        # diag: (i-1, j-1) = previous row, same lane
        diag = jnp.where(jvec >= 1, prev + prof, neg)
        # vert (consume target): (i-1, j) = previous row, lane l+1
        # (roll by BW-1 == left-shift by 1 mod BW; edge lane is masked)
        up = pltpu.roll(prev, BW - 1, axis=1)
        vert = jnp.where(lvec == BW - 1, neg, up) + g
        acc = jnp.maximum(diag, vert)
        # j == 0 boundary column: all-vertical prefix
        acc = jnp.where(jvec == 0, r * g, acc)
        # horiz (consume query): in-row prefix shift-max along lanes
        t = acc - lvec * g
        for sh in range(log_bw):
            s = 1 << sh
            rolled = pltpu.roll(t, s, axis=1)
            rolled = jnp.where(lvec < s, neg, rolled)
            t = jnp.maximum(t, rolled)
        run = t + lvec * g
        run = jnp.where(valid, run, neg)
        # freeze rows past this pair's target end (band frame keeps
        # shifting, but values are only read back at the SAME lane)
        past = r > tlen
        run = jnp.where(past, prev, run)
        H[lax.rem(r, 2)] = run

        d_dir = jnp.full((BSUB, BW), 2, jnp.int32)  # horizontal (I)
        d_dir = jnp.where(run == vert, 1, d_dir)  # vertical (D)
        d_dir = jnp.where(run == diag, 0, d_dir)  # diagonal (M) top
        DIR[r] = jnp.where(past, DIR[i], d_dir.astype(jnp.int8))
        return 0

    tmax = jnp.max(tlen)
    lax.fori_loop(0, tmax, step, 0)

    final = H[lax.rem(tmax, 2)]
    lstar = qlen - tlen - lo  # lane of (tlen, qlen)
    score = jnp.max(
        jnp.where(lvec == lstar, final, neg), axis=1, keepdims=True
    )
    dist_ref[0, 0] = (-score)[:, 0]

    # in-kernel walks (band coords): diag -> (i-1, l); vert -> (i-1, l+1);
    # horiz -> (i, l-1); query pos j = i + lo + l
    bl1 = lax.broadcasted_iota(jnp.int32, (1, BW), 1)
    lanesL = lax.broadcasted_iota(jnp.int32, (1, L), 1)
    counts = []
    for d in range(BSUB):
        i0 = tlen[d, 0]
        l0 = qlen[d, 0] - tlen[d, 0] - lo[d, 0]
        lod = lo[d, 0]

        def cond(state):
            # hard step bound: pairs whose distance overflows the band are
            # rejected by the caller, but their walk must still terminate
            return state[3] & (state[2] < L)

        def body(state):
            i, l, k, ok, pt, pq = state
            i = jnp.clip(i, 0, T)
            l = jnp.clip(l, 0, BW - 1)
            rowd = DIR[i, d].reshape(1, BW).astype(jnp.int32)
            dirv = jnp.sum(jnp.where(bl1 == l, rowd, 0))
            is_diag = dirv == 0
            is_vert = dirv == 1
            jq = i + lod + l
            prev_i = jnp.where(is_diag | is_vert, i - 1, i)
            prev_l = jnp.where(
                is_diag, l, jnp.where(is_vert, l + 1, l - 1)
            )
            upd = lanesL == (L - 1 - k)
            pt = jnp.where(upd, jnp.where(i == prev_i, -1, i - 1), pt)
            pq = jnp.where(
                upd, jnp.where(is_vert, -1, jq - 1), pq
            )
            i, l, k = prev_i, prev_l, k + 1
            jq2 = i + lod + l
            return i, l, k, ~((i == 0) & (jq2 == 0)), pt, pq

        pt0 = jnp.full((1, L), -2, jnp.int32)
        pq0 = jnp.full((1, L), -2, jnp.int32)
        started = ~((i0 == 0) & (qlen[d, 0] == 0))
        _, _, k_fin, _, pt, pq = lax.while_loop(
            cond, body, (i0, l0, jnp.int32(0), started, pt0, pq0)
        )
        pairs_t_ref[0, pl.ds(d, 1), :] = pt
        pairs_q_ref[0, pl.ds(d, 1), :] = pq
        counts.append(jnp.where(started, k_fin, 0))

    count_ref[0, 0] = jnp.stack(counts)


def _pairwise_banded_impl(
    tcodes,  # [B, T, 1, BSUB]
    tlen,  # [B, 1, BSUB] int32
    qwin0,  # [B, BSUB, BW]
    qent,  # [B, T, 1, BSUB]
    qlen,  # [B, 1, BSUB] int32
    lo,  # [B, 1, BSUB] int32
    BW: int,
    interpret: bool = False,
):
    tcodes = tcodes.astype(jnp.int32)
    qwin0 = qwin0.astype(jnp.int32)
    qent = qent.astype(jnp.int32)
    B, T = tcodes.shape[0], tcodes.shape[1]
    L = T + BW
    kernel = functools.partial(_kernel_banded, T=T, BW=BW, L=L)
    vmem = lambda shape: pl.BlockSpec(
        shape, lambda b: (b,) + (0,) * (len(shape) - 1), memory_space=pltpu.VMEM
    )
    pt, pq, count, dist = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            vmem((1, T, 1, BSUB)),
            vmem((1, 1, BSUB)),
            vmem((1, BSUB, BW)),
            vmem((1, T, 1, BSUB)),
            vmem((1, 1, BSUB)),
            vmem((1, 1, BSUB)),
        ],
        out_specs=(
            vmem((1, BSUB, L)),
            vmem((1, BSUB, L)),
            vmem((1, 1, BSUB)),
            vmem((1, 1, BSUB)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, BSUB, L), jnp.int32),
            jax.ShapeDtypeStruct((B, BSUB, L), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, BSUB), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, BSUB), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, BSUB, BW), jnp.int32),
            pltpu.VMEM((T + 1, BSUB, BW), jnp.int8),
            pltpu.VMEM((BSUB, BW), jnp.int32),
        ],
        interpret=interpret,
    )(tcodes, tlen, qwin0, qent, qlen, lo)
    return pt.astype(jnp.int16), pq.astype(jnp.int16), count, dist


_pairwise_banded_jit = functools.partial(
    jax.jit, static_argnames=("BW", "interpret")
)(_pairwise_banded_impl)


# ------------------------------------------------------ anchors and tiling


def _minimizer_anchors(q: np.ndarray, t: np.ndarray, k: int = 15, w: int = 5):
    """Colinear (q_pos, t_pos) anchors between two code arrays."""
    from ...pipeline.overlapper import _hash64

    def mins(codes):
        n = len(codes) - k + 1
        if n <= 0:
            return np.empty(0, np.uint64), np.empty(0, np.int64)
        window = np.lib.stride_tricks.sliding_window_view(codes, k)
        weights = np.uint64(1) << (
            np.uint64(2) * np.arange(k - 1, -1, -1, dtype=np.uint64)
        )
        km = (window.astype(np.uint64) * weights[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        h = _hash64(km)
        if n <= w:
            best = int(np.argmin(h))
            return h[best : best + 1], np.array([best])
        win = np.lib.stride_tricks.sliding_window_view(h, w)
        arg = np.argmin(win, axis=1)
        pos = np.unique(arg + np.arange(len(arg)))
        return h[pos], pos.astype(np.int64)

    qh, qp = mins(q)
    th, tp = mins(t)
    if len(qh) == 0 or len(th) == 0:
        return np.empty((0, 2), np.int64)
    order_t = np.argsort(th, kind="stable")
    th_s, tp_s = th[order_t], tp[order_t]
    lo = np.searchsorted(th_s, qh, side="left")
    hi = np.searchsorted(th_s, qh, side="right")
    anchors = []
    for i in range(len(qh)):
        for s in range(lo[i], min(hi[i], lo[i] + 4)):
            anchors.append((int(qp[i]), int(tp_s[s])))
    if not anchors:
        return np.empty((0, 2), np.int64)
    a = np.array(anchors, dtype=np.int64)
    # densest diagonal band, then monotonic chain
    diag = a[:, 0] - a[:, 1]
    med = np.median(diag)
    a = a[np.abs(diag - med) <= 200]
    if len(a) == 0:
        return np.empty((0, 2), np.int64)
    a = a[np.lexsort((a[:, 0], a[:, 1]))]
    keep = []
    last_q = -1
    last_t = -1
    for qp_, tp_ in a:
        if qp_ > last_q and tp_ > last_t:
            keep.append((qp_, tp_))
            last_q, last_t = qp_, tp_
    return np.array(keep, dtype=np.int64) if keep else np.empty((0, 2), np.int64)


def tile_cut_points(
    q_len: int, t_len: int, anchors: np.ndarray, max_span: int
) -> Optional[List[Tuple[int, int]]]:
    """Cut positions (q, t) splitting the global alignment into tiles whose
    q/t spans both fit max_span. None when anchor gaps are too large."""
    cuts = [(0, 0)]
    cq = ct = 0
    ai = 0
    n = len(anchors)
    while t_len - ct > max_span or q_len - cq > max_span:
        # furthest anchor keeping both spans within max_span
        best = None
        while ai < n:
            aq, at = int(anchors[ai][0]), int(anchors[ai][1])
            if aq - cq <= max_span and at - ct <= max_span:
                if aq > cq and at > ct:
                    best = (aq, at)
                ai += 1
            else:
                break
        if best is None:
            return None
        cuts.append(best)
        cq, ct = best
    cuts.append((q_len, t_len))
    return cuts


class DevicePairwiseAligner:
    """Batched device NW on the pairwise kernels; returns CIGARs.

    Two device formulations, routed by size:
    * EXACT banded mode (default for pairs fitting the band buckets): full
      global NW over a diagonal corridor, accepted only when the resulting
      edit distance provably fits the band (Ukkonen: a d-edit path strays
      at most d diagonals from the corridor), so accepted CIGARs are
      byte-identical to the host oracle — the parity the reference's
      accelerated aligner had (src/cuda/cudaaligner.cpp:51-81). Overflow
      pairs fall back to the exact host Myers path.
    * anchor-tiled mode for pairs beyond the banded buckets (near-optimal;
      PARITY.md divergence #3).
    """

    TILE_T = 511  # target rows per tile bucket (T = 512 with +1)
    TILE_W = 512  # query lanes (W)
    # (T, BW) banded buckets: DIR scratch = (T+1)*BSUB*BW int8 must fit
    # VMEM next to the row buffers (9.2 MB at 2560x896)
    EXACT_BUCKETS = ((640, 384), (2560, 896))

    def __init__(self, interpret: bool = False):
        self.interpret = interpret
        self.device_tiles = 0
        self.host_fallbacks = 0
        self.exact_pairs = 0
        self.exact_rejects = 0  # band overflow -> host fallback
        self.t_tile = 0.0  # anchors + cut points + tile assembly
        self.t_device = 0.0  # dispatch + execute + fetch
        self.t_host = 0.0  # host-fallback tiles/pairs
        self.t_asm = 0.0  # ops -> CIGAR assembly
        self.n_dispatches = 0
        self.exact_enabled = (
            os.environ.get("VECHAT_DEVICE_PW_EXACT", "1") == "1"
        )

    MIN_DEVICE_PAIRS = 8

    def _exact_bucket(self, lq: int, lt: int):
        """Smallest (T, BW) bucket that can hold this pair with a usable
        verification margin, or None."""
        for T, BW in self.EXACT_BUCKETS:
            if lt <= T and lq <= T:
                k = (BW - 1 - abs(lq - lt)) // 2
                if k >= 16:  # enough margin to ever accept
                    return T, BW
        return None

    def edit_align_batch(self, pairs: Sequence[Tuple[np.ndarray, np.ndarray]]):
        import time as _time

        from ..pairwise import edit_align, ops_to_cigar

        if not self.interpret and len(pairs) < self.MIN_DEVICE_PAIRS:
            _t0 = _time.perf_counter()
            out = [edit_align(np.asarray(q), np.asarray(t)) for q, t in pairs]
            self.t_host += _time.perf_counter() - _t0
            return out

        if self.exact_enabled:
            exact_idx = {}
            rest = []
            for pi, (q, t) in enumerate(pairs):
                bk = self._exact_bucket(len(q), len(t))
                if bk is not None:
                    exact_idx.setdefault(bk, []).append(pi)
                else:
                    rest.append(pi)
            if exact_idx:
                out: List[Optional[str]] = [None] * len(pairs)
                for bk, idxs in exact_idx.items():
                    self._run_exact(
                        bk, [(pi, pairs[pi]) for pi in idxs], out
                    )
                if rest:
                    tiled = self._tiled_align_batch(
                        [pairs[pi] for pi in rest]
                    )
                    for pi, cg in zip(rest, tiled):
                        out[pi] = cg
                return out

        return self._tiled_align_batch(pairs)

    def _run_exact(self, bucket, jobs, out):
        """Banded exact device alignment for (pi, (q, t)) jobs; rejected
        (band-overflow) pairs fall back to the exact host path."""
        import time as _time

        from ..pairwise import edit_align, ops_to_cigar

        T, BW = bucket
        L = T + BW
        pending = []
        _t0 = _time.perf_counter()
        for off in range(0, len(jobs), 64 * BSUB):
            chunk = jobs[off : off + 64 * BSUB]
            B = (len(chunk) + BSUB - 1) // BSUB
            for cand in (8, 64):
                if cand >= B:
                    B = cand
                    break
            tcodes = np.zeros((B, T, 1, BSUB), np.int16)
            tlen = np.ones((B, 1, BSUB), np.int32)
            qwin0 = np.full((B, BSUB, BW), 0xFF, np.int16)
            qent = np.full((B, T, 1, BSUB), 0xFF, np.int16)
            qlen = np.zeros((B, 1, BSUB), np.int32)
            lo = np.zeros((B, 1, BSUB), np.int32)
            for n, (pi, (q, t)) in enumerate(chunk):
                b, d = divmod(n, BSUB)
                lq, lt = len(q), len(t)
                k = (BW - 1 - abs(lq - lt)) // 2
                lod = min(0, lq - lt) - k
                tcodes[b, :lt, 0, d] = t
                tlen[b, 0, d] = lt
                # row-1 window qwin0[l] = q[lo + l]; entering element for
                # row r+1 is qent[r-1] = q[r + lo + BW - 1] (pad 0xFF)
                qa = np.asarray(q, dtype=np.int16)
                w_idx = lod + np.arange(BW)
                ok = (w_idx >= 0) & (w_idx < lq)
                qwin0[b, d] = np.where(ok, qa[np.clip(w_idx, 0, lq - 1)], 0xFF)
                e_idx = np.arange(1, T + 1) + lod + BW - 1
                ok = (e_idx >= 0) & (e_idx < lq)
                qent[b, :, 0, d] = np.where(
                    ok, qa[np.clip(e_idx, 0, lq - 1)], 0xFF
                )
                qlen[b, 0, d] = lq
                lo[b, 0, d] = lod
            _td = _time.perf_counter()
            pt, pq, count, dist = _pairwise_banded_jit(
                jnp.asarray(tcodes),
                jnp.asarray(tlen),
                jnp.asarray(qwin0),
                jnp.asarray(qent),
                jnp.asarray(qlen),
                jnp.asarray(lo),
                BW=BW,
                interpret=self.interpret,
            )
            self.t_device += _time.perf_counter() - _td
            self.n_dispatches += 1
            pending.append((chunk, pt, pq, count, dist))
        self.t_tile += _time.perf_counter() - _t0

        # start every chunk's d2h before the first blocking fetch: the
        # tunnel's ~24 ms latency then overlaps across chunks
        for _, pt, pq, count, dist in pending:
            for a in (pt, pq, count, dist):
                _async_d2h(a)
        for chunk, pt, pq, count, dist in pending:
            _td = _time.perf_counter()
            pt = np.asarray(pt)
            pq = np.asarray(pq)
            count = np.asarray(count)
            dist = np.asarray(dist)
            self.t_device += _time.perf_counter() - _td
            Lr = pt.shape[2]
            for n, (pi, (q, t)) in enumerate(chunk):
                b, d = divmod(n, BSUB)
                lq, lt = len(q), len(t)
                k = (BW - 1 - abs(lq - lt)) // 2
                if int(dist[b, 0, d]) <= k - 2:
                    _ta = _time.perf_counter()
                    c = int(count[b, 0, d])
                    tp = pt[b, d, Lr - c :]
                    qp = pq[b, d, Lr - c :]
                    ops = np.where(
                        tp == -1, "I", np.where(qp == -1, "D", "M")
                    )
                    from ..pairwise import ops_to_cigar as _otc

                    out[pi] = _otc(ops.tolist())
                    self.exact_pairs += 1
                    self.t_asm += _time.perf_counter() - _ta
                else:
                    _th = _time.perf_counter()
                    out[pi] = edit_align(np.asarray(q), np.asarray(t))
                    self.exact_rejects += 1
                    self.host_fallbacks += 1
                    self.t_host += _time.perf_counter() - _th

    def _tiled_align_batch(self, pairs):
        import time as _time

        from ..pairwise import edit_align, ops_to_cigar

        _t0 = _time.perf_counter()
        # 1. tile every pair
        jobs = []  # (pair idx, tile order, q_sub, t_sub) or host marker
        results_ops: List[List[Optional[List[str]]]] = []
        for pi, (q, t) in enumerate(pairs):
            q = np.asarray(q)
            t = np.asarray(t)
            max_span = self.TILE_T - 1
            if len(q) <= max_span and len(t) <= max_span:
                cuts = [(0, 0), (len(q), len(t))]
            else:
                anchors = _minimizer_anchors(q, t)
                cuts = tile_cut_points(len(q), len(t), anchors, max_span)
            if cuts is None:
                self.host_fallbacks += 1
                results_ops.append(None)  # full host fallback
                continue
            tiles = []
            for (q0, t0), (q1, t1) in zip(cuts[:-1], cuts[1:]):
                tiles.append((q[q0:q1], t[t0:t1]))
            results_ops.append([None] * len(tiles))
            for ti, (qs, ts) in enumerate(tiles):
                jobs.append((pi, ti, qs, ts))

        self.t_tile += _time.perf_counter() - _t0

        # 2. run device tiles in DSUB-packed batches
        self._run_tiles(jobs, results_ops)

        # 3. assemble CIGARs
        _t0 = _time.perf_counter()
        out = []
        for pi, (q, t) in enumerate(pairs):
            if results_ops[pi] is None:
                _th = _time.perf_counter()
                out.append(edit_align(np.asarray(q), np.asarray(t)))
                self.t_host += _time.perf_counter() - _th
                continue
            ops: List[str] = []
            for tile_ops in results_ops[pi]:
                ops.extend(tile_ops)
            out.append(ops_to_cigar(ops))
        self.t_asm += _time.perf_counter() - _t0
        return out

    def _run_tiles(self, jobs, results_ops):
        import time as _time

        from ..pairwise import _full_dp_cigar

        _t0 = _time.perf_counter()
        device_jobs = []
        for job in jobs:
            pi, ti, qs, ts = job
            if len(qs) == 0 or len(ts) == 0 or len(qs) >= self.TILE_W:
                # degenerate or oversized: host
                self.host_fallbacks += 1
                results_ops[pi][ti] = (
                    ["I"] * len(qs)
                    if len(ts) == 0
                    else ["D"] * len(ts)
                    if len(qs) == 0
                    else _full_dp_cigar(qs, ts)
                )
            else:
                device_jobs.append(job)
        self.t_host += _time.perf_counter() - _t0

        T, W = self.TILE_T + 1, self.TILE_W
        # phase 1: dispatch every chunk (async); phase 2: fetch + decode.
        # int16 wire dtypes + overlap hide part of the ~10 MB/s tunnel.
        pending = []
        for off in range(0, len(device_jobs), 64 * DSUB):
            chunk = device_jobs[off : off + 64 * DSUB]
            # pad B to a fixed ladder: a fresh B is a fresh XLA compile,
            # so unpadded tail chunks would recompile nearly every run
            B = (len(chunk) + DSUB - 1) // DSUB
            for cand in (8, 64):
                if cand >= B:
                    B = cand
                    break
            tcodes = np.zeros((B, T, 1, DSUB), np.int16)
            tlen = np.ones((B, 1, DSUB), np.int32)
            qcodes = np.full((B, DSUB, W), 0xFF, np.int16)
            qcodes[:, :, 1] = 0
            qlen = np.ones((B, 1, DSUB), np.int32)
            tcodes[:, 0, 0, :] = 0
            for n, (pi, ti, qs, ts) in enumerate(chunk):
                b, d = divmod(n, DSUB)
                tcodes[b, : len(ts), 0, d] = ts
                tlen[b, 0, d] = len(ts)
                qcodes[b, d, 1 : 1 + len(qs)] = qs
                qlen[b, 0, d] = len(qs)
            _td = _time.perf_counter()
            pt, pq, count, _ = _pairwise_nw_pallas_wire_jit(
                jnp.asarray(tcodes),
                jnp.asarray(tlen),
                jnp.asarray(qcodes),
                jnp.asarray(qlen),
                interpret=self.interpret,
            )
            self.t_device += _time.perf_counter() - _td
            self.n_dispatches += 1
            pending.append((chunk, pt, pq, count))

        for _, pt, pq, count in pending:
            for a in (pt, pq, count):
                _async_d2h(a)
        for chunk, pt, pq, count in pending:
            _td = _time.perf_counter()
            pt = np.asarray(pt)
            pq = np.asarray(pq)
            count = np.asarray(count)
            self.t_device += _time.perf_counter() - _td
            L = pt.shape[2]
            _ta = _time.perf_counter()
            for n, (pi, ti, qs, ts) in enumerate(chunk):
                b, d = divmod(n, DSUB)
                c = int(count[b, 0, d])
                tp = pt[b, d, L - c :]
                qp = pq[b, d, L - c :]
                ops = np.where(tp == -1, "I", np.where(qp == -1, "D", "M"))
                results_ops[pi][ti] = ops.tolist()
                self.device_tiles += 1
            self.t_asm += _time.perf_counter() - _ta
