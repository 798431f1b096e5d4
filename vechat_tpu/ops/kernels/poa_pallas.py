"""Pallas TPU kernel: batched sequence-to-graph DP + batched traceback walk.

The performance path of the framework, replacing the reference's SIMD DP
(vendor/spoa/src/simd_alignment_engine_implementation.hpp) with a TPU-native
design:

* DP kernel, grid = (B, row_chunks): one window graph per major grid step;
  node rows stream through VMEM in CH-row chunks so the direction tensor
  pipelines out to HBM while later rows compute.
* Candidate resolution uses packed **combos**: ``value << SH | prio << 9 |
  delta`` where ``prio`` encodes the traceback direction with the
  reference's first-true priority (diagonal per in-edge slot, then vertical
  per slot, then horizontal, then SW-stop — sisd_alignment_engine.cpp:
  369-459) and ``delta`` is the predecessor **row distance** (0 = the row-0
  boundary). A plain `max` over combos picks value, direction, and
  predecessor row in one op; horizontal moves are detected after the in-row
  scan by comparing the scanned value against the local maximum. Embedding
  delta makes the traceback walk self-contained: ONE gather per step
  (XLA TPU gathers cost ~6 ns/index regardless of table size, so dropping
  the preds/node-id gathers cut the walk cost ~2.5x on v5e).
* The DP history H is stored as **int16 values** (the recurrence only needs
  predecessor values; directions stream to HBM) — half the VMEM of int32,
  which doubles the sequence-batch depth D per window. The kernel is
  latency-bound on the serial in-row scan chain, so deeper D is nearly free:
  measured 13.9 -> 35 Gcell/s going D=8 -> D=32 on v5e. This is the TPU
  analog of the reference's int16 SIMD lane-density selection
  (simd_alignment_engine_implementation.hpp:684-725); callers must guarantee
  the worst-case |score| fits int16 (see `fits_int16`) and route outliers to
  the host/XLA paths.
* H rows live in a **ring buffer** of `ring` rows plus one pinned slot for
  the constant row-0 boundary (start nodes at any rank read row 0). POA
  graphs from overlapping reads have small max predecessor rank-distance
  (aligned-bundle locality), so `ring` << N holds for real windows — the
  host verifies `max(rank+1 - pred_row)` per graph and falls back to
  `ring=N` when violated. This frees most of the VMEM the full history
  used, buying 2-4x deeper D at the same budget.
* The in-row gap recurrence is the log2(W)-step shift-max prefix scan of the
  reference's SIMD engine (simd_alignment_engine_implementation.hpp:109-117,
  866-875).
* Match/mismatch profiles for the whole 16-letter alphabet are precomputed
  per window into a VMEM table; each row does one dynamic load instead of a
  compare+select.
* Predecessor slots are tiered: slot 0 always runs; slots [1,2), [2,4),
  [4,8), [8,16) run under `lax.cond` on the node's true in-degree, so the
  common 1-in-edge node costs one slot regardless of the bucket's P.
* Direction (prio, delta) codes stream out as int16.
* Best-cell tracking packs (value, row) into one int32 so the running
  "max score, then min row" reduction is a single `max`.
* Traceback runs OUTSIDE the kernel as one batched XLA walk: all B*D walks
  advance together through the HBM direction tensor with ONE gather per
  step and an early-exit while_loop, emitting (rank, pos) pairs; rank ->
  node-id decode happens on host (or via an optional in-jit gather for the
  small-shape test path).

Linear gap model only (all the correction path needs: kNW at
src/polisher.cpp:187-189, kSW at src/window.cpp:326).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

NEGV = -(2**30)  # combo-domain -inf (decodes below any fits_int16 value)
NEG16 = -16000  # value-domain -inf for int16-stored H rows
# H rows per pipelined output chunk. Smaller chunks shrink the
# double-buffered dirs out block (2*CH*D*W int16 of VMEM) — the largest
# VMEM consumer — buying a deeper D at the same budget (env-tunable for
# experiments)
ROW_CHUNK = int(os.environ.get("VECHAT_ROW_CHUNK", "32"))
TIE = 4096  # row-tie field width in the packed best-cell combo
NCODES = 16  # fixed alphabet size (ops/encode.py)
DELTA_BITS = 9  # predecessor row-distance field; ring must stay < 2**9


def fits_int16(n_cap: int, w_cap: int, m: int, x: int, g: int) -> bool:
    """Worst-case |score| bound for the int16 H rows, mirroring the
    reference's precision selection (simd_alignment_engine_implementation
    .hpp:684-725). Leaves headroom above NEG16 for poison arithmetic."""
    worst = (n_cap + w_cap + 2) * max(abs(m), abs(x), abs(g))
    return worst <= 14000 and n_cap + 1 < TIE


def max_pred_distance(preds_np: np.ndarray, n_nodes: int) -> int:
    """Max (DP row - predecessor row) over real predecessor slots of a dense
    graph (preds_np [N, P], values = DP rows, 0 = row-0 boundary). Row-0
    preds are excluded: the kernel pins row 0 in a dedicated ring slot."""
    n = int(n_nodes)
    if n <= 0:
        return 0
    pr = preds_np[:n].astype(np.int64)
    rows = np.arange(1, n + 1, dtype=np.int64)[:, None]
    return int(np.where(pr > 0, rows - pr, 0).max(initial=0))


def _sh_bits(P: int) -> int:
    """Bits below the value field: priority code (codes span [0, 2P+1] plus
    two reserved run-marker codes at the top of the field) plus the
    DELTA_BITS predecessor-distance field."""
    return int(np.ceil(np.log2(2 * P + 4))) + DELTA_BITS


def _markers(P: int):
    """Run-marker priority codes (top two values of the prio field).

    The DP kernel rewrites the direction code of cells whose chosen move is
    diagonal-delta-1 (resp. vertical-delta-1) to MARKER_D (resp. MARKER_V),
    storing the length of the maximal chain of such cells ending here in
    the delta field. The traceback can then either take the move one step
    at a time (delta 1 implied — byte-identical to the unmarked walk) or
    jump the whole run in ONE gather step (rle mode), which is where the
    walk's cost lives (~12 ns per gathered index on v5e, measured
    scripts/prof_tb2.py). Run pairs are arithmetic ((i-1-k, j-1-k) resp.
    (i-1-k, -1)) so no per-pair memory traffic is needed."""
    pb = _sh_bits(P) - DELTA_BITS
    if pb > 6:
        raise ValueError(f"P={P} pushes marker codes past int16 direction range")
    marker_d = (1 << pb) - 1
    return marker_d, marker_d - 1


def _dp_kernel(
    codes_ref,  # [1, 1, N] int32 SMEM: rank-ordered node codes
    aux_ref,  # [1, P, N] int32 SMEM: per slot, H-ring slot << 16 | diag pack
    # ((prio<<DELTA_BITS)+delta) — precomputed outside the kernel so each
    # slot costs ONE scalar load instead of a where/rem/shift chain
    deg_ref,  # [1, 1, N] int32 SMEM: true in-degree (distinct pred slots)
    sink_ref,  # [1, 1, N] int32 SMEM (1 = no out-edges)
    nn_ref,  # [1, 1, 1] int32 SMEM: number of nodes
    seqp_ref,  # [1, D, W] int32 VMEM; lane j = code of seq pos j-1
    slen_ref,  # [1, 1, D] int32 VMEM: sequence lengths
    # outputs
    dirs_ref,  # [1, CH, D, W] int16: this chunk of (prio<<9|delta) rows
    maxi_ref,  # [1, 1, D] int32: best cell DP row
    maxj_ref,  # [1, 1, D] int32: best cell lane
    score_ref,  # [1, 1, D] int32
    # scratch
    H,  # [R+1, D, W] int16 DP value ring; slot R pins the row-0 boundary
    PROF,  # [NCODES, D, W] int32: (match/mismatch << SH) per alphabet code
    BESTC,  # [D, W] int32 packed (value * TIE + (TIE-1 - row))
    RLD,  # [D, W] int32: diag-delta-1 run length of the PREVIOUS row
    RLV,  # [D, W] int32: vert-delta-1 run length of the PREVIOUS row
    *,
    N: int,
    D: int,
    W: int,
    P: int,
    NC: int,
    CH: int,
    R: int,
    align_type: str,
    m: int,
    x: int,
    g: int,
):
    SH = _sh_bits(P)
    MASKC = (1 << SH) - 1
    HORIZ_CODE = 1 << DELTA_BITS  # prio 1, delta 0
    STOP_CODE = 0
    MARKER_D, MARKER_V = _markers(P)
    DMASK = (1 << DELTA_BITS) - 1
    c = pl.program_id(1)
    jlane = lax.broadcasted_iota(jnp.int32, (D, W), 1)
    jg = jlane * jnp.int32(g)
    slen = slen_ref[0, 0].reshape(D, 1)
    n_nodes = nn_ref[0, 0, 0]
    negc = jnp.int32(NEGV)
    lane0 = jlane == 0
    log_w = int(np.ceil(np.log2(W)))
    scan_masks = [jlane >= (1 << s) for s in range(log_w)]
    if align_type == "nw":
        cell_mask = jlane == slen  # AND is_sink per row
    else:  # sw / ov share the lane mask; ov additionally ANDs is_sink
        cell_mask = (jlane != 0) & (jlane <= slen)

    @pl.when(c == 0)
    def _init():
        # slot R pins the constant row-0 boundary: start nodes at any rank
        # read DP row 0, which a pure ring would have recycled
        if align_type == "sw":
            H[R] = jnp.zeros((D, W), jnp.int16)
            dirs_ref[0, 0] = jnp.full((D, W), STOP_CODE, jnp.int16)
            BESTC[:, :] = jnp.zeros((D, W), jnp.int32)  # score 0, row 0
        else:
            H[R] = jg.astype(jnp.int16)
            dirs_ref[0, 0] = jnp.full((D, W), HORIZ_CODE, jnp.int16)
            # score NEG16, row 0 (row 0 decodes as "never updated" = empty)
            BESTC[:, :] = jnp.full(
                (D, W), NEG16 * TIE + (TIE - 1), jnp.int32
            )
        seqp = seqp_ref[0]
        for code in range(NCODES):
            PROF[code] = (
                jnp.where(seqp == code, jnp.int32(m), jnp.int32(x)) << SH
            )
        # DP row 0 (the boundary row) has no diag/vert moves
        RLD[:, :] = jnp.zeros((D, W), jnp.int32)
        RLV[:, :] = jnp.zeros((D, W), jnp.int32)

    def slot_range(acc, prof_c, r, lo, hi):
        # vert pack = diag pack - (P << DELTA_BITS): vprio = dprio - P
        VADJ = jnp.int32((g << SH) - (P << DELTA_BITS))
        for p in range(lo, hi):
            aux = aux_ref[0, p, r]
            hslot = aux >> 16
            dpack = aux & 0xFFFF
            rowv = H[hslot].astype(jnp.int32) << SH
            diag = pltpu.roll(rowv, 1, axis=1) + (prof_c + dpack)
            diag = jnp.where(lane0, negc, diag)
            vert = rowv + (VADJ + dpack)
            acc = jnp.maximum(acc, jnp.maximum(diag, vert))
        return acc

    def dp_step(hr):
        r = hr - 1  # node rank of this DP row
        deg = deg_ref[0, 0, r]
        prof_c = PROF[codes_ref[0, 0, r]]

        acc = jnp.full((D, W), negc, jnp.int32)
        acc = slot_range(acc, prof_c, r, 0, 1)
        tier_bounds = [t for t in (1, 2, 4, 8) if t < P] + [P]
        for ti in range(len(tier_bounds) - 1):
            lo, hi = tier_bounds[ti], tier_bounds[ti + 1]
            acc = lax.cond(
                deg > lo,
                lambda a, lo=lo, hi=hi: slot_range(a, prof_c, r, lo, hi),
                lambda a: a,
                acc,
            )

        if align_type != "nw":
            # first column is 0 (sw/ov); for nw the vertical candidates at
            # lane 0 already produce max(pred_row[0]) + g
            acc = jnp.where(lane0, 0, acc)

        local_val = acc >> SH
        local_code = acc & MASKC
        # in-row gap: run[j] = max_{k<=j} val[k] + (j-k)*g (prefix shift-max)
        t = local_val - jg
        for si in range(log_w):
            rolled = pltpu.roll(t, 1 << si, axis=1)
            t = jnp.maximum(t, jnp.where(scan_masks[si], rolled, negc))
        run = t + jg
        if align_type == "sw":
            run = jnp.maximum(run, 0)
        # horizontal loses every tie (last in reference priority order)
        dcode = jnp.where(run == local_val, local_code, HORIZ_CODE)
        if align_type == "sw":
            dcode = jnp.where(run == 0, STOP_CODE, dcode)
        H[lax.rem(hr - 1, R)] = run.astype(jnp.int16)
        # run-length compression: chains of diag-delta-1 (resp. vert-delta-1)
        # moves are rewritten to marker codes carrying the chain length so
        # the traceback can jump a whole run per gather (scripts/prof_tb2.py:
        # the gather IS the walk cost). Happens after all DP selection —
        # values, priorities, and move semantics are untouched.
        pr = dcode >> DELTA_BITS
        dl = dcode & DMASK
        isd1 = (pr >= P + 2) & (dl == 1)
        isv1 = (pr >= 2) & (pr <= P + 1) & (dl == 1)
        rld = jnp.where(
            isd1, jnp.minimum(pltpu.roll(RLD[:, :], 1, axis=1) + 1, DMASK), 0
        )
        rlv = jnp.where(isv1, jnp.minimum(RLV[:, :] + 1, DMASK), 0)
        dcode = jnp.where(isd1, (MARKER_D << DELTA_BITS) | rld, dcode)
        dcode = jnp.where(isv1, (MARKER_V << DELTA_BITS) | rlv, dcode)
        RLD[:, :] = rld
        RLV[:, :] = rlv
        dirs_ref[0, hr - c * CH] = dcode.astype(jnp.int16)

        # running best cell: pack (value, row) so one max keeps the highest
        # score and, on ties, the smallest row (first in scan order)
        def best_update():
            cand = run * TIE + (jnp.int32(TIE - 1) - hr)
            BESTC[:, :] = jnp.maximum(
                BESTC[:, :], jnp.where(cell_mask, cand, jnp.int32(-(2**30)))
            )

        if align_type == "sw":
            best_update()
        else:
            # nw/ov best cells live on sink rows only; skip the rest
            @pl.when(sink_ref[0, 0, r] != 0)
            def _():
                best_update()

    # static trip count (program_id-derived dynamic bounds hang interpret
    # mode); rows outside [1, n_nodes] are skipped by the predicated branch
    def dp_body(k, carry):
        hr = c * CH + k

        @pl.when((hr >= 1) & (hr <= n_nodes))
        def _():
            dp_step(hr)

        return carry

    lax.fori_loop(0, CH, dp_body, 0)

    @pl.when(c == NC - 1)
    def _finalize():
        bc = BESTC[:, :]
        big = jnp.int32(2**30)
        best_combo = jnp.max(bc, axis=1, keepdims=True)  # [D, 1]
        # arithmetic shift = floor division: exact since 0 <= tie < TIE
        score_max = best_combo >> 12
        tie = best_combo & jnp.int32(TIE - 1)
        i_pick = jnp.int32(TIE - 1) - tie
        lane_hit = bc == best_combo
        j_pick = jnp.min(
            jnp.where(lane_hit, jlane, big), axis=1, keepdims=True
        )
        if align_type == "sw":
            empty = score_max <= 0
        else:
            empty = i_pick == 0
        maxi_ref[0, 0] = jnp.where(empty, 0, i_pick)[:, 0]
        maxj_ref[0, 0] = jnp.where(empty, 0, j_pick)[:, 0]
        score_ref[0, 0] = score_max[:, 0]


def _decode_move(code, P, align_type):
    """Decode a direction code into (is_diag, is_vert, delta_eff, is_run,
    run_len). Marker codes (run-compressed diag/vert-delta-1 chains) decode
    as their single-step move with delta 1; run_len carries the jumpable
    chain length for the rle walk."""
    MARKER_D, MARKER_V = _markers(P)
    DMASK = (1 << DELTA_BITS) - 1
    pr = code >> DELTA_BITS
    dl = code & DMASK
    is_mrkd = pr == MARKER_D
    is_mrkv = pr == MARKER_V
    is_run = is_mrkd | is_mrkv
    is_diag = ((pr >= P + 2) & (pr < MARKER_V)) | is_mrkd
    is_vert = ((pr >= 2) & (pr <= P + 1)) | is_mrkv
    delta_eff = jnp.where(is_run, 1, dl)
    run_len = jnp.where(is_run, dl, 1)
    is_stop = pr == 0
    return is_diag, is_vert, delta_eff, is_run, run_len, is_stop


def _traceback_walk(dirs, maxi, maxj, align_type, L, P):
    """All B*D walks advance together; ONE gather per step; early exit.

    dirs:  [B, N1P, D, W] int16 (prio << DELTA_BITS | delta) rows
    maxi/maxj: [B, 1, D] int32 start cells (0,0 = empty alignment)
    Returns pn, pp [B, D, L] int32 (pairs back-to-front), count [B, D].
    pn holds DP *rank* (row-1), not node id — decode rank -> node id with
    `node_id` afterwards (host numpy, or _ranks_to_node_ids in-jit).
    """
    B, N1P, D, W = dirs.shape
    BD = B * D
    cf = dirs.reshape(-1)
    bidx = jnp.arange(BD, dtype=jnp.int32) // D
    didx = jnp.arange(BD, dtype=jnp.int32) % D
    i0 = maxi[:, 0, :].reshape(BD)
    j0 = maxj[:, 0, :].reshape(BD)
    started = ~((i0 == 0) & (j0 == 0))
    if align_type == "ov":
        active0 = started & (i0 != 0) & (j0 != 0)
    else:
        active0 = started

    def cond(st):
        step, _, _, _, active, _, _ = st
        return (step < L) & jnp.any(active)

    UNROLL = 16  # steps per while iteration: amortizes loop overhead
    # pad the pair buffers so an unrolled tail never writes below column 0
    # (the last batch can run to step L+UNROLL-2 with all lanes inactive)
    LP = L + UNROLL

    # one plain take per step: TPU gather cost is LINEAR in index count
    # (~11.7 ns/idx at every size 128..4096, slope-measured
    # scripts/prof_tb5.py — r4's "superlinear" reading was roundtrip-
    # polluted), so chunked gathers only add slice/concat overhead
    def _gather(flat):
        return jnp.take(cf, flat).astype(jnp.int32)

    def one_step(step, i, j, cnt, active, pn, pp):
        flat = ((bidx * N1P + i) * D + didx) * W + j
        code = _gather(flat)
        is_diag, is_vert, delta, _, _, is_stop = _decode_move(
            code, P, align_type
        )
        if align_type == "sw":
            do = active & ~is_stop
        else:
            do = active
        prev_i = jnp.where(is_diag | is_vert, i - delta, i)
        prev_i = jnp.where(delta == 0, jnp.where(is_diag | is_vert, 0, i), prev_i)
        prev_j = jnp.where(is_diag | (~is_vert), j - 1, j)
        pnv = jnp.where(do, jnp.where(prev_i == i, -1, i - 1), -2)
        ppv = jnp.where(do, jnp.where(prev_j == j, -1, j - 1), -2)
        col = LP - 1 - step
        pn = lax.dynamic_update_slice(pn, pnv[:, None], (0, col))
        pp = lax.dynamic_update_slice(pp, ppv[:, None], (0, col))
        i = jnp.where(do, prev_i, i)
        j = jnp.where(do, prev_j, j)
        cnt = cnt + do.astype(jnp.int32)
        if align_type == "sw":
            nactive = do
        elif align_type == "nw":
            nactive = do & ~((i == 0) & (j == 0))
        else:
            nactive = do & ~((i == 0) | (j == 0))
        return step + 1, i, j, cnt, nactive, pn, pp

    def body(st):
        step, i, j, cnt, active, pn, pp = st
        for _ in range(UNROLL):
            step, i, j, cnt, active, pn, pp = one_step(
                step, i, j, cnt, active, pn, pp
            )
        return step, i, j, cnt, active, pn, pp

    pn0 = jnp.full((BD, LP), -2, jnp.int32)
    pp0 = jnp.full((BD, LP), -2, jnp.int32)
    st = (
        jnp.int32(0),
        i0,
        j0,
        jnp.zeros(BD, jnp.int32),
        active0,
        pn0,
        pp0,
    )
    _, _, _, cnt, _, pn, pp = lax.while_loop(cond, body, st)
    pn = pn[:, LP - L :]
    pp = pp[:, LP - L :]
    cnt = jnp.where(started, cnt, 0)
    return (
        pn.reshape(B, D, L),
        pp.reshape(B, D, L),
        cnt.reshape(B, D),
    )


# RLE run-header field layout (packed int32, nonnegative):
#   bits [19, 31): pn0 + 2   (first pair's rank field; -1 = insertion)
#   bits [9, 19):  pp0 + 2   (first pair's position field; -1 = deletion)
#   bits [0, 9):   r          (pairs in this step; 0 = inactive step)
# Pair k of a step (k in [0, r)) is (pn0 - k*dn, pp0 - k*dp) with dn = 1,
# dp = (pp0 >= 0) for r > 1 (arithmetic runs); r == 1 steps use the header
# pair verbatim. Headers are written in walk order (back-to-front pairs).
RUN_R_BITS = 9
RUN_PP_BITS = 10
RUN_PN_SHIFT = RUN_R_BITS + RUN_PP_BITS


def _traceback_walk_rle(dirs, maxi, maxj, align_type, L, P):
    """Run-jumping traceback: marker cells advance a whole diag/vert run in
    one gather step, emitting ONE packed header per step; pairs are expanded
    arithmetically by the consumer (expand_runs_np — np.repeat, C speed).

    ~6-10x fewer serial gather steps than _traceback_walk on real windows
    (the per-step [BD]-index gather is the entire walk cost; see
    scripts/prof_tb2.py). Returns (runs [LP, B*D] int32 walk-order headers,
    steps scalar int32 = used rows, count [B, D] total pairs)."""
    B, N1P, D, W = dirs.shape
    BD = B * D
    cf = dirs.reshape(-1)
    bidx = jnp.arange(BD, dtype=jnp.int32) // D
    didx = jnp.arange(BD, dtype=jnp.int32) % D
    i0 = maxi[:, 0, :].reshape(BD)
    j0 = maxj[:, 0, :].reshape(BD)
    started = ~((i0 == 0) & (j0 == 0))
    if align_type == "ov":
        active0 = started & (i0 != 0) & (j0 != 0)
    else:
        active0 = started

    # while_loop iteration overhead is ~90 us on this chip — a large unroll
    # amortizes it; the <=UNROLL-1 step overshoot costs one gather each
    # (~48 us at BD=4096), still a clear net win over UNROLL=4
    UNROLL = 16
    LP = L + UNROLL

    def _gather(flat):
        # linear-cost gather — see the note in _traceback_walk
        return jnp.take(cf, flat).astype(jnp.int32)

    def cond(st):
        step, _, _, _, active, _ = st
        return (step < L) & jnp.any(active)

    def one_step(step, i, j, cnt, active, runs):
        flat = ((bidx * N1P + i) * D + didx) * W + j
        code = _gather(flat)
        is_diag, is_vert, delta, is_run, r, is_stop = _decode_move(
            code, P, align_type
        )
        if align_type == "sw":
            do = active & ~is_stop
        else:
            do = active
        # single-step (non-run) move target + emitted pair
        prev_i1 = jnp.where(is_diag | is_vert, i - delta, i)
        prev_i1 = jnp.where(
            delta == 0, jnp.where(is_diag | is_vert, 0, i), prev_i1
        )
        prev_j1 = jnp.where(is_diag | (~is_vert), j - 1, j)
        pn0 = jnp.where(prev_i1 == i, -1, i - 1)
        pp0 = jnp.where(prev_j1 == j, -1, j - 1)
        # run move target: r diag (resp. vert) unit steps at once
        prev_i = jnp.where(is_run, i - r, prev_i1)
        prev_j = jnp.where(is_run & is_diag, j - r, prev_j1)
        header = jnp.where(
            do,
            ((pn0 + 2) << RUN_PN_SHIFT)
            | ((pp0 + 2) << RUN_R_BITS)
            | jnp.where(is_run, r, 1),
            0,
        )
        runs = lax.dynamic_update_slice(runs, header[None, :], (step, 0))
        i = jnp.where(do, prev_i, i)
        j = jnp.where(do, prev_j, j)
        cnt = cnt + jnp.where(do, jnp.where(is_run, r, 1), 0)
        if align_type == "sw":
            nactive = do
        elif align_type == "nw":
            nactive = do & ~((i == 0) & (j == 0))
        else:
            nactive = do & ~((i == 0) | (j == 0))
        return step + 1, i, j, cnt, nactive, runs

    def body(st):
        step, i, j, cnt, active, runs = st
        for _ in range(UNROLL):
            step, i, j, cnt, active, runs = one_step(
                step, i, j, cnt, active, runs
            )
        return step, i, j, cnt, active, runs

    runs0 = jnp.zeros((LP, BD), jnp.int32)
    st = (
        jnp.int32(0),
        i0,
        j0,
        jnp.zeros(BD, jnp.int32),
        active0,
        runs0,
    )
    steps, _, _, cnt, _, runs = lax.while_loop(cond, body, st)
    cnt = jnp.where(started, cnt, 0)
    return runs, steps, cnt.reshape(B, D)


def runs_to_pairs_np(runs_w: np.ndarray):
    """Expand one walk's headers (runs_w [S] int32, walk order) to
    front-to-back (pn, pp) int64 arrays. np.repeat does the run stretch."""
    r = runs_w & ((1 << RUN_R_BITS) - 1)
    m = r > 0
    rr = r[m].astype(np.int64)
    pn0 = ((runs_w[m] >> RUN_PN_SHIFT) & 0xFFF).astype(np.int64) - 2
    pp0 = ((runs_w[m] >> RUN_R_BITS) & ((1 << RUN_PP_BITS) - 1)).astype(
        np.int64
    ) - 2
    total = int(rr.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    starts = np.zeros(len(rr), np.int64)
    np.cumsum(rr[:-1], out=starts[1:])
    k = np.arange(total, dtype=np.int64) - np.repeat(starts, rr)
    dn = (rr > 1).astype(np.int64)
    dp = ((rr > 1) & (pp0 >= 0)).astype(np.int64)
    pn = np.repeat(pn0, rr) - k * np.repeat(dn, rr)
    pp = np.repeat(pp0, rr) - k * np.repeat(dp, rr)
    return pn[::-1], pp[::-1]


def expand_runs_np(runs: np.ndarray, B: int, D: int, L: int):
    """Expand [S, B*D] walk-order headers to dense right-aligned pn, pp
    [B, D, L] int32 (-2 padding) + count [B, D] — the _traceback_walk
    output format, for parity tests and dense-format consumers."""
    BD = B * D
    pn = np.full((BD, L), -2, np.int32)
    pp = np.full((BD, L), -2, np.int32)
    cnt = np.zeros(BD, np.int32)
    for w in range(BD):
        a, b = runs_to_pairs_np(runs[:, w])
        c = len(a)
        cnt[w] = c
        if c:
            pn[w, L - c :] = a
            pp[w, L - c :] = b
    return (
        pn.reshape(B, D, L),
        pp.reshape(B, D, L),
        cnt.reshape(B, D),
    )


def _ranks_to_node_ids(pn, node_id):
    """In-jit rank -> node-id decode (gather over [B, D, L]; fine for small
    test shapes, production callers decode on host with ranks_to_node_ids)."""
    B, D, L = pn.shape
    nid = node_id[:, 0, :]  # [B, N]
    safe = jnp.maximum(pn, 0).astype(jnp.int32)
    mapped = jnp.take_along_axis(
        nid[:, None, :].repeat(D, axis=1).reshape(B * D, -1),
        safe.reshape(B * D, L),
        axis=1,
    ).reshape(B, D, L)
    return jnp.where(pn >= 0, mapped, pn.astype(jnp.int32))


def ranks_to_node_ids_np(pn: np.ndarray, node_id_row: np.ndarray) -> np.ndarray:
    """Host-side rank -> node-id decode for one window (node_id_row [N])."""
    out = pn.copy()
    pos = pn >= 0
    out[pos] = node_id_row[pn[pos]]
    return out


def _poa_dp_pallas(
    codes,  # [B, 1, N] int32
    preds,  # [B, P, N] int32
    sink,  # [B, 1, N] int32
    n_nodes,  # [B, 1, 1] int32
    seqp,  # [B, D, W] int32
    seq_len,  # [B, 1, D] int32
    align_type: str,
    m: int,
    x: int,
    g: int,
    interpret: bool = False,
    ring: int = 0,
):
    """Runs the DP kernel; returns (dirs [B,N1P,D,W] int8, maxi, maxj, score).

    ring: H-row ring size; every graph in the batch must have max
    predecessor rank-distance <= ring (0 = full history, always safe)."""
    B, _, N = codes.shape
    P = preds.shape[1]
    D, W = seqp.shape[1], seqp.shape[2]
    CH = min(ROW_CHUNK, N + 1)
    NC = -(-(N + 1) // CH)
    N1P = NC * CH
    R = N if ring <= 0 or ring > N else ring
    if R >= (1 << DELTA_BITS):
        raise ValueError(
            f"ring {R} exceeds the {DELTA_BITS}-bit predecessor-delta field; "
            f"pass ring<{1 << DELTA_BITS} (graphs with larger predecessor "
            f"reach must go to the host/XLA path)"
        )

    # true in-degree per row: padding repeats slot 0, real slots are distinct
    deg = (preds[:, 1:, :] != preds[:, :1, :]).sum(
        axis=1, dtype=jnp.int32
    )[:, None, :] + 1  # [B, 1, N]

    # per-slot aux pack (vectorized XLA, off the kernel's scalar unit):
    # hslot << 16 | (prio << DELTA_BITS) + delta, where hslot is the H-ring
    # slot (R = pinned row-0 boundary) and delta the predecessor distance
    rows = jnp.arange(1, N + 1, dtype=jnp.int32)[None, None, :]
    pz = preds == 0
    hslot = jnp.where(pz, R, lax.rem(preds - 1, R))
    delta = jnp.where(pz, 0, rows - preds)
    dprio = (2 * P + 1 - jnp.arange(P, dtype=jnp.int32))[None, :, None]
    aux = (hslot << 16) | ((dprio << DELTA_BITS) + delta)

    kernel = functools.partial(
        _dp_kernel,
        N=N,
        D=D,
        W=W,
        P=P,
        NC=NC,
        CH=CH,
        R=R,
        align_type=align_type,
        m=m,
        x=x,
        g=g,
    )

    smem = lambda shape: pl.BlockSpec(
        shape, lambda b, c: (b,) + (0,) * (len(shape) - 1), memory_space=pltpu.SMEM
    )
    vmem = lambda shape: pl.BlockSpec(
        shape, lambda b, c: (b,) + (0,) * (len(shape) - 1), memory_space=pltpu.VMEM
    )

    return pl.pallas_call(
        kernel,
        grid=(B, NC),
        in_specs=[
            smem((1, 1, N)),
            smem((1, P, N)),
            smem((1, 1, N)),
            smem((1, 1, N)),
            smem((1, 1, 1)),
            vmem((1, D, W)),
            vmem((1, 1, D)),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, CH, D, W), lambda b, c: (b, c, 0, 0), memory_space=pltpu.VMEM
            ),
            vmem((1, 1, D)),
            vmem((1, 1, D)),
            vmem((1, 1, D)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N1P, D, W), jnp.int16),
            jax.ShapeDtypeStruct((B, 1, D), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, D), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, D), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((R + 1, D, W), jnp.int16),
            pltpu.VMEM((NCODES, D, W), jnp.int32),
            pltpu.VMEM((D, W), jnp.int32),
            pltpu.VMEM((D, W), jnp.int32),
            pltpu.VMEM((D, W), jnp.int32),
        ],
        interpret=interpret,
    )(codes, aux, deg, sink, n_nodes, seqp, seq_len)


def _poa_align_pallas_impl(
    codes,  # [B, 1, N] int32
    preds,  # [B, P, N] int32
    sink,  # [B, 1, N] int32
    node_id,  # [B, 1, N] int32
    n_nodes,  # [B, 1, 1] int32
    seqp,  # [B, D, W] int32
    seq_len,  # [B, 1, D] int32
    align_type: str,
    m: int,
    x: int,
    g: int,
    interpret: bool = False,
    dp_only: bool = False,
    ring: int = 0,
    emit_node_ids: bool = True,
    emit_rle: bool = False,
    preds_is_delta: bool = False,
):
    """Returns (pairs_node [B,D,L] int16, pairs_pos [B,D,L] int16,
    count [B,1,D], score [B,1,D]). With emit_node_ids=False, pairs_node
    holds DP ranks (decode on host with ranks_to_node_ids_np — skips a
    [B,D,L] gather).

    With emit_rle=True, returns (runs [L+4, B*D] int32, steps scalar int32,
    count [B,1,D], score [B,1,D]) instead: run-compressed traceback headers
    in walk order (expand with expand_runs_np / runs_to_pairs_np; rows
    beyond `steps` are zero — fetch runs[:steps] to cut wire bytes ~8x).
    The rle walk jumps whole diag/vert unit-delta runs per gather step,
    which cuts the serial-gather step count ~6-10x (scripts/prof_tb2.py:
    the gather IS the walk cost).

    Wire-size note: this machine reaches its TPU through a ~10 MB/s tunnel,
    so every input upcasts from the narrowest dtype that fits (int16 graph
    tensors, int16 sequences) on DEVICE, and the pair outputs downcast to
    int16 before the fetch — values are bounded by N < 2048 and W."""
    codes = codes.astype(jnp.int32)
    preds = preds.astype(jnp.int32)
    sink = sink.astype(jnp.int32)
    node_id = node_id.astype(jnp.int32)
    n_nodes = n_nodes.astype(jnp.int32)
    seqp = seqp.astype(jnp.int32)
    seq_len = seq_len.astype(jnp.int32)
    B, _, N = codes.shape
    if preds_is_delta:
        # uint8 wire format: preds carry the predecessor ROW DISTANCE
        # (delta = row - pred_row, bounded by the ring <= 254) with 255 as
        # the row-0-boundary sentinel — half the bytes of int16 rows
        # through the ~10 MB/s tunnel; reconstruct rows on device
        rows = jnp.arange(1, N + 1, dtype=jnp.int32)[None, None, :]
        preds = jnp.where(preds == 255, 0, rows - preds)
    P = preds.shape[1]
    D, W = seqp.shape[1], seqp.shape[2]
    L = N + W

    dirs, maxi, maxj, score = _poa_dp_pallas(
        codes, preds, sink, n_nodes, seqp, seq_len,
        align_type, m, x, g, interpret=interpret, ring=ring,
    )
    if dp_only:
        pn = jnp.full((B, D, L), -2, jnp.int16)
        pp = jnp.full((B, D, L), -2, jnp.int16)
        count = jnp.zeros((B, 1, D), jnp.int32)
        return pn, pp, count, score

    if emit_rle:
        N1P = dirs.shape[1]
        if N1P + 1 >= (1 << 12) or W + 1 >= (1 << RUN_PP_BITS):
            raise ValueError(
                f"shape N1P={N1P}, W={W} exceeds rle header fields"
            )
        runs, steps, count = _traceback_walk_rle(
            dirs, maxi, maxj, align_type, L, P
        )
        return runs, steps, count[:, None, :], score

    pn, pp, count = _traceback_walk(dirs, maxi, maxj, align_type, L, P)
    if emit_node_ids:
        pn = _ranks_to_node_ids(pn, node_id)
    return (
        pn.astype(jnp.int16),
        pp.astype(jnp.int16),
        count[:, None, :],
        score,
    )


_poa_align_pallas_jit = functools.partial(
    jax.jit,
    static_argnames=(
        "align_type", "m", "x", "g", "interpret", "dp_only", "ring",
        "emit_node_ids", "emit_rle", "preds_is_delta",
    ),
)(_poa_align_pallas_impl)


def poa_align_pallas(*args, interpret: bool = False, **kw):
    """interpret=True emulates the kernel through XLA (CPU testing); compile
    cost is bounded by keeping test shapes small + the persistent cache."""
    return _poa_align_pallas_jit(*args, interpret=interpret, **kw)
