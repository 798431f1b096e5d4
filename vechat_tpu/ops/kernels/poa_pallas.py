"""Pallas TPU kernel: batched sequence-to-graph DP + batched traceback walk.

The performance path of the framework, replacing the reference's SIMD DP
(vendor/spoa/src/simd_alignment_engine_implementation.hpp) with a TPU-native
design. Round-2 architecture (the round-1 kernel kept an in-kernel scalar
traceback walk that dominated runtime):

* DP kernel, grid = (B, row_chunks): one window graph per major grid step;
  node rows stream through VMEM in CH-row chunks so the direction tensor
  pipelines out to HBM while later rows compute.
* Each DP cell stores a packed **combo** int32: ``value << SH | code`` where
  ``code`` encodes the traceback direction with the reference's first-true
  priority (diagonal per in-edge slot, then vertical per slot, then
  horizontal, then SW-stop — sisd_alignment_engine.cpp:369-459). A plain
  `max` over combos therefore picks both the DP value and the
  highest-priority direction in one op; horizontal moves are detected after
  the in-row scan by comparing the scanned value against the local maximum.
* The in-row gap recurrence is the log2(W)-step shift-max prefix scan of the
  reference's SIMD engine (simd_alignment_engine_implementation.hpp:109-117,
  866-875).
* Predecessor slots are tiered: slot 0 always runs; slots [1,2), [2,4),
  [4,8), [8,16) run under `lax.cond` on the node's true in-degree, so the
  common 1-in-edge node costs one slot regardless of the bucket's P.
* Traceback runs OUTSIDE the kernel as one batched XLA walk: all B*D walks
  advance together through the HBM combo tensor with 3 gathers per step and
  an early-exit while_loop — O(path) total work instead of the round-1
  O(path * W) per-sequence one-hot reduce.

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

NEGV = -(2**28)  # value-domain -inf (scan poison)
ROW_CHUNK = 64  # H rows per pipelined output chunk


def _sh_bits(P: int) -> int:
    """Bits reserved for the direction code: codes span [0, 2P+1]."""
    return int(np.ceil(np.log2(2 * P + 2)))


def _dp_kernel(
    codes_ref,  # [1, 1, N] int32 SMEM: rank-ordered node codes
    preds_ref,  # [1, P, N] int32 SMEM: pred DP-row per slot (in-edge order)
    deg_ref,  # [1, 1, N] int32 SMEM: true in-degree (distinct pred slots)
    sink_ref,  # [1, 1, N] int32 SMEM (1 = no out-edges)
    nn_ref,  # [1, 1, 1] int32 SMEM: number of nodes
    seqp_ref,  # [1, D, W] int32 VMEM; lane j = code of seq pos j-1
    slen_ref,  # [1, 1, D] int32 VMEM: sequence lengths
    # outputs
    combo_ref,  # [1, CH, D, W] int32: this chunk of packed (value, dir) rows
    maxi_ref,  # [1, 1, D] int32: best cell DP row
    maxj_ref,  # [1, 1, D] int32: best cell lane
    score_ref,  # [1, 1, D] int32
    # scratch
    H,  # [N+1, D, W] int32 combo rows (full history: preds reach back)
    BEST,  # [D, W] int32 running per-lane max
    BESTI,  # [D, W] int32 row of the running max
    *,
    N: int,
    D: int,
    W: int,
    P: int,
    NC: int,
    CH: int,
    align_type: str,
    m: int,
    x: int,
    g: int,
):
    SH = _sh_bits(P)
    MASKC = (1 << SH) - 1
    HORIZ_CODE = 1
    STOP_CODE = 0
    c = pl.program_id(1)
    mi = jnp.int32(m)
    xi = jnp.int32(x)
    jlane = lax.broadcasted_iota(jnp.int32, (D, W), 1)
    jg = jlane * jnp.int32(g)
    slen = slen_ref[0, 0].reshape(D, 1)
    n_nodes = nn_ref[0, 0, 0]
    seqp = seqp_ref[0]
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
        if align_type == "sw":
            row0 = jnp.zeros((D, W), jnp.int32)  # value 0, code STOP
        else:
            row0 = (jg << SH) + HORIZ_CODE
        H[0] = row0
        combo_ref[0, 0] = row0
        BEST[:, :] = jnp.full(
            (D, W), 0 if align_type == "sw" else NEGV, jnp.int32
        )
        BESTI[:, :] = jnp.zeros((D, W), jnp.int32)

    def slot_range(acc, prof_c, r, lo, hi):
        for p in range(lo, hi):
            pr = preds_ref[0, p, r]
            rowv = H[pr] & ~MASKC  # value << SH (strips the dir code)
            # candidate codes: priority idx -> code = (2P+1) - idx
            dcode = (2 * P + 1) - p
            vcode = (2 * P + 1) - (P + p)
            diag = pltpu.roll(rowv, 1, axis=1) + (prof_c + dcode)
            diag = jnp.where(lane0, negc, diag)
            vert = rowv + jnp.int32((g << SH) + vcode)
            acc = jnp.maximum(acc, jnp.maximum(diag, vert))
        return acc

    def dp_step(hr):
        r = hr - 1  # node rank of this DP row
        code = codes_ref[0, 0, r]
        deg = deg_ref[0, 0, r]
        prof_c = jnp.where(seqp == code, mi, xi) << SH

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
        combo = (run << SH) + dcode
        H[hr] = combo
        combo_ref[0, hr - c * CH] = combo

        # running max (first maximal cell in (row, lane) scan order)
        if align_type == "sw":
            ok = cell_mask
        else:
            ok = cell_mask & (sink_ref[0, 0, r] != 0)
        imp = ok & (run > BEST[:, :])
        BEST[:, :] = jnp.where(imp, run, BEST[:, :])
        BESTI[:, :] = jnp.where(imp, hr, BESTI[:, :])

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
        best = BEST[:, :]
        best_i = BESTI[:, :]
        big = jnp.int32(2**28)
        score_max = jnp.max(best, axis=1, keepdims=True)  # [D, 1]
        at_max = best == score_max
        i_min = jnp.min(jnp.where(at_max, best_i, big), axis=1, keepdims=True)
        lane_pick = at_max & (best_i == i_min)
        j_pick = jnp.min(jnp.where(lane_pick, jlane, big), axis=1, keepdims=True)
        if align_type == "sw":
            empty = score_max <= 0
        else:
            empty = i_min == 0
        maxi_ref[0, 0] = jnp.where(empty, 0, i_min)[:, 0]
        maxj_ref[0, 0] = jnp.where(empty, 0, j_pick)[:, 0]
        score_ref[0, 0] = score_max[:, 0]


def _traceback_walk(combos, preds, node_id, maxi, maxj, align_type, L):
    """All B*D walks advance together; 3 gathers/step; early exit.

    combos: [B, N1P, D, W] int32 packed (value << SH | code) rows
    preds:  [B, P, N] int32, node_id: [B, 1, N] int32
    maxi/maxj: [B, 1, D] int32 start cells (0,0 = empty alignment)
    Returns pn, pp [B, D, L] int32 (pairs back-to-front), count [B, D].
    """
    B, N1P, D, W = combos.shape
    P, N = preds.shape[1], preds.shape[2]
    SH = _sh_bits(P)
    MASKC = (1 << SH) - 1
    STOP_IDX = 2 * P + 1
    BD = B * D
    cf = combos.reshape(-1)
    pf = preds.reshape(-1)
    nf = node_id.reshape(-1)
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

    def body(st):
        step, i, j, cnt, active, pn, pp = st
        flat = ((bidx * N1P + i) * D + didx) * W + j
        cv = jnp.take(cf, flat)
        idx = STOP_IDX - (cv & MASKC)
        if align_type == "sw":
            do = active & (idx != STOP_IDX)
        else:
            do = active
        is_diag = idx < P
        is_vert = (idx >= P) & (idx < 2 * P)
        slot = jnp.where(is_diag, idx, jnp.maximum(idx - P, 0))
        slot = jnp.minimum(slot, P - 1)
        node = jnp.maximum(i - 1, 0)
        pred = jnp.take(pf, (bidx * P + slot) * N + node)
        prev_i = jnp.where(is_diag | is_vert, pred, i)
        prev_j = jnp.where(is_diag | (~is_vert), j - 1, j)
        nid = jnp.take(nf, bidx * N + node)
        pnv = jnp.where(do, jnp.where(prev_i == i, -1, nid), -2)
        ppv = jnp.where(do, jnp.where(prev_j == j, -1, j - 1), -2)
        col = L - 1 - step
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

    pn0 = jnp.full((BD, L), -2, jnp.int32)
    pp0 = jnp.full((BD, L), -2, jnp.int32)
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
    cnt = jnp.where(started, cnt, 0)
    return (
        pn.reshape(B, D, L),
        pp.reshape(B, D, L),
        cnt.reshape(B, D),
    )


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
):
    """Runs the DP kernel; returns (combos [B,N1P,D,W], maxi, maxj, score)."""
    B, _, N = codes.shape
    P = preds.shape[1]
    D, W = seqp.shape[1], seqp.shape[2]
    CH = min(ROW_CHUNK, N + 1)
    NC = -(-(N + 1) // CH)
    N1P = NC * CH

    # true in-degree per row: padding repeats slot 0, real slots are distinct
    deg = (preds[:, 1:, :] != preds[:, :1, :]).sum(
        axis=1, dtype=jnp.int32
    )[:, None, :] + 1  # [B, 1, N]

    kernel = functools.partial(
        _dp_kernel,
        N=N,
        D=D,
        W=W,
        P=P,
        NC=NC,
        CH=CH,
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
            jax.ShapeDtypeStruct((B, N1P, D, W), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, D), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, D), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, D), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((N + 1, D, W), jnp.int32),
            pltpu.VMEM((D, W), jnp.int32),
            pltpu.VMEM((D, W), jnp.int32),
        ],
        interpret=interpret,
    )(codes, preds, deg, sink, n_nodes, seqp, seq_len)


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
):
    """Returns (pairs_node [B,D,L], pairs_pos [B,D,L], count [B,1,D],
    score [B,1,D])."""
    B, _, N = codes.shape
    D, W = seqp.shape[1], seqp.shape[2]
    L = N + W

    combos, maxi, maxj, score = _poa_dp_pallas(
        codes, preds, sink, n_nodes, seqp, seq_len,
        align_type, m, x, g, interpret=interpret,
    )
    if dp_only:
        pn = jnp.full((B, D, L), -2, jnp.int32)
        pp = jnp.full((B, D, L), -2, jnp.int32)
        count = jnp.zeros((B, 1, D), jnp.int32)
        return pn, pp, count, score

    pn, pp, count = _traceback_walk(
        combos, preds, node_id, maxi, maxj, align_type, L
    )
    return pn, pp, count[:, None, :], score


_poa_align_pallas_jit = functools.partial(
    jax.jit, static_argnames=("align_type", "m", "x", "g", "interpret", "dp_only")
)(_poa_align_pallas_impl)


def poa_align_pallas(*args, interpret: bool = False, **kw):
    """interpret=True emulates the kernel through XLA (CPU testing); compile
    cost is bounded by keeping test shapes small + the persistent cache."""
    return _poa_align_pallas_jit(*args, interpret=interpret, **kw)
