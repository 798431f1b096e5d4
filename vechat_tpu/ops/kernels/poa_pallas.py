"""Pallas TPU kernel: batched sequence-to-graph DP + in-kernel traceback.

The performance path of the framework, replacing the reference's SIMD DP
(vendor/spoa/src/simd_alignment_engine_implementation.hpp) with a TPU-native
design:

* grid = (B,) — one program per window graph; Pallas TPU grid steps run
  sequentially on the core, parallelism comes from the vector lanes.
* The DP matrix H lives entirely in VMEM scratch, shaped [N+1, D, W]:
  lane axis = DP columns, sublane axis = D sequences aligned against the
  SAME graph at once (the correction loop's realign rounds align every layer
  of a window against one frozen graph — they batch here at full (8,128)
  vreg utilisation).
* The in-row gap recurrence is a log2(W)-step shift-max prefix scan — the
  same trick as the reference's SIMD engine
  (simd_alignment_engine_implementation.hpp:109-117,866-875).
* Traceback directions are computed vectorised during the DP into an int8
  VMEM scratch with the reference's first-true priority (diagonal per
  in-edge slot, then vertical per slot, then horizontal —
  sisd_alignment_engine.cpp:369-459). SW stop cells (H == 0) are encoded as
  a STOP direction so the walk never touches H.
* The walk itself runs in-kernel as a scalar while-loop per (window,
  sequence); single-lane values are extracted with a one-hot reduce over a
  [1, W] row (Mosaic cannot scalar-index VMEM lanes dynamically), and pairs
  accumulate in vector-register carries written out once per walk.

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

NEG = -(2**28)


def _kernel(
    codes_ref,  # [1, 1, N] int32 SMEM: rank-ordered node codes
    preds_ref,  # [1, P, N] int32 SMEM: pred DP-row per slot (in-edge order)
    sink_ref,  # [1, 1, N] int32 SMEM (1 = no out-edges)
    nid_ref,  # [1, 1, N] int32 SMEM: rank -> node id
    nn_ref,  # [1, 1, 1] int32 SMEM: number of nodes
    seqp_ref,  # [1, D, W] int32 VMEM; lane j = code of seq pos j-1
    slen_ref,  # [1, 1, D] int32 VMEM: sequence lengths
    # outputs
    pairs_node_ref,  # [1, D, L] int32
    pairs_pos_ref,  # [1, D, L] int32
    count_ref,  # [1, 1, D] int32
    score_ref,  # [1, 1, D] int32
    # scratch
    H,  # [N+1, D, W] int32
    DIR,  # [N+1, D, W] int8
    *,
    N: int,
    D: int,
    W: int,
    P: int,
    L: int,
    align_type: str,
    m: int,
    x: int,
    g: int,
    dp_only: bool,
):
    mi = jnp.int32(m)
    xi = jnp.int32(x)
    gi = jnp.int32(g)
    neg = jnp.int32(NEG)
    jlane = lax.broadcasted_iota(jnp.int32, (D, W), 1)
    n_nodes = nn_ref[0, 0, 0]
    seqp = seqp_ref[0]  # [D, W]
    slen = slen_ref[0, 0].reshape(D, 1)  # [D, 1]
    STOP = 2 * P + 1

    # row 0 of H and DIR
    if align_type == "sw":
        H[0] = jnp.zeros((D, W), jnp.int32)
        DIR[0] = jnp.full((D, W), STOP, jnp.int8)  # H==0 everywhere
    else:
        H[0] = jlane * gi
        DIR[0] = jnp.full((D, W), 2 * P, jnp.int8)  # horizontal only

    log_w = int(np.ceil(np.log2(W)))

    # ---- DP over nodes in rank order
    def dp_step(r, best_state):
        best, best_i = best_state  # [D, W]
        code = codes_ref[0, 0, r]
        prof = jnp.where(seqp == code, mi, xi)  # [D, W]

        acc = jnp.full((D, W), neg, jnp.int32)
        c0 = jnp.full((D, 1), neg, jnp.int32)
        diags = []  # per-slot diagonal candidate values (reused for DIR)
        verts = []  # per-slot vertical candidate values
        for p in range(P):
            pr = preds_ref[0, p, r]
            row = H[pr]  # [D, W]
            ds = pltpu.roll(row, 1, axis=1)
            diag = jnp.where(jlane == 0, neg, ds) + prof
            vert = row + gi
            diags.append(diag)
            verts.append(vert)
            acc = jnp.maximum(acc, jnp.maximum(diag, vert))
            c0 = jnp.maximum(c0, row[:, 0:1] + gi)

        if align_type != "nw":
            c0 = jnp.zeros((D, 1), jnp.int32)

        val = jnp.where(jlane == 0, c0, acc)
        # in-row gap: run[j] = max_{k<=j} val[k] + (j-k)*g (prefix shift-max)
        t = val - jlane * gi
        for sh in range(log_w):
            s = 1 << sh
            rolled = pltpu.roll(t, s, axis=1)
            rolled = jnp.where(jlane < s, neg, rolled)
            t = jnp.maximum(t, rolled)
        run = t + jlane * gi
        if align_type == "sw":
            run = jnp.maximum(run, 0)
        H[r + 1] = run

        # traceback directions, first-true priority (reverse-order writes)
        d_dir = jnp.full((D, W), 2 * P, jnp.int32)
        for p in reversed(range(P)):
            d_dir = jnp.where(run == verts[p], P + p, d_dir)
        for p in reversed(range(P)):
            # diag candidate already has lane 0 poisoned to NEG
            d_dir = jnp.where(run == diags[p], p, d_dir)
        if align_type == "sw":
            d_dir = jnp.where(run == 0, STOP, d_dir)
        DIR[r + 1] = d_dir.astype(jnp.int8)

        # running max (first maximal cell in scan order)
        valid_row = r < n_nodes
        if align_type == "sw":
            cell_ok = (jlane != 0) & (jlane <= slen)
        elif align_type == "nw":
            cell_ok = (jlane == slen) & (sink_ref[0, 0, r] != 0)
        else:  # ov
            cell_ok = (jlane != 0) & (jlane <= slen) & (sink_ref[0, 0, r] != 0)
        improve = valid_row & cell_ok & (run > best)
        best = jnp.where(improve, run, best)
        best_i = jnp.where(improve, r + 1, best_i)
        return best, best_i

    init_best = jnp.full((D, W), 0 if align_type == "sw" else neg, jnp.int32)
    init_best_i = jnp.zeros((D, W), jnp.int32)
    # dynamic trip count: stop at the real node count, not the padded bucket
    best, best_i = lax.fori_loop(0, n_nodes, dp_step, (init_best, init_best_i))

    # ---- first maximal cell in (row, lane) scan order
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
    max_i = jnp.where(empty, 0, i_min)
    max_j = jnp.where(empty, 0, j_pick)
    score_ref[0, 0] = score_max[:, 0]

    if dp_only:
        pairs_node_ref[0] = jnp.full((D, L), -2, jnp.int32)
        pairs_pos_ref[0] = jnp.full((D, L), -2, jnp.int32)
        count_ref[0, 0] = jnp.zeros((D,), jnp.int32)
        return

    # ---- traceback walks (one per sequence, python-unrolled: d is static)
    jl1 = lax.broadcasted_iota(jnp.int32, (1, W), 1)
    lanesL = lax.broadcasted_iota(jnp.int32, (1, L), 1)
    counts = []
    for d in range(D):
        i0 = max_i[d, 0].astype(jnp.int32)
        j0 = max_j[d, 0].astype(jnp.int32)
        started = ~((i0 == 0) & (j0 == 0))

        def cond(state):
            return state[3]

        def body(state):
            i, j, k, ok, pn, pp = state
            rowd = DIR[i, d].reshape(1, W).astype(jnp.int32)  # static sublane
            dirv = jnp.sum(jnp.where(jl1 == j, rowd, 0))
            if align_type == "sw":
                do = dirv != STOP
            else:
                do = jnp.bool_(True)

            is_diag = dirv < P
            is_vert = (dirv >= P) & (dirv < 2 * P)
            slot = jnp.where(is_diag, dirv, jnp.maximum(dirv - P, 0))
            slot = jnp.minimum(slot, P - 1)
            node = jnp.maximum(i - 1, 0)
            pred_row = preds_ref[0, slot, node]
            prev_i = jnp.where(is_diag | is_vert, pred_row, i)
            prev_j = jnp.where(is_diag | (~is_vert), j - 1, j)

            upd = (lanesL == (L - 1 - k)) & do
            pn = jnp.where(
                upd, jnp.where(i == prev_i, -1, nid_ref[0, 0, node]), pn
            )
            pp = jnp.where(upd, jnp.where(j == prev_j, -1, j - 1), pp)
            i = jnp.where(do, prev_i, i)
            j = jnp.where(do, prev_j, j)
            k = jnp.where(do, k + 1, k)
            if align_type == "sw":
                ok = do
            elif align_type == "nw":
                ok = do & (~((i == 0) & (j == 0)))
            else:
                ok = do & (~((i == 0) | (j == 0)))
            return i, j, k, ok, pn, pp

        pn0 = jnp.full((1, L), -2, jnp.int32)
        pp0 = jnp.full((1, L), -2, jnp.int32)
        _, _, k_fin, _, pn, pp = lax.while_loop(
            cond, body, (i0, j0, jnp.int32(0), started, pn0, pp0)
        )
        pairs_node_ref[0, pl.ds(d, 1), :] = pn
        pairs_pos_ref[0, pl.ds(d, 1), :] = pp
        counts.append(jnp.where(started, k_fin, 0))

    if D > 1:
        count_ref[0, 0] = jnp.stack(counts)
    else:
        count_ref[0, 0] = counts[0].reshape(1)


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
    P = preds.shape[1]
    D, W = seqp.shape[1], seqp.shape[2]
    L = N + W

    kernel = functools.partial(
        _kernel,
        N=N,
        D=D,
        W=W,
        P=P,
        L=L,
        align_type=align_type,
        m=m,
        x=x,
        g=g,
        dp_only=dp_only,
    )

    smem = lambda shape: pl.BlockSpec(
        shape, lambda b: (b,) + (0,) * (len(shape) - 1), memory_space=pltpu.SMEM
    )
    vmem = lambda shape: pl.BlockSpec(
        shape, lambda b: (b,) + (0,) * (len(shape) - 1), memory_space=pltpu.VMEM
    )

    return pl.pallas_call(
        kernel,
        grid=(B,),
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
            vmem((1, D, L)),
            vmem((1, D, L)),
            vmem((1, 1, D)),
            vmem((1, 1, D)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, D, L), jnp.int32),
            jax.ShapeDtypeStruct((B, D, L), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, D), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, D), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((N + 1, D, W), jnp.int32),
            pltpu.VMEM((N + 1, D, W), jnp.int8),
        ],
        interpret=interpret,
    )(codes, preds, sink, node_id, n_nodes, seqp, seq_len)


_poa_align_pallas_jit = functools.partial(
    jax.jit, static_argnames=("align_type", "m", "x", "g", "interpret", "dp_only")
)(_poa_align_pallas_impl)


def poa_align_pallas(*args, interpret: bool = False, **kw):
    """interpret=True emulates the kernel through XLA (CPU testing); compile
    cost is bounded by keeping test shapes small + the persistent cache."""
    return _poa_align_pallas_jit(*args, interpret=interpret, **kw)
