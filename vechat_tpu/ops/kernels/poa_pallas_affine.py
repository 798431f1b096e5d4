"""Pallas TPU kernel: AFFINE-gap batched sequence-to-graph DP + traceback.

Extends the linear kernel's design (poa_pallas.py — int16 ring-buffer rows,
packed value|prio|delta combos, streamed direction rows, one-gather batched
traceback) with the affine gap model of the reference SISD engine
(vendor/spoa/src/sisd_alignment_engine.cpp:462-676):

  F[i][j] = max_p max(H[p][j] + g, F[p][j] + e)        (graph-gap channel)
  E[i][j] = max(H[i][j-1] + g, E[i][j-1] + e)          (sequence-gap channel)
  H[i][j] = max(diag_p + prof, F[i][j], E[i][j] [, 0])

Two int16 ring buffers (H and F). The in-row E recurrence collapses to the
same log2(W) shift-max prefix scan as the linear kernel, over
S[j] = A0[j] - j*e (A0 = pre-E H), because g <= e absorbs E[j-1]+g.

Direction streams: per cell an int32 = (FE << 16) | Hcode, so the batched
walk still costs ONE gather per step.
  Hcode  int16: prio << DELTA_BITS | delta, prio ordered by the reference
         dispatch's first-true priority (sisd:550-675): diag per in-edge
         slot, then per slot F-extend THEN F-open, then E-extend, E-open,
         then SW-stop.
  FE     int16: bit 14 = EB (E formed by extension — drives the E chain
         walk); bits 0..13 = F-chain code (per slot F-open THEN F-extend —
         note the chain's reversed per-slot order vs the dispatch, per the
         reference) << DELTA_BITS | delta.

Boundary pins (ring slot R): H row-0 = [0, g, g+e, g+2e, ...] (NW/OV),
F row-0 = [g - e, -inf, ...] so the uniform recurrence reproduces the
reference's start-node F = g and F[0][1:] = -inf.

Traceback: 3-state walk (H / F-chain / E-chain) batched over all B*D
alignments, one int32 gather per step.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .poa_pallas import (
    DELTA_BITS,
    NCODES,
    NEG16,
    NEGV,
    ROW_CHUNK,
    TIE,
)

EB_BIT = 14  # E-extension flag bit in the FE halfword


def fits_int16_affine(n_cap: int, w_cap: int, m: int, x: int, g: int, e: int) -> bool:
    worst = (n_cap + w_cap + 2) * max(abs(m), abs(x), abs(g), abs(e))
    return worst <= 14000 and n_cap + 1 < TIE


def _sh_bits_aff(P: int) -> int:
    """H-combo shift: prio space 3P+3 + delta field."""
    return int(np.ceil(np.log2(3 * P + 3))) + DELTA_BITS


def _shf_bits(P: int) -> int:
    """F-combo shift: prio space 2P + delta field."""
    return int(np.ceil(np.log2(max(2 * P, 2)))) + DELTA_BITS


def _dp_kernel_affine(
    codes_ref,  # [1, 1, N] int32 SMEM
    aux_ref,  # [1, P, N] int32 SMEM: hslot << 16 | delta (per pred slot)
    deg_ref,  # [1, 1, N] int32 SMEM
    sink_ref,  # [1, 1, N] int32 SMEM
    nn_ref,  # [1, 1, 1] int32 SMEM
    seqp_ref,  # [1, D, W] int32 VMEM
    slen_ref,  # [1, 1, D] int32 VMEM
    # outputs
    dirs_ref,  # [1, CH, D, W] int32: (FE << 16) | Hcode
    maxi_ref,  # [1, 1, D] int32
    maxj_ref,  # [1, 1, D] int32
    score_ref,  # [1, 1, D] int32
    # scratch
    H,  # [R+1, D, W] int16 (slot R pins boundary row 0)
    F,  # [R+1, D, W] int16 (slot R pins F boundary row)
    PROF,  # [NCODES, D, W] int32 (match/mismatch << SH)
    BESTC,  # [D, W] int32
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
    e: int,
):
    SH = _sh_bits_aff(P)
    SHF = _shf_bits(P)
    NPRIO = 3 * P + 3
    MASKC = (1 << SH) - 1
    MASKF = (1 << SHF) - 1
    c = pl.program_id(1)
    jlane = lax.broadcasted_iota(jnp.int32, (D, W), 1)
    # affine boundary row: 0 at lane0, g + (j-1)*e for j >= 1
    jg_aff = jnp.where(
        jlane == 0, 0, jnp.int32(g) + (jlane - 1) * jnp.int32(e)
    )
    slen = slen_ref[0, 0].reshape(D, 1)
    n_nodes = nn_ref[0, 0, 0]
    negc = jnp.int32(NEGV)
    lane0 = jlane == 0
    log_w = int(np.ceil(np.log2(W)))
    scan_masks = [jlane >= (1 << s) for s in range(log_w)]
    if align_type == "nw":
        cell_mask = jlane == slen
    else:
        cell_mask = (jlane != 0) & (jlane <= slen)

    # H-code priorities (descending first-true order)
    def hprio_diag(p):
        return NPRIO - 1 - p

    def hprio_fext(p):
        return NPRIO - 1 - (P + 2 * p)

    def hprio_fopen(p):
        return NPRIO - 1 - (P + 2 * p + 1)

    HPRIO_EEXT = NPRIO - 1 - 3 * P
    HPRIO_EOPEN = NPRIO - 1 - (3 * P + 1)
    HSTOP = 0

    # F-chain priorities: per slot open BEFORE ext (sisd:640-664)
    def fprio_open(p):
        return 2 * P - 1 - 2 * p

    def fprio_ext(p):
        return 2 * P - 1 - (2 * p + 1)

    @pl.when(c == 0)
    def _init():
        if align_type == "sw":
            H[R] = jnp.zeros((D, W), jnp.int16)
        else:
            H[R] = jg_aff.astype(jnp.int16)
        # F boundary: g - e at lane0, -inf elsewhere (uniform recurrence
        # then yields start-node F = g and F[0][1:] = -inf)
        F[R] = jnp.where(lane0, jnp.int32(g - e), jnp.int32(NEG16)).astype(
            jnp.int16
        )
        # direction row 0: E-open into lane 1, E-extend further left
        row0_h = jnp.where(
            jlane == 1,
            HPRIO_EOPEN << DELTA_BITS,
            HPRIO_EEXT << DELTA_BITS,
        )
        if align_type == "sw":
            row0_h = jnp.full((D, W), HSTOP, jnp.int32)
            row0_fe = jnp.zeros((D, W), jnp.int32)
            BESTC[:, :] = jnp.zeros((D, W), jnp.int32)
        else:
            row0_fe = jnp.where(jlane >= 2, jnp.int32(1) << EB_BIT, 0)
            BESTC[:, :] = jnp.full((D, W), NEG16 * TIE + (TIE - 1), jnp.int32)
        dirs_ref[0, 0] = (row0_fe << 16) | row0_h
        seqp = seqp_ref[0]
        for code in range(NCODES):
            PROF[code] = (
                jnp.where(seqp == code, jnp.int32(m), jnp.int32(x)) << SH
            )

    def slot_range(carry, prof_c, r, lo, hi):
        acc, facc = carry
        for p in range(lo, hi):
            aux = aux_ref[0, p, r]
            hslot = aux >> 16
            delta = aux & 0xFFFF
            rowH = H[hslot].astype(jnp.int32)
            rowF = F[hslot].astype(jnp.int32)
            diag = pltpu.roll(rowH << SH, 1, axis=1) + (
                prof_c + (hprio_diag(p) << DELTA_BITS) + delta
            )
            diag = jnp.where(lane0, negc, diag)
            fext = ((rowF + e) << SH) + (
                (hprio_fext(p) << DELTA_BITS) + delta
            )
            fopen = ((rowH + g) << SH) + (
                (hprio_fopen(p) << DELTA_BITS) + delta
            )
            acc = jnp.maximum(acc, jnp.maximum(diag, jnp.maximum(fext, fopen)))
            ff = jnp.maximum(
                ((rowF + e) << SHF) + ((fprio_ext(p) << DELTA_BITS) + delta),
                ((rowH + g) << SHF) + ((fprio_open(p) << DELTA_BITS) + delta),
            )
            facc = jnp.maximum(facc, ff)
        return acc, facc

    def dp_step(hr):
        r = hr - 1
        deg = deg_ref[0, 0, r]
        prof_c = PROF[codes_ref[0, 0, r]]

        acc = jnp.full((D, W), negc, jnp.int32)
        facc = jnp.full((D, W), negc, jnp.int32)
        acc, facc = slot_range((acc, facc), prof_c, r, 0, 1)
        tier_bounds = [t for t in (1, 2, 4, 8) if t < P] + [P]
        for ti in range(len(tier_bounds) - 1):
            lo, hi = tier_bounds[ti], tier_bounds[ti + 1]
            acc, facc = lax.cond(
                deg > lo,
                lambda a, lo=lo, hi=hi: slot_range(a, prof_c, r, lo, hi),
                lambda a: a,
                (acc, facc),
            )

        Fr = facc >> SHF
        fcode = facc & MASKF
        A = acc >> SH  # pre-E H (diag and F channels merged)
        hcode = acc & MASKC

        if align_type != "nw":
            # sw/ov: H[i][0] = 0; the boundary column never back-tracks
            A = jnp.where(lane0, 0, A)
            hcode = jnp.where(lane0, HSTOP, hcode)

        A0 = jnp.maximum(A, 0) if align_type == "sw" else A
        # E scan: S[j] = A0[j] - j*e ; M = running max ; E[j] = M[j-1]+g+(j-1)e
        je = jlane * jnp.int32(e)
        t = A0 - je
        for si in range(log_w):
            rolled = pltpu.roll(t, 1 << si, axis=1)
            t = jnp.maximum(t, jnp.where(scan_masks[si], rolled, negc))
        Erow = pltpu.roll(t, 1, axis=1) + (jnp.int32(g) - e) + je
        Erow = jnp.where(lane0, jnp.int32(NEG16), Erow)
        EB = Erow == pltpu.roll(Erow, 1, axis=1) + e
        EB = EB & (~lane0) & (jlane != 1)

        ecode = jnp.where(
            EB, HPRIO_EEXT << DELTA_BITS, HPRIO_EOPEN << DELTA_BITS
        )
        Hfin = jnp.maximum(A0, Erow)
        hcode = jnp.where(Erow > A0, ecode, hcode)
        if align_type == "sw":
            Hfin = jnp.maximum(Hfin, 0)
            hcode = jnp.where(Hfin == 0, HSTOP, hcode)

        # clamp the poison floor so dead lanes can't drift past int16 range
        # over deep graphs (F accumulates +e per row on no-path lanes)
        H[lax.rem(hr - 1, R)] = jnp.maximum(Hfin, jnp.int32(NEG16)).astype(
            jnp.int16
        )
        F[lax.rem(hr - 1, R)] = jnp.maximum(Fr, jnp.int32(NEG16)).astype(
            jnp.int16
        )
        fe = fcode | (EB.astype(jnp.int32) << EB_BIT)
        dirs_ref[0, hr - c * CH] = (fe << 16) | hcode

        def best_update():
            cand = Hfin * TIE + (jnp.int32(TIE - 1) - hr)
            BESTC[:, :] = jnp.maximum(
                BESTC[:, :], jnp.where(cell_mask, cand, jnp.int32(-(2**30)))
            )

        if align_type == "sw":
            best_update()
        else:

            @pl.when(sink_ref[0, 0, r] != 0)
            def _():
                best_update()

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
        best_combo = jnp.max(bc, axis=1, keepdims=True)
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


def _traceback_walk_affine(dirs, maxi, maxj, align_type, L, P):
    """3-state (H / F-chain / E-chain) batched walk; ONE int32 gather/step.

    dirs: [B, N1P, D, W] int32 (FE << 16 | Hcode).
    Returns pn, pp [B, D, L] (back-to-front pairs; pn holds DP ranks),
    count [B, D].
    """
    B, N1P, D, W = dirs.shape
    NPRIO = 3 * P + 3
    DMASK = (1 << DELTA_BITS) - 1
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

    ST_H, ST_F, ST_E = 0, 1, 2

    def cond(st):
        step = st[0]
        active = st[5]
        return (step < L) & jnp.any(active)

    UNROLL = 8
    LP = L + UNROLL
    GCHUNK = 256
    NG = -(-BD // GCHUNK)
    PADBD = NG * GCHUNK

    def _gather(flat):
        if NG == 1:
            return jnp.take(cf, flat).astype(jnp.int32)
        flat = jnp.pad(flat, (0, PADBD - BD))
        parts = [
            jnp.take(cf, lax.dynamic_slice(flat, (gi * GCHUNK,), (GCHUNK,)))
            for gi in range(NG)
        ]
        return jnp.concatenate(parts)[:BD].astype(jnp.int32)

    def one_step(step, i, j, state, cnt, active, pn, pp):
        flat = ((bidx * N1P + i) * D + didx) * W + j
        word = _gather(flat)
        hcode = word & 0xFFFF
        fe = (word >> 16) & 0xFFFF
        hprio = hcode >> DELTA_BITS
        hdelta = hcode & DMASK
        hidx = NPRIO - 1 - hprio
        eb = (fe >> EB_BIT) & 1
        fcode = fe & ((1 << EB_BIT) - 1)
        fdelta = fcode & DMASK
        fidx = (2 * P - 1) - (fcode >> DELTA_BITS)

        in_h = state == ST_H
        in_f = state == ST_F
        in_e = state == ST_E

        is_diag = in_h & (hidx < P)
        is_fenter = in_h & (hidx >= P) & (hidx < 3 * P)
        f_ext_enter = is_fenter & (((hidx - P) & 1) == 0)
        is_eext = in_h & (hidx == 3 * P)
        is_eopen = in_h & (hidx == 3 * P + 1)
        is_stop = in_h & (hidx == 3 * P + 2)
        if align_type == "sw":
            do = active & ~is_stop
        else:
            do = active

        # F-chain codes: fidx = 2p (open) / 2p+1 (ext)
        f_chain_ext = in_f & ((fidx & 1) == 1)

        consumes_node = is_diag | is_fenter | in_f
        consumes_seq = is_diag | is_eext | is_eopen | in_e

        delta = jnp.where(in_f, fdelta, hdelta)
        vert_move = is_diag | is_fenter | in_f
        prev_i = jnp.where(vert_move, jnp.where(delta == 0, 0, i - delta), i)
        prev_j = jnp.where(consumes_seq, j - 1, j)

        pnv = jnp.where(do, jnp.where(consumes_node, i - 1, -1), -2)
        ppv = jnp.where(do, jnp.where(consumes_seq, j - 1, -1), -2)
        col = LP - 1 - step
        pn = lax.dynamic_update_slice(pn, pnv[:, None], (0, col))
        pp = lax.dynamic_update_slice(pp, ppv[:, None], (0, col))

        nstate = jnp.where(
            f_ext_enter | f_chain_ext,
            ST_F,
            jnp.where(is_eext | (in_e & (eb == 1)), ST_E, ST_H),
        )
        i = jnp.where(do, prev_i, i)
        j = jnp.where(do, prev_j, j)
        state = jnp.where(do, nstate, state)
        cnt = cnt + do.astype(jnp.int32)
        if align_type == "sw":
            nactive = do
        elif align_type == "nw":
            nactive = do & ~((i == 0) & (j == 0) & (state == ST_H))
        else:
            nactive = do & ~((i == 0) | (j == 0))
        return step + 1, i, j, state, cnt, nactive, pn, pp

    def body(st):
        step, i, j, state, cnt, active, pn, pp = st
        for _ in range(UNROLL):
            step, i, j, state, cnt, active, pn, pp = one_step(
                step, i, j, state, cnt, active, pn, pp
            )
        return step, i, j, state, cnt, active, pn, pp

    pn0 = jnp.full((BD, LP), -2, jnp.int32)
    pp0 = jnp.full((BD, LP), -2, jnp.int32)
    st = (
        jnp.int32(0),
        i0,
        j0,
        jnp.zeros(BD, jnp.int32),
        jnp.zeros(BD, jnp.int32),
        active0,
        pn0,
        pp0,
    )
    _, _, _, _, cnt, _, pn, pp = lax.while_loop(cond, body, st)
    pn = pn[:, LP - L :]
    pp = pp[:, LP - L :]
    cnt = jnp.where(started, cnt, 0)
    return pn.reshape(B, D, L), pp.reshape(B, D, L), cnt.reshape(B, D)


def _poa_dp_pallas_affine(
    codes, preds, sink, n_nodes, seqp, seq_len,
    align_type: str, m: int, x: int, g: int, e: int,
    interpret: bool = False, ring: int = 0,
):
    B, _, N = codes.shape
    P = preds.shape[1]
    D, W = seqp.shape[1], seqp.shape[2]
    CH = min(ROW_CHUNK, N + 1)
    NC = -(-(N + 1) // CH)
    N1P = NC * CH
    R = N if ring <= 0 or ring > N else ring
    if R >= (1 << DELTA_BITS):
        raise ValueError(
            f"ring {R} exceeds the {DELTA_BITS}-bit delta field"
        )

    deg = (preds[:, 1:, :] != preds[:, :1, :]).sum(
        axis=1, dtype=jnp.int32
    )[:, None, :] + 1

    rows = jnp.arange(1, N + 1, dtype=jnp.int32)[None, None, :]
    pz = preds == 0
    hslot = jnp.where(pz, R, lax.rem(preds - 1, R))
    delta = jnp.where(pz, 0, rows - preds)
    aux = (hslot << 16) | delta

    kernel = functools.partial(
        _dp_kernel_affine,
        N=N, D=D, W=W, P=P, NC=NC, CH=CH, R=R,
        align_type=align_type, m=m, x=x, g=g, e=e,
    )

    smem = lambda shape: pl.BlockSpec(
        shape, lambda b, c: (b,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.SMEM,
    )
    vmem = lambda shape: pl.BlockSpec(
        shape, lambda b, c: (b,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM,
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
                (1, CH, D, W), lambda b, c: (b, c, 0, 0),
                memory_space=pltpu.VMEM,
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
            pltpu.VMEM((R + 1, D, W), jnp.int16),
            pltpu.VMEM((R + 1, D, W), jnp.int16),
            pltpu.VMEM((NCODES, D, W), jnp.int32),
            pltpu.VMEM((D, W), jnp.int32),
        ],
        interpret=interpret,
    )(codes, aux, deg, sink, n_nodes, seqp, seq_len)


def _poa_align_pallas_affine_impl(
    codes, preds, sink, node_id, n_nodes, seqp, seq_len,
    align_type: str, m: int, x: int, g: int, e: int,
    interpret: bool = False, dp_only: bool = False, ring: int = 0,
    emit_node_ids: bool = True,
):
    # narrow wire dtypes upcast on device (tunnel bandwidth, see poa_pallas)
    codes = codes.astype(jnp.int32)
    preds = preds.astype(jnp.int32)
    sink = sink.astype(jnp.int32)
    node_id = node_id.astype(jnp.int32)
    n_nodes = n_nodes.astype(jnp.int32)
    seqp = seqp.astype(jnp.int32)
    seq_len = seq_len.astype(jnp.int32)
    B, _, N = codes.shape
    P = preds.shape[1]
    D, W = seqp.shape[1], seqp.shape[2]
    L = 2 * N + W  # F chains can visit more rows than a linear path

    dirs, maxi, maxj, score = _poa_dp_pallas_affine(
        codes, preds, sink, n_nodes, seqp, seq_len,
        align_type, m, x, g, e, interpret=interpret, ring=ring,
    )
    if dp_only:
        pn = jnp.full((B, D, L), -2, jnp.int32)
        pp = jnp.full((B, D, L), -2, jnp.int32)
        count = jnp.zeros((B, 1, D), jnp.int32)
        return pn, pp, count, score

    pn, pp, count = _traceback_walk_affine(dirs, maxi, maxj, align_type, L, P)
    if emit_node_ids:
        from .poa_pallas import _ranks_to_node_ids

        pn = _ranks_to_node_ids(pn, node_id)
    return pn, pp, count[:, None, :], score


_poa_align_pallas_affine_jit = functools.partial(
    jax.jit,
    static_argnames=(
        "align_type", "m", "x", "g", "e", "interpret", "dp_only", "ring",
        "emit_node_ids",
    ),
)(_poa_align_pallas_affine_impl)


def poa_align_pallas_affine(*args, interpret: bool = False, **kw):
    return _poa_align_pallas_affine_jit(*args, interpret=interpret, **kw)
