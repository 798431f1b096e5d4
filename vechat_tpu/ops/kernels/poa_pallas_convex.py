"""Pallas TPU kernel: CONVEX (dual-affine, min-of-two-affines) batched
sequence-to-graph DP + traceback.

Reference semantics: vendor/spoa/src/sisd_alignment_engine.cpp:678-923 —
channels (F, E) with (g, e) and (O, Q) with (q, c):

  F[i][j] = max_p max(H[p][j] + g, F[p][j] + e)
  O[i][j] = max_p max(H[p][j] + q, O[p][j] + c)
  E[i][j] = max(H[i][j-1] + g, E[i][j-1] + e)
  Q[i][j] = max(H[i][j-1] + q, Q[i][j-1] + c)
  H[i][j] = max(diag, F, O, E, Q [, 0])

The in-row (E, Q) pair is COUPLED through H. Substituting
H[j-1] = max(A0[j-1], E[j-1], Q[j-1]) (A0 = pre-E/Q H) and using the convex
subtype ordering q < g < e < c gives the constant-matrix max-plus linear
recurrence

  [E_j]   [e  g]   [E_{j-1}]   [A0[j-1]+g]
  [Q_j] = [q  c] x [Q_{j-1}] + [A0[j-1]+q]   (max-plus)

solved with a log2(W) doubling scan whose 2x2 matrix POWERS are constants
precomputed on host.

Direction streams (one int32 per cell = FOCB << 16 | Hcode, one gather per
walk step):
  Hcode: prio << DELTA_BITS | delta. Priority = reference dispatch order
         (sisd:778-922): diag per slot; per slot F-ext, F-open(g), O-ext,
         O-open(q); then E-ext, E-open, Q-ext, Q-open; SW-stop.
  FOCB:  bit 14 = CB (E or Q extends — the seq-gap chain continues);
         bits 0..13 = vertical-chain code: cont_p (first slot whose F/O
         EXTENDS — all conts precede all stops, per the reference chain
         loop) then stop_p, with delta.

P (pred slots) is capped at 8 so the Hcode prio space (5P+5) + delta fits
int16; larger in-degree graphs route to the host engine.
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

CB_BIT = 14
P_CAP = 8


def fits_int16_convex(
    n_cap: int, w_cap: int, m: int, x: int, g: int, e: int, q: int, c: int
) -> bool:
    worst = (n_cap + w_cap + 2) * max(
        abs(m), abs(x), abs(g), abs(e), abs(q), abs(c)
    )
    return worst <= 14000 and n_cap + 1 < TIE


def _sh_bits_cvx(P: int) -> int:
    return int(np.ceil(np.log2(5 * P + 5))) + DELTA_BITS


def _shf_bits_cvx(P: int) -> int:
    return int(np.ceil(np.log2(max(2 * P, 2)))) + DELTA_BITS


def _mat_powers(g: int, e: int, q: int, c: int, log_w: int):
    """Max-plus powers M^(2^s) of M = [[e, g], [q, c]] (python ints)."""
    M = [[e, g], [q, c]]

    def mul(A, B):
        return [
            [
                max(A[i][0] + B[0][j], A[i][1] + B[1][j])
                for j in range(2)
            ]
            for i in range(2)
        ]

    out = [M]
    for _ in range(log_w - 1):
        out.append(mul(out[-1], out[-1]))
    return out


def _dp_kernel_convex(
    codes_ref, aux_ref, deg_ref, sink_ref, nn_ref, seqp_ref, slen_ref,
    dirs_ref, maxi_ref, maxj_ref, score_ref,
    H, F, O, PROF, BESTC,
    *, N, D, W, P, NC, CH, R, align_type, m, x, g, e, q, c,
):
    SH = _sh_bits_cvx(P)
    SHF = _shf_bits_cvx(P)
    NPRIO = 5 * P + 5
    MASKC = (1 << SH) - 1
    cidx = pl.program_id(1)
    jlane = lax.broadcasted_iota(jnp.int32, (D, W), 1)
    e_init = jnp.int32(g) + (jlane - 1) * jnp.int32(e)
    q_init = jnp.int32(q) + (jlane - 1) * jnp.int32(c)
    h_row0 = jnp.where(jlane == 0, 0, jnp.maximum(e_init, q_init))
    slen = slen_ref[0, 0].reshape(D, 1)
    n_nodes = nn_ref[0, 0, 0]
    negc = jnp.int32(NEGV)
    lane0 = jlane == 0
    log_w = int(np.ceil(np.log2(W)))
    scan_masks = [jlane >= (1 << s) for s in range(log_w)]
    MP = _mat_powers(g, e, q, c, log_w)
    if align_type == "nw":
        cell_mask = jlane == slen
    else:
        cell_mask = (jlane != 0) & (jlane <= slen)

    # H-code priorities, descending dispatch order
    def hp_diag(p):
        return NPRIO - 1 - p

    def hp_fext(p):
        return NPRIO - 1 - (P + 4 * p)

    def hp_fopen(p):
        return NPRIO - 1 - (P + 4 * p + 1)

    def hp_oext(p):
        return NPRIO - 1 - (P + 4 * p + 2)

    def hp_oopen(p):
        return NPRIO - 1 - (P + 4 * p + 3)

    HP_EEXT = NPRIO - 1 - 5 * P
    HP_EOPEN = NPRIO - 1 - (5 * P + 1)
    HP_QEXT = NPRIO - 1 - (5 * P + 2)
    HP_QOPEN = NPRIO - 1 - (5 * P + 3)
    HSTOP = 0

    @pl.when(cidx == 0)
    def _init():
        if align_type == "sw":
            H[R] = jnp.zeros((D, W), jnp.int16)
        else:
            H[R] = h_row0.astype(jnp.int16)
        F[R] = jnp.where(lane0, jnp.int32(g - e), jnp.int32(NEG16)).astype(
            jnp.int16
        )
        O[R] = jnp.where(lane0, jnp.int32(q - c), jnp.int32(NEG16)).astype(
            jnp.int16
        )
        if align_type == "sw":
            row0_h = jnp.full((D, W), HSTOP, jnp.int32)
            row0_cb = jnp.zeros((D, W), jnp.int32)
            BESTC[:, :] = jnp.zeros((D, W), jnp.int32)
        else:
            # dispatch along row 0: j==1 -> E-open; j>=2 -> E-ext where the
            # E channel carries the max, else Q-ext
            row0_h = jnp.where(
                jlane == 1,
                HP_EOPEN << DELTA_BITS,
                jnp.where(
                    e_init >= q_init,
                    HP_EEXT << DELTA_BITS,
                    HP_QEXT << DELTA_BITS,
                ),
            )
            row0_cb = jnp.where(jlane >= 2, jnp.int32(1) << CB_BIT, 0)
            BESTC[:, :] = jnp.full((D, W), NEG16 * TIE + (TIE - 1), jnp.int32)
        dirs_ref[0, 0] = (row0_cb << 16) | row0_h
        seqp = seqp_ref[0]
        for code in range(NCODES):
            PROF[code] = (
                jnp.where(seqp == code, jnp.int32(m), jnp.int32(x)) << SH
            )

    def slot_range(carry, prof_c, r, lo, hi):
        acc, fe_, fo_, oe_, oo_ = carry
        for p in range(lo, hi):
            aux = aux_ref[0, p, r]
            hslot = aux >> 16
            delta = aux & 0xFFFF
            rowH = H[hslot].astype(jnp.int32)
            rowF = F[hslot].astype(jnp.int32)
            rowO = O[hslot].astype(jnp.int32)
            diag = pltpu.roll(rowH << SH, 1, axis=1) + (
                prof_c + (hp_diag(p) << DELTA_BITS) + delta
            )
            diag = jnp.where(lane0, negc, diag)
            vfe = rowF + e
            vfo = rowH + g
            voe = rowO + c
            voo = rowH + q
            acc = jnp.maximum(
                acc,
                jnp.maximum(
                    jnp.maximum(
                        diag,
                        (vfe << SH) + ((hp_fext(p) << DELTA_BITS) + delta),
                    ),
                    jnp.maximum(
                        jnp.maximum(
                            (vfo << SH)
                            + ((hp_fopen(p) << DELTA_BITS) + delta),
                            (voe << SH)
                            + ((hp_oext(p) << DELTA_BITS) + delta),
                        ),
                        (voo << SH) + ((hp_oopen(p) << DELTA_BITS) + delta),
                    ),
                ),
            )
            # channel combos for rings + vertical-chain codes; slot prio
            # descending so the packed max picks the FIRST slot on ties
            sp = (P - 1 - p) << DELTA_BITS
            fe_ = jnp.maximum(fe_, (vfe << SHF) + (sp + delta))
            oe_ = jnp.maximum(oe_, (voe << SHF) + (sp + delta))
            # opens masked at lane0: F/O column-0 values are pure extends
            # (sisd init: F[i][0] = max_p F[p][0] + e)
            vfo0 = jnp.where(lane0, negc, (vfo << SHF) + (sp + delta))
            voo0 = jnp.where(lane0, negc, (voo << SHF) + (sp + delta))
            fo_ = jnp.maximum(fo_, vfo0)
            oo_ = jnp.maximum(oo_, voo0)
        return acc, fe_, fo_, oe_, oo_

    def dp_step(hr):
        r = hr - 1
        deg = deg_ref[0, 0, r]
        prof_c = PROF[codes_ref[0, 0, r]]

        init5 = tuple(jnp.full((D, W), negc, jnp.int32) for _ in range(5))
        carry = slot_range(init5, prof_c, r, 0, 1)
        tier_bounds = [t for t in (1, 2, 4, 8) if t < P] + [P]
        for ti in range(len(tier_bounds) - 1):
            lo, hi = tier_bounds[ti], tier_bounds[ti + 1]
            carry = lax.cond(
                deg > lo,
                lambda a, lo=lo, hi=hi: slot_range(a, prof_c, r, lo, hi),
                lambda a: a,
                carry,
            )
        acc, fe_, fo_, oe_, oo_ = carry

        Fr = jnp.maximum(fe_, fo_) >> SHF
        Or = jnp.maximum(oe_, oo_) >> SHF
        A = acc >> SH
        hcode = acc & MASKC

        # vertical-chain code: first slot whose channel EXTENDS to the final
        # F/O value, else first slot that OPENS it (reference chain loop:
        # all conts before all stops)
        SLOTMASK = (1 << (SHF - DELTA_BITS)) - 1

        def hit(combo, target):
            return (combo >> SHF) == target

        def slot_of(combo):
            return (P - 1) - ((combo >> DELTA_BITS) & SLOTMASK)

        def delta_of(combo):
            return combo & ((1 << DELTA_BITS) - 1)

        BIGS = jnp.int32(1 << 20)
        fe_slot = jnp.where(hit(fe_, Fr), slot_of(fe_), BIGS)
        oe_slot = jnp.where(hit(oe_, Or), slot_of(oe_), BIGS)
        cont_slot = jnp.minimum(fe_slot, oe_slot)
        cont_delta = jnp.where(fe_slot <= oe_slot, delta_of(fe_), delta_of(oe_))
        fo_slot = jnp.where(hit(fo_, Fr), slot_of(fo_), BIGS)
        oo_slot = jnp.where(hit(oo_, Or), slot_of(oo_), BIGS)
        stop_slot = jnp.minimum(fo_slot, oo_slot)
        stop_delta = jnp.where(fo_slot <= oo_slot, delta_of(fo_), delta_of(oo_))
        has_cont = cont_slot < BIGS
        chain_prio = jnp.where(
            has_cont,
            2 * P - 1 - cont_slot,
            jnp.maximum(2 * P - 1 - (P + stop_slot), 0),
        )
        chain_delta = jnp.where(has_cont, cont_delta, stop_delta)
        focode = (chain_prio << DELTA_BITS) | chain_delta

        if align_type != "nw":
            A = jnp.where(lane0, 0, A)
            hcode = jnp.where(lane0, HSTOP, hcode)
        A0 = jnp.maximum(A, 0) if align_type == "sw" else A

        # coupled (E, Q) max-plus doubling scan over b = (A0+g, A0+q)
        bE = pltpu.roll(A0 + g, 1, axis=1)
        bQ = pltpu.roll(A0 + q, 1, axis=1)
        l0neg = jnp.where(lane0, negc, 0)
        Ev = bE + l0neg
        Qv = bQ + l0neg
        for si in range(log_w):
            sh = 1 << si
            shE = pltpu.roll(Ev, sh, axis=1)
            shQ = pltpu.roll(Qv, sh, axis=1)
            ok = scan_masks[si]
            m11, m12 = MP[si][0]
            m21, m22 = MP[si][1]
            Ev = jnp.maximum(
                Ev,
                jnp.where(
                    ok,
                    jnp.maximum(shE + m11, shQ + m12),
                    negc,
                ),
            )
            Qv = jnp.maximum(
                Qv,
                jnp.where(
                    ok,
                    jnp.maximum(shE + m21, shQ + m22),
                    negc,
                ),
            )
        Ev = jnp.where(lane0, jnp.int32(NEG16), Ev)
        Qv = jnp.where(lane0, jnp.int32(NEG16), Qv)
        EBe = Ev == pltpu.roll(Ev, 1, axis=1) + e
        QBq = Qv == pltpu.roll(Qv, 1, axis=1) + c
        EBe = EBe & (~lane0) & (jlane != 1)
        QBq = QBq & (~lane0) & (jlane != 1)
        CB = EBe | QBq

        EQ = jnp.maximum(Ev, Qv)
        ecode = jnp.where(EBe, HP_EEXT << DELTA_BITS, HP_EOPEN << DELTA_BITS)
        qcode = jnp.where(QBq, HP_QEXT << DELTA_BITS, HP_QOPEN << DELTA_BITS)
        # dispatch priority among the seq-gap candidates: Eext, Eopen,
        # Qext, Qopen — resolved by packed max over the two channels
        epack = (Ev << SH) + ecode
        qpack = (Qv << SH) + qcode
        eqpack = jnp.maximum(epack, qpack)
        eqcode = eqpack & MASKC

        Hfin = jnp.maximum(A0, EQ)
        hcode = jnp.where(EQ > A0, eqcode, hcode)
        if align_type == "sw":
            Hfin = jnp.maximum(Hfin, 0)
            hcode = jnp.where(Hfin == 0, HSTOP, hcode)

        H[lax.rem(hr - 1, R)] = jnp.maximum(Hfin, jnp.int32(NEG16)).astype(
            jnp.int16
        )
        F[lax.rem(hr - 1, R)] = jnp.maximum(Fr, jnp.int32(NEG16)).astype(
            jnp.int16
        )
        O[lax.rem(hr - 1, R)] = jnp.maximum(Or, jnp.int32(NEG16)).astype(
            jnp.int16
        )
        fo = focode | (CB.astype(jnp.int32) << CB_BIT)
        dirs_ref[0, hr - cidx * CH] = (fo << 16) | hcode

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
        hr = cidx * CH + k

        @pl.when((hr >= 1) & (hr <= n_nodes))
        def _():
            dp_step(hr)

        return carry

    lax.fori_loop(0, CH, dp_body, 0)

    @pl.when(cidx == NC - 1)
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


def _traceback_walk_convex(dirs, maxi, maxj, align_type, L, P):
    """3-state walk (H / vertical chain / seq-gap chain), one gather/step."""
    B, N1P, D, W = dirs.shape
    NPRIO = 5 * P + 5
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
        return (st[0] < L) & jnp.any(st[5])

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
        fo = (word >> 16) & 0xFFFF
        hprio = hcode >> DELTA_BITS
        hdelta = hcode & DMASK
        hidx = NPRIO - 1 - hprio
        cb = (fo >> CB_BIT) & 1
        focode = fo & ((1 << CB_BIT) - 1)
        fodelta = focode & DMASK
        foidx = (2 * P - 1) - (focode >> DELTA_BITS)

        in_h = state == ST_H
        in_f = state == ST_F
        in_e = state == ST_E

        is_diag = in_h & (hidx < P)
        is_voenter = in_h & (hidx >= P) & (hidx < 5 * P)
        sub = (hidx - P) & 3  # 0=Fext 1=Fopen 2=Oext 3=Oopen
        vo_ext_enter = is_voenter & ((sub & 1) == 0)
        is_eqext = in_h & ((hidx == 5 * P) | (hidx == 5 * P + 2))
        is_eqopen = in_h & ((hidx == 5 * P + 1) | (hidx == 5 * P + 3))
        is_stop = in_h & (hidx == 5 * P + 4)
        if align_type == "sw":
            do = active & ~is_stop
        else:
            do = active

        fo_cont = in_f & (foidx < P)

        consumes_node = is_diag | is_voenter | in_f
        consumes_seq = is_diag | is_eqext | is_eqopen | in_e

        delta = jnp.where(in_f, fodelta, hdelta)
        vert_move = is_diag | is_voenter | in_f
        prev_i = jnp.where(vert_move, jnp.where(delta == 0, 0, i - delta), i)
        prev_j = jnp.where(consumes_seq, j - 1, j)

        pnv = jnp.where(do, jnp.where(consumes_node, i - 1, -1), -2)
        ppv = jnp.where(do, jnp.where(consumes_seq, j - 1, -1), -2)
        col = LP - 1 - step
        pn = lax.dynamic_update_slice(pn, pnv[:, None], (0, col))
        pp = lax.dynamic_update_slice(pp, ppv[:, None], (0, col))

        nstate = jnp.where(
            vo_ext_enter | fo_cont,
            ST_F,
            jnp.where(is_eqext | (in_e & (cb == 1)), ST_E, ST_H),
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
        jnp.int32(0), i0, j0, jnp.zeros(BD, jnp.int32),
        jnp.zeros(BD, jnp.int32), active0, pn0, pp0,
    )
    _, _, _, _, cnt, _, pn, pp = lax.while_loop(cond, body, st)
    pn = pn[:, LP - L:]
    pp = pp[:, LP - L:]
    cnt = jnp.where(started, cnt, 0)
    return pn.reshape(B, D, L), pp.reshape(B, D, L), cnt.reshape(B, D)


def _poa_dp_pallas_convex(
    codes, preds, sink, n_nodes, seqp, seq_len,
    align_type, m, x, g, e, q, c, interpret=False, ring=0,
):
    B, _, N = codes.shape
    P = preds.shape[1]
    if P > P_CAP:
        raise ValueError(f"convex kernel supports P <= {P_CAP}, got {P}")
    D, W = seqp.shape[1], seqp.shape[2]
    CH = min(ROW_CHUNK, N + 1)
    NC = -(-(N + 1) // CH)
    N1P = NC * CH
    R = N if ring <= 0 or ring > N else ring
    if R >= (1 << DELTA_BITS):
        raise ValueError(f"ring {R} exceeds the delta field")

    deg = (preds[:, 1:, :] != preds[:, :1, :]).sum(
        axis=1, dtype=jnp.int32
    )[:, None, :] + 1
    rows = jnp.arange(1, N + 1, dtype=jnp.int32)[None, None, :]
    pz = preds == 0
    hslot = jnp.where(pz, R, lax.rem(preds - 1, R))
    delta = jnp.where(pz, 0, rows - preds)
    aux = (hslot << 16) | delta

    kernel = functools.partial(
        _dp_kernel_convex,
        N=N, D=D, W=W, P=P, NC=NC, CH=CH, R=R,
        align_type=align_type, m=m, x=x, g=g, e=e, q=q, c=c,
    )
    smem = lambda shape: pl.BlockSpec(
        shape, lambda b, c_: (b,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.SMEM,
    )
    vmem = lambda shape: pl.BlockSpec(
        shape, lambda b, c_: (b,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=(B, NC),
        in_specs=[
            smem((1, 1, N)), smem((1, P, N)), smem((1, 1, N)),
            smem((1, 1, N)), smem((1, 1, 1)),
            vmem((1, D, W)), vmem((1, 1, D)),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, CH, D, W), lambda b, c_: (b, c_, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            vmem((1, 1, D)), vmem((1, 1, D)), vmem((1, 1, D)),
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
            pltpu.VMEM((R + 1, D, W), jnp.int16),
            pltpu.VMEM((NCODES, D, W), jnp.int32),
            pltpu.VMEM((D, W), jnp.int32),
        ],
        interpret=interpret,
    )(codes, aux, deg, sink, n_nodes, seqp, seq_len)


def _poa_align_pallas_convex_impl(
    codes, preds, sink, node_id, n_nodes, seqp, seq_len,
    align_type, m, x, g, e, q, c,
    interpret=False, dp_only=False, ring=0, emit_node_ids=True,
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
    L = 2 * N + W

    dirs, maxi, maxj, score = _poa_dp_pallas_convex(
        codes, preds, sink, n_nodes, seqp, seq_len,
        align_type, m, x, g, e, q, c, interpret=interpret, ring=ring,
    )
    if dp_only:
        pn = jnp.full((B, D, L), -2, jnp.int32)
        pp = jnp.full((B, D, L), -2, jnp.int32)
        count = jnp.zeros((B, 1, D), jnp.int32)
        return pn, pp, count, score

    pn, pp, count = _traceback_walk_convex(dirs, maxi, maxj, align_type, L, P)
    if emit_node_ids:
        from .poa_pallas import _ranks_to_node_ids

        pn = _ranks_to_node_ids(pn, node_id)
    return pn, pp, count[:, None, :], score


_poa_align_pallas_convex_jit = functools.partial(
    jax.jit,
    static_argnames=(
        "align_type", "m", "x", "g", "e", "q", "c", "interpret", "dp_only",
        "ring", "emit_node_ids",
    ),
)(_poa_align_pallas_convex_impl)


def poa_align_pallas_convex(*args, interpret: bool = False, **kw):
    return _poa_align_pallas_convex_jit(*args, interpret=interpret, **kw)
