"""Device-resident round-2 (plain racon) consensus: heaviest-bundle
traversal, branch completion, per-node coverage and the kTGS coverage trim
as batched JAX programs — the round-2 companion of graph_build.py /
graph_cycle.py, so BOTH pipeline rounds run their window consensus fully on
device (reference semantics: vendor/spoa/src/graph.cpp:534-588
TraverseHeaviestBundle, :590-638 BranchCompletion, :38-56 Coverage,
:461-485 GenerateConsensus-with-coverage; trim src/window.cpp:141-171;
host twin csrc/poagraph.cpp:370-443).

Order-sensitive semantics preserved exactly (tested against the host oracle
by tests/test_graph_consensus.py):
  * the in-edge selection loop's replace rule — take the new edge when its
    weight is strictly greater, or equal with scores[current pred] <=
    scores[new tail] — reduces to the lexicographic (weight, tail score)
    maximum with the LAST maximal slot winning (<= replaces on full tie)
  * maxn = FIRST strict maximum over nodes in rank order
  * branch completion invalidates rival tails (in-edge tails != start of
    start's out-heads), then recomputes ranks > start skipping
    invalidated tails; repeats while the running max node still has
    out-edges (strictly increasing rank bounds the loop)
  * coverage of a consensus node = its distinct traversing-sequence count
    PLUS each aligned-ring member's own count (summed, not OR-ed —
    graph.cpp:480-484); sequence sets ride as 2x int32 edge label masks
    from graph_build (depth cap 64)
  * trim: first/last consensus position with coverage >= (n_seqs-1)/2;
    begin >= end keeps the full consensus (possible chimera,
    src/window.cpp:161-170)

Score dtype: the host uses long long; on device int32 suffices under the
dispatch capacities — path score <= N_cap * max edge weight
<= 2048 * (64 seqs * 2 * 1000) ~ 2.6e8 < 2^31 (device_cycle ladders cap
N at 2048 and depth at 64; deeper windows take the host path).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

BIG = jnp.int32(2**30)
NEG = jnp.int32(-(2**30))


# ----------------------------------------------------- weighted in/out slots


def build_in_slots_weighted(
    tails: jnp.ndarray,  # [B, E]
    heads: jnp.ndarray,
    weights: jnp.ndarray,
    valid: jnp.ndarray,
    n_nodes_cap: int,
    p_cap: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-node in-edge (tail, weight) lists in slot order (ascending edge
    index — the spoa in-edge vector order, see graph_cycle docstring).

    Returns (in_nbr [B,N,P], in_w [B,N,P], indeg [B,N], overflow [B])."""
    B, E = tails.shape
    N = n_nodes_cap
    bidx = jnp.arange(B)[:, None]
    key = jnp.where(
        valid, heads * jnp.int32(E) + jnp.arange(E, dtype=jnp.int32), BIG
    )
    perm = jnp.argsort(key, axis=1)
    s_head = jnp.take_along_axis(
        jnp.where(valid, heads, jnp.int32(N)), perm, axis=1
    )
    s_tail = jnp.take_along_axis(tails, perm, axis=1)
    s_w = jnp.take_along_axis(weights, perm, axis=1)
    from .graph_cycle import _group_positions

    pos = _group_positions(s_head)
    indeg = jnp.zeros((B, N), jnp.int32).at[bidx, s_head].add(
        jnp.where(s_head < N, 1, 0), mode="drop"
    )
    overflow = jnp.any(indeg > p_cap, axis=1)
    slot_ok = (s_head < N) & (pos < p_cap)
    in_nbr = jnp.zeros((B, N, p_cap), jnp.int32).at[
        bidx, jnp.where(slot_ok, s_head, N), jnp.where(slot_ok, pos, 0)
    ].set(jnp.where(slot_ok, s_tail, 0), mode="drop")
    in_w = jnp.zeros((B, N, p_cap), jnp.int32).at[
        bidx, jnp.where(slot_ok, s_head, N), jnp.where(slot_ok, pos, 0)
    ].set(jnp.where(slot_ok, s_w, 0), mode="drop")
    return in_nbr, in_w, indeg, overflow


def build_out_slots(
    tails: jnp.ndarray,
    heads: jnp.ndarray,
    valid: jnp.ndarray,
    n_nodes_cap: int,
    q_cap: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-node out-edge head lists in slot order (ascending edge index).

    Returns (out_nbr [B,N,Q], out_deg [B,N], overflow [B])."""
    B, E = tails.shape
    N = n_nodes_cap
    bidx = jnp.arange(B)[:, None]
    key = jnp.where(
        valid, tails * jnp.int32(E) + jnp.arange(E, dtype=jnp.int32), BIG
    )
    perm = jnp.argsort(key, axis=1)
    s_tail = jnp.take_along_axis(
        jnp.where(valid, tails, jnp.int32(N)), perm, axis=1
    )
    s_head = jnp.take_along_axis(heads, perm, axis=1)
    from .graph_cycle import _group_positions

    pos = _group_positions(s_tail)
    out_deg = jnp.zeros((B, N), jnp.int32).at[bidx, s_tail].add(
        jnp.where(s_tail < N, 1, 0), mode="drop"
    )
    overflow = jnp.any(out_deg > q_cap, axis=1)
    slot_ok = (s_tail < N) & (pos < q_cap)
    out_nbr = jnp.zeros((B, N, q_cap), jnp.int32).at[
        bidx, jnp.where(slot_ok, s_tail, N), jnp.where(slot_ok, pos, 0)
    ].set(jnp.where(slot_ok, s_head, 0), mode="drop")
    return out_nbr, out_deg, overflow


# --------------------------------------------------------- heaviest bundle


def _bundle_scan(
    scores: jnp.ndarray,  # [B, N] int32 (by node id)
    preds: jnp.ndarray,  # [B, N] int32 (-1 = none)
    in_nbr: jnp.ndarray,  # [B, N, P]
    in_w: jnp.ndarray,  # [B, N, P]
    indeg: jnp.ndarray,  # [B, N]
    rank_to_node: jnp.ndarray,  # [B, N]
    n_nodes: jnp.ndarray,  # [B]
    lo_rank: jnp.ndarray,  # [B] process ranks > lo_rank (-1 = all)
    skip_invalid: bool,  # branch-completion mode: skip tails with score -1
    win_active: jnp.ndarray,  # [B] bool
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One sequential pass over ranks of the scores/predecessors recurrence
    (graph.cpp:534-563 main, :590-638 branch-completion inner loop; host twin
    csrc/poagraph.cpp:379-424). Returns (scores, preds, maxn [B]) where maxn
    is the pass's first strict maximum in rank order (-1 if no rank
    processed)."""
    B, N, P = in_nbr.shape
    bidx = jnp.arange(B)
    arangeP = jnp.arange(P, dtype=jnp.int32)

    maxn0 = jnp.full((B,), -1, jnp.int32)
    maxsc0 = jnp.full((B,), 0, jnp.int32)

    def step(r, st):
        scores, preds, maxn, maxsc = st
        v = rank_to_node[bidx, jnp.minimum(r, N - 1)]
        process = win_active & (r > lo_rank) & (r < n_nodes)

        tails_v = in_nbr[bidx, v]  # [B, P]
        w_v = in_w[bidx, v]
        sc_t = scores[bidx[:, None], tails_v]  # [B, P]
        slot_ok = arangeP[None, :] < indeg[bidx, v][:, None]
        if skip_invalid:
            slot_ok = slot_ok & (sc_t != -1)
        has = jnp.any(slot_ok, axis=1)
        # lexicographic (weight, tail score) max, LAST maximal slot wins
        mw = jnp.max(jnp.where(slot_ok, w_v, NEG), axis=1)
        c2 = slot_ok & (w_v == mw[:, None])
        ms = jnp.max(jnp.where(c2, sc_t, NEG), axis=1)
        c3 = c2 & (sc_t == ms[:, None])
        last = (
            jnp.int32(P - 1)
            - jnp.argmax(c3[:, ::-1], axis=1).astype(jnp.int32)
        )
        best_tail = tails_v[bidx, last]

        new_sc = jnp.where(has, mw + ms, jnp.int32(-1))
        new_pred = jnp.where(has, best_tail, jnp.int32(-1))
        scores = scores.at[bidx, jnp.where(process, v, N)].set(
            new_sc, mode="drop"
        )
        preds = preds.at[bidx, jnp.where(process, v, N)].set(
            new_pred, mode="drop"
        )
        # running first-strict maximum (scores[maxn] < scores[v] replaces)
        take = process & ((maxn == -1) | (maxsc < new_sc))
        maxn = jnp.where(take, v, maxn)
        maxsc = jnp.where(take, new_sc, maxsc)
        return scores, preds, maxn, maxsc

    K = 4

    def body(r4, st):
        for u in range(K):
            st = step(r4 * K + u, st)
        return st

    n_iter = -(-N // K)
    scores, preds, maxn, _ = lax.fori_loop(
        0, n_iter, body, (scores, preds, maxn0, maxsc0)
    )
    return scores, preds, maxn


def heaviest_bundle(
    in_nbr: jnp.ndarray,  # [B, N, P]
    in_w: jnp.ndarray,  # [B, N, P]
    indeg: jnp.ndarray,  # [B, N]
    out_nbr: jnp.ndarray,  # [B, N, Q]
    out_deg: jnp.ndarray,  # [B, N]
    rank_of: jnp.ndarray,  # [B, N]
    rank_to_node: jnp.ndarray,  # [B, N]
    n_nodes: jnp.ndarray,  # [B]
    max_branch_iters: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """TraverseHeaviestBundle + BranchCompletion loop + backward walk
    (graph.cpp:534-638; csrc/poagraph.cpp:379-443).

    Returns (cons [B, N] consensus node ids left-packed in path order,
    cons_len [B], overflow [B] — set when the branch-completion loop exceeds
    max_branch_iters; such windows must fall back to the host)."""
    B, N, P = in_nbr.shape
    Q = out_nbr.shape[2]
    bidx = jnp.arange(B)
    b3 = bidx[:, None, None]
    arangeP = jnp.arange(P, dtype=jnp.int32)
    arangeQ = jnp.arange(Q, dtype=jnp.int32)

    scores = jnp.full((B, N), -1, jnp.int32)
    preds = jnp.full((B, N), -1, jnp.int32)
    nonempty = n_nodes > 0
    scores, preds, maxn = _bundle_scan(
        scores, preds, in_nbr, in_w, indeg, rank_to_node, n_nodes,
        jnp.full((B,), -1, jnp.int32), False, nonempty,
    )
    maxn = jnp.where(nonempty, maxn, 0)

    # ---- branch completion while the max node still has out-edges
    def bc_cond(st):
        it, scores, preds, maxn, active, ovf = st
        return jnp.any(active) & (it < max_branch_iters)

    def bc_body(st):
        it, scores, preds, maxn, active, ovf = st
        # invalidate rival tails: in-edge tails (!= maxn) of maxn's out-heads
        heads_q = out_nbr[bidx, maxn]  # [B, Q]
        q_ok = arangeQ[None, :] < out_deg[bidx, maxn][:, None]
        head_indeg = indeg[bidx[:, None], heads_q]  # [B, Q]
        rival = in_nbr[bidx[:, None], heads_q]  # [B, Q, P]
        r_ok = (
            q_ok[:, :, None]
            & (arangeP[None, None, :] < head_indeg[:, :, None])
            & (rival != maxn[:, None, None])
            & active[:, None, None]
        )
        scores = scores.at[
            b3, jnp.where(r_ok, rival, N)
        ].set(jnp.int32(-1), mode="drop")

        scores, preds, new_maxn = _bundle_scan(
            scores, preds, in_nbr, in_w, indeg, rank_to_node, n_nodes,
            rank_of[bidx, maxn], True, active,
        )
        found = new_maxn >= 0
        maxn = jnp.where(active & found, new_maxn, maxn)
        active = active & found & (out_deg[bidx, maxn] > 0)
        return it + 1, scores, preds, maxn, active, ovf

    active0 = nonempty & (out_deg[bidx, maxn] > 0)
    it, scores, preds, maxn, still_active, _ = lax.while_loop(
        bc_cond, bc_body,
        (jnp.int32(0), scores, preds, maxn, active0, jnp.zeros((B,), bool)),
    )
    overflow = still_active  # hit the iteration cap without converging

    # ---- backward walk: push maxn, follow preds until -1 (then reverse)
    buf = jnp.zeros((B, N), jnp.int32)
    cur = maxn
    k = jnp.zeros((B,), jnp.int32)
    act = nonempty

    def wstep(st):
        buf, cur, k, act = st
        buf = buf.at[bidx, jnp.where(act, jnp.minimum(k, N - 1), N)].set(
            cur, mode="drop"
        )
        k = k + jnp.where(act, 1, 0)
        nxt = preds[bidx, cur]
        more = act & (nxt >= 0)
        cur = jnp.where(more, nxt, cur)
        return buf, cur, k, more

    KW = 4

    def w_cond(st):
        it, inner = st
        return (it < N + KW) & jnp.any(inner[3])

    def w_body(st):
        it, inner = st
        for _ in range(KW):
            inner = wstep(inner)
        return it + KW, inner

    _, (buf, _, k, _) = lax.while_loop(
        w_cond, w_body, (jnp.int32(0), (buf, cur, k, act))
    )
    # reverse into path order: cons[i] = buf[k-1-i]
    idx = jnp.arange(N, dtype=jnp.int32)[None, :]
    src = jnp.clip(k[:, None] - 1 - idx, 0, N - 1)
    cons = jnp.take_along_axis(buf, src, axis=1)
    cons = jnp.where(idx < k[:, None], cons, 0)
    return cons, k, overflow


# ---------------------------------------------------------------- coverage


def consensus_coverage(
    cons: jnp.ndarray,  # [B, N] consensus node ids (left-packed)
    cons_len: jnp.ndarray,  # [B]
    tails: jnp.ndarray,  # [B, E]
    heads: jnp.ndarray,
    valid: jnp.ndarray,  # [B, E]
    lab_lo: jnp.ndarray,  # [B, E] int32 edge label masks
    lab_hi: jnp.ndarray,
    aligned: jnp.ndarray,  # [B, N, R]
    acount: jnp.ndarray,  # [B, N]
) -> jnp.ndarray:
    """Per-consensus-position coverage (graph.cpp:461-485): each node's
    distinct traversing-sequence count (union of labels over its in+out
    edges) plus the counts of its aligned-ring members, SUMMED."""
    B, E = tails.shape
    N = aligned.shape[1]
    R = aligned.shape[2]
    bidx = jnp.arange(B)[:, None]

    # node label masks: OR of incident edge masks via bool scatter-max
    def bits_of(lab):  # [B, E] -> [B, E, 32] bool
        return (
            jnp.right_shift(
                lab[:, :, None], jnp.arange(32, dtype=jnp.int32)[None, None, :]
            )
            & 1
        ).astype(bool)

    ebits = jnp.concatenate([bits_of(lab_lo), bits_of(lab_hi)], axis=2)
    ebits = ebits & valid[:, :, None]  # [B, E, 64]
    node_bits = jnp.zeros((B, N, 64), bool)
    node_bits = node_bits.at[
        bidx, jnp.where(valid, tails, N)
    ].max(ebits, mode="drop")
    node_bits = node_bits.at[
        bidx, jnp.where(valid, heads, N)
    ].max(ebits, mode="drop")
    node_cov = jnp.sum(node_bits, axis=2).astype(jnp.int32)  # [B, N]

    ring_cov = jnp.take_along_axis(
        node_cov, aligned.reshape(B, N * R), axis=1
    ).reshape(B, N, R)
    ring_on = jnp.arange(R)[None, None, :] < acount[:, :, None]
    total_cov = node_cov + jnp.sum(
        jnp.where(ring_on, ring_cov, 0), axis=2
    ).astype(jnp.int32)  # [B, N] by node id

    cov = jnp.take_along_axis(total_cov, cons, axis=1)  # [B, N] by cons pos
    return jnp.where(
        jnp.arange(N, dtype=jnp.int32)[None, :] < cons_len[:, None], cov, 0
    )


# ------------------------------------------------------------ trim + emit


def trim_consensus(
    cons_codes: jnp.ndarray,  # [B, N] int32 codes in path order
    cons_len: jnp.ndarray,  # [B]
    cov: jnp.ndarray,  # [B, N]
    avg_cov: jnp.ndarray,  # [B] int32 (n_seqs - 1) // 2
    do_trim: jnp.ndarray,  # [B] bool (trim flag && kTGS window)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """kTGS end trim (src/window.cpp:141-171): strip leading/trailing
    consensus positions with coverage < average; begin >= end keeps the full
    consensus (possible chimera)."""
    B, N = cons_codes.shape
    idx = jnp.arange(N, dtype=jnp.int32)[None, :]
    in_len = idx < cons_len[:, None]
    ok = in_len & (cov >= avg_cov[:, None])
    any_ok = jnp.any(ok, axis=1)
    begin = jnp.where(
        any_ok, jnp.argmax(ok, axis=1).astype(jnp.int32), cons_len
    )
    end = jnp.where(
        any_ok,
        jnp.int32(N - 1) - jnp.argmax(ok[:, ::-1], axis=1).astype(jnp.int32),
        jnp.int32(-1),
    )
    do_slice = do_trim & (begin < end)
    b0 = jnp.where(do_slice, begin, 0)
    out_len = jnp.where(do_slice, end - begin + 1, cons_len)
    src = jnp.clip(b0[:, None] + idx, 0, N - 1)
    out = jnp.take_along_axis(cons_codes, src, axis=1)
    out = jnp.where(idx < out_len[:, None], out, 0)
    return out, out_len


# ------------------------------------------------------------ full program


@functools.partial(
    jax.jit,
    static_argnames=("n_cap", "e_cap", "r_cap", "m", "x", "g", "p_cap"),
)
def device_linear(
    bb_codes: jnp.ndarray,  # [B, W] int32 backbone codes
    bb_w: jnp.ndarray,  # [B, W] int32 backbone build weights
    bb_len: jnp.ndarray,  # [B]
    lseqs: jnp.ndarray,  # [B, SMAX, W]
    lw: jnp.ndarray,  # [B, SMAX, W]
    llen: jnp.ndarray,  # [B, SMAX]
    lbegin: jnp.ndarray,  # [B, SMAX]
    lend: jnp.ndarray,  # [B, SMAX]
    lfull: jnp.ndarray,  # [B, SMAX] bool
    n_layers: jnp.ndarray,  # [B]
    do_trim: jnp.ndarray,  # [B] bool (trim && kTGS)
    n_cap: int,
    e_cap: int,
    r_cap: int,
    m: int,
    x: int,
    g: int,
    p_cap: int = 16,
):
    """Round-2 window consensus entirely on device (src/window.cpp:74-174):
    incremental build (graph_build.device_build with edge label tracking),
    bundled topo ranking, heaviest-bundle consensus with branch completion,
    coverage and the kTGS trim — one dispatch per window batch.

    Returns (out [B, n_cap] int32 codes left-packed, out_len [B],
    overflow [B] bool — overflow windows fall back to the host path)."""
    from .graph_build import device_build, topo_ranks_bundled

    B = bb_codes.shape[0]
    built = device_build(
        bb_codes, bb_w, bb_len, lseqs, lw, llen, lbegin, lend, lfull,
        n_layers, n_cap, e_cap, r_cap, m, x, g, p_cap=p_cap,
        track_labels=True,
    )
    valid = (
        jnp.arange(e_cap, dtype=jnp.int32)[None, :]
        < built["n_edges"][:, None]
    )
    in_nbr, in_w, indeg, ovf1 = build_in_slots_weighted(
        built["tails"], built["heads"], built["weights"], valid,
        n_cap, p_cap,
    )
    out_nbr, out_deg, ovf2 = build_out_slots(
        built["tails"], built["heads"], valid, n_cap, p_cap
    )
    rank_of, rank_to_node = topo_ranks_bundled(
        in_nbr, indeg, built["aligned"], built["acount"], built["n_nodes"]
    )
    cons, cons_len, ovf3 = heaviest_bundle(
        in_nbr, in_w, indeg, out_nbr, out_deg, rank_of, rank_to_node,
        built["n_nodes"],
    )
    cov = consensus_coverage(
        cons, cons_len, built["tails"], built["heads"], valid,
        built["lab_lo"], built["lab_hi"], built["aligned"], built["acount"],
    )
    cons_codes = jnp.take_along_axis(built["codes"], cons, axis=1)
    avg_cov = ((1 + n_layers) - 1) // 2  # (n_sequences - 1) / 2
    out, out_len = trim_consensus(
        cons_codes, cons_len, cov, avg_cov.astype(jnp.int32), do_trim
    )
    overflow = built["overflow"] | ovf1 | ovf2 | ovf3
    return out, out_len, overflow
