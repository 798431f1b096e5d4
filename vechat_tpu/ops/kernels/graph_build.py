"""Device-resident POA graph BUILD phase: AddAlignment fusion, aligned-node
bundled topological sort, and positional subgraph extraction as batched JAX
programs — the companion of graph_cycle.py for the incremental build loop
(reference: vendor/spoa/src/graph.cpp:182-299 AddAlignment, :301-371
TopologicalSort with aligned bundles, :640-745 Subgraph/UpdateAlignment;
host twin csrc/poagraph.cpp:96-201,330-368).

With this module the ENTIRE round-1 window consensus — incremental build
over layer steps, then the prune cycle — runs on device: the build loop is
one jitted program per window batch (layer steps as a fori_loop whose body
aligns, extracts positional subgraphs, fuses and re-ranks), eliminating the
per-layer-step host round-trips and graph re-uploads that dominated the
device pipeline's wall (459 dispatches for a 205-window batch).

Graph state (beyond graph_cycle's edge-list form):
  aligned[B, N, R]  int32  aligned-node rings, insertion order (R = ring cap)
  acount[B, N]      int32  ring lengths

Order-sensitive semantics preserved (tested against the host oracle):
  * fusion: unaligned prefix run, then suffix run, then matched-pair walk —
    node ids allocated in exactly that order; edge duplicate-merge by
    existing (tail, head); new aligned nodes ring-linked in the reference's
    member order (graph.cpp:260-279)
  * bundled topo sort: roots in id order skipping in_bundle nodes; deps =
    in-edge tails (slot order) then unmet ring members (claimed in_bundle
    when first seen); LIFO expansion = last unmet first; a bundle
    representative emits itself plus its whole ring contiguously
    (graph.cpp:301-371)
  * positional subgraph: backwards reachability from `end` through nodes
    >= `begin` via in-edges and rings; renumbering ascending in original
    id; edges re-emitted in (head, in-slot) order (graph.cpp:640-745)
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

BIG = jnp.int32(2**30)


# ----------------------------------------------------- bundled topo ranks


def topo_ranks_bundled(
    in_nbr: jnp.ndarray,  # [B, N, P] int32 in-edge tails, slot order
    indeg: jnp.ndarray,  # [B, N] int32
    aligned: jnp.ndarray,  # [B, N, R] int32 ring members, insertion order
    acount: jnp.ndarray,  # [B, N] int32
    n_nodes: jnp.ndarray,  # [B] int32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Topological emission order WITH aligned-node bundles
    (graph.cpp:301-371; csrc/poagraph.cpp:96-140).

    Returns (rank_of [B,N], rank_to_node [B,N])."""
    B, N, P = in_nbr.shape
    R = aligned.shape[2]
    bidx = jnp.arange(B)
    arangeN = jnp.arange(N, dtype=jnp.int32)
    arangeP = jnp.arange(P, dtype=jnp.int32)
    arangeR = jnp.arange(R, dtype=jnp.int32)

    emitted = jnp.zeros((B, N), bool)
    in_bundle = jnp.zeros((B, N), bool)
    rank_of = jnp.zeros((B, N), jnp.int32)
    rank_to_node = jnp.zeros((B, N), jnp.int32)
    stack = jnp.zeros((B, N), jnp.int32)
    sp = jnp.zeros((B,), jnp.int32)
    rcnt = jnp.zeros((B,), jnp.int32)  # rank positions filled

    def step(state):
        emitted, in_bundle, rank_of, rank_to_node, stack, sp, rcnt = state
        need_root = (sp == 0) & (rcnt < n_nodes)
        # next node in id order that is neither emitted nor in a bundle
        rootable = (
            ~emitted & ~in_bundle & (arangeN[None, :] < n_nodes[:, None])
        )
        root = jnp.argmax(rootable, axis=1).astype(jnp.int32)
        top = jnp.maximum(sp - 1, 0)
        v = jnp.where(need_root, root, stack[bidx, top])

        dv = indeg[bidx, v]
        tails_row = in_nbr[bidx, v]  # [B, P]
        tail_unmet = (arangeP[None, :] < dv[:, None]) & ~emitted[
            bidx[:, None], tails_row
        ]
        av = acount[bidx, v]
        ring_row = aligned[bidx, v]  # [B, R]
        v_bundled = in_bundle[bidx, v]
        ring_unmet = (
            (arangeR[None, :] < av[:, None])
            & ~emitted[bidx[:, None], ring_row]
            & ~v_bundled[:, None]
        )

        any_ring = jnp.any(ring_unmet, axis=1)
        any_tail = jnp.any(tail_unmet, axis=1)
        any_unmet = any_ring | any_tail
        last_ring = (
            jnp.int32(R - 1)
            - jnp.argmax(ring_unmet[:, ::-1], axis=1).astype(jnp.int32)
        )
        last_tail = (
            jnp.int32(P - 1)
            - jnp.argmax(tail_unmet[:, ::-1], axis=1).astype(jnp.int32)
        )
        # ring deps are pushed after tail deps, so they pop first
        u = jnp.where(
            any_ring, ring_row[bidx, last_ring], tails_row[bidx, last_tail]
        )

        active = need_root | (sp > 0)
        do_root = need_root
        do_push = active & ~do_root & any_unmet
        do_emit = active & ~do_root & ~any_unmet

        # claim every unmet ring member the moment the representative scans
        # them (the reference pushes + claims all at once; claiming all here
        # keeps claimed members from ever becoming roots)
        claim = ring_unmet & (do_push | do_emit)[:, None]
        in_bundle = in_bundle.at[
            bidx[:, None], jnp.where(claim, ring_row, N)
        ].set(True, mode="drop")

        pushed = jnp.where(do_root, v, u)
        slot = jnp.minimum(sp, N - 1)
        stack = stack.at[bidx, slot].set(
            jnp.where(do_root | do_push, pushed, stack[bidx, slot])
        )
        sp = sp + jnp.where(do_root | do_push, 1, jnp.where(do_emit, -1, 0))

        emitted = emitted.at[bidx, v].set(emitted[bidx, v] | do_emit)
        # rank append: representative emits itself + its whole ring
        rep_emit = do_emit & ~v_bundled
        pos_v = jnp.minimum(rcnt, N - 1)
        rank_to_node = rank_to_node.at[bidx, pos_v].set(
            jnp.where(rep_emit, v, rank_to_node[bidx, pos_v])
        )
        rank_of = rank_of.at[bidx, jnp.where(rep_emit, v, N)].set(
            rcnt, mode="drop"
        )
        ring_append = (arangeR[None, :] < av[:, None]) & rep_emit[:, None]
        ring_pos = jnp.minimum(rcnt[:, None] + 1 + arangeR[None, :], N - 1)
        rank_to_node = rank_to_node.at[
            bidx[:, None], jnp.where(ring_append, ring_pos, N)
        ].set(ring_row, mode="drop")
        rank_of = rank_of.at[
            bidx[:, None], jnp.where(ring_append, ring_row, N)
        ].set(rcnt[:, None] + 1 + arangeR[None, :], mode="drop")
        rcnt = rcnt + jnp.where(rep_emit, 1 + av, 0)
        return emitted, in_bundle, rank_of, rank_to_node, stack, sp, rcnt

    K = 4  # machine steps per while iteration (finished windows no-op)

    def cond(st):
        it, inner = st
        return (it < 3 * N + 2 + K) & jnp.any(
            (inner[5] > 0) | (inner[6] < n_nodes)
        )

    def body(st):
        it, inner = st
        for _ in range(K):
            inner = step(inner)
        return it + K, inner

    state = (emitted, in_bundle, rank_of, rank_to_node, stack, sp, rcnt)
    _, state = lax.while_loop(cond, body, (jnp.int32(0), state))
    return state[2], state[3]


# ------------------------------------------------------------ fusion machine


def fuse_alignments(
    codes: jnp.ndarray,  # [B, N] int32
    tails: jnp.ndarray,  # [B, E]
    heads: jnp.ndarray,
    weights: jnp.ndarray,
    n_nodes: jnp.ndarray,  # [B]
    n_edges: jnp.ndarray,  # [B]
    aligned: jnp.ndarray,  # [B, N, R]
    acount: jnp.ndarray,  # [B, N]
    pairs: jnp.ndarray,  # [B, L, 2] node-id space, back-to-front
    count: jnp.ndarray,  # [B] pair counts (0 = add the whole run unaligned)
    seq: jnp.ndarray,  # [B, W] int32 codes (0xFF padded)
    seq_w: jnp.ndarray,  # [B, W] int32 per-base weights
    seq_len: jnp.ndarray,  # [B] int32
    active_w: jnp.ndarray,  # [B] bool: window participates this step
    lab_lo: jnp.ndarray = None,  # [B, E] int32 edge label bitmask (seqs 0-31)
    lab_hi: jnp.ndarray = None,  # [B, E] int32 edge label bitmask (seqs 32-63)
    bit_lo: jnp.ndarray = None,  # [B] int32 this sequence's label bit
    bit_hi: jnp.ndarray = None,  # [B] int32
):
    """One AddAlignment per window, batched (graph.cpp:182-299 semantics;
    csrc/poagraph.cpp:142-201). Sequential walk per window over the pair
    stream, vector-parallel across windows. Returns the updated graph
    arrays + overflow flag.

    Edge labels: spoa records on every edge the set of sequences that
    traverse it (graph.cpp AddEdge label emplace; used only by consensus
    Coverage, graph.cpp:38-56). With sequence depth capped at 64 the set is
    two int32 bitmask words per edge; merge-or-append ORs the current
    sequence's bit in. Pass None to skip label tracking."""
    B, N = codes.shape
    E = tails.shape[1]
    R = aligned.shape[2]
    L = pairs.shape[1]
    bidx = jnp.arange(B)
    arangeR = jnp.arange(R, dtype=jnp.int32)
    arangeE = jnp.arange(E, dtype=jnp.int32)
    track_labels = lab_lo is not None
    if not track_labels:
        lab_lo = jnp.zeros((B, 1), jnp.int32)
        lab_hi = jnp.zeros((B, 1), jnp.int32)
        bit_lo = jnp.zeros((B,), jnp.int32)
        bit_hi = jnp.zeros((B,), jnp.int32)

    an = pairs[:, :, 0]
    ap = pairs[:, :, 1]
    valid_pair = (
        jnp.arange(L)[None, :] >= (L - count[:, None])
    )  # [B, L] back-to-front region
    ap_ok = valid_pair & (ap >= 0)
    # vfront / vback: first / last seq pos present in the alignment
    vfront = jnp.min(jnp.where(ap_ok, ap, BIG), axis=1)
    vback = jnp.max(jnp.where(ap_ok, ap, -1), axis=1)
    # empty alignment -> the whole sequence is one unaligned run
    # (graph.cpp:209-213); an alignment with no seq positions is treated
    # the same (the oracle rejects it; it cannot arise from a real DP)
    no_aln = (count == 0) | ~jnp.any(ap_ok, axis=1)
    vfront = jnp.where(no_aln, seq_len, vfront)  # whole seq is the "prefix"
    vback = jnp.where(no_aln, seq_len - 1, vback)

    overflow = jnp.zeros((B,), bool)

    def add_node(state, code, do):
        codes, n_nodes = state
        pos = jnp.minimum(n_nodes, N - 1)
        codes = codes.at[bidx, jnp.where(do, pos, N)].set(code, mode="drop")
        nid = pos
        n_nodes = n_nodes + jnp.where(do, 1, 0)
        return (codes, n_nodes), nid

    def add_edge(est, t, h, w, do):
        """Merge into existing (t->h) else append (graph.cpp:94-107)."""
        tails, heads, weights, n_edges, overflow, lab_lo, lab_hi = est
        hit = (
            (tails == t[:, None])
            & (heads == h[:, None])
            & (arangeE[None, :] < n_edges[:, None])
        )
        found = jnp.any(hit, axis=1)
        eidx = jnp.argmax(hit, axis=1)
        weights = weights.at[
            bidx, jnp.where(do & found, eidx, E)
        ].add(w, mode="drop")
        pos = jnp.minimum(n_edges, E - 1)
        app = do & ~found
        tails = tails.at[bidx, jnp.where(app, pos, E)].set(t, mode="drop")
        heads = heads.at[bidx, jnp.where(app, pos, E)].set(h, mode="drop")
        weights = weights.at[bidx, jnp.where(app, pos, E)].set(w, mode="drop")
        if track_labels:
            # OR the sequence bit in: touched edge = merged-into or appended
            touched = jnp.where(do, jnp.where(found, eidx, pos), E)
            # bitwise OR via two complementary scatters: lab | bit ==
            # lab + bit - (lab & bit); use max trick instead — per-word OR
            # decomposes as set when appended (lab was 0) and add of the
            # missing bit when merged
            cur_lo = lab_lo[bidx, jnp.minimum(touched, E - 1)]
            cur_hi = lab_hi[bidx, jnp.minimum(touched, E - 1)]
            app_mask = app
            new_lo = jnp.where(app_mask, bit_lo, cur_lo | bit_lo)
            new_hi = jnp.where(app_mask, bit_hi, cur_hi | bit_hi)
            lab_lo = lab_lo.at[bidx, touched].set(new_lo, mode="drop")
            lab_hi = lab_hi.at[bidx, touched].set(new_hi, mode="drop")
        overflow = overflow | (app & (n_edges >= E))
        n_edges = n_edges + jnp.where(app, 1, 0)
        return (tails, heads, weights, n_edges, overflow, lab_lo, lab_hi)

    # ---- phase 1+2: unaligned prefix run [0, vfront) and suffix run
    # [vback+1, slen) — chains of fresh nodes, ids allocated prefix first,
    # suffix second (csrc/poagraph.cpp:157-159)
    def run_phase(carry, lo, hi, phase_active):
        """Masked chain loop: i in [lo, hi), prev chains within the run."""
        (codes, n_nodes, tails, heads, weights, n_edges, overflow,
         lab_lo, lab_hi, prev, first) = carry

        def body(k, st):
            (codes, n_nodes, tails, heads, weights, n_edges, overflow,
             lab_lo, lab_hi, prev, first) = st
            i = lo + k
            do = phase_active & (i < hi)
            code = seq[bidx, jnp.clip(i, 0, seq.shape[1] - 1)]
            (codes, n_nodes), nid = add_node((codes, n_nodes), code, do)
            w = seq_w[bidx, jnp.clip(i - 1, 0, seq.shape[1] - 1)] + seq_w[
                bidx, jnp.clip(i, 0, seq.shape[1] - 1)
            ]
            est = add_edge(
                (tails, heads, weights, n_edges, overflow, lab_lo, lab_hi),
                prev, nid, w, do & (prev >= 0) & (i > lo),
            )
            tails, heads, weights, n_edges, overflow, lab_lo, lab_hi = est
            first = jnp.where(do & (first < 0), nid, first)
            prev = jnp.where(do, nid, prev)
            return (codes, n_nodes, tails, heads, weights, n_edges,
                    overflow, lab_lo, lab_hi, prev, first)

        n_steps = jnp.max(jnp.where(phase_active, hi - lo, 0))
        return lax.fori_loop(0, jnp.maximum(n_steps, 0), body, carry)

    prev0 = jnp.full((B,), -1, jnp.int32)
    first0 = jnp.full((B,), -1, jnp.int32)
    carry = (codes, n_nodes, tails, heads, weights, n_edges, overflow,
             lab_lo, lab_hi, prev0, first0)
    carry = run_phase(carry, jnp.zeros((B,), jnp.int32), vfront, active_w)
    (codes, n_nodes, tails, heads, weights, n_edges, overflow,
     lab_lo, lab_hi, prefix_prev, _) = carry

    carry = (codes, n_nodes, tails, heads, weights, n_edges, overflow,
             lab_lo, lab_hi,
             jnp.full((B,), -1, jnp.int32), jnp.full((B,), -1, jnp.int32))
    carry = run_phase(carry, vback + 1, seq_len, active_w)
    (codes, n_nodes, tails, heads, weights, n_edges, overflow,
     lab_lo, lab_hi, _, suffix_first) = carry

    # ---- phase 3: matched-pair walk (graph.cpp:238-292)
    def walk_body(k, st):
        (codes, n_nodes, tails, heads, weights, n_edges, overflow,
         lab_lo, lab_hi, aligned, acount, prev) = st
        # k < L guard: the unrolled caller may overstep the pair region
        in_rgn = active_w & (k >= L - count) & (k < L) & ~no_aln
        k = jnp.minimum(k, L - 1)
        a_n = an[bidx, k]
        a_p = ap[bidx, k]
        do = in_rgn & (a_p >= 0)
        code = seq[bidx, jnp.clip(a_p, 0, seq.shape[1] - 1)]

        is_new = a_n < 0
        jt = jnp.maximum(a_n, 0)
        jt_match = ~is_new & (codes[bidx, jt] == code)
        ring_row = aligned[bidx, jt]  # [B, R]
        ring_hit = (
            (arangeR[None, :] < acount[bidx, jt][:, None])
            & (codes[bidx[:, None], ring_row] == code[:, None])
            & (~is_new & ~jt_match)[:, None]
        )
        ring_found = jnp.any(ring_hit, axis=1)
        ring_node = ring_row[bidx, jnp.argmax(ring_hit, axis=1)]

        need_new = do & (is_new | (~jt_match & ~ring_found))
        (codes, n_nodes), new_id = add_node((codes, n_nodes), code, need_new)
        curr = jnp.where(
            jt_match, jt, jnp.where(ring_found, ring_node, new_id)
        )

        # ring-link a NEW node aligned to jt: every existing member gets
        # curr appended, curr's ring = members ++ [jt] (graph.cpp:260-279)
        link = need_new & ~is_new
        av = acount[bidx, jt]
        members_on = (arangeR[None, :] < av[:, None]) & link[:, None]
        m_pos = jnp.minimum(
            acount[bidx[:, None], ring_row], R - 1
        )  # append slot per member
        aligned = aligned.at[
            bidx[:, None],
            jnp.where(members_on, ring_row, N),
            jnp.where(members_on, m_pos, 0),
        ].set(curr[:, None], mode="drop")
        acount = acount.at[
            bidx[:, None], jnp.where(members_on, ring_row, N)
        ].add(1, mode="drop")
        # curr's ring = members of jt's ring, then jt
        cpos = jnp.minimum(curr, N - 1)
        aligned = aligned.at[
            bidx[:, None],
            jnp.where(members_on, cpos[:, None], N),
            jnp.where(members_on, arangeR[None, :], 0),
        ].set(ring_row, mode="drop")
        aligned = aligned.at[
            bidx, jnp.where(link, cpos, N), jnp.minimum(av, R - 1)
        ].set(jt, mode="drop")
        acount = acount.at[bidx, jnp.where(link, cpos, N)].set(
            av + 1, mode="drop"
        )
        # ... and jt's own ring gets curr appended (graph.cpp:277)
        aligned = aligned.at[
            bidx, jnp.where(link, jt, N), jnp.minimum(av, R - 1)
        ].set(curr, mode="drop")
        acount = acount.at[bidx, jnp.where(link, jt, N)].add(
            1, mode="drop"
        )
        overflow = overflow | (link & (av + 1 > R))

        w = seq_w[bidx, jnp.clip(a_p - 1, 0, seq.shape[1] - 1)] + seq_w[
            bidx, jnp.clip(a_p, 0, seq.shape[1] - 1)
        ]
        est = add_edge(
            (tails, heads, weights, n_edges, overflow, lab_lo, lab_hi),
            prev, curr, w, do & (prev >= 0),
        )
        tails, heads, weights, n_edges, overflow, lab_lo, lab_hi = est
        prev = jnp.where(do, curr, prev)
        return (codes, n_nodes, tails, heads, weights, n_edges, overflow,
                lab_lo, lab_hi, aligned, acount, prev)

    st = (codes, n_nodes, tails, heads, weights, n_edges, overflow,
          lab_lo, lab_hi, aligned, acount, prefix_prev)
    # 4 pair steps per loop iteration (out-of-region steps no-op), cutting
    # the sequential walk's per-iteration overhead — the dominant cost of
    # the machine loops on TPU
    KU = 4

    def walk4(k4, st):
        for u in range(KU):
            st = walk_body(k4 * KU + u, st)
        return st

    st = lax.fori_loop(0, -(-L // KU), walk4, st)
    (codes, n_nodes, tails, heads, weights, n_edges, overflow,
     lab_lo, lab_hi, aligned, acount, walk_prev) = st

    # ---- final: bridge into the suffix run (csrc/poagraph.cpp:196-198)
    w_last = seq_w[bidx, jnp.clip(vback, 0, seq.shape[1] - 1)] + seq_w[
        bidx, jnp.clip(vback + 1, 0, seq.shape[1] - 1)
    ]
    est = add_edge(
        (tails, heads, weights, n_edges, overflow, lab_lo, lab_hi),
        walk_prev, suffix_first, w_last,
        active_w & (suffix_first >= 0) & (walk_prev >= 0) & ~no_aln,
    )
    tails, heads, weights, n_edges, overflow, lab_lo, lab_hi = est
    overflow = overflow | (n_nodes > N) | (n_edges > E)
    return (codes, tails, heads, weights, n_nodes, n_edges,
            aligned, acount, overflow, lab_lo, lab_hi)


# ------------------------------------------------------- positional subgraph


def positional_subgraph(
    codes: jnp.ndarray,  # [B, N]
    tails: jnp.ndarray,  # [B, E]
    heads: jnp.ndarray,
    weights: jnp.ndarray,
    n_edges: jnp.ndarray,  # [B]
    aligned: jnp.ndarray,  # [B, N, R]
    acount: jnp.ndarray,  # [B, N]
    begin: jnp.ndarray,  # [B] int32 (node ids = backbone positions)
    end: jnp.ndarray,  # [B] int32
    use_full: jnp.ndarray,  # [B] bool: full-span layers skip extraction
    n_nodes: jnp.ndarray,  # [B]
):
    """Backwards-reachable subgraph from `end` through nodes >= `begin` via
    in-edges and aligned rings (graph.cpp:640-666; csrc/poagraph.cpp:330-368),
    renumbered ascending in original node id, edges re-emitted in
    (head, in-slot) order, rings filtered in order.

    Windows with use_full keep the identity mapping (every node kept), so
    one batched program serves mixed full/partial layer steps.

    Returns dict with the subgraph arrays + sub_to_full mapping (`order`)."""
    B, N = codes.shape
    E = tails.shape[1]
    R = aligned.shape[2]
    bidx = jnp.arange(B)[:, None]
    arangeN = jnp.arange(N, dtype=jnp.int32)

    node_real = arangeN[None, :] < n_nodes[:, None]
    evalid = jnp.arange(E)[None, :] < n_edges[:, None]

    keep0 = jnp.zeros((B, N), bool)
    start_ok = (end >= begin) & (end < n_nodes)
    keep0 = keep0.at[bidx[:, 0], jnp.where(start_ok, end, N)].set(
        True, mode="drop"
    )
    ge_begin = arangeN[None, :] >= begin[:, None]

    def prop_cond(st):
        it, keep, changed = st
        return changed & (it < N)

    def prop_body(st):
        it, keep, _ = st
        kh = jnp.take_along_axis(keep, heads, axis=1)  # [B, E]
        new = keep.at[
            bidx, jnp.where(evalid & kh, tails, N)
        ].max(True, mode="drop")
        # ring neighbours of kept nodes
        ring_on = (
            jnp.arange(R)[None, None, :] < acount[:, :, None]
        ) & keep[:, :, None]
        new = new.at[
            bidx[:, :, None], jnp.where(ring_on, aligned, N)
        ].max(True, mode="drop")
        new = new & ge_begin & node_real
        new = new | keep
        return it + 1, new, jnp.any(new != keep)

    _, keep, _ = lax.while_loop(
        prop_cond, prop_body, (jnp.int32(0), keep0, jnp.bool_(True))
    )
    keep = jnp.where(use_full[:, None], node_real, keep)

    new_id = jnp.where(keep, jnp.cumsum(keep, axis=1) - 1, -1).astype(
        jnp.int32
    )
    n_sub = jnp.sum(keep, axis=1).astype(jnp.int32)
    # order[new] = old id (scatter the kept ids to their new positions)
    order = jnp.zeros((B, N), jnp.int32)
    order = order.at[
        bidx, jnp.where(keep, new_id, N)
    ].set(jnp.broadcast_to(arangeN[None, :], (B, N)), mode="drop")
    codes_sub = jnp.take_along_axis(codes, order, axis=1)

    # edges: kept iff both endpoints kept; emission order = (head, in-slot)
    # = (head, edge idx) since in-slot order is ascending edge index
    nt = jnp.take_along_axis(new_id, tails, axis=1)
    nh = jnp.take_along_axis(new_id, heads, axis=1)
    esurv = evalid & (nt >= 0) & (nh >= 0)
    ekey = jnp.where(
        esurv, nh * jnp.int32(E) + jnp.arange(E, dtype=jnp.int32), BIG
    )
    eperm = jnp.argsort(ekey, axis=1)
    tails_sub = jnp.take_along_axis(jnp.where(esurv, nt, 0), eperm, axis=1)
    heads_sub = jnp.take_along_axis(jnp.where(esurv, nh, 0), eperm, axis=1)
    weights_sub = jnp.take_along_axis(
        jnp.where(esurv, weights, 0), eperm, axis=1
    )
    n_edges_sub = jnp.sum(esurv, axis=1).astype(jnp.int32)

    # rings: member kept-filter preserving order, remapped to new ids
    ring_old = jnp.take_along_axis(
        aligned, order[:, :, None], axis=1
    )  # [B, N, R] (per new node, its old ring)
    acount_old = jnp.take_along_axis(acount, order, axis=1)
    ring_new = jnp.take_along_axis(
        new_id, ring_old.reshape(B, N * R), axis=1
    ).reshape(B, N, R)
    ring_on = (
        jnp.arange(R)[None, None, :] < acount_old[:, :, None]
    ) & (ring_new >= 0)
    # left-compact surviving members (order preserved)
    pos = jnp.cumsum(ring_on, axis=2) - 1
    aligned_sub = jnp.zeros((B, N, R), jnp.int32)
    aligned_sub = aligned_sub.at[
        bidx[:, :, None],
        jnp.arange(N)[None, :, None],
        jnp.where(ring_on, pos, R),
    ].set(jnp.where(ring_on, ring_new, 0), mode="drop")
    acount_sub = jnp.sum(ring_on, axis=2).astype(jnp.int32)

    return dict(
        codes=codes_sub, tails=tails_sub, heads=heads_sub,
        weights=weights_sub, n_edges=n_edges_sub, aligned=aligned_sub,
        acount=acount_sub, n_sub=n_sub, order=order, new_id=new_id,
    )


# ------------------------------------------------------------ build driver


import functools  # noqa: E402


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_cap", "e_cap", "r_cap", "m", "x", "g", "p_cap", "track_labels",
    ),
)
def device_build(
    bb_codes: jnp.ndarray,  # [B, W] int32 backbone codes
    bb_w: jnp.ndarray,  # [B, W] int32 backbone build weights
    bb_len: jnp.ndarray,  # [B] int32
    lseqs: jnp.ndarray,  # [B, SMAX, W] int32 layer codes (0xFF padded)
    lw: jnp.ndarray,  # [B, SMAX, W] int32 layer build weights
    llen: jnp.ndarray,  # [B, SMAX] int32
    lbegin: jnp.ndarray,  # [B, SMAX] int32
    lend: jnp.ndarray,  # [B, SMAX] int32
    lfull: jnp.ndarray,  # [B, SMAX] bool (full-span -> align whole graph)
    n_layers: jnp.ndarray,  # [B] int32
    n_cap: int,
    e_cap: int,
    r_cap: int,
    m: int,
    x: int,
    g: int,
    p_cap: int = 16,
    track_labels: bool = False,
):
    """The whole incremental build phase as ONE device program
    (src/window.cpp:84-136 build loop; graph.cpp:182-299 AddAlignment):
    layer steps run as a fori_loop whose body extracts the positional
    subgraph, bundle-topo-ranks it, NW-aligns the layer, maps the alignment
    back and fuses it into the full graph. Layers must be pre-ordered by the
    reference's sorted layer order (windows._layer_order).

    Returns (graph arrays incl. rings, overflow [B])."""
    B, W = bb_codes.shape
    SMAX = lseqs.shape[1]
    N, E, R = n_cap, e_cap, r_cap
    bidx = jnp.arange(B)
    arangeN = jnp.arange(N, dtype=jnp.int32)

    # ---- init: backbone chain (graph.cpp:109-130 via add_alignment(empty))
    codes = jnp.where(
        arangeN[None, :] < bb_len[:, None],
        jnp.pad(bb_codes, ((0, 0), (0, max(0, N - W))))[:, :N],
        0,
    ).astype(jnp.int32)
    n_nodes = bb_len.astype(jnp.int32)
    arangeE = jnp.arange(E, dtype=jnp.int32)
    chain_on = arangeE[None, :] < (bb_len[:, None] - 1)
    tails = jnp.where(chain_on, arangeE[None, :], 0).astype(jnp.int32)
    heads = jnp.where(chain_on, arangeE[None, :] + 1, 0).astype(jnp.int32)
    bw_pad = jnp.pad(bb_w, ((0, 0), (0, max(0, E + 1 - W))))
    weights = jnp.where(
        chain_on, bw_pad[:, :E] + bw_pad[:, 1 : E + 1], 0
    ).astype(jnp.int32)
    n_edges = jnp.maximum(bb_len - 1, 0).astype(jnp.int32)
    aligned = jnp.zeros((B, N, R), jnp.int32)
    acount = jnp.zeros((B, N), jnp.int32)
    overflow = bb_len > N
    # edge label bitmasks (sequence sets for consensus Coverage); backbone
    # chain edges carry label 0
    if track_labels:
        lab_lo = jnp.where(chain_on, jnp.int32(1), 0)
        lab_hi = jnp.zeros((B, E), jnp.int32)
    else:
        lab_lo = jnp.zeros((B, 1), jnp.int32)
        lab_hi = jnp.zeros((B, 1), jnp.int32)

    from .graph_cycle import (
        build_dp_arrays,
        build_in_slots,
        poa_align_mixed,
        ranks_to_ids,
    )

    def step(s, st):
        (codes, tails, heads, weights, n_nodes, n_edges,
         aligned, acount, overflow, lab_lo, lab_hi) = st
        active = s < n_layers
        seq = lseqs[:, s, :]
        w_s = lw[:, s, :]
        slen = jnp.where(active, llen[:, s], 1)
        begin = lbegin[:, s]
        end = lend[:, s]
        use_full = lfull[:, s] | ~active

        sub = positional_subgraph(
            codes, tails, heads, weights, n_edges, aligned, acount,
            begin, end, use_full, n_nodes,
        )
        in_nbr, indeg, out_deg, ovf_p = build_in_slots(
            sub["tails"], sub["heads"],
            jnp.arange(E)[None, :] < sub["n_edges"][:, None], N, p_cap,
        )
        rank_of, rank_to_node = topo_ranks_bundled(
            in_nbr, indeg, sub["aligned"], sub["acount"], sub["n_sub"]
        )
        codes_dp, preds_dp, is_sink = build_dp_arrays(
            rank_of, rank_to_node, in_nbr, indeg, out_deg,
            sub["codes"], sub["n_sub"],
        )
        pairs, count, _ = poa_align_mixed(
            codes_dp, preds_dp, is_sink, sub["n_sub"],
            seq[:, None, :], slen[:, None], jnp.zeros((B, 1), bool),
            m, x, g,
        )
        pairs = ranks_to_ids(pairs, rank_to_node)[:, 0]  # [B, L, 2]
        # map sub node ids back to full-graph ids (UpdateAlignment,
        # graph.cpp:723-745)
        pn = pairs[:, :, 0]
        mapped = jnp.take_along_axis(
            sub["order"], jnp.maximum(pn, 0), axis=1
        )
        pairs = jnp.stack(
            [jnp.where(pn >= 0, mapped, pn), pairs[:, :, 1]], axis=2
        )
        if track_labels:
            # sequence index of layer s is s+1 (backbone = 0); its label bit
            j = (s + 1).astype(jnp.int32)
            b_lo = jnp.where(
                j < 32, jnp.left_shift(jnp.int32(1), jnp.minimum(j, 31)), 0
            )
            b_hi = jnp.where(
                j >= 32,
                jnp.left_shift(jnp.int32(1), jnp.clip(j - 32, 0, 31)),
                0,
            )
            b_lo = jnp.broadcast_to(b_lo, (B,))
            b_hi = jnp.broadcast_to(b_hi, (B,))
        else:
            b_lo = b_hi = None
        (codes, tails, heads, weights, n_nodes, n_edges,
         aligned, acount, ovf_f, lab_lo, lab_hi) = fuse_alignments(
            codes, tails, heads, weights, n_nodes, n_edges,
            aligned, acount, pairs, jnp.where(active, count[:, 0], 0),
            seq, w_s, slen, active,
            lab_lo=lab_lo if track_labels else None,
            lab_hi=lab_hi if track_labels else None,
            bit_lo=b_lo, bit_hi=b_hi,
        )
        overflow = overflow | (active & (ovf_p | ovf_f))
        return (codes, tails, heads, weights, n_nodes, n_edges,
                aligned, acount, overflow, lab_lo, lab_hi)

    st = (codes, tails, heads, weights, n_nodes, n_edges,
          aligned, acount, overflow, lab_lo, lab_hi)
    st = lax.fori_loop(0, jnp.max(n_layers), step, st)
    (codes, tails, heads, weights, n_nodes, n_edges,
     aligned, acount, overflow, lab_lo, lab_hi) = st
    return dict(
        codes=codes, tails=tails, heads=heads, weights=weights,
        n_nodes=n_nodes, n_edges=n_edges, aligned=aligned, acount=acount,
        overflow=overflow, lab_lo=lab_lo, lab_hi=lab_hi,
    )
