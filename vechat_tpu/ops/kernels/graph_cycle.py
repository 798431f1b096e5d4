"""Device-resident variation-graph ops: the haplotype prune cycle as batched
JAX programs over dense edge-list graph tensors.

This moves the per-window graph work of the correction cycle — PruneGraph,
largest connected component, subgraph renumbering, topological ranking,
AddWeights re-weighting and corrected-sequence emission — onto the device,
batched across windows, so the whole prune -> realign x2 -> emit cycle runs
with ONE host round-trip per window batch instead of one per layer step
(reference semantics: vendor/spoa/src/graph.cpp:811-982 PruneGraph, :984-1089
DfsUtil/LargestSubgraph, :1104-1165 AddWeights, :1167-1179
GenerateCorrectedSequence; host twin: csrc/poagraph.cpp).

Graph representation (per window, capacity-padded, batch axis B first):
  codes[N]        int32  node character codes, indexed by node id
  n_nodes         int32
  tails/heads[E]  int32  edge endpoints, ascending edge index = insertion
                         order. In spoa, per-node in/out-edge slot vectors are
                         ascending in edge index BY CONSTRUCTION (add_edge
                         appends globally; prune's compaction is monotone —
                         csrc/poagraph.cpp:poa_save comment), so slot order
                         never needs to be stored: it IS the edge index order.
  weights[E]      int32  edge weights (bounded: <= 2*1000 per traversing read)
  valid[E]        bool   pruning clears bits instead of compacting; relative
                         order of surviving edges is preserved implicitly

Order-sensitive semantics preserved exactly (verified against the native C++
twin by tests/test_graph_cycle.py):
  * prune decisions computed against pre-prune sums; 0/0 -> NaN keeps the
    comparison false (graph.cpp:811-982)
  * components discovered in min-node-id order, `>=` size tie-break = the
    last (highest min-id) component of maximal size wins (graph.cpp:1049)
  * LargestSubgraph renumbers nodes in preorder DFS discovery order with
    neighbours = in-edge tails then out-edge heads, each in slot order
    (graph.cpp:984-1019); edge weights reset to 0 (graph.cpp:1082); aligned
    rings are NOT copied, so the pruned graph's topological sort has no
    bundles (graph.cpp:1021-1089)
  * topological sort = iterative DFS emitting a node after its predecessors,
    expanding unmet dependencies last-pushed-first (graph.cpp:301-371,
    csrc/poagraph.cpp:96-140)
  * AddWeights adds w[p-1]+w[p] along consecutive matched alignment pairs,
    resetting across gaps; it may re-create edges between surviving nodes
    (appended in first-occurrence order) but never adds nodes
    (graph.cpp:1104-1165)

Floating-point note: prune confidences are computed in float32 on device vs
double on host. A keep/drop flip needs |w/total - threshold| below float32
resolution (~2.4e-8 at 0.2) with w/total != threshold exactly; with integer
weights and per-node totals < ~1e6 the smallest nonzero deviation is
>= 1/(5*total) ~ 2e-7, so the comparison is exact for realistic windows.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

NEG = jnp.int32(-(2**30))
BIG = jnp.int32(2**30)


# ----------------------------------------------------------- host packing


def graph_to_edges(graph, n_cap: int, e_cap: int):
    """Pack a host graph (native or oracle) into the flat edge-list form.

    Returns dict(codes [n_cap], tails/heads/weights [e_cap], n_nodes,
    n_edges) or None when caps are exceeded. Edge index order = insertion
    order = every per-node slot order (see module docstring)."""
    if hasattr(graph, "edges_dense"):  # native C++ graph
        return graph.edges_dense(n_cap, e_cap)
    n = graph.num_nodes()
    m = len(graph.edges)
    if n > n_cap or m > e_cap:
        return None
    codes = np.zeros(n_cap, dtype=np.int32)
    tails = np.zeros(e_cap, dtype=np.int32)
    heads = np.zeros(e_cap, dtype=np.int32)
    weights = np.zeros(e_cap, dtype=np.int32)
    codes[:n] = graph.codes
    for i, e in enumerate(graph.edges):
        tails[i] = e.tail
        heads[i] = e.head
        weights[i] = min(e.weight, 0x7FFFFFFF)
    return dict(
        codes=codes, tails=tails, heads=heads, weights=weights,
        n_nodes=n, n_edges=m,
    )


# ------------------------------------------------------------------- prune


def prune_edges(
    tails: jnp.ndarray,  # [B, E] int32
    heads: jnp.ndarray,  # [B, E] int32
    weights: jnp.ndarray,  # [B, E] int32
    valid: jnp.ndarray,  # [B, E] bool
    n_nodes_cap: int,
    avg_weight: jnp.ndarray,  # [B] float32
    min_confidence: jnp.ndarray,  # [] or [B] float32
    min_support: jnp.ndarray,
) -> jnp.ndarray:
    """Edge keep mask after one PruneGraph pass (graph.cpp:811-982).

    keep = conf_uv >= d && conf_vu >= d && support >= s, where
    conf_uv = w / sum(out-weights of tail), conf_vu = w / sum(in-weights of
    head), support = w / average_weight — all sums over the PRE-prune state.
    0/0 -> NaN makes every comparison false, dropping the edge.
    """
    B, E = tails.shape
    bidx = jnp.arange(B)[:, None]
    w = weights.astype(jnp.float32)
    wv = jnp.where(valid, w, 0.0)
    tot_out = jnp.zeros((B, n_nodes_cap), jnp.float32).at[bidx, tails].add(
        wv, mode="drop"
    )
    tot_in = jnp.zeros((B, n_nodes_cap), jnp.float32).at[bidx, heads].add(
        wv, mode="drop"
    )
    conf_uv = w / jnp.take_along_axis(tot_out, tails, axis=1)
    conf_vu = w / jnp.take_along_axis(tot_in, heads, axis=1)
    supp = w / avg_weight[:, None]
    d = jnp.asarray(min_confidence, jnp.float32)
    s = jnp.asarray(min_support, jnp.float32)
    if d.ndim == 1:
        d = d[:, None]
    if s.ndim == 1:
        s = s[:, None]
    keep = (conf_uv >= d) & (conf_vu >= d) & (supp >= s)
    return keep & valid


# ----------------------------------------------------- connected components


def cc_min_labels(
    tails: jnp.ndarray,
    heads: jnp.ndarray,
    valid: jnp.ndarray,
    node_alive: jnp.ndarray,  # [B, N] bool
) -> jnp.ndarray:
    """Min-node-id label per connected component (undirected, valid edges).

    Iterated min-hooking + pointer jumping until fixpoint; at convergence
    label[v] = min node id of v's component — exactly the id the reference's
    id-ascending DFS discovers that component from (graph.cpp:1030-1040).
    """
    B, N = node_alive.shape
    bidx = jnp.arange(B)[:, None]
    label0 = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    sent = jnp.int32(N)

    def body(state):
        it, label, _ = state
        lt = jnp.take_along_axis(label, tails, axis=1)
        lh = jnp.take_along_axis(label, heads, axis=1)
        mn = jnp.where(valid, jnp.minimum(lt, lh), sent)
        new = label.at[bidx, jnp.where(valid, tails, sent)].min(mn, mode="drop")
        new = new.at[bidx, jnp.where(valid, heads, sent)].min(mn, mode="drop")
        # pointer jumping (label compression), twice per round
        new = jnp.take_along_axis(new, new, axis=1)
        new = jnp.take_along_axis(new, new, axis=1)
        return it + 1, new, jnp.any(new != label)

    def cond(state):
        it, _, changed = state
        return changed & (it < 2 * N)

    _, label, _ = lax.while_loop(
        cond, body, (jnp.int32(0), label0, jnp.bool_(True))
    )
    return label


def select_component(
    labels: jnp.ndarray,  # [B, N] int32
    node_alive: jnp.ndarray,  # [B, N] bool
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(comp_mask [B,N], root [B]) of the winning component.

    The reference keeps the LAST discovered component of maximal size
    (`comp.size() >= best.size()`, graph.cpp:1049); discovery order is by
    component min node id ascending, so the winner maximises
    (size, min_node_id) lexicographically. root = that min node id (the DFS
    start the reference renumbers from).
    """
    B, N = labels.shape
    bidx = jnp.arange(B)[:, None]
    lab = jnp.where(node_alive, labels, jnp.int32(N))
    sizes = jnp.zeros((B, N), jnp.int32).at[bidx, lab].add(
        jnp.where(node_alive, 1, 0), mode="drop"
    )
    # size-0 labels score < any size-1 score since N+1 > any label
    score = sizes * jnp.int32(N + 1) + jnp.arange(N, dtype=jnp.int32)
    root = jnp.argmax(score, axis=1).astype(jnp.int32)
    comp_mask = node_alive & (labels == root[:, None])
    return comp_mask, root


# --------------------------------------------------------------- adjacency


def _group_positions(sorted_owner: jnp.ndarray) -> jnp.ndarray:
    """Position of each entry within its (contiguous) owner group."""
    B, M = sorted_owner.shape
    idx = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (B, M))
    start = jnp.concatenate(
        [
            jnp.ones((B, 1), bool),
            sorted_owner[:, 1:] != sorted_owner[:, :-1],
        ],
        axis=1,
    )
    group_start_idx = lax.cummax(jnp.where(start, idx, jnp.int32(-1)), axis=1)
    return idx - group_start_idx


def build_undirected_adjacency(
    tails: jnp.ndarray,
    heads: jnp.ndarray,
    valid: jnp.ndarray,
    n_nodes_cap: int,
    a_cap: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense per-node neighbour lists in the reference's DFS scan order:
    in-edge tails first, then out-edge heads, each ascending in edge index
    (graph.cpp:984-1019 adjacency = inedges then outedges, slot order).

    Returns (adj [B,N,a_cap] int32, deg [B,N] int32, overflow [B] bool).
    """
    B, E = tails.shape
    N = n_nodes_cap
    bidx = jnp.arange(B)[:, None]
    eidx = jnp.broadcast_to(jnp.arange(E, dtype=jnp.int32), (B, E))
    # entry stream: [in-entries | out-entries]; key orders by
    # (owner, in-before-out, edge index)
    owner = jnp.concatenate([heads, tails], axis=1)
    nbr = jnp.concatenate([tails, heads], axis=1)
    ordr = jnp.concatenate([eidx, eidx + E], axis=1)
    ok = jnp.concatenate([valid, valid], axis=1)
    key = jnp.where(ok, owner * jnp.int32(2 * E) + ordr, BIG)
    perm = jnp.argsort(key, axis=1)
    s_owner = jnp.take_along_axis(jnp.where(ok, owner, jnp.int32(N)), perm, axis=1)
    s_nbr = jnp.take_along_axis(nbr, perm, axis=1)
    pos = _group_positions(s_owner)
    deg = jnp.zeros((B, N), jnp.int32).at[bidx, s_owner].add(
        jnp.where(s_owner < N, 1, 0), mode="drop"
    )
    overflow = jnp.any(deg > a_cap, axis=1)
    slot_ok = (s_owner < N) & (pos < a_cap)
    adj = jnp.zeros((B, N, a_cap), jnp.int32)
    adj = adj.at[
        bidx, jnp.where(slot_ok, s_owner, N), jnp.where(slot_ok, pos, 0)
    ].set(jnp.where(slot_ok, s_nbr, 0), mode="drop")
    return adj, deg, overflow


# ------------------------------------------------------------ DFS preorder


def dfs_preorder(
    adj: jnp.ndarray,  # [B, N, A] int32
    deg: jnp.ndarray,  # [B, N] int32
    comp_mask: jnp.ndarray,  # [B, N] bool
    root: jnp.ndarray,  # [B] int32
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Preorder DFS numbering of the winning component from its min-id root,
    replaying DfsUtil's discovery order (graph.cpp:984-1019: mark visited at
    discovery, descend into the first unvisited neighbour in scan order).

    Returns (new_id [B,N] int32, -1 outside the component;
             order [B,N] int32, preorder position -> node id;
             n_sub [B] int32).

    Batched stack machine: every step either pushes one newly discovered
    node or pops an exhausted frame, so <= 2N+1 steps complete all windows
    (each node of the component is pushed exactly once).
    """
    B, N, A = adj.shape
    bidx = jnp.arange(B)
    has = jnp.take_along_axis(comp_mask, root[:, None], axis=1)[:, 0]

    visited = jnp.zeros((B, N), bool).at[bidx, root].set(has)
    new_id = jnp.full((B, N), -1, jnp.int32).at[bidx, root].set(
        jnp.where(has, 0, -1)
    )
    order = jnp.zeros((B, N), jnp.int32).at[bidx, 0].set(root)
    stack = jnp.zeros((B, N), jnp.int32).at[bidx, 0].set(root)
    pptr = jnp.zeros((B, N), jnp.int32)
    sp = jnp.where(has, 1, 0).astype(jnp.int32)
    cnt = sp

    arangeA = jnp.arange(A, dtype=jnp.int32)

    def step(_, state):
        visited, new_id, order, stack, pptr, sp, cnt = state
        active = sp > 0
        top = jnp.maximum(sp - 1, 0)
        v = stack[bidx, top]
        p = pptr[bidx, top]
        degv = deg[bidx, v]
        row = adj[bidx, v]  # [B, A]
        vis = visited[bidx[:, None], row]  # [B, A]
        cand = (arangeA[None, :] >= p[:, None]) & (
            arangeA[None, :] < degv[:, None]
        ) & ~vis
        anyc = jnp.any(cand, axis=1)
        jstar = jnp.argmax(cand, axis=1).astype(jnp.int32)
        u = row[bidx, jstar]

        push = active & anyc
        pop = active & ~anyc

        # push: advance parent's scan ptr past j*, discover u
        pptr = pptr.at[bidx, top].set(
            jnp.where(push, jstar + 1, pptr[bidx, top])
        )
        visited = visited.at[bidx, u].set(
            visited[bidx, u] | push
        )
        new_id = new_id.at[bidx, u].set(
            jnp.where(push, cnt, new_id[bidx, u])
        )
        order = order.at[bidx, jnp.minimum(cnt, N - 1)].set(
            jnp.where(push, u, order[bidx, jnp.minimum(cnt, N - 1)])
        )
        stack = stack.at[bidx, jnp.minimum(sp, N - 1)].set(
            jnp.where(push, u, stack[bidx, jnp.minimum(sp, N - 1)])
        )
        pptr = pptr.at[bidx, jnp.minimum(sp, N - 1)].set(
            jnp.where(push, 0, pptr[bidx, jnp.minimum(sp, N - 1)])
        )
        cnt = cnt + jnp.where(push, 1, 0)
        sp = sp + jnp.where(push, 1, jnp.where(pop, -1, 0))
        return visited, new_id, order, stack, pptr, sp, cnt

    state = (visited, new_id, order, stack, pptr, sp, cnt)

    # K machine steps per while iteration: a finished window's step is a
    # no-op, so over-stepping is safe and the per-iteration loop overhead
    # (the dominant cost of these tiny-op machines on TPU) amortizes K-fold
    K = 4

    def cond(st):
        it, inner = st
        return (it < 2 * N + 1 + K) & jnp.any(inner[5] > 0)

    def body(st):
        it, inner = st
        for _ in range(K):
            inner = step(it, inner)
        return it + K, inner

    _, state = lax.while_loop(cond, body, (jnp.int32(0), state))
    visited, new_id, order, stack, pptr, sp, cnt = state
    return new_id, order, cnt


# ------------------------------------------------------- subgraph renumber


def renumber_subgraph(
    tails: jnp.ndarray,
    heads: jnp.ndarray,
    valid: jnp.ndarray,
    new_id: jnp.ndarray,  # [B, N] int32 (-1 outside component)
    order: jnp.ndarray,  # [B, N] preorder position -> old node id
    codes: jnp.ndarray,  # [B, N] int32 (indexed by old node id)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rebuild the winning component as a fresh graph: nodes renumbered in
    DFS preorder, edges re-emitted scanning old nodes in preorder and each
    node's out-edges in slot order — so the new edge index order is
    (new_id[tail], old edge index) — with every weight reset to 0
    (graph.cpp:1021-1089; weight reset at :1082).

    Returns (tails2, heads2, weights2, valid2 [B,E], n_edges2 [B], codes2 [B,N]).
    """
    B, E = tails.shape
    N = new_id.shape[1]
    eidx = jnp.broadcast_to(jnp.arange(E, dtype=jnp.int32), (B, E))
    nt = jnp.take_along_axis(new_id, tails, axis=1)
    nh = jnp.take_along_axis(new_id, heads, axis=1)
    survive = valid & (nt >= 0)
    key = jnp.where(survive, nt * jnp.int32(E) + eidx, BIG)
    perm = jnp.argsort(key, axis=1)
    tails2 = jnp.take_along_axis(jnp.where(survive, nt, 0), perm, axis=1)
    heads2 = jnp.take_along_axis(jnp.where(survive, nh, 0), perm, axis=1)
    valid2 = jnp.take_along_axis(survive, perm, axis=1)
    weights2 = jnp.zeros((B, E), jnp.int32)
    n_edges2 = jnp.sum(survive, axis=1).astype(jnp.int32)
    codes2 = jnp.take_along_axis(codes, order, axis=1)
    return tails2, heads2, weights2, valid2, n_edges2, codes2


# ----------------------------------------------------------- in-edge slots


def build_in_slots(
    tails: jnp.ndarray,
    heads: jnp.ndarray,
    valid: jnp.ndarray,
    n_nodes_cap: int,
    p_cap: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-node in-edge tail lists in slot order (ascending edge index).

    Returns (in_nbr [B,N,p_cap] int32, indeg [B,N], out_deg [B,N],
    overflow [B] bool).
    """
    B, E = tails.shape
    N = n_nodes_cap
    bidx = jnp.arange(B)[:, None]
    key = jnp.where(valid, heads * jnp.int32(E) + jnp.arange(E, dtype=jnp.int32), BIG)
    perm = jnp.argsort(key, axis=1)
    s_head = jnp.take_along_axis(jnp.where(valid, heads, jnp.int32(N)), perm, axis=1)
    s_tail = jnp.take_along_axis(tails, perm, axis=1)
    pos = _group_positions(s_head)
    indeg = jnp.zeros((B, N), jnp.int32).at[bidx, s_head].add(
        jnp.where(s_head < N, 1, 0), mode="drop"
    )
    out_deg = jnp.zeros((B, N), jnp.int32).at[
        bidx, jnp.where(valid, tails, jnp.int32(N))
    ].add(jnp.where(valid, 1, 0), mode="drop")
    overflow = jnp.any(indeg > p_cap, axis=1)
    slot_ok = (s_head < N) & (pos < p_cap)
    in_nbr = jnp.zeros((B, N, p_cap), jnp.int32)
    in_nbr = in_nbr.at[
        bidx, jnp.where(slot_ok, s_head, N), jnp.where(slot_ok, pos, 0)
    ].set(jnp.where(slot_ok, s_tail, 0), mode="drop")
    return in_nbr, indeg, out_deg, overflow


# ----------------------------------------------------------- topo ranking


def topo_ranks(
    in_nbr: jnp.ndarray,  # [B, N, P] int32 (tail node ids, slot order)
    indeg: jnp.ndarray,  # [B, N] int32
    n_sub: jnp.ndarray,  # [B] int32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Topological emission order of the renumbered (bundle-free) graph,
    replaying the reference's iterative DFS: roots iterated in node-id
    ascending order; at each frame the LAST still-unmet in-edge dependency
    (slot order) is expanded first; a node emits when all dependencies have
    emitted (graph.cpp:301-371 with empty aligned rings;
    csrc/poagraph.cpp:96-140 — pushing all unmet deps then processing LIFO
    is equivalent to repeatedly expanding the last unmet one).

    Returns (rank_of [B,N] int32, rank_to_node [B,N] int32). <= 2N+2 machine
    steps: every step pushes one node (each node is pushed exactly once,
    as root or as dependency) or emits the top frame.
    """
    B, N, P = in_nbr.shape
    bidx = jnp.arange(B)
    arangeN = jnp.arange(N, dtype=jnp.int32)
    arangeP = jnp.arange(P, dtype=jnp.int32)

    emitted = jnp.zeros((B, N), bool)
    rank_of = jnp.zeros((B, N), jnp.int32)
    rank_to_node = jnp.zeros((B, N), jnp.int32)
    stack = jnp.zeros((B, N), jnp.int32)
    sp = jnp.zeros((B,), jnp.int32)
    cnt = jnp.zeros((B,), jnp.int32)

    def step(_, state):
        emitted, rank_of, rank_to_node, stack, sp, cnt = state
        need_root = (sp == 0) & (cnt < n_sub)
        # next unemitted node in id order (only consulted when sp == 0);
        # node ids >= n_sub are padding and never emitted or rooted
        unem = ~emitted & (arangeN[None, :] < n_sub[:, None])
        root = jnp.argmax(unem, axis=1).astype(jnp.int32)

        top = jnp.maximum(sp - 1, 0)
        v = jnp.where(need_root, root, stack[bidx, top])
        dv = indeg[bidx, v]
        row = in_nbr[bidx, v]  # [B, P]
        dep_unmet = (arangeP[None, :] < dv[:, None]) & ~emitted[
            bidx[:, None], row
        ]
        any_unmet = jnp.any(dep_unmet, axis=1)
        # LAST unmet slot
        last = (
            jnp.int32(P - 1)
            - jnp.argmax(dep_unmet[:, ::-1], axis=1).astype(jnp.int32)
        )
        u = row[bidx, last]

        active = need_root | (sp > 0)
        # case 1: rooting — push root frame (the dep scan happens next step)
        # case 2: unmet dep — push it
        # case 3: emit top
        do_root = need_root
        do_push = active & ~do_root & any_unmet
        do_emit = active & ~do_root & ~any_unmet

        pushed = jnp.where(do_root, v, u)
        slot = jnp.minimum(sp, N - 1)
        stack = stack.at[bidx, slot].set(
            jnp.where(do_root | do_push, pushed, stack[bidx, slot])
        )
        sp = sp + jnp.where(do_root | do_push, 1, jnp.where(do_emit, -1, 0))

        emitted = emitted.at[bidx, v].set(emitted[bidx, v] | do_emit)
        rank_of = rank_of.at[bidx, v].set(
            jnp.where(do_emit, cnt, rank_of[bidx, v])
        )
        rpos = jnp.minimum(cnt, N - 1)
        rank_to_node = rank_to_node.at[bidx, rpos].set(
            jnp.where(do_emit, v, rank_to_node[bidx, rpos])
        )
        cnt = cnt + jnp.where(do_emit, 1, 0)
        return emitted, rank_of, rank_to_node, stack, sp, cnt

    state = (emitted, rank_of, rank_to_node, stack, sp, cnt)

    # steps: N pushes + N emits + up to N rooting steps interleaved;
    # early-exits once every window has emitted all n_sub nodes. K steps
    # per iteration amortize the loop overhead (finished windows no-op).
    K = 4

    def cond(st):
        it, inner = st
        return (it < 3 * N + 2 + K) & jnp.any(
            (inner[4] > 0) | (inner[5] < n_sub)
        )

    def body(st):
        it, inner = st
        for _ in range(K):
            inner = step(it, inner)
        return it + K, inner

    _, state = lax.while_loop(cond, body, (jnp.int32(0), state))
    emitted, rank_of, rank_to_node, stack, sp, cnt = state
    return rank_of, rank_to_node


# ------------------------------------------------------- DP array assembly


def build_dp_arrays(
    rank_of: jnp.ndarray,  # [B, N]
    rank_to_node: jnp.ndarray,  # [B, N]
    in_nbr: jnp.ndarray,  # [B, N, P]
    indeg: jnp.ndarray,  # [B, N]
    out_deg: jnp.ndarray,  # [B, N]
    codes: jnp.ndarray,  # [B, N] (indexed by node id)
    n_sub: jnp.ndarray,  # [B]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rank-ordered aligner inputs matching csrc/poagraph.cpp:poa_dense:
    codes_dp[r] = code of rank-r node; preds_dp[r,s] = DP row (rank+1) of the
    s-th in-edge tail, no-preds -> row 0, padding repeats slot 0;
    is_sink[r] = node has no out-edges."""
    B, N, P = in_nbr.shape
    codes_dp = jnp.take_along_axis(codes, rank_to_node, axis=1)
    indeg_r = jnp.take_along_axis(indeg, rank_to_node, axis=1)  # [B, N]
    is_sink = (
        jnp.take_along_axis(out_deg, rank_to_node, axis=1) == 0
    ) & (jnp.arange(N)[None, :] < n_sub[:, None])
    # tails (node ids) per rank row, slot order
    tails_r = jnp.take_along_axis(
        in_nbr, rank_to_node[:, :, None], axis=1
    )  # [B, N, P]
    pred_rows = (
        jnp.take_along_axis(rank_of, tails_r.reshape(B, N * P), axis=1)
        .reshape(B, N, P)
        + 1
    )
    slot_idx = jnp.arange(P)[None, None, :]
    has_pred = slot_idx < indeg_r[:, :, None]
    first = jnp.where(indeg_r > 0, pred_rows[:, :, 0], 0)
    preds_dp = jnp.where(has_pred, pred_rows, first[:, :, None]).astype(
        jnp.int32
    )
    return codes_dp, preds_dp, is_sink


# ------------------------------------------------------------ mixed-mode DP


def poa_align_mixed(
    codes_dp: jnp.ndarray,  # [B, N] int32
    preds_dp: jnp.ndarray,  # [B, N, P] int32
    is_sink: jnp.ndarray,  # [B, N] bool
    n_sub: jnp.ndarray,  # [B] int32
    seq: jnp.ndarray,  # [B, D, S] int32 (0xFF padding)
    seq_len: jnp.ndarray,  # [B, D] int32
    is_sw: jnp.ndarray,  # [B, D] bool (False -> NW with (m,x,g))
    m: int,
    x: int,
    g: int,
):
    """Batched sequence-to-graph DP with a per-sequence NW/SW mode flag.

    Generalizes ops/kernels/poa_jax.poa_align_batch_device to D sequences per
    graph and mixed modes in one dispatch: the realign rounds of the prune
    cycle align the backbone and full-span layers NW (CLI scores) and partial
    layers SW with the reference's fixed local scores 3/-5/-4
    (src/window.cpp:326,329-386). Same DP, cell-selection and traceback
    preference order as the scalar engine (csrc/poagraph.cpp:align_linear).

    Returns (pairs [B, D, L, 2] int32 back-to-front, count [B, D], score [B, D])
    where pair rows are (node id | -1, seq pos | -1); node ids are the
    CURRENT graph's node ids (rank_to_node applied by the caller if needed —
    here we emit ranks and the caller converts, see cycle driver).
    Note: pairs carry RANK-1 space node rows converted through rank_to_node
    by align_and_convert below.
    """
    B, D, S = seq.shape
    N, P = preds_dp.shape[1], preds_dp.shape[2]
    W = S + 1
    sw = is_sw[:, :, None]  # [B, D, 1]
    mi = jnp.where(sw, jnp.int32(3), jnp.int32(m))
    xi = jnp.where(sw, jnp.int32(-5), jnp.int32(x))
    gi = jnp.where(sw, jnp.int32(-4), jnp.int32(g))
    jidx = jnp.arange(W, dtype=jnp.int32)

    H0 = jnp.where(sw, 0, jidx[None, None, :] * gi)  # [B, D, W]
    H = jnp.zeros((B, D, N + 1, W), jnp.int32)
    H = H.at[:, :, 0, :].set(H0)

    def step(n, H):
        code = codes_dp[:, n]  # [B]
        prof = jnp.where(
            seq == code[:, None, None], mi, xi
        )  # [B, D, S]
        p_idx = preds_dp[:, n, :]  # [B, P]
        pred_rows = jnp.take_along_axis(
            H, p_idx[:, None, :, None], axis=2
        )  # [B, D, P, W]
        diag = pred_rows[:, :, :, :-1] + prof[:, :, None, :]
        vert = pred_rows[:, :, :, 1:] + gi[:, :, None, :]
        cand = jnp.max(jnp.maximum(diag, vert), axis=2)  # [B, D, S]
        h0_nw = jnp.max(pred_rows[:, :, :, 0], axis=2) + gi[:, :, 0]
        h0 = jnp.where(is_sw, 0, h0_nw)  # [B, D]
        full = jnp.concatenate([h0[:, :, None], cand], axis=2)  # [B, D, W]
        shifted = full - jidx[None, None, :] * gi
        run = lax.cummax(shifted, axis=2) + jidx[None, None, :] * gi
        run = jnp.where(sw, jnp.maximum(run, 0), run)
        return H.at[:, :, n + 1, :].set(run)

    # rows are capacity-padded; only the batch's real maximum node count
    # needs computing (rows beyond a window's n_sub are masked out of cell
    # selection and never visited by the traceback)
    H = lax.fori_loop(0, jnp.max(n_sub), step, H)

    # ---- max cell selection (first maximal in (rank, j) scan order)
    row_valid = jnp.arange(N)[None, :] < n_sub[:, None]  # [B, N]
    col_valid = (
        jnp.arange(1, W)[None, None, :] <= seq_len[:, :, None]
    )  # [B, D, S]
    body = H[:, :, 1:, 1:]  # [B, D, N, S]

    # NW: sink rows at column seq_len
    last = jnp.take_along_axis(
        H[:, :, 1:, :], seq_len[:, :, None, None], axis=3
    )[..., 0]  # [B, D, N]
    nw_vals = jnp.where((row_valid & is_sink)[:, None, :], last, NEG)
    nw_i = jnp.argmax(nw_vals, axis=2).astype(jnp.int32) + 1
    nw_j = seq_len
    nw_score = jnp.max(nw_vals, axis=2)

    # SW: any valid cell, empty when best <= 0
    mask = row_valid[:, None, :, None] & col_valid[:, :, None, :]
    sw_vals = jnp.where(mask, body, NEG).reshape(B, D, -1)
    flat = jnp.argmax(sw_vals, axis=2)
    sw_i = (flat // S + 1).astype(jnp.int32)
    sw_j = (flat % S + 1).astype(jnp.int32)
    sw_score = jnp.max(sw_vals, axis=2)
    sw_empty = sw_score <= 0
    sw_i = jnp.where(sw_empty, 0, sw_i)
    sw_j = jnp.where(sw_empty, 0, sw_j)

    max_i = jnp.where(is_sw, sw_i, nw_i)
    max_j = jnp.where(is_sw, sw_j, nw_j).astype(jnp.int32)
    max_score = jnp.where(is_sw, sw_score, nw_score)

    # ---- traceback: all (b, d) walks advance together
    L = N + S + 1
    b2 = jnp.arange(B)[:, None]
    d2 = jnp.arange(D)[None, :]

    start_empty = (max_i == 0) & (max_j == 0)
    i0 = jnp.where(start_empty, 0, max_i)
    j0 = jnp.where(start_empty, 0, max_j)

    gi2 = gi[:, :, 0]
    mi2 = mi[:, :, 0]
    xi2 = xi[:, :, 0]

    def cond_alive(i, j):
        sw_alive = H[b2, d2, i, j] != 0
        nw_alive = ~((i == 0) & (j == 0))
        return jnp.where(is_sw, sw_alive, nw_alive)

    def tb_step(_, state):
        i, j, k, active, pairs = state
        h_ij = H[b2, d2, i, j]  # [B, D]
        node = jnp.maximum(i - 1, 0)
        code = codes_dp[b2, node]
        jm1 = jnp.maximum(j - 1, 0)
        seq_code = seq[b2, d2, jm1]
        match_cost = jnp.where(seq_code == code, mi2, xi2)  # [B, D]
        p_idx = preds_dp[b2, node]  # [B, D, P]
        Hp_jm1 = H[b2[:, :, None], d2[:, :, None], p_idx, jm1[:, :, None]]
        Hp_j = H[b2[:, :, None], d2[:, :, None], p_idx, j[:, :, None]]

        diag_ok = ((i != 0) & (j != 0))[:, :, None] & (
            h_ij[:, :, None] == Hp_jm1 + match_cost[:, :, None]
        )
        vert_ok = (i != 0)[:, :, None] & (
            h_ij[:, :, None] == Hp_j + gi2[:, :, None]
        )
        horiz_ok = (j != 0) & (h_ij == H[b2, d2, i, jm1] + gi2)

        cands = jnp.concatenate(
            [diag_ok, vert_ok, horiz_ok[:, :, None]], axis=2
        )  # [B, D, 2P+1]
        choice = jnp.argmax(cands, axis=2)  # first true = preference order
        is_diag = choice < P
        is_vert = (choice >= P) & (choice < 2 * P)
        slot = jnp.where(is_diag, choice, choice - P)
        pred_row = jnp.take_along_axis(
            p_idx, jnp.minimum(slot, P - 1)[:, :, None], axis=2
        )[:, :, 0]

        prev_i = jnp.where(is_diag | is_vert, pred_row, i)
        prev_j = jnp.where(is_diag | (~is_vert), j - 1, j)

        pair = jnp.stack(
            [
                jnp.where(i == prev_i, -1, node),  # rank (row - 1)
                jnp.where(j == prev_j, -1, j - 1),
            ],
            axis=2,
        )  # [B, D, 2]
        write_pos = L - 1 - k
        old = pairs[b2, d2, write_pos]
        pairs = pairs.at[b2, d2, write_pos].set(
            jnp.where(active[:, :, None], pair, old)
        )
        i = jnp.where(active, prev_i, i)
        j = jnp.where(active, prev_j, j)
        k = jnp.where(active, k + 1, k)
        active = active & cond_alive(i, j)
        return i, j, k, active, pairs

    pairs0 = jnp.full((B, D, L, 2), -2, jnp.int32)
    k0 = jnp.zeros((B, D), jnp.int32)
    active0 = cond_alive(i0, j0) & (~start_empty)

    KU = 4  # walk steps per while iteration (inactive walks no-op)

    def tb_cond(state):
        step, (i, j, k, active, pairs) = state
        return (step < L) & jnp.any(active)

    def tb_body(state):
        step, inner = state
        for _ in range(KU):
            inner = tb_step(step, inner)
        return step + KU, inner

    _, (_, _, count, _, pairs) = lax.while_loop(
        tb_cond, tb_body, (jnp.int32(0), (i0, j0, k0, active0, pairs0))
    )
    count = jnp.where(start_empty, 0, count)
    return pairs, count, max_score


def ranks_to_ids(
    pairs: jnp.ndarray,  # [B, D, L, 2] (rank | -1, pos | -1)
    rank_to_node: jnp.ndarray,  # [B, N]
) -> jnp.ndarray:
    """Convert the rank column of traceback pairs to node ids."""
    B, D, L, _ = pairs.shape
    r = pairs[..., 0]
    ids = jnp.take_along_axis(
        rank_to_node[:, None, :],
        jnp.maximum(r, 0).reshape(B, 1, D * L),
        axis=2,
    ).reshape(B, D, L)
    node_col = jnp.where(r >= 0, ids, r)
    return jnp.stack([node_col, pairs[..., 1]], axis=3)


# -------------------------------------------------------------- AddWeights


def add_weights_batch(
    tails: jnp.ndarray,  # [B, E]
    heads: jnp.ndarray,
    weights: jnp.ndarray,
    valid: jnp.ndarray,
    n_edges: jnp.ndarray,  # [B]
    pairs: jnp.ndarray,  # [B, D, L, 2] node-id space
    seq_w: jnp.ndarray,  # [B, D, W] int32 per-base weights
    n_nodes_cap: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched AddWeights over all D re-aligned sequences of each window
    (graph.cpp:1104-1165): every adjacent matched pair (both node and seq pos
    non-gap, no gap between) contributes w[p-1]+w[p] to edge (prev -> curr);
    a missing edge between surviving nodes is re-created via AddEdge — new
    edges append after existing ones in first-occurrence order across the
    sequence stream (backbone first, then layers in sorted order, pairs in
    walk order). Weight accumulation commutes, so found-edge contributions
    scatter-add and new-edge contributions group-sum to the sequential result.

    Returns (tails', heads', weights', valid', n_edges', overflow [B] bool).
    """
    B, E = tails.shape
    D, L = pairs.shape[1], pairs.shape[2]
    N = n_nodes_cap
    bidx = jnp.arange(B)[:, None]

    an = pairs[..., 0]  # [B, D, L]
    ap = pairs[..., 1]
    matched = (an >= 0) & (ap >= 0)
    contrib = matched[:, :, 1:] & matched[:, :, :-1]  # [B, D, L-1]
    t_c = an[:, :, :-1]
    h_c = an[:, :, 1:]
    p_c = ap[:, :, 1:]  # seq pos of the head pair
    # seq_w is [B, D, W]: gather per (b, d)
    wp = jnp.take_along_axis(seq_w, jnp.maximum(p_c, 0), axis=2)
    wpm1 = jnp.take_along_axis(seq_w, jnp.maximum(p_c - 1, 0), axis=2)
    w_c = jnp.where(contrib, wp + wpm1, 0)

    C = D * (L - 1)
    key = jnp.where(
        contrib, t_c * jnp.int32(N) + h_c, BIG
    ).reshape(B, C)
    w_flat = w_c.reshape(B, C)
    c_valid = contrib.reshape(B, C)

    # lookup against the round-start edge set
    ekey = jnp.where(valid, tails * jnp.int32(N) + heads, BIG)
    eperm = jnp.argsort(ekey, axis=1)
    ekey_s = jnp.take_along_axis(ekey, eperm, axis=1)
    slot = jnp.clip(
        jax.vmap(jnp.searchsorted)(ekey_s, key), 0, E - 1
    )  # [B, C]
    found = jnp.take_along_axis(ekey_s, slot, axis=1) == key
    eidx = jnp.take_along_axis(eperm, slot, axis=1)
    weights = weights.at[
        bidx, jnp.where(found & c_valid, eidx, E)
    ].add(jnp.where(found & c_valid, w_flat, 0), mode="drop")

    # new edges: dedup not-found keys by first stream occurrence
    nf = c_valid & ~found
    nf_key = jnp.where(nf, key, BIG)
    # stable sort groups equal keys in stream order
    perm2 = jnp.argsort(nf_key, axis=1, stable=True)
    sk = jnp.take_along_axis(nf_key, perm2, axis=1)
    sw_ = jnp.take_along_axis(jnp.where(nf, w_flat, 0), perm2, axis=1)
    sord = jnp.take_along_axis(
        jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32), (B, C)), perm2, axis=1
    )
    first = jnp.concatenate(
        [
            (sk[:, :1] < BIG),
            (sk[:, 1:] != sk[:, :-1]) & (sk[:, 1:] < BIG),
        ],
        axis=1,
    )
    gid = jnp.cumsum(first, axis=1) - 1  # [B, C]
    n_new = jnp.max(
        jnp.where(first, gid + 1, 0), axis=1
    ).astype(jnp.int32)
    gsum = jnp.zeros((B, C), jnp.int32).at[
        bidx, jnp.where(sk < BIG, gid, C - 1)
    ].add(jnp.where(sk < BIG, sw_, 0), mode="drop")
    # representative (first) entry per group, ordered by first occurrence:
    # within equal keys sord ascends, so the first flag marks min stream order
    rep_order = jnp.where(first, sord, BIG)
    rep_key = jnp.where(first, sk, BIG)
    rep_sum = jnp.where(
        first, jnp.take_along_axis(gsum, gid, axis=1), 0
    )
    # order the new edges by first-occurrence stream position
    perm3 = jnp.argsort(rep_order, axis=1)
    NE = min(E, C)
    new_key = jnp.take_along_axis(rep_key, perm3, axis=1)[:, :NE]
    new_sum = jnp.take_along_axis(rep_sum, perm3, axis=1)[:, :NE]

    j_new = jnp.broadcast_to(jnp.arange(NE, dtype=jnp.int32), (B, NE))
    dst = n_edges[:, None] + j_new
    put = (j_new < n_new[:, None]) & (dst < E)
    dst_c = jnp.where(put, dst, E)
    tails = tails.at[bidx, dst_c].set(
        jnp.where(put, new_key // N, 0), mode="drop"
    )
    heads = heads.at[bidx, dst_c].set(
        jnp.where(put, new_key % N, 0), mode="drop"
    )
    weights = weights.at[bidx, dst_c].set(
        jnp.where(put, new_sum, 0), mode="drop"
    )
    valid = valid.at[bidx, dst_c].set(
        jnp.where(put, True, False), mode="drop"
    )
    overflow = n_edges + n_new > E
    n_edges = jnp.minimum(n_edges + n_new, E)
    return tails, heads, weights, valid, n_edges, overflow


# ------------------------------------------------------------------- emit


def corrected_emit(
    pairs: jnp.ndarray,  # [B, L, 2] node-id space (backbone alignment)
    codes: jnp.ndarray,  # [B, N] node codes by id
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GenerateCorrectedSequence (graph.cpp:1167-1179): emit the code of
    every non-gap graph node on the alignment path, in path order.

    Returns (out [B, L] int32 left-packed, out_len [B])."""
    B, L, _ = pairs.shape
    bidx = jnp.arange(B)[:, None]
    an = pairs[:, :, 0]
    keep = an >= 0
    pos = jnp.cumsum(keep, axis=1) - 1
    ch = jnp.take_along_axis(codes, jnp.maximum(an, 0), axis=1)
    out = jnp.zeros((B, L), jnp.int32)
    out = out.at[bidx, jnp.where(keep, pos, L)].set(
        jnp.where(keep, ch, 0), mode="drop"
    )
    return out, jnp.sum(keep, axis=1).astype(jnp.int32)


# ------------------------------------------------------------- full cycle


def prune_and_rebuild(
    tails, heads, weights, valid, codes, n_alive, avg_weight,
    min_confidence, min_support, n_cap: int, a_cap: int, p_cap: int,
):
    """One prune -> largest-CC -> renumber -> topo-rank pass. Returns the
    renumbered graph (edge arrays + codes + n_sub), rank tables, DP arrays
    and an overflow flag per window."""
    node_alive = (
        jnp.arange(n_cap, dtype=jnp.int32)[None, :] < n_alive[:, None]
    )
    keep = prune_edges(
        tails, heads, weights, valid, n_cap, avg_weight,
        min_confidence, min_support,
    )
    labels = cc_min_labels(tails, heads, keep, node_alive)
    comp_mask, root = select_component(labels, node_alive)
    adj, deg, ovf_a = build_undirected_adjacency(tails, heads, keep, n_cap, a_cap)
    new_id, order, n_sub = dfs_preorder(adj, deg, comp_mask, root)
    t2, h2, w2, v2, ne2, codes2 = renumber_subgraph(
        tails, heads, keep, new_id, order, codes
    )
    in_nbr, indeg, out_deg, ovf_p = build_in_slots(t2, h2, v2, n_cap, p_cap)
    rank_of, rank_to_node = topo_ranks(in_nbr, indeg, n_sub)
    codes_dp, preds_dp, is_sink = build_dp_arrays(
        rank_of, rank_to_node, in_nbr, indeg, out_deg, codes2, n_sub
    )
    overflow = ovf_a | ovf_p
    return dict(
        tails=t2, heads=h2, weights=w2, valid=v2, n_edges=ne2,
        codes=codes2, n_sub=n_sub,
        rank_of=rank_of, rank_to_node=rank_to_node,
        codes_dp=codes_dp, preds_dp=preds_dp, is_sink=is_sink,
        overflow=overflow,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_prune", "m", "x", "g", "a_cap", "p_cap", "d_chunk",
    ),
)
def haplotype_cycle(
    tails: jnp.ndarray,  # [B, E] build-graph edges
    heads: jnp.ndarray,
    weights: jnp.ndarray,
    n_edges: jnp.ndarray,  # [B]
    codes: jnp.ndarray,  # [B, N]
    n_nodes: jnp.ndarray,  # [B]
    avg_weight: jnp.ndarray,  # [B] float32
    seqs: jnp.ndarray,  # [B, D, S] int32, 0xFF padded (seq 0 = backbone)
    seq_len: jnp.ndarray,  # [B, D] int32
    seq_w: jnp.ndarray,  # [B, D, S] int32 AddWeights weights
    is_sw: jnp.ndarray,  # [B, D] bool realign mode per sequence
    d_used: jnp.ndarray,  # [B] int32 real sequence count per window
    min_confidence: jnp.ndarray,  # [] float32
    min_support: jnp.ndarray,  # [] float32
    num_prune: int,
    m: int,
    x: int,
    g: int,
    a_cap: int = 32,
    p_cap: int = 16,
    d_chunk: int = 8,
):
    """The full haplotype prune cycle on device (src/window.cpp:300-396):

      prune + largest-subgraph
      x (num_prune - 1): realign all sequences -> AddWeights -> re-prune
      final backbone SW alignment -> corrected-sequence emit

    One dispatch per window batch; returns (corrected [B, L], out_len [B],
    overflow [B] bool, stats dict). Windows flagged overflow must be
    recomputed on the host (capacity fallback, the cudapoa pattern —
    SURVEY §2.4)."""
    B, E = tails.shape
    N = codes.shape[1]
    D, S = seqs.shape[1], seqs.shape[2]
    valid0 = jnp.arange(E)[None, :] < n_edges[:, None]

    st = prune_and_rebuild(
        tails, heads, weights, valid0, codes, n_nodes, avg_weight,
        min_confidence, min_support, N, a_cap, p_cap,
    )
    overflow = st["overflow"]
    seq_active = jnp.arange(D)[None, :] < d_used[:, None]  # [B, D]

    K = (D + d_chunk - 1) // d_chunk
    Dp = K * d_chunk
    pad = Dp - D

    def align_all(st):
        """Align every sequence against the current graph, chunked over D to
        bound the DP matrix footprint. Returns pairs in node-id space."""
        seqs_p = jnp.pad(seqs, ((0, 0), (0, pad), (0, 0)), constant_values=0xFF)
        slen_p = jnp.pad(seq_len, ((0, 0), (0, pad)), constant_values=1)
        sw_p = jnp.pad(is_sw, ((0, 0), (0, pad)))
        seqs_k = seqs_p.reshape(B, K, d_chunk, S).transpose(1, 0, 2, 3)
        slen_k = slen_p.reshape(B, K, d_chunk).transpose(1, 0, 2)
        sw_k = sw_p.reshape(B, K, d_chunk).transpose(1, 0, 2)

        def one(args):
            sq, sl, sw_flags = args
            p, c, sc = poa_align_mixed(
                st["codes_dp"], st["preds_dp"], st["is_sink"], st["n_sub"],
                sq, sl, sw_flags, m, x, g,
            )
            return p, c

        pairs_k, count_k = lax.map(one, (seqs_k, slen_k, sw_k))
        L = N + S + 1
        pairs = pairs_k.transpose(1, 0, 2, 3, 4).reshape(B, Dp, L, 2)[:, :D]
        count = count_k.transpose(1, 0, 2).reshape(B, Dp)[:, :D]
        pairs = ranks_to_ids(pairs, st["rank_to_node"])
        # inactive (padding) sequences contribute nothing
        pairs = jnp.where(
            seq_active[:, :, None, None], pairs, jnp.int32(-2)
        )
        return pairs, count

    for _ in range(num_prune - 1):
        pairs, count = align_all(st)
        t2, h2, w2, v2, ne2, ovf_w = add_weights_batch(
            st["tails"], st["heads"], st["weights"], st["valid"],
            st["n_edges"], pairs, seq_w, N,
        )
        overflow = overflow | ovf_w
        st2 = prune_and_rebuild(
            t2, h2, w2, v2, st["codes"], st["n_sub"], avg_weight,
            min_confidence, min_support, N, a_cap, p_cap,
        )
        overflow = overflow | st2["overflow"]
        st = st2

    # final backbone SW alignment + corrected emit (src/window.cpp:388-394)
    bb = seqs[:, :1, :]
    bb_len = seq_len[:, :1]
    bb_sw = jnp.ones((B, 1), bool)
    p_bb, c_bb, _ = poa_align_mixed(
        st["codes_dp"], st["preds_dp"], st["is_sink"], st["n_sub"],
        bb, bb_len, bb_sw, m, x, g,
    )
    p_bb = ranks_to_ids(p_bb, st["rank_to_node"])
    corrected, out_len = corrected_emit(p_bb[:, 0], st["codes"])
    return corrected, out_len, overflow, st["n_sub"]
