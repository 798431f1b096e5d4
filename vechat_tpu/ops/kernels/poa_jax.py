"""Batched sequence-to-graph DP on device (JAX/XLA).

The hot loop of the whole framework: aligns one sequence against one POA
graph for a whole batch of windows at once. Replaces the reference's SIMD DP
(vendor/spoa/src/simd_alignment_engine_implementation.hpp) with a design
matched to TPU:

* DP rows ordered by topological rank; the batch axis and the sequence axis
  vectorise onto the VPU's (8, 128) lanes; the node axis is the sequential
  grid (`lax.fori_loop`).
* The in-row horizontal-gap recurrence H[j] = max(H[j-1]+g, H[j]) is a
  prefix scan: running-max of (H[k] - k*g) plus j*g (the same trick the
  reference's SIMD engine implements with log2(lanes) shift-max steps,
  simd_alignment_engine_implementation.hpp:109-117,866-875).
* Graphs are dense, capacity-padded tensors; "no in-edges" is encoded as a
  single predecessor pointing at virtual row 0, exactly like the scalar
  reference (sisd_alignment_engine.cpp:319-321).

Traceback runs on device as a vmapped `lax.while_loop` replicating the
reference's preference order: diagonal through in-edges in slot order, then
vertical in slot order, then horizontal (sisd_alignment_engine.cpp:369-459).

Parity with the host oracle (ops/graph_align.py) is enforced by tests.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..poagraph import Alignment, PoaGraph

NEG = jnp.int32(-(2**30))


# --------------------------------------------------------------------- pack


def graph_to_dense(
    graph: PoaGraph, n_cap: int, p_cap: int
) -> Optional[dict]:
    """Pack a PoaGraph into rank-ordered dense arrays.

    Returns None when the graph exceeds (n_cap, p_cap) — caller falls back.
    Layout (all rank-ordered):
      codes[n_cap]    uint8   node character codes
      preds[n_cap,p]  int32   predecessor DP-row indices (rank+1), slot order
                              = in-edge insertion order; no-preds -> row 0;
                              padding repeats slot 0
      node_id[n_cap]  int32   rank -> original node id
      is_sink[n_cap]  bool    node has no out-edges
      n_nodes         int32
    """
    if hasattr(graph, "dense"):  # native C++ graph: fast path
        d = graph.dense(n_cap, p_cap)
        if d is None:
            return None
        return dict(
            codes=d["codes"],
            preds=np.ascontiguousarray(d["preds_pn"].T),
            node_id=d["node_id"],
            is_sink=d["is_sink"],
            n_nodes=d["n_nodes"],
        )
    n = graph.num_nodes()
    if n > n_cap:
        return None
    rank_of = graph.node_id_to_rank()
    codes = np.zeros(n_cap, dtype=np.uint8)
    preds = np.zeros((n_cap, p_cap), dtype=np.int32)
    node_id = np.zeros(n_cap, dtype=np.int32)
    is_sink = np.zeros(n_cap, dtype=bool)
    for r, v in enumerate(graph.rank_to_node):
        codes[r] = graph.codes[v]
        node_id[r] = v
        ins = graph.inedges[v]
        if len(ins) > p_cap:
            return None
        if not ins:
            preds[r, :] = 0
        else:
            first = rank_of[ins[0].tail] + 1
            preds[r, :] = first
            for s, e in enumerate(ins):
                preds[r, s] = rank_of[e.tail] + 1
        is_sink[r] = len(graph.outedges[v]) == 0
    return dict(
        codes=codes, preds=preds, node_id=node_id, is_sink=is_sink, n_nodes=n
    )


# ----------------------------------------------------------------------- DP


@functools.partial(jax.jit, static_argnames=("align_type", "m", "x", "g"))
def poa_align_batch_device(
    codes: jnp.ndarray,  # [B, N] uint8
    preds: jnp.ndarray,  # [B, N, P] int32
    node_id: jnp.ndarray,  # [B, N] int32
    is_sink: jnp.ndarray,  # [B, N] bool
    n_nodes: jnp.ndarray,  # [B] int32
    seq: jnp.ndarray,  # [B, S] uint8 (padded with 0xFF)
    seq_len: jnp.ndarray,  # [B] int32
    align_type: str,
    m: int,
    x: int,
    g: int,
):
    """Returns (pairs[B, L, 2] int32 filled back-to-front, count[B], score[B]).
    pairs rows are (node_id | -1, seq_pos | -1) in forward order starting at
    index L - count."""
    B, N, P = preds.shape
    S = seq.shape[1]
    W = S + 1
    mi, xi, gi = jnp.int32(m), jnp.int32(x), jnp.int32(g)
    jidx = jnp.arange(W, dtype=jnp.int32)

    # ---- DP matrix
    if align_type == "nw":
        H0 = jnp.broadcast_to(jidx * gi, (B, W))
    elif align_type == "ov":
        H0 = jnp.broadcast_to(jidx * gi, (B, W))
    else:  # sw
        H0 = jnp.zeros((B, W), jnp.int32)

    H = jnp.zeros((B, N + 1, W), jnp.int32)
    H = H.at[:, 0, :].set(H0)

    def step(n, H):
        code = codes[:, n]  # [B]
        prof = jnp.where(seq == code[:, None], mi, xi)  # [B, S]
        p_idx = preds[:, n, :]  # [B, P]
        pred_rows = jnp.take_along_axis(H, p_idx[:, :, None], axis=1)  # [B,P,W]
        diag = pred_rows[:, :, :-1] + prof[:, None, :]
        vert = pred_rows[:, :, 1:] + gi
        cand = jnp.max(jnp.maximum(diag, vert), axis=1)  # [B, S]
        if align_type == "nw":
            h0 = jnp.max(pred_rows[:, :, 0], axis=1) + gi  # [B]
        else:
            h0 = jnp.zeros((B,), jnp.int32)
        full = jnp.concatenate([h0[:, None], cand], axis=1)  # [B, W]
        run = lax.cummax(full - jidx * gi, axis=1) + jidx * gi
        if align_type == "sw":
            run = jnp.maximum(run, 0)
        return H.at[:, n + 1, :].set(run)

    H = lax.fori_loop(0, N, step, H)

    # ---- max cell selection: first maximal cell in (rank, j) scan order
    row_valid = jnp.arange(N)[None, :] < n_nodes[:, None]  # [B, N]
    col_valid = jnp.arange(1, W)[None, :] <= seq_len[:, None]  # [B, S]
    body = H[:, 1:, 1:]  # [B, N, S]

    if align_type == "nw":
        last = jnp.take_along_axis(
            H[:, 1:, :], seq_len[:, None, None], axis=2
        )[..., 0]  # [B, N]
        vals = jnp.where(row_valid & is_sink, last, NEG)
        max_i = jnp.argmax(vals, axis=1) + 1  # first max
        max_j = seq_len
        max_score = jnp.max(vals, axis=1)
    elif align_type == "ov":
        mask = row_valid[:, :, None] & col_valid[:, None, :] & is_sink[:, :, None]
        vals = jnp.where(mask, body, NEG).reshape(B, -1)
        flat = jnp.argmax(vals, axis=1)
        max_i = flat // S + 1
        max_j = flat % S + 1
        max_score = jnp.max(vals, axis=1)
    else:  # sw
        mask = row_valid[:, :, None] & col_valid[:, None, :]
        vals = jnp.where(mask, body, NEG).reshape(B, -1)
        flat = jnp.argmax(vals, axis=1)
        max_i = flat // S + 1
        max_j = flat % S + 1
        max_score = jnp.max(vals, axis=1)
        empty = max_score <= 0  # reference keeps max only when > 0
        max_i = jnp.where(empty, 0, max_i)
        max_j = jnp.where(empty, 0, max_j)

    max_i = max_i.astype(jnp.int32)
    max_j = max_j.astype(jnp.int32)

    # ---- traceback: batch-vectorised fixed-step walk. A vmapped while_loop
    # compiles pathologically on TPU; instead all B walks advance together in
    # one fori_loop of L steps with an active mask (finished walks no-op).
    L = N + S + 1
    bidx = jnp.arange(B)

    start_empty = (max_i == 0) & (max_j == 0)
    i0 = jnp.where(start_empty, 0, max_i)
    j0 = jnp.where(start_empty, 0, max_j)

    def cond_alive(i, j):
        if align_type == "sw":
            return H[bidx, i, j] != 0
        if align_type == "nw":
            return ~((i == 0) & (j == 0))
        return ~((i == 0) | (j == 0))

    def tb_step(_, state):
        i, j, k, active, pairs = state
        h_ij = H[bidx, i, j]  # [B]
        node = jnp.maximum(i - 1, 0)
        code = codes[bidx, node]
        jm1 = jnp.maximum(j - 1, 0)
        seq_code = seq[bidx, jm1]
        match_cost = jnp.where(seq_code == code, mi, xi)  # [B]
        p_idx = preds[bidx, node]  # [B, P]
        bcol = bidx[:, None]
        Hp_jm1 = H[bcol, p_idx, jm1[:, None]]  # [B, P]
        Hp_j = H[bcol, p_idx, j[:, None]]  # [B, P]

        diag_ok = (
            ((i != 0) & (j != 0))[:, None]
            & (h_ij[:, None] == Hp_jm1 + match_cost[:, None])
        )
        vert_ok = (i != 0)[:, None] & (h_ij[:, None] == Hp_j + gi)
        horiz_ok = (j != 0) & (h_ij == H[bidx, i, jm1] + gi)

        cands = jnp.concatenate(
            [diag_ok, vert_ok, horiz_ok[:, None]], axis=1
        )  # [B, 2P+1]
        choice = jnp.argmax(cands, axis=1)  # first true = reference order
        is_diag = choice < P
        is_vert = (choice >= P) & (choice < 2 * P)
        slot = jnp.where(is_diag, choice, choice - P)
        pred_row = jnp.take_along_axis(
            p_idx, jnp.minimum(slot, P - 1)[:, None], axis=1
        )[:, 0]

        prev_i = jnp.where(is_diag | is_vert, pred_row, i)
        prev_j = jnp.where(is_diag | (~is_vert), j - 1, j)

        pair = jnp.stack(
            [
                jnp.where(i == prev_i, -1, node_id[bidx, node]),
                jnp.where(j == prev_j, -1, j - 1),
            ],
            axis=1,
        )  # [B, 2]
        write_pos = L - 1 - k
        old = pairs[bidx, write_pos]
        pairs = pairs.at[bidx, write_pos].set(
            jnp.where(active[:, None], pair, old)
        )
        i = jnp.where(active, prev_i, i)
        j = jnp.where(active, prev_j, j)
        k = jnp.where(active, k + 1, k)
        active = active & cond_alive(i, j)
        return i, j, k, active, pairs

    pairs0 = jnp.full((B, L, 2), -2, jnp.int32)
    k0 = jnp.zeros(B, jnp.int32)
    active0 = cond_alive(i0, j0) & (~start_empty)
    _, _, count, _, pairs = lax.fori_loop(
        0, L, tb_step, (i0, j0, k0, active0, pairs0)
    )
    count = jnp.where(start_empty, 0, count)
    return pairs, count, max_score


# ------------------------------------------------------------------ backend

N_BUCKETS = (64, 128, 256, 512, 1024, 1536, 2048)
S_BUCKETS = (63, 127, 255, 511, 767)  # W = S+1 is a lane-friendly 2^k/640
P_BUCKETS = (4, 8, 16)
B_ALIGN = 8


def _bucket(v: int, buckets: Sequence[int]) -> Optional[int]:
    for b in buckets:
        if v <= b:
            return b
    return None


class JaxAlignerBackend:
    """Drop-in replacement for HostAlignerBackend that batches alignments of
    equal bucket shape onto the device. Items that exceed capacity fall back
    to the host oracle."""

    supports_graph_cycle = True  # pipeline/device_cycle.py

    def __init__(self, match: int, mismatch: int, gap: int):
        self.match = match
        self.mismatch = mismatch
        self.gap = gap
        self.t_cycle_pack = 0.0
        self.t_cycle_device = 0.0
        self.n_cycle_windows = 0
        self.n_cycle_dispatches = 0
        from ..graph_align import LinearAligner

        self._host_nw = LinearAligner("nw", match, mismatch, gap)
        self._host_sw = LinearAligner("sw", 3, -5, -4)
        self.fallbacks = 0
        self.device_alignments = 0
        self.cell_updates = 0  # DP cells computed (for GCUPS accounting)

    def _host_align(self, codes, graph, mode):
        eng = self._host_nw if mode == "nw" else self._host_sw
        return eng.align(codes, graph)

    def _scores(self, mode: str) -> Tuple[int, int, int]:
        if mode == "nw":
            return self.match, self.mismatch, self.gap
        return 3, -5, -4  # reference: src/window.cpp:326

    def align_batch(
        self, items: Sequence[Tuple[np.ndarray, PoaGraph, str]]
    ) -> List[Alignment]:
        results: List[Optional[Alignment]] = [None] * len(items)
        # group indices by (mode, n_bucket, s_bucket, p_bucket)
        groups = {}
        for idx, (codes, graph, mode) in enumerate(items):
            nn = graph.num_nodes()
            sl = len(codes)
            if nn == 0 or sl == 0:
                results[idx] = []
                continue
            if hasattr(graph, "max_in_degree"):
                max_deg = graph.max_in_degree()
            else:
                max_deg = max((len(ins) for ins in graph.inedges), default=0)
            nb = _bucket(nn, N_BUCKETS)
            sb = _bucket(sl, S_BUCKETS)
            pb = _bucket(max(max_deg, 1), P_BUCKETS)
            if nb is None or sb is None or pb is None:
                self.fallbacks += 1
                results[idx] = self._host_align(codes, graph, mode)
                continue
            groups.setdefault((mode, nb, sb, pb), []).append(idx)

        for (mode, nb, sb, pb), idxs in groups.items():
            self._run_group(items, results, idxs, mode, nb, sb, pb)

        return results  # type: ignore

    # ~1 GiB of int32 DP cells per device dispatch
    MAX_CELLS_PER_CALL = 1 << 28
    B_SIZES = (8, 16, 32, 64, 128, 256)

    def _run_group(self, items, results, idxs, mode, nb, sb, pb):
        cells_per_item = (nb + 1) * (sb + 1)
        max_b = max(1, min(256, self.MAX_CELLS_PER_CALL // cells_per_item))
        for off in range(0, len(idxs), max_b):
            self._run_chunk(items, results, idxs[off : off + max_b], mode, nb, sb, pb)

    def _run_chunk(self, items, results, idxs, mode, nb, sb, pb):
        B = len(idxs)
        B = _bucket(B, self.B_SIZES) or len(idxs)
        codes_arr = np.zeros((B, nb), dtype=np.uint8)
        preds_arr = np.zeros((B, nb, pb), dtype=np.int32)
        node_id_arr = np.zeros((B, nb), dtype=np.int32)
        sink_arr = np.ones((B, nb), dtype=bool)
        # padded batch slots run a trivial 1-node/1-base alignment
        nn_arr = np.ones(B, dtype=np.int32)
        seq_arr = np.full((B, sb), 0xFF, dtype=np.uint8)
        seq_arr[:, 0] = 0
        sl_arr = np.ones(B, dtype=np.int32)

        dense_ok = []
        for bi, idx in enumerate(idxs):
            codes, graph, _ = items[idx]
            d = graph_to_dense(graph, nb, pb)
            if d is None:
                self.fallbacks += 1
                results[idx] = self._host_align(codes, graph, mode)
                continue
            dense_ok.append((bi, idx))
            codes_arr[bi] = d["codes"]
            preds_arr[bi] = d["preds"]
            node_id_arr[bi] = d["node_id"]
            sink_arr[bi] = d["is_sink"]
            nn_arr[bi] = d["n_nodes"]
            seq_arr[bi, : len(codes)] = codes
            sl_arr[bi] = len(codes)

        if not dense_ok:
            return
        m, x, g = self._scores(mode)
        pairs, count, _ = poa_align_batch_device(
            jnp.asarray(codes_arr),
            jnp.asarray(preds_arr),
            jnp.asarray(node_id_arr),
            jnp.asarray(sink_arr),
            jnp.asarray(nn_arr),
            jnp.asarray(seq_arr),
            jnp.asarray(sl_arr),
            align_type=mode,
            m=m,
            x=x,
            g=g,
        )
        pairs = np.asarray(pairs)
        count = np.asarray(count)
        L = pairs.shape[1]
        for bi, idx in dense_ok:
            c = int(count[bi])
            aln = [tuple(int(v) for v in row) for row in pairs[bi, L - c :]]
            results[idx] = aln
            self.device_alignments += 1
            self.cell_updates += int(nn_arr[bi]) * int(sl_arr[bi])
