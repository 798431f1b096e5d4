"""Sequence-to-graph alignment — host oracle (linear / affine gap models).

Reimplements the semantics of the reference's scalar DP engine
(vendor/spoa/src/sisd_alignment_engine.cpp) with numpy-vectorised rows and an
exact Python traceback. Device implementations (JAX / Pallas) are verified
against this module.

Alignment types: 'nw' (global), 'sw' (local), 'ov' (semi-global), matching
spoa::AlignmentType kNW/kSW/kOV. The gap model is selected like
spoa::AlignmentEngine::Create (alignment_engine.cpp:57-66): linear iff g >= e.

Tie-break rules preserved exactly (sisd_alignment_engine.cpp:292-459):
* the maximum-score cell is the FIRST maximal cell in (rank, j) order
  (strict '<' update);
* traceback prefers diagonal moves through in-edges in insertion order, then
  vertical (graph-gap) moves in the same order, then the horizontal move.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .poagraph import Alignment, PoaGraph

NEG_INF = np.int32(np.iinfo(np.int32).min + 1024)  # kNegativeInfinity


def worst_case_score(i: int, j: int, m: int, g: int, e: int, q: int, c: int) -> int:
    """reference: alignment_engine.cpp:101-110."""

    def gap_score(length: int) -> int:
        if length == 0:
            return 0
        return min(g + (length - 1) * e, q + (length - 1) * c)

    return min(-1 * (m * min(i, j) + gap_score(abs(i - j))), gap_score(i) + gap_score(j))


class LinearAligner:
    """Linear-gap sequence-to-graph aligner (subtype kLinear)."""

    def __init__(self, align_type: str, m: int, n: int, g: int):
        assert align_type in ("nw", "sw", "ov")
        if g > 0:
            raise ValueError("gap penalty must be non-positive")
        self.type = align_type
        self.m = int(m)
        self.n = int(n)
        self.g = int(g)

    def align(
        self,
        seq_codes: np.ndarray,
        graph: PoaGraph,
        return_score: bool = False,
    ):
        seq_codes = np.asarray(seq_codes)
        self._seq = seq_codes
        W = len(seq_codes) + 1
        nn = graph.num_nodes()
        if nn == 0 or W == 1:
            return ([], 0) if return_score else []
        if (
            worst_case_score(len(seq_codes), nn, self.m, self.g, self.g, self.g, self.g)
            < NEG_INF
        ):
            raise ValueError("possible score overflow")

        g = np.int32(self.g)
        rank_to_node = graph.rank_to_node
        rank_of = graph.node_id_to_rank()

        H = np.zeros((nn + 1, W), dtype=np.int32)
        # row 0 / column 0 init (sisd_alignment_engine.cpp:180-253)
        if self.type == "nw":
            H[0, :] = np.arange(W, dtype=np.int32) * g
            for v in rank_to_node:
                i = rank_of[v] + 1
                ins = graph.inedges[v]
                if not ins:
                    pen = np.int32(0)
                else:
                    pen = NEG_INF
                    for e in ins:
                        pen = max(pen, H[rank_of[e.tail] + 1, 0])
                H[i, 0] = pen + g
        elif self.type == "ov":
            H[0, :] = np.arange(W, dtype=np.int32) * g
            H[1:, 0] = 0
        # sw: all zeros already

        jgrid = np.arange(W, dtype=np.int64) * int(g)
        max_score = np.int32(0) if self.type == "sw" else NEG_INF
        max_i = 0
        max_j = 0

        # profile rows per code, computed lazily
        profile_cache = {}

        def profile(code: int) -> np.ndarray:
            p = profile_cache.get(code)
            if p is None:
                p = np.where(seq_codes == code, np.int32(self.m), np.int32(self.n))
                profile_cache[code] = p
            return p

        for v in rank_to_node:
            i = rank_of[v] + 1
            prof = profile(graph.codes[v])
            ins = graph.inedges[v]
            pred_rows = [0] if not ins else [rank_of[e.tail] + 1 for e in ins]

            row = None
            for p in pred_rows:
                cand = np.maximum(H[p, :-1] + prof, H[p, 1:] + g)
                row = cand if row is None else np.maximum(row, cand)

            # in-row horizontal pass: H[j] = max(H[j-1]+g, H[j]) left to right
            # == running max of (value[k] - k*g) + j*g (g<=0, associative)
            full = np.empty(W, dtype=np.int64)
            full[0] = int(H[i, 0])
            full[1:] = row.astype(np.int64)
            run = np.maximum.accumulate(full - jgrid) + jgrid
            if self.type == "sw":
                run = np.maximum(run, 0)
            H[i, 1:] = run[1:].astype(np.int32)

            # max-score update, first maximal cell in scan order wins
            if self.type == "sw":
                jbest = int(np.argmax(H[i, 1:])) + 1
                if max_score < H[i, jbest]:
                    max_score, max_i, max_j = H[i, jbest], i, jbest
            elif self.type == "nw":
                if not graph.outedges[v] and max_score < H[i, W - 1]:
                    max_score, max_i, max_j = H[i, W - 1], i, W - 1
            else:  # ov
                if not graph.outedges[v]:
                    jbest = int(np.argmax(H[i, 1:])) + 1
                    if max_score < H[i, jbest]:
                        max_score, max_i, max_j = H[i, jbest], i, jbest

        if max_i == 0 and max_j == 0:
            return ([], int(max_score)) if return_score else []

        alignment = self._traceback(H, graph, rank_to_node, rank_of, max_i, max_j)
        if return_score:
            return alignment, int(max_score)
        return alignment

    def _traceback(self, H, graph, rank_to_node, rank_of, i, j) -> Alignment:
        """reference: sisd_alignment_engine.cpp:369-459."""
        g = self.g
        W = H.shape[1]
        alignment: Alignment = []
        prev_i = 0
        prev_j = 0

        def keep_going() -> bool:
            if self.type == "sw":
                return H[i, j] != 0
            if self.type == "nw":
                return not (i == 0 and j == 0)
            return not (i == 0 or j == 0)

        while keep_going():
            h_ij = H[i, j]
            found = False

            if i != 0 and j != 0:
                v = rank_to_node[i - 1]
                code = graph.codes[v]
                match_cost = self.m if code == self._seq_code(j) else self.n
                preds = (
                    [0]
                    if not graph.inedges[v]
                    else [rank_of[e.tail] + 1 for e in graph.inedges[v]]
                )
                for p in preds:
                    if h_ij == H[p, j - 1] + match_cost:
                        prev_i, prev_j, found = p, j - 1, True
                        break

            if not found and i != 0:
                v = rank_to_node[i - 1]
                preds = (
                    [0]
                    if not graph.inedges[v]
                    else [rank_of[e.tail] + 1 for e in graph.inedges[v]]
                )
                for p in preds:
                    if h_ij == H[p, j] + g:
                        prev_i, prev_j, found = p, j, True
                        break

            if not found and h_ij == H[i, j - 1] + g:
                prev_i, prev_j, found = i, j - 1, True

            alignment.append(
                (
                    -1 if i == prev_i else rank_to_node[i - 1],
                    -1 if j == prev_j else j - 1,
                )
            )
            i, j = prev_i, prev_j

        alignment.reverse()
        return alignment

    def _seq_code(self, j: int) -> int:
        return int(self._seq[j - 1])

    __call__ = align


def make_engine(align_type: str, m: int, n: int, g: int, e: Optional[int] = None):
    """Factory mirroring spoa::AlignmentEngine::Create: linear iff g >= e
    (alignment_engine.cpp:57-66)."""
    if e is None:
        e = g
    if g >= e:
        return LinearAligner(align_type, m, n, g)
    raise NotImplementedError("affine/convex engines land with the spoa-CLI parity work")
