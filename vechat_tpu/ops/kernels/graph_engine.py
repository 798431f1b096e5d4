"""Device (Pallas) drop-in for the host graph-alignment engines.

`PallasGraphEngine` mirrors the `align(codes, graph, return_score)` API of
`ops/graph_align.py`'s Linear/Affine/ConvexAligner but dispatches to the
matching TPU kernel (poa_pallas / poa_pallas_affine / poa_pallas_convex),
with subtype selection identical to spoa::AlignmentEngine::Create
(vendor/spoa/src/alignment_engine.cpp:57-66). Falls back to the host oracle
when the graph exceeds kernel capacity (node/pred/width buckets or int16
score range) — the cudapoa-refusal analog.

Built for the spoa-CLI surface (single growing graph, one sequence at a
time, B=1 D=1); the correction hot path uses the batched
`ops/kernels/backend.py` instead.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..graph_align import make_engine
from ..poagraph import PoaGraph
from .backend import N_BUCKETS, P_BUCKETS, W_BUCKETS, _bucket
from .poa_jax import graph_to_dense
from .poa_pallas import ranks_to_node_ids_np


class PallasGraphEngine:
    def __init__(
        self,
        align_type: str,
        m: int,
        n: int,
        g: int,
        e: Optional[int] = None,
        q: Optional[int] = None,
        c: Optional[int] = None,
        interpret: bool = False,
    ):
        self.type = align_type
        self.m, self.n = int(m), int(n)
        self.g = int(g)
        self.e = int(g if e is None else e)
        self.q = int(g if q is None else q)
        self.c = int(self.e if c is None else c)
        self.interpret = interpret
        self.host = make_engine(align_type, m, n, g, e, q, c)
        if self.g >= self.e:
            self.subtype = "linear"
        elif self.g <= self.q or self.e >= self.c:
            self.subtype = "affine"
        else:
            self.subtype = "convex"
        self.device_alignments = 0
        self.fallbacks = 0

    def _fits(self, nb: int, wb: int) -> bool:
        if self.subtype == "linear":
            from .poa_pallas import fits_int16

            return fits_int16(nb, wb, self.m, self.n, self.g)
        if self.subtype == "affine":
            from .poa_pallas_affine import fits_int16_affine

            return fits_int16_affine(nb, wb, self.m, self.n, self.g, self.e)
        from .poa_pallas_convex import P_CAP, fits_int16_convex  # noqa: F401

        return fits_int16_convex(
            nb, wb, self.m, self.n, self.g, self.e, self.q, self.c
        )

    def align(self, seq_codes, graph: PoaGraph, return_score: bool = False):
        codes = np.asarray(seq_codes)
        nn = graph.num_nodes()
        if nn == 0 or len(codes) == 0:
            return ([], 0) if return_score else []
        if hasattr(graph, "max_in_degree"):
            max_deg = graph.max_in_degree()
        else:
            max_deg = max((len(ins) for ins in graph.inedges), default=0)
        nb = _bucket(nn, N_BUCKETS)
        pb = _bucket(max(max_deg, 1), P_BUCKETS)
        wb = _bucket(len(codes) + 1, W_BUCKETS)
        if self.subtype == "convex":
            from .poa_pallas_convex import P_CAP

            if pb is not None and pb > P_CAP:
                pb = None
        ok = nb is not None and pb is not None and wb is not None
        if ok:
            ok = self._fits(nb, wb)
        d = graph_to_dense(graph, nb, pb) if ok else None
        if d is None:
            self.fallbacks += 1
            return self.host.align(codes, graph, return_score=return_score)

        import jax.numpy as jnp

        B, D = 1, 1
        cb = np.zeros((B, 1, nb), np.int32)
        preds = np.zeros((B, pb, nb), np.int32)
        sink = np.zeros((B, 1, nb), np.int32)
        nid = np.zeros((B, 1, nb), np.int32)
        nnb = np.zeros((B, 1, 1), np.int32)
        seqp = np.full((B, D, wb), 0xFF, np.int32)
        slen = np.ones((B, 1, D), np.int32)
        cb[0, 0] = d["codes"]
        preds[0] = d["preds"].T
        sink[0, 0] = d["is_sink"].astype(np.int32)
        nid[0, 0] = d["node_id"]
        nnb[0, 0, 0] = d["n_nodes"]
        seqp[0, 0, 1 : 1 + len(codes)] = codes
        slen[0, 0, 0] = len(codes)
        args = (
            jnp.asarray(cb), jnp.asarray(preds), jnp.asarray(sink),
            jnp.asarray(nid), jnp.asarray(nnb), jnp.asarray(seqp),
            jnp.asarray(slen),
        )
        if self.subtype == "linear":
            from .poa_pallas import poa_align_pallas

            pn, pp, count, score = poa_align_pallas(
                *args, align_type=self.type, m=self.m, x=self.n, g=self.g,
                interpret=self.interpret, emit_node_ids=False,
            )
        elif self.subtype == "affine":
            from .poa_pallas_affine import poa_align_pallas_affine

            pn, pp, count, score = poa_align_pallas_affine(
                *args, align_type=self.type, m=self.m, x=self.n, g=self.g,
                e=self.e, interpret=self.interpret, emit_node_ids=False,
            )
        else:
            from .poa_pallas_convex import poa_align_pallas_convex

            pn, pp, count, score = poa_align_pallas_convex(
                *args, align_type=self.type, m=self.m, x=self.n, g=self.g,
                e=self.e, q=self.q, c=self.c, interpret=self.interpret,
                emit_node_ids=False,
            )
        self.device_alignments += 1
        pn = np.asarray(pn)
        pp = np.asarray(pp)
        cnt = int(np.asarray(count)[0, 0, 0])
        L = pn.shape[2]
        seg = ranks_to_node_ids_np(pn[0, 0, L - cnt :], nid[0, 0])
        aln = list(zip(seg.tolist(), pp[0, 0, L - cnt :].tolist()))
        if return_score:
            return aln, int(np.asarray(score)[0, 0, 0])
        return aln

    __call__ = align
