"""Production aligner backend: Pallas DP kernel + batched XLA walk.

Groups alignment items by (mode, graph) so that multiple sequences aligned
against the same graph share one kernel instance (sublane axis D), then
buckets graphs by (node capacity, in-degree, sequence width) to bound
recompilation. Falls back to the host oracle for out-of-capacity items.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from ..graph_align import LinearAligner
from ..poagraph import Alignment, PoaGraph
from .poa_jax import graph_to_dense

N_BUCKETS = (128, 256, 512, 640, 1024, 2048)
W_BUCKETS = (128, 256, 512, 768)
P_BUCKETS = (4, 8, 16)
D_CHOICES = (8, 4, 2, 1)
VMEM_BUDGET = 13 * 1024 * 1024  # combo H scratch + pipelined out chunks
DIR_HBM_BUDGET = 1 << 30  # bytes of combo tensor per dispatch


def _bucket(v: int, buckets) -> Optional[int]:
    for b in buckets:
        if v <= b:
            return b
    return None


def _d_cap(n: int, w: int) -> int:
    # per-window VMEM: H scratch (N+1 combo rows, int32) + 2 pipelined
    # CH-row output chunks (ops/kernels/poa_pallas.py ROW_CHUNK)
    rows = (n + 1) + 2 * 64
    for d in D_CHOICES:
        if rows * d * w * 4 <= VMEM_BUDGET:
            return d
    return 1


class PallasAlignerBackend:
    """Drop-in batch aligner running the Pallas kernel on device."""

    def __init__(self, match: int, mismatch: int, gap: int, interpret: bool = False):
        self.match = match
        self.mismatch = mismatch
        self.gap = gap
        self.interpret = interpret
        self._host_nw = LinearAligner("nw", match, mismatch, gap)
        self._host_sw = LinearAligner("sw", 3, -5, -4)  # src/window.cpp:326
        self.fallbacks = 0
        self.device_alignments = 0
        self.cell_updates = 0
        self._dense_cache: Dict[Tuple[int, int, int], Optional[dict]] = {}
        self._pairwise = None

    def edit_align_batch(self, pairs):
        """Overlap alignment on device (anchor-tiled NW kernel); the Polisher
        picks this up via duck typing (pipeline/polisher.py)."""
        if self._pairwise is None:
            from .pairwise_pallas import DevicePairwiseAligner

            self._pairwise = DevicePairwiseAligner(interpret=self.interpret)
        return self._pairwise.edit_align_batch(pairs)

    def _scores(self, mode: str) -> Tuple[int, int, int]:
        if mode == "nw":
            return self.match, self.mismatch, self.gap
        return 3, -5, -4

    def _host_align(self, codes, graph, mode):
        if hasattr(graph, "align_host"):
            m, x, g = self._scores(mode)
            return graph.align_host(codes, mode, m, x, g)
        eng = self._host_nw if mode == "nw" else self._host_sw
        return eng.align(codes, graph)

    def _dense(self, graph: PoaGraph, nb: int, pb: int) -> Optional[dict]:
        key = (id(graph), nb, pb)
        d = self._dense_cache.get(key)
        if d is None and key not in self._dense_cache:
            d = graph_to_dense(graph, nb, pb)
            self._dense_cache[key] = d
            if len(self._dense_cache) > 4096:
                self._dense_cache.clear()
        return d

    # below this many alignments a device dispatch costs more than the native
    # host aligner (tunnel round-trip ~50ms vs ~1ms/alignment on host)
    MIN_DEVICE_ITEMS = 24

    def align_batch(
        self, items: Sequence[Tuple[np.ndarray, PoaGraph, str]]
    ) -> List[Alignment]:
        if not self.interpret and len(items) < self.MIN_DEVICE_ITEMS:
            return [
                [] if (g.num_nodes() == 0 or len(c) == 0) else self._host_align(c, g, m)
                for c, g, m in items
            ]
        results: List[Optional[Alignment]] = [None] * len(items)
        # cache is only safe within one call: graph objects mutate between
        # calls and ids can be recycled by the GC
        self._dense_cache.clear()

        # group by (mode, graph), preserving order within groups
        graph_groups: Dict[Tuple[str, int], List[int]] = {}
        graph_of: Dict[int, PoaGraph] = {}
        for idx, (codes, graph, mode) in enumerate(items):
            if graph.num_nodes() == 0 or len(codes) == 0:
                results[idx] = []
                continue
            key = (mode, id(graph))
            graph_groups.setdefault(key, []).append(idx)
            graph_of[id(graph)] = graph

        # classify each (graph, its item indices) into shape buckets
        buckets: Dict[Tuple[str, int, int, int, int], List[Tuple[PoaGraph, List[int]]]] = {}
        for (mode, gid), idxs in graph_groups.items():
            graph = graph_of[gid]
            nn = graph.num_nodes()
            if hasattr(graph, "max_in_degree"):
                max_deg = graph.max_in_degree()
            else:
                max_deg = max((len(ins) for ins in graph.inedges), default=0)
            max_sl = max(len(items[i][0]) for i in idxs)
            nb = _bucket(nn, N_BUCKETS)
            pb = _bucket(max(max_deg, 1), P_BUCKETS)
            wb = _bucket(max_sl + 1, W_BUCKETS)
            ok = nb is not None and pb is not None and wb is not None
            if ok:
                dcap = _d_cap(nb, wb)
                # split this graph's items into D-sized chunks
                for off in range(0, len(idxs), dcap):
                    chunk = idxs[off : off + dcap]
                    buckets.setdefault((mode, nb, pb, wb, dcap), []).append(
                        (graph, chunk)
                    )
            else:
                for i in idxs:
                    self.fallbacks += 1
                    results[i] = self._host_align(items[i][0], graph, mode)

        for (mode, nb, pb, wb, dcap), entries in buckets.items():
            max_b = max(1, DIR_HBM_BUDGET // ((nb + 1 + 63) * dcap * wb * 4))
            for off in range(0, len(entries), max_b):
                self._run_chunk(
                    items, results, entries[off : off + max_b], mode, nb, pb, wb, dcap
                )

        return results  # type: ignore

    def _run_chunk(self, items, results, entries, mode, nb, pb, wb, dcap):
        from .poa_pallas import poa_align_pallas

        B = len(entries)
        # pad B to a small set of sizes to bound compilation
        B_pad = 1
        while B_pad < B:
            B_pad *= 2
        B_pad = min(B_pad, max(B, 1))
        for cand in (1, 2, 4, 8, 16, 32, 64, 128, 256):
            if cand >= B:
                B_pad = cand
                break
        else:
            B_pad = B

        codes = np.zeros((B_pad, 1, nb), np.int32)
        preds = np.zeros((B_pad, pb, nb), np.int32)
        sink = np.ones((B_pad, 1, nb), np.int32)
        nid = np.zeros((B_pad, 1, nb), np.int32)
        nn = np.ones((B_pad, 1, 1), np.int32)
        seqp = np.full((B_pad, dcap, wb), 0xFF, np.int32)
        seqp[:, :, 1] = 0
        slen = np.ones((B_pad, 1, dcap), np.int32)

        packed = []  # (batch slot, [item idx per d])
        for b, (graph, idxs) in enumerate(entries):
            d = self._dense(graph, nb, pb)
            if d is None:
                for i in idxs:
                    self.fallbacks += 1
                    results[i] = self._host_align(items[i][0], graph, mode)
                continue
            codes[b, 0] = d["codes"]
            preds[b] = d["preds"].T
            sink[b, 0] = d["is_sink"].astype(np.int32)
            nid[b, 0] = d["node_id"]
            nn[b, 0, 0] = d["n_nodes"]
            for di, i in enumerate(idxs):
                q = items[i][0]
                seqp[b, di, 1 : 1 + len(q)] = q
                seqp[b, di, 1 + len(q) :] = 0xFF
                slen[b, 0, di] = len(q)
            packed.append((b, idxs))

        if not packed:
            return
        m, x, g = self._scores(mode)
        pn, pp, count, _ = poa_align_pallas(
            jnp.asarray(codes),
            jnp.asarray(preds),
            jnp.asarray(sink),
            jnp.asarray(nid),
            jnp.asarray(nn),
            jnp.asarray(seqp),
            jnp.asarray(slen),
            align_type=mode,
            m=m,
            x=x,
            g=g,
            interpret=self.interpret,
        )
        pn = np.asarray(pn)
        pp = np.asarray(pp)
        count = np.asarray(count)
        L = pn.shape[2]
        for b, idxs in packed:
            for di, i in enumerate(idxs):
                c = int(count[b, 0, di])
                aln = list(
                    zip(pn[b, di, L - c :].tolist(), pp[b, di, L - c :].tolist())
                )
                results[i] = aln
                self.device_alignments += 1
                self.cell_updates += int(nn[b, 0, 0]) * int(slen[b, 0, di])
