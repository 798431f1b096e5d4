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

# COARSE ladders: the kernel predicates away rows beyond the real node
# count (dp_body's pl.when), so nb padding costs little compute — while
# every extra bucket fragments batches into more dispatches (a ~0.3 s
# tunnel round-trip each here) and adds a ~300 s remote compile
N_BUCKETS = (256, 640, 1152, 2048)
W_BUCKETS = (128, 320, 576, 768)
P_BUCKETS = (4, 8, 16)
# H-ring sizes: POA graphs from overlapping reads keep predecessor
# rank-distance small, so a short ring usually holds and frees VMEM for a
# deeper D (poa_pallas.py module docstring). Max ring 511: the predecessor
# delta must fit the kernel's 9-bit field (poa_pallas.DELTA_BITS)
R_BUCKETS = (64, 128, 256, 511)
D_CHOICES = (64, 48, 32, 16, 8, 4, 2, 1)
VMEM_BUDGET = 13 * 1024 * 1024
DIR_HBM_BUDGET = 1 << 30  # bytes of direction tensor per dispatch


def _bucket(v: int, buckets) -> Optional[int]:
    for b in buckets:
        if v <= b:
            return b
    return None


def _d_cap(ring_rows: int, w: int) -> int:
    # per-window VMEM bytes/(D*W): H int16 ring (2*(R+1)) + PROF table (64)
    # + BESTC (4) + 2 pipelined int16 out chunks (2*2*ROW_CHUNK) + seqp (4)
    from .poa_pallas import ROW_CHUNK

    per_dw = 2 * ring_rows + 16 * 4 + 4 + 2 * 2 * ROW_CHUNK + 4
    for d in D_CHOICES:
        if per_dw * d * w <= VMEM_BUDGET:
            return d
    return 1


class PallasAlignerBackend:
    """Drop-in batch aligner running the Pallas kernel on device."""

    # the haplotype prune cycle runs device-resident for this backend
    # (pipeline/device_cycle.py)
    supports_graph_cycle = True

    def __init__(self, match: int, mismatch: int, gap: int, interpret: bool = False):
        self.match = match
        self.mismatch = mismatch
        self.gap = gap
        self.interpret = interpret
        # device prune-cycle stage timers (pipeline/device_cycle.py)
        self.t_cycle_pack = 0.0
        self.t_cycle_device = 0.0
        self.n_cycle_windows = 0
        self.n_cycle_dispatches = 0
        self._host_nw = LinearAligner("nw", match, mismatch, gap)
        self._host_sw = LinearAligner("sw", 3, -5, -4)  # src/window.cpp:326
        self.fallbacks = 0
        self.device_alignments = 0
        self.cell_updates = 0
        # stage timers (observability: where does align_batch wall go?)
        self.t_pack = 0.0  # dense conversion + batch array fill
        self.t_device = 0.0  # dispatch + device execution + fetch
        self.t_decode = 0.0  # pairs -> Alignment decode
        self.t_host_fb = 0.0  # host-fallback alignments
        self.n_dispatches = 0
        self.n_calls = 0
        self._dense_cache: Dict[Tuple[int, int, int], Optional[dict]] = {}
        self._pairwise = None
        # multi-chip: shard window batches across the local mesh
        # (reference analog: per-GPU batches, src/cuda/cudapolisher.cpp:166-181)
        import jax

        self._n_dev = len(jax.devices())
        self._mesh = None
        self._sharded_fns: Dict[Tuple, object] = {}

    def _sharded_fn(self, mode: str, ring: int = 0):
        key = (mode, *self._scores(mode), self.interpret, ring)
        fn = self._sharded_fns.get(key)
        if fn is None:
            from ...parallel.mesh import make_mesh, sharded_poa_align_pallas

            if self._mesh is None:
                self._mesh = make_mesh()
            m, x, g = self._scores(mode)
            fn = sharded_poa_align_pallas(
                self._mesh,
                mode,
                m,
                x,
                g,
                interpret=self.interpret,
                ring=ring,
                emit_node_ids=False,
            )
            self._sharded_fns[key] = fn
        return fn

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
        import time as _time

        self.n_calls += 1
        if not self.interpret and len(items) < self.MIN_DEVICE_ITEMS:
            _t0 = _time.perf_counter()
            out = [
                [] if (g.num_nodes() == 0 or len(c) == 0) else self._host_align(c, g, m)
                for c, g, m in items
            ]
            self.t_host_fb += _time.perf_counter() - _t0
            return out
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
                # kernel stores DP values as int16 (the reference's precision
                # selection, simd_alignment_engine_implementation.hpp:684-725);
                # out-of-range score configs go to the host oracle
                from .poa_pallas import fits_int16

                ok = fits_int16(nb, wb, *self._scores(mode))
            d = self._dense(graph, nb, pb) if ok else None
            rb = None
            if d is not None:
                # H-ring size: smallest bucket covering this graph's max
                # predecessor rank-distance. 0 = full history, only valid
                # when every delta fits the 9-bit field (nb <= max bucket);
                # graphs with larger reach go to the host oracle
                from .poa_pallas import max_pred_distance

                dist = max_pred_distance(d["preds"], d["n_nodes"])
                rb = next((r for r in R_BUCKETS if dist <= r < nb), None)
                if rb is None and nb <= R_BUCKETS[-1]:
                    rb = 0
                if rb is None and dist <= R_BUCKETS[-1]:
                    rb = R_BUCKETS[-1]
            if rb is not None:
                buckets.setdefault((mode, nb, pb, wb), []).append(
                    (graph, idxs, rb)
                )
            else:
                for i in idxs:
                    self.fallbacks += 1
                    results[i] = self._host_align(items[i][0], graph, mode)

        # two phases: dispatch every chunk (async — jax returns device
        # arrays immediately), THEN fetch+decode. Overlapping the h2d of
        # chunk i+1 with the execute/d2h of chunk i hides part of the
        # ~10 MB/s tunnel's transfer time.
        #
        # One ring per GROUP, not per graph: the group takes the largest
        # member ring (0 = full history = nb rows, the largest) so graphs
        # with different predecessor reach share one dispatch — per-graph
        # rings fragmented the build phase into ~3x more dispatches, and on
        # this machine each dispatch costs a ~0.3 s tunnel round-trip
        pending = []
        for (mode, nb, pb, wb), group in buckets.items():
            eff = max((rb if rb else nb) for _, _, rb in group)
            rb_g = 0 if eff >= nb else eff
            dcap = _d_cap(eff + 1, wb)
            entries = []
            for graph, idxs, _ in group:
                for off in range(0, len(idxs), dcap):
                    entries.append((graph, idxs[off : off + dcap]))
            max_b = max(1, DIR_HBM_BUDGET // ((nb + 1 + 63) * dcap * wb * 2))
            for off in range(0, len(entries), max_b):
                p = self._run_chunk(
                    items,
                    results,
                    entries[off : off + max_b],
                    mode,
                    nb,
                    pb,
                    wb,
                    dcap,
                    rb_g,
                )
                if p is not None:
                    pending.append(p)
        # three-phase fetch: per-chunk synchronous fetches serialize the
        # tunnel's ~24 ms d2h latency (3 fetches x hundreds of chunks was
        # the dominant cost of the warm device e2e). Phase 1 starts the
        # small meta fetches (steps/count) for EVERY chunk asynchronously;
        # phase 2 slices each runs buffer to its used rows (steps is local
        # by then) and starts those fetches; phase 3 decodes — each
        # np.asarray then finds its bytes already on host.
        for p in pending:
            self._start_meta_fetch(p)
        pending = [self._start_runs_fetch(p) for p in pending]
        for p in pending:
            self._finish_chunk(items, results, p)

        return results  # type: ignore

    @staticmethod
    def _async(arr):
        try:
            arr.copy_to_host_async()
        except Exception:  # noqa: BLE001 — platform without async d2h
            pass

    def _start_meta_fetch(self, pending):
        kind, a1, a2, count = pending[:4]
        if kind == "rle":
            self._async(a2)
        self._async(count)

    def _start_runs_fetch(self, pending):
        import time as _time

        kind, a1, a2, count = pending[:4]
        if kind != "rle":
            self._async(a1)
            self._async(a2)
            return pending
        _t0 = _time.perf_counter()
        steps = int(a2)
        runs = a1[:steps] if steps else None
        if runs is not None:
            self._async(runs)
        self.t_device += _time.perf_counter() - _t0
        return (kind, runs, steps, count) + pending[4:]

    def _run_chunk(self, items, results, entries, mode, nb, pb, wb, dcap, rb=0):
        from .poa_pallas import poa_align_pallas

        B = len(entries)
        # pad B to a SMALL ladder: every distinct B is a distinct XLA
        # compile (~300 s each through this machine's remote-compile
        # tunnel — measured scripts/prof_pipeline.py), and grid-step
        # padding waste is bounded by the ladder ratio; multi-chip
        # batches must also divide by the mesh size (shard_map requirement)
        for cand in (8, 64, 256):
            if cand >= B:
                B_pad = cand
                break
        else:
            B_pad = B
        if self._n_dev > 1:
            B_pad = -(-B_pad // self._n_dev) * self._n_dev

        import time as _time

        _t0 = _time.perf_counter()
        # D sized to the chunk's real item count, not the VMEM cap: the
        # incremental build phase carries ~1 sequence per graph per call,
        # and padded D lanes multiply BOTH the seqp upload and the pn/pp
        # pair-buffer fetch (at dcap=48 the padding was ~96% of the bytes)
        d_used = max(len(idxs) for _, idxs in entries)
        for dl in (1, 2, 4, 8, 16, 32):
            if dl >= d_used:
                d_used = dl
                break
        dcap = min(d_used, dcap)
        # narrowest wire dtypes (the tunnel to this machine's TPU moves
        # ~10 MB/s, so input bytes ARE the dispatch cost; the kernel
        # wrapper upcasts on device): uint8 codes/sink; uint8 DELTA-coded
        # preds when the ring bounds distances under the 255 sentinel
        # (rings 64/128 — the common buckets), int16 rows otherwise
        delta_preds = not self._n_dev > 1 and 0 < rb <= 254
        codes = np.zeros((B_pad, 1, nb), np.uint8)
        preds = np.zeros(
            (B_pad, pb, nb), np.uint8 if delta_preds else np.int16
        )
        sink = np.ones((B_pad, 1, nb), np.uint8)
        nid = np.zeros((B_pad, 1, nb), np.int16)
        nn = np.ones((B_pad, 1, 1), np.int32)
        seqp = np.full((B_pad, dcap, wb), 0xFF, np.uint8)
        seqp[:, :, 1] = 0
        slen = np.ones((B_pad, 1, dcap), np.int32)
        if delta_preds:
            # padding slots must decode as the row-0 boundary
            preds[:] = 255

        packed = []  # (batch slot, [item idx per d])
        rows_col = np.arange(1, nb + 1, dtype=np.int64)[:, None]
        for b, (graph, idxs) in enumerate(entries):
            d = self._dense(graph, nb, pb)
            if d is None:
                for i in idxs:
                    self.fallbacks += 1
                    results[i] = self._host_align(items[i][0], graph, mode)
                continue
            codes[b, 0] = d["codes"]
            pr = d["preds"]  # [nb, pb] DP rows, 0 = boundary
            if delta_preds:
                preds[b] = np.where(pr == 0, 255, rows_col - pr).T
            else:
                preds[b] = pr.T
            sink[b, 0] = d["is_sink"].astype(np.uint8)
            nid[b, 0] = d["node_id"]
            nn[b, 0, 0] = d["n_nodes"]
            for di, i in enumerate(idxs):
                q = items[i][0]
                seqp[b, di, 1 : 1 + len(q)] = q
                seqp[b, di, 1 + len(q) :] = 0xFF
                slen[b, 0, di] = len(q)
            packed.append((b, idxs))

        if not packed:
            return None
        self.t_pack += _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
        m, x, g = self._scores(mode)
        # node ids stay on HOST for the rank decode; the device never reads
        # them with emit_node_ids=False, so ship a [B,1,1] stub instead of
        # nb int16s per dispatch
        nid_dev = nid[:, :, :1] if not self._n_dev > 1 else nid
        args = (
            jnp.asarray(codes),
            jnp.asarray(preds),
            jnp.asarray(sink),
            jnp.asarray(nid_dev),
            jnp.asarray(nn),
            jnp.asarray(seqp),
            jnp.asarray(slen),
        )
        if self._n_dev > 1:
            pn, pp, count, _ = self._sharded_fn(mode, rb)(*args)
            pending = ("dense", pn, pp, count)
        else:
            # rle traceback: run-compressed headers instead of dense pairs —
            # the walk takes ~2x fewer serial gather steps on device AND the
            # fetch moves ~4-8x fewer bytes through the ~10 MB/s tunnel
            runs, steps, count, _ = poa_align_pallas(
                *args,
                align_type=mode,
                m=m,
                x=x,
                g=g,
                interpret=self.interpret,
                ring=rb,
                emit_node_ids=False,
                emit_rle=True,
                preds_is_delta=delta_preds,
            )
            pending = ("rle", runs, steps, count)
        self.t_device += _time.perf_counter() - _t0
        self.n_dispatches += 1
        return pending + (nid, nn, slen, packed, dcap)

    def _finish_chunk(self, items, results, pending):
        import time as _time

        kind, a1, a2, count, nid, nn, slen, packed, dcap = pending
        _t0 = _time.perf_counter()
        count = np.asarray(count)
        if kind == "rle":
            # a1 was sliced to the used rows in _start_runs_fetch and its
            # d2h started there; this asarray finds the bytes on host
            runs = (
                np.asarray(a1)
                if a1 is not None
                else np.zeros((0, count.shape[0] * count.shape[2]), np.int32)
            )
        else:
            pn = np.asarray(a1)
            pp = np.asarray(a2)
            L = pn.shape[2]
        self.t_device += _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
        from .poa_pallas import ranks_to_node_ids_np, runs_to_pairs_np

        for b, idxs in packed:
            nid_b = nid[b, 0]
            for di, i in enumerate(idxs):
                c = int(count[b, 0, di])
                if kind == "rle":
                    seg, ppw = runs_to_pairs_np(runs[:, b * dcap + di])
                    seg = ranks_to_node_ids_np(seg, nid_b)
                    aln = list(zip(seg.tolist(), ppw.tolist()))
                else:
                    seg = ranks_to_node_ids_np(pn[b, di, L - c :], nid_b)
                    aln = list(zip(seg.tolist(), pp[b, di, L - c :].tolist()))
                assert len(aln) == c
                results[i] = aln
                self.device_alignments += 1
                self.cell_updates += int(nn[b, 0, 0]) * int(slen[b, 0, di])
        self.t_decode += _time.perf_counter() - _t0
