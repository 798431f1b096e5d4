"""Device-resident haplotype prune-cycle driver.

Routes the prune -> realign x2 -> emit cycle of generate_consensus_haplotype
(reference: src/window.cpp:300-396) through the batched device program
ops/kernels/graph_cycle.haplotype_cycle: after the incremental build phase,
each window's graph crosses to the device ONCE as dense edge-list tensors and
the whole cycle — PruneGraph, largest-CC renumbering, topological ranking,
all realignments, AddWeights and the corrected-sequence emit — runs on device
with a single host round-trip per window batch. The host C++ path remains the
oracle and the capacity-overflow fallback (the cudapoa refusal pattern,
src/cuda/cudabatch.cpp:205-209).
"""

from __future__ import annotations

import os
import time
from typing import List, Optional

import numpy as np

from ..ops.encode import phred_weights
from ..ops.kernels.graph_cycle import graph_to_edges, haplotype_cycle

# capacity ladders: every distinct (B, E, N, D, S) tuple is one XLA compile
# (~300 s through this machine's remote-compile tunnel), so keep them COARSE.
# Sized from the measured build-graph distribution of the standard e2e
# config (500 bp windows, ~8% error, 30-40x): nodes p50=927 max=1105,
# edges max=1905, layer depth max=32, max layer seq 518, in-degree max 7.
N_LADDER = (256, 1152, 2048)
D_LADDER = (8, 32, 64)
S_LADDER = (128, 576)
B_LADDER = (4, 16, 64)
A_CAP = 32
P_CAP = 16
D_CHUNK = 8



def _async_d2h_tree(*objs):
    """Start device-to-host copies for every jax array in the given
    objects/tuples without blocking (overlaps the tunnel's per-fetch
    latency across chunks; no-op where async d2h is unsupported)."""
    for o in objs:
        if isinstance(o, (tuple, list)):
            _async_d2h_tree(*o)
        else:
            try:
                o.copy_to_host_async()
            except Exception:  # noqa: BLE001
                pass

def _bucket(v, ladder):
    for b in ladder:
        if v <= b:
            return b
    return None


# Placement default, measured on silicon (BENCH_banked_r04.json
# device_path_ab): the per-layer-dispatch path — host C++ graph ops (AVX) +
# batched Pallas alignment per layer step — runs round 1 warm in ~61 s for a
# 205-window batch vs ~500 s for the fully device-resident machines, whose
# XLA row-loop DP carries ~36x padding (P=16 pred slots materialized, full-N
# rows) and whose stack machines pay per-iteration while_loop overhead. The
# device-resident programs stay available (VECHAT_DEVICE_BUILD/CYCLE/
# LINEAR=1) for dispatch-bound regimes — thin links where per-dispatch
# latency, not device execution, dominates — and are what dryrun_multichip
# shards. The reference's CUDA path made the same placement trade in the
# opposite direction: cudapoa ran plain consensus only, pruning stayed on
# CPU (src/cuda/cudapolisher.cpp:294,365-366).
def use_device_cycle(backend) -> bool:
    """Device-resident prune cycle: opt-in via VECHAT_DEVICE_CYCLE=1."""
    flag = os.environ.get("VECHAT_DEVICE_CYCLE")
    if flag is not None:
        return flag not in ("0", "", "off") and getattr(
            backend, "supports_graph_cycle", False
        )
    return False


def _window_avg_weight(w, total: float) -> float:
    """average_weight = 2*total/window_len (uint16 len quirk), x1000 for
    FASTQ-mode windows (reference: src/window.cpp:301-309)."""
    window_len = np.uint16(len(w.backbone_codes))
    avg = 2.0 * total / int(window_len)
    if not w.if_fasta:
        avg *= 1000.0
    return avg


def use_device_build(backend) -> bool:
    """Full on-device round-1 (build + cycle): opt-in via
    VECHAT_DEVICE_BUILD=1 (see placement note above)."""
    flag = os.environ.get("VECHAT_DEVICE_BUILD")
    if flag is not None:
        return flag not in ("0", "", "off") and getattr(
            backend, "supports_graph_cycle", False
        )
    return False


def use_device_linear(backend) -> bool:
    """Full on-device round-2 (build + heaviest-bundle consensus + trim):
    opt-in via VECHAT_DEVICE_LINEAR=1 (see placement note above)."""
    flag = os.environ.get("VECHAT_DEVICE_LINEAR")
    if flag is not None:
        return flag not in ("0", "", "off") and getattr(
            backend, "supports_graph_cycle", False
        )
    return False


# once a device graph program hard-fails (remote compile error, TPU worker
# crash), stop dispatching that program this process — windows fall back to
# the next tier instead (build broken -> host build + device cycle; cycle
# broken -> full host path). The cudapoa-refusal pattern extended to
# whole-program failure (SURVEY §5 failure handling).
_broken = {"build": False, "cycle": False, "linear": False}


def _mark_device_broken(kind: str, where: str, exc: Exception) -> None:
    _broken[kind] = True
    import sys

    print(
        f"[vechat_tpu::cycle] device graph program failed in {where}: "
        f"{type(exc).__name__}: {str(exc)[:200]} — disabling the device "
        f"{kind} path for this process",
        file=sys.stderr,
    )


R_CAP = 8  # aligned-ring capacity (DNA: a node plus <= a handful of variants)


def run_device_polish(
    active: List,
    backend,
    min_confidence: float,
    min_support: float,
    num_prune: int,
    progress=None,
) -> List[bool]:
    """Round-1 window consensus entirely on device: the incremental build
    (graph_build.device_build — one jitted program over layer steps) feeds
    the prune cycle (graph_cycle.haplotype_cycle) without the graphs ever
    existing on the host. Two dispatches per window batch replace the
    per-layer-step dispatch storm of the host-build path (459 dispatches for
    a 205-window batch through this machine's tunnel).

    Sets consensus on handled windows; returns the handled mask."""
    import jax.numpy as jnp

    from ..ops.encode import phred_prob_sum, phred_weights
    from ..ops.kernels.graph_build import device_build
    from ..pipeline.windows import _backbone_weights, _layer_order

    handled = [False] * len(active)
    if _broken["build"] or _broken["cycle"]:
        return handled
    m, x, g = backend.match, backend.mismatch, backend.gap

    t0 = time.perf_counter()
    buckets = {}
    packs: List[Optional[dict]] = [None] * len(active)
    for wi, w in enumerate(active):
        blen = len(w.backbone_codes)
        offset = int(0.01 * blen)
        d_real = 1 + len(w.layers)
        s_max = max(
            [blen] + [len(l.codes) for l in w.layers]
        )
        # build graphs grow ~(1 + error_rate * depth) x backbone; bucket on
        # the realistic ceiling, fall back to host when it overflows there
        nb = _bucket(max(blen * 2, 256), N_LADDER)
        db = _bucket(d_real, D_LADDER)
        sb = _bucket(s_max, S_LADDER)
        if nb is None or db is None or sb is None:
            continue
        order = _layer_order(w)
        seqs = np.full((db, sb), 0xFF, np.int32)
        bw = np.ones((db, sb), np.int32)  # build weights
        cw = np.ones((db, sb), np.int32)  # cycle (AddWeights) weights
        slen = np.ones(db, np.int32)
        begin = np.zeros(db, np.int32)
        end = np.zeros(db, np.int32)
        full = np.zeros(db, bool)
        is_sw = np.zeros(db, bool)
        bb = w.backbone_codes
        seqs[0, : len(bb)] = bb
        bw[0, : len(bb)] = _backbone_weights(w)
        cw[0, : len(bb)] = phred_weights(w.backbone_quality, len(bb))
        slen[0] = len(bb)
        total = (
            float(len(bb))
            if w.if_fasta
            else (
                phred_prob_sum(w.backbone_quality)
                if w.backbone_quality is not None
                else 0.0
            )
        )
        for j, oi in enumerate(order, start=1):
            l = w.layers[oi]
            seqs[j, : len(l.codes)] = l.codes
            bw[j, : len(l.codes)] = phred_weights(l.quality, len(l.codes))
            cw[j, : len(l.codes)] = bw[j, : len(l.codes)]
            slen[j] = len(l.codes)
            begin[j] = l.begin
            end[j] = l.end
            full[j] = l.begin < offset and l.end > blen - offset
            is_sw[j] = not full[j]
            total += (
                float(len(l.codes))
                if l.quality is None
                else phred_prob_sum(l.quality)
            )
        packs[wi] = dict(
            seqs=seqs, bw=bw, cw=cw, slen=slen, begin=begin, end=end,
            full=full, is_sw=is_sw, d_real=d_real,
            avg=_window_avg_weight(w, total),
        )
        buckets.setdefault((nb, db, sb), []).append(wi)
    t_pack = time.perf_counter() - t0

    t0 = time.perf_counter()
    pending = []
    n_dispatches = 0
    for (nb, db, sb), wis in sorted(buckets.items()):
        eb = 2 * nb
        # the remote TPU worker crashes executing device_build at the
        # largest (B, N, SMAX, W) combination; B=16 at the same shape is
        # stable (bisected on silicon) — cap the batch for big buckets
        b_max = 16 if (nb >= 1152 and sb >= 576) else B_LADDER[-1]
        for off in range(0, len(wis), b_max):
            chunk = wis[off : off + b_max]
            B = _bucket(len(chunk), B_LADDER) or len(chunk)
            bb_codes = np.zeros((B, sb), np.int32)
            bb_w = np.zeros((B, sb), np.int32)
            bb_len = np.ones(B, np.int32)
            lseqs = np.full((B, db - 1, sb), 0xFF, np.int32)
            lw = np.ones((B, db - 1, sb), np.int32)
            llen = np.ones((B, db - 1), np.int32)
            lbegin = np.zeros((B, db - 1), np.int32)
            lend = np.zeros((B, db - 1), np.int32)
            lfull = np.zeros((B, db - 1), bool)
            n_layers = np.zeros(B, np.int32)
            seqs = np.full((B, db, sb), 0xFF, np.int32)
            seqs[:, :, 0] = 0
            seq_w = np.ones((B, db, sb), np.int32)
            slen_c = np.ones((B, db), np.int32)
            is_sw = np.zeros((B, db), bool)
            d_used = np.ones(B, np.int32)
            avg = np.ones(B, np.float32)
            for bi, wi in enumerate(chunk):
                p = packs[wi]
                bb_codes[bi] = p["seqs"][0]
                bb_codes[bi][p["seqs"][0] == 0xFF] = 0
                bb_w[bi] = p["bw"][0]
                bb_len[bi] = p["slen"][0]
                nl = p["d_real"] - 1
                lseqs[bi, :nl] = p["seqs"][1 : nl + 1]
                lw[bi, :nl] = p["bw"][1 : nl + 1]
                llen[bi, :nl] = p["slen"][1 : nl + 1]
                lbegin[bi, :nl] = p["begin"][1 : nl + 1]
                lend[bi, :nl] = p["end"][1 : nl + 1]
                lfull[bi, :nl] = p["full"][1 : nl + 1]
                n_layers[bi] = nl
                seqs[bi] = p["seqs"]
                seq_w[bi] = p["cw"]
                slen_c[bi] = p["slen"]
                is_sw[bi] = p["is_sw"]
                d_used[bi] = p["d_real"]
                avg[bi] = p["avg"]
            try:
                built = device_build(
                    jnp.asarray(bb_codes), jnp.asarray(bb_w),
                    jnp.asarray(bb_len),
                    jnp.asarray(lseqs), jnp.asarray(lw), jnp.asarray(llen),
                    jnp.asarray(lbegin), jnp.asarray(lend),
                    jnp.asarray(lfull),
                    jnp.asarray(n_layers), nb, eb, R_CAP, m, x, g,
                )
                out = haplotype_cycle(
                    built["tails"], built["heads"], built["weights"],
                    built["n_edges"], built["codes"], built["n_nodes"],
                    jnp.asarray(avg), jnp.asarray(seqs), jnp.asarray(slen_c),
                    jnp.asarray(seq_w), jnp.asarray(is_sw),
                    jnp.asarray(d_used),
                    jnp.float32(min_confidence), jnp.float32(min_support),
                    num_prune=num_prune, m=m, x=x, g=g,
                    a_cap=A_CAP, p_cap=P_CAP, d_chunk=D_CHUNK,
                )
            except Exception as exc:  # noqa: BLE001 — remote compile/worker
                _mark_device_broken("build", "device_build/haplotype_cycle", exc)
                return handled
            n_dispatches += 2
            pending.append((chunk, built["overflow"], out))
    t_device = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _c, b_ovf, outs in pending:
        _async_d2h_tree(b_ovf, outs)
    for chunk, b_ovf, (corrected, out_len, overflow, n_sub) in pending:
        try:
            corrected = np.asarray(corrected)
            out_len = np.asarray(out_len)
            bad = np.asarray(overflow) | np.asarray(b_ovf)
        except Exception as exc:  # noqa: BLE001 — device died mid-execution
            _mark_device_broken("build", "device polish fetch", exc)
            return handled
        for bi, wi in enumerate(chunk):
            if bad[bi]:
                continue
            w = active[wi]
            w.consensus_codes = corrected[bi, : out_len[bi]].astype(np.uint8)
            w.polished = True
            handled[wi] = True
        if progress is not None:
            progress()
    t_fetch = time.perf_counter() - t0

    n_handled = sum(handled)
    if hasattr(backend, "t_cycle_device"):
        backend.t_cycle_pack += t_pack
        backend.t_cycle_device += t_device + t_fetch
        backend.n_cycle_windows += n_handled
        backend.n_cycle_dispatches += n_dispatches
    if n_dispatches:
        import sys

        print(
            f"[vechat_tpu::polish-device] full on-device round-1: "
            f"{n_handled}/{len(active)} windows, {n_dispatches} dispatches | "
            f"pack {t_pack:.1f}s | device {t_device:.1f}s | fetch "
            f"{t_fetch:.1f}s",
            file=sys.stderr,
        )
    return handled


def run_device_linear(
    active: List,
    backend,
    trim: bool,
    progress=None,
) -> List[bool]:
    """Round-2 (plain racon) window consensus entirely on device: the
    incremental build feeds heaviest-bundle consensus + coverage trim as ONE
    jitted program per window batch (graph_consensus.device_linear),
    replacing the per-layer-step dispatches of the generic backend path.
    Sets consensus on handled windows; returns the handled mask."""
    import jax.numpy as jnp

    from ..ops.kernels.graph_consensus import device_linear
    from ..pipeline.windows import (
        WINDOW_TYPE_TGS,
        _backbone_weights,
        _layer_order,
    )

    handled = [False] * len(active)
    if _broken["linear"]:
        return handled
    m, x, g = backend.match, backend.mismatch, backend.gap

    t0 = time.perf_counter()
    buckets = {}
    packs: List[Optional[dict]] = [None] * len(active)
    for wi, w in enumerate(active):
        blen = len(w.backbone_codes)
        offset = int(0.01 * blen)
        d_real = 1 + len(w.layers)
        s_max = max([blen] + [len(l.codes) for l in w.layers])
        nb = _bucket(max(blen * 2, 256), N_LADDER)
        db = _bucket(d_real, D_LADDER)
        sb = _bucket(s_max, S_LADDER)
        if nb is None or db is None or sb is None:
            continue
        order = _layer_order(w)
        seqs = np.full((db - 1, sb), 0xFF, np.int32)
        bw = np.ones((db - 1, sb), np.int32)
        slen = np.ones(db - 1, np.int32)
        begin = np.zeros(db - 1, np.int32)
        end = np.zeros(db - 1, np.int32)
        full = np.zeros(db - 1, bool)
        for j, oi in enumerate(order):
            l = w.layers[oi]
            seqs[j, : len(l.codes)] = l.codes
            bw[j, : len(l.codes)] = phred_weights(l.quality, len(l.codes))
            slen[j] = len(l.codes)
            begin[j] = l.begin
            end[j] = l.end
            full[j] = l.begin < offset and l.end > blen - offset
        packs[wi] = dict(
            seqs=seqs, bw=bw, slen=slen, begin=begin, end=end, full=full,
            n_layers=d_real - 1,
            do_trim=trim and w.window_type == WINDOW_TYPE_TGS,
        )
        buckets.setdefault((nb, db, sb), []).append(wi)
    t_pack = time.perf_counter() - t0

    t0 = time.perf_counter()
    pending = []
    n_dispatches = 0
    for (nb, db, sb), wis in sorted(buckets.items()):
        eb = 2 * nb
        b_max = 16 if (nb >= 1152 and sb >= 576) else B_LADDER[-1]
        for off in range(0, len(wis), b_max):
            chunk = wis[off : off + b_max]
            B = _bucket(len(chunk), B_LADDER) or len(chunk)
            bb_codes = np.zeros((B, sb), np.int32)
            bb_w = np.zeros((B, sb), np.int32)
            bb_len = np.ones(B, np.int32)
            lseqs = np.full((B, db - 1, sb), 0xFF, np.int32)
            lw = np.ones((B, db - 1, sb), np.int32)
            llen = np.ones((B, db - 1), np.int32)
            lbegin = np.zeros((B, db - 1), np.int32)
            lend = np.zeros((B, db - 1), np.int32)
            lfull = np.zeros((B, db - 1), bool)
            n_layers = np.zeros(B, np.int32)
            do_trim = np.zeros(B, bool)
            for bi, wi in enumerate(chunk):
                p = packs[wi]
                w = active[wi]
                bb = w.backbone_codes
                bb_codes[bi, : len(bb)] = bb
                bb_w[bi, : len(bb)] = _backbone_weights(w)
                bb_len[bi] = len(bb)
                nl = p["n_layers"]
                lseqs[bi, :nl] = p["seqs"][:nl]
                lw[bi, :nl] = p["bw"][:nl]
                llen[bi, :nl] = p["slen"][:nl]
                lbegin[bi, :nl] = p["begin"][:nl]
                lend[bi, :nl] = p["end"][:nl]
                lfull[bi, :nl] = p["full"][:nl]
                n_layers[bi] = nl
                do_trim[bi] = p["do_trim"]
            try:
                out = device_linear(
                    jnp.asarray(bb_codes), jnp.asarray(bb_w),
                    jnp.asarray(bb_len),
                    jnp.asarray(lseqs), jnp.asarray(lw), jnp.asarray(llen),
                    jnp.asarray(lbegin), jnp.asarray(lend),
                    jnp.asarray(lfull),
                    jnp.asarray(n_layers), jnp.asarray(do_trim),
                    nb, eb, R_CAP, m, x, g, p_cap=P_CAP,
                )
            except Exception as exc:  # noqa: BLE001 — remote compile/worker
                _mark_device_broken("linear", "device_linear", exc)
                return handled
            n_dispatches += 1
            pending.append((chunk, out))
    t_device = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _c, outs in pending:
        _async_d2h_tree(outs)
    for chunk, (corrected, out_len, overflow) in pending:
        try:
            corrected = np.asarray(corrected)
            out_len = np.asarray(out_len)
            overflow = np.asarray(overflow)
        except Exception as exc:  # noqa: BLE001 — device died mid-execution
            _mark_device_broken("linear", "device linear fetch", exc)
            return handled
        for bi, wi in enumerate(chunk):
            if overflow[bi]:
                continue
            w = active[wi]
            w.consensus_codes = corrected[bi, : out_len[bi]].astype(np.uint8)
            w.polished = True
            handled[wi] = True
        if progress is not None:
            progress()
    t_fetch = time.perf_counter() - t0

    n_handled = sum(handled)
    if hasattr(backend, "t_cycle_device"):
        backend.t_cycle_pack += t_pack
        backend.t_cycle_device += t_device + t_fetch
        backend.n_cycle_windows += n_handled
        backend.n_cycle_dispatches += n_dispatches
    if n_dispatches:
        import sys

        print(
            f"[vechat_tpu::linear-device] full on-device round-2: "
            f"{n_handled}/{len(active)} windows, {n_dispatches} dispatches | "
            f"pack {t_pack:.1f}s | device {t_device:.1f}s | fetch "
            f"{t_fetch:.1f}s",
            file=sys.stderr,
        )
    return handled


def run_device_cycle(
    active: List,
    graphs: List,
    totals: List[float],
    orders: List[List[int]],
    backend,
    min_confidence: float,
    min_support: float,
    num_prune: int,
    progress=None,
) -> List[bool]:
    """Run the device cycle for every eligible window. Sets consensus_codes /
    polished on handled windows; returns a handled mask (False -> the caller
    must run the host cycle for that window)."""
    import jax.numpy as jnp

    handled = [False] * len(active)
    if _broken["cycle"]:
        return handled
    m, x, g = backend.match, backend.mismatch, backend.gap

    # ---- classify windows into shape buckets
    t0 = time.perf_counter()
    buckets = {}
    packs: List[Optional[dict]] = [None] * len(active)
    for wi, (w, gr) in enumerate(zip(active, graphs)):
        blen = len(w.backbone_codes)
        offset = int(0.01 * blen)
        d_real = 1 + len(w.layers)
        s_max = max(
            [len(w.backbone_codes)] + [len(l.codes) for l in w.layers]
        )
        nb = _bucket(gr.num_nodes(), N_LADDER)
        db = _bucket(d_real, D_LADDER)
        sb = _bucket(s_max, S_LADDER)
        if nb is None or db is None or sb is None:
            continue
        ed = graph_to_edges(gr, nb, 2 * nb)
        if ed is None:
            continue
        seqs = np.full((db, sb), 0xFF, np.int32)
        seq_w = np.ones((db, sb), np.int32)
        slen = np.ones(db, np.int32)
        is_sw = np.zeros(db, bool)
        bb = w.backbone_codes
        seqs[0, : len(bb)] = bb
        seq_w[0, : len(bb)] = phred_weights(w.backbone_quality, len(bb))
        slen[0] = len(bb)
        for j, oi in enumerate(orders[wi], start=1):
            l = w.layers[oi]
            seqs[j, : len(l.codes)] = l.codes
            seq_w[j, : len(l.codes)] = phred_weights(l.quality, len(l.codes))
            slen[j] = len(l.codes)
            is_sw[j] = not (l.begin < offset and l.end > blen - offset)
        packs[wi] = dict(
            edges=ed, seqs=seqs, seq_w=seq_w, slen=slen, is_sw=is_sw,
            d_real=d_real, avg=_window_avg_weight(w, totals[wi]),
        )
        buckets.setdefault((nb, db, sb), []).append(wi)
    t_pack = time.perf_counter() - t0

    # ---- run batches per bucket: dispatch everything, then fetch
    t_device = 0.0
    t_fetch = 0.0
    n_dispatches = 0
    pending = []
    t0 = time.perf_counter()
    for (nb, db, sb), wis in sorted(buckets.items()):
        eb = 2 * nb
        for off in range(0, len(wis), B_LADDER[-1]):
            chunk = wis[off : off + B_LADDER[-1]]
            B = _bucket(len(chunk), B_LADDER) or len(chunk)
            tails = np.zeros((B, eb), np.int32)
            heads = np.zeros((B, eb), np.int32)
            weights = np.zeros((B, eb), np.int32)
            codes = np.zeros((B, nb), np.int32)
            n_nodes = np.ones(B, np.int32)
            n_edges = np.zeros(B, np.int32)
            avg = np.ones(B, np.float32)
            seqs = np.full((B, db, sb), 0xFF, np.int32)
            seqs[:, :, 0] = 0
            seq_w = np.ones((B, db, sb), np.int32)
            slen = np.ones((B, db), np.int32)
            is_sw = np.zeros((B, db), bool)
            d_used = np.ones(B, np.int32)
            for bi, wi in enumerate(chunk):
                p = packs[wi]
                ed = p["edges"]
                tails[bi] = ed["tails"][:eb]
                heads[bi] = ed["heads"][:eb]
                weights[bi] = ed["weights"][:eb]
                codes[bi] = ed["codes"][:nb]
                n_nodes[bi] = ed["n_nodes"]
                n_edges[bi] = ed["n_edges"]
                avg[bi] = p["avg"]
                seqs[bi] = p["seqs"]
                seq_w[bi] = p["seq_w"]
                slen[bi] = p["slen"]
                is_sw[bi] = p["is_sw"]
                d_used[bi] = p["d_real"]
            try:
                out = haplotype_cycle(
                    jnp.asarray(tails), jnp.asarray(heads),
                    jnp.asarray(weights),
                    jnp.asarray(n_edges), jnp.asarray(codes),
                    jnp.asarray(n_nodes),
                    jnp.asarray(avg), jnp.asarray(seqs), jnp.asarray(slen),
                    jnp.asarray(seq_w), jnp.asarray(is_sw),
                    jnp.asarray(d_used),
                    jnp.float32(min_confidence), jnp.float32(min_support),
                    num_prune=num_prune, m=m, x=x, g=g,
                    a_cap=A_CAP, p_cap=P_CAP, d_chunk=D_CHUNK,
                )
            except Exception as exc:  # noqa: BLE001
                _mark_device_broken("cycle", "haplotype_cycle", exc)
                return handled
            n_dispatches += 1
            pending.append((chunk, out))
    t_device = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _c, outs in pending:
        _async_d2h_tree(outs)
    for chunk, (corrected, out_len, overflow, n_sub) in pending:
        try:
            corrected = np.asarray(corrected)
            out_len = np.asarray(out_len)
            overflow = np.asarray(overflow)
        except Exception as exc:  # noqa: BLE001
            _mark_device_broken("cycle", "device cycle fetch", exc)
            return handled
        for bi, wi in enumerate(chunk):
            if overflow[bi]:
                continue  # host fallback
            w = active[wi]
            w.consensus_codes = corrected[bi, : out_len[bi]].astype(np.uint8)
            w.polished = True
            handled[wi] = True
        if progress is not None:
            progress()
    t_fetch = time.perf_counter() - t0

    n_handled = sum(handled)
    if hasattr(backend, "t_cycle_device"):
        backend.t_cycle_pack += t_pack
        backend.t_cycle_device += t_device + t_fetch
        backend.n_cycle_windows += n_handled
        backend.n_cycle_dispatches += n_dispatches
    if n_dispatches:
        import sys

        print(
            f"[vechat_tpu::cycle] device prune-cycle: {n_handled}/"
            f"{len(active)} windows, {n_dispatches} dispatches | pack "
            f"{t_pack:.1f}s | device {t_device:.1f}s | fetch {t_fetch:.1f}s",
            file=sys.stderr,
        )
    return handled
