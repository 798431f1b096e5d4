#!/usr/bin/env python
"""Would a chain-following topo order lengthen diag runs?

Builds the bench-stage graphs, host-aligns the queries, and measures the
d1-run-compressed step count of each alignment path under:
  (a) the host topo order (what the kernel uses today)
  (b) a chain-preferring Kahn order (follow the current node's out-edge
      whenever it is ready, preferring the heaviest edge)
All host-side — no kernel involved.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from vechat_tpu.ops.encode import encode
from vechat_tpu.ops.graph_align import LinearAligner
from vechat_tpu.ops.poagraph import PoaGraph

rng = np.random.default_rng(0)
W = 512
base_len = int((W - 1) * 0.9)
eng = LinearAligner("nw", 3, -5, -4)


def noisy(base):
    out = []
    for c in base:
        r = rng.random()
        if r < 0.04:
            out.append(rng.choice(list("ACGT")))
        elif r < 0.06:
            continue
        else:
            out.append(c)
            if rng.random() < 0.02:
                out.append(rng.choice(list("ACGT")))
    return "".join(out)[: W - 1]


def chain_order(gr):
    """Chain-preferring Kahn topo order over node ids; returns rank map."""
    n = gr.num_nodes()
    indeg = np.zeros(n, np.int32)
    outs = [[] for _ in range(n)]  # (weight, dst)
    for u in range(n):
        for e in gr.outedges[u]:
            indeg[e.head] += 1
            outs[u].append((e.weight, e.head))
    ready = [u for u in range(n) if indeg[u] == 0]
    import heapq

    heapq.heapify(ready)
    rank = np.full(n, -1, np.int64)
    r = 0
    cur = None
    while r < n:
        nxt = None
        if cur is not None:
            # continue the chain: heaviest ready successor
            best = None
            for w, v in sorted(outs[cur], reverse=True):
                if indeg[v] == 0 and rank[v] < 0:
                    best = v
                    break
            nxt = best
        if nxt is None:
            while ready and rank[ready[0]] >= 0:
                heapq.heappop(ready)
            if not ready:
                break
            nxt = heapq.heappop(ready)
        rank[nxt] = r
        r += 1
        for w, v in outs[nxt]:
            indeg[v] -= 1
            if indeg[v] == 0:
                heapq.heappush(ready, v)
        cur = nxt
    assert (rank >= 0).all()
    return rank


def d1_steps(pairs, rank_of):
    """Step count of the d1-compressed walk for one alignment path (pairs
    front-to-back; walk goes back-to-front)."""
    moves = []
    prev = None
    for node, pos in reversed(pairs):
        if node is not None and node >= 0 and pos is not None and pos >= 0:
            kind = 0
        elif node is not None and node >= 0:
            kind = 1
        else:
            kind = 2
        if kind in (0, 1) and node >= 0:
            rk = rank_of[node]
        else:
            rk = None
        moves.append((kind, rk))
    s = 0
    k = 0
    n = len(moves)
    while k < n:
        kind, rk = moves[k]
        if kind in (0, 1) and rk is not None:
            # run continues while next move same kind and rank drops by 1
            j = k
            while (
                j + 1 < n
                and moves[j + 1][0] == kind
                and moves[j + 1][1] is not None
                and moves[j][1] is not None
                and moves[j][1] - moves[j + 1][1] == 1
            ):
                j += 1
            s += 1
            k = j + 1
        else:
            s += 1
            k += 1
    return s, n


tot = {"host": [], "chain": []}
maxdist = {"host": 0, "chain": 0}
for u in range(4):
    base = "".join(rng.choice(list("ACGT"), size=base_len))
    g = PoaGraph()
    while True:
        q = encode(noisy(base))
        aln = eng.align(q, g) if g.num_nodes() else []
        g.add_alignment(aln, q, np.ones(len(q), dtype=np.uint32))
        if g.num_nodes() > 640 - 80 or len(g.sequences) >= 8:
            break
    n = g.num_nodes()
    host_rank = np.zeros(n, np.int64)
    for r, nd in enumerate(g.rank_to_node):
        host_rank[nd] = r
    ch_rank = chain_order(g)
    # ring requirement under each order
    for name, rk in (("host", host_rank), ("chain", ch_rank)):
        md = 0
        for v in range(n):
            for e in g.inedges[v]:
                md = max(md, int(rk[v] - rk[e.tail]))
        maxdist[name] = max(maxdist[name], md)
    for _ in range(8):
        q = encode(noisy(base))
        pairs = eng.align(q, g)
        s_h, npairs = d1_steps(pairs, host_rank)
        s_c, _ = d1_steps(pairs, ch_rank)
        tot["host"].append(s_h)
        tot["chain"].append(s_c)

for k in ("host", "chain"):
    v = np.array(tot[k])
    print(
        f"{k:5s}: steps max {v.max():4d} mean {v.mean():7.1f}  "
        f"(ring needs maxdist {maxdist[k]})",
        flush=True,
    )
