#!/usr/bin/env python
"""Walk-compression ceiling analysis on REAL dirs from the bench batch.

Fetches the dirs tensor for the full bench stage, replays all walks in
numpy, and reports max/mean steps under:
  (a) no compression (dense walk)
  (b) diag/vert delta==1 runs (r5 current)
  (c) constant-delta diag/vert runs (any delta)
  (d) (c) + horizontal runs
The while_loop cost is governed by the MAX steps over the batch.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import synth_graph_batch  # noqa: E402
from vechat_tpu.ops.kernels.poa_pallas import (  # noqa: E402
    _poa_dp_pallas, _markers, DELTA_BITS,
)

B, N, P, D, W = 64, 640, 8, 64, 512
args_np, cells = synth_graph_batch(B, N, P, D, W, seed=0)
a = [jnp.asarray(x) for x in args_np]
dirs, maxi, maxj, score = _poa_dp_pallas(
    a[0], a[1], a[2], a[4], a[5], a[6], "nw", 3, -5, -4, ring=64
)
dirs = np.asarray(dirs)
maxi = np.asarray(maxi)[:, 0, :]
maxj = np.asarray(maxj)[:, 0, :]
MD, MV = _markers(P)
DMASK = (1 << DELTA_BITS) - 1

_, N1P, _, _ = dirs.shape
stats = {k: [] for k in ("dense", "d1", "cd", "cdh")}
for b in range(B):
    for d in range(D):
        i, j = int(maxi[b, d]), int(maxj[b, d])
        if i == 0 and j == 0:
            continue
        moves = []  # (kind, delta): kind 0=diag 1=vert 2=horiz
        while not (i == 0 and j == 0):
            code = int(dirs[b, i, d, j])
            pr = code >> DELTA_BITS
            dl = code & DMASK
            if pr == MD:
                kind, delta = 0, 1
            elif pr == MV:
                kind, delta = 1, 1
            elif pr >= P + 2:
                kind, delta = 0, dl
            elif pr >= 2:
                kind, delta = 1, dl
            elif pr == 1:
                kind, delta = 2, 0
            else:
                break  # stop
            moves.append((kind, delta))
            if kind == 0:
                i, j = (i - delta) if dl or pr == MD else 0, j - 1
                if pr != MD and dl == 0:
                    i = 0
            elif kind == 1:
                i = (i - delta) if dl or pr == MV else 0
                if pr != MV and dl == 0:
                    i = 0
            else:
                j -= 1
            if len(moves) > N1P + W:
                break
        n = len(moves)
        stats["dense"].append(n)
        # (b) delta==1 runs
        s = 0
        k = 0
        while k < n:
            kd, dd = moves[k]
            if kd in (0, 1) and dd == 1:
                while k < n and moves[k] == (kd, 1):
                    k += 1
            else:
                k += 1
            s += 1
        stats["d1"].append(s)
        # (c) constant-delta runs (cap 63 per header)
        s = 0
        k = 0
        while k < n:
            kd, dd = moves[k]
            if kd in (0, 1) and 1 <= dd <= 8:
                c = 0
                while k < n and moves[k] == (kd, dd) and c < 63:
                    k += 1
                    c += 1
            else:
                k += 1
            s += 1
        stats["cd"].append(s)
        # (d) + horizontal runs
        s = 0
        k = 0
        while k < n:
            kd, dd = moves[k]
            if kd in (0, 1) and 1 <= dd <= 8:
                c = 0
                while k < n and moves[k] == (kd, dd) and c < 63:
                    k += 1
                    c += 1
            elif kd == 2:
                c = 0
                while k < n and moves[k][0] == 2 and c < 63:
                    k += 1
                    c += 1
            else:
                k += 1
            s += 1
        stats["cdh"].append(s)

for k, v in stats.items():
    v = np.array(v)
    print(
        f"{k:6s}: max {v.max():5d}  p99 {np.percentile(v, 99):7.1f}  "
        f"mean {v.mean():7.1f}",
        flush=True,
    )
