#!/usr/bin/env python
"""RLE-walk decomposition on REAL dirs (from the full bench-stage DP)."""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench import synth_graph_batch  # noqa: E402
from vechat_tpu.ops.kernels.poa_pallas import (  # noqa: E402
    _poa_dp_pallas, _decode_move, _traceback_walk_rle, _traceback_walk,
    RUN_PN_SHIFT, RUN_R_BITS,
)

B, N, P, D, W = 64, 640, 8, 64, 512
args_np, cells = synth_graph_batch(B, N, P, D, W, seed=0)
a = [jnp.asarray(x) for x in args_np]
dirs, maxi, maxj, _ = _poa_dp_pallas(
    a[0], a[1], a[2], a[4], a[5], a[6], "nw", 3, -5, -4, ring=64
)
dirs = jax.block_until_ready(dirs)
L = N + W

runs, steps, cnt = _traceback_walk_rle(dirs, maxi, maxj, "nw", L, P)
print(f"actual rle steps: {int(steps)}  max cnt: {int(jnp.max(cnt))}",
      flush=True)


def timeit(fn, reps=5):
    f = jax.jit(fn)
    out = f(dirs, maxi, maxj)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(dirs, maxi, maxj))
        best = min(best, time.perf_counter() - t0)
    return best


def walk_var(dirs, maxi, maxj, gather=True, decode=True, dus=True,
             unroll=16, early=True):
    Bq, N1P, Dq, Wq = dirs.shape
    BD = Bq * Dq
    cf = dirs.reshape(-1)
    bidx = jnp.arange(BD, dtype=jnp.int32) // Dq
    didx = jnp.arange(BD, dtype=jnp.int32) % Dq
    i0 = maxi[:, 0, :].reshape(BD)
    j0 = maxj[:, 0, :].reshape(BD)
    active0 = ~((i0 == 0) & (j0 == 0))
    LP = L + unroll

    def one(step, i, j, cnt, active, runsb):
        if gather:
            flat = ((bidx * N1P + i) * Dq + didx) * Wq + j
            code = jnp.take(cf, flat).astype(jnp.int32)
        else:
            code = (i * 37 + j * 11) & 0x3FFF
        if decode:
            is_diag, is_vert, delta, is_run, r, is_stop = _decode_move(
                code, P, "nw")
            do = active
            prev_i1 = jnp.where(is_diag | is_vert, i - delta, i)
            prev_i1 = jnp.where(
                delta == 0, jnp.where(is_diag | is_vert, 0, i), prev_i1)
            prev_j1 = jnp.where(is_diag | (~is_vert), j - 1, j)
            pn0 = jnp.where(prev_i1 == i, -1, i - 1)
            pp0 = jnp.where(prev_j1 == j, -1, j - 1)
            prev_i = jnp.where(is_run, i - r, prev_i1)
            prev_j = jnp.where(is_run & is_diag, j - r, prev_j1)
            header = jnp.where(
                do,
                ((pn0 + 2) << RUN_PN_SHIFT) | ((pp0 + 2) << RUN_R_BITS)
                | jnp.where(is_run, r, 1), 0)
            i = jnp.where(do, prev_i, i)
            j = jnp.where(do, prev_j, j)
            cnt = cnt + jnp.where(do, jnp.where(is_run, r, 1), 0)
            nactive = do & ~((i == 0) & (j == 0))
        else:
            i = jnp.maximum(i - 1 - (code & 1), 0)
            j = jnp.maximum(j - 1, 0)
            header = code
            cnt = cnt + 1
            nactive = active & ~((i == 0) & (j == 0))
        if dus:
            runsb = lax.dynamic_update_slice(runsb, header[None, :], (step, 0))
        return step + 1, i, j, cnt, nactive, runsb

    def body(st):
        step, i, j, cnt, active, runsb = st
        for _ in range(unroll):
            step, i, j, cnt, active, runsb = one(step, i, j, cnt, active, runsb)
        return step, i, j, cnt, active, runsb

    def cond(st):
        step, _, _, _, active, _ = st
        if early:
            return (step < L) & jnp.any(active)
        return step < 240

    st = (jnp.int32(0), i0, j0, jnp.zeros(BD, jnp.int32), active0,
          jnp.zeros((LP, BD), jnp.int32))
    step, i, j, cnt, active, runsb = lax.while_loop(cond, body, st)
    return cnt.ravel()[0] + runsb[0, 0] + step


base = timeit(functools.partial(walk_var))
print(f"full replica     : {base*1e3:7.2f} ms", flush=True)
for name, kw in [
    ("no dus", dict(dus=False)),
    ("no gather", dict(gather=False)),
    ("no decode", dict(decode=False)),
    ("gather only", dict(decode=False, dus=False)),
    ("fixed 240 steps", dict(early=False)),
    ("unroll 4", dict(unroll=4)),
]:
    v = timeit(functools.partial(walk_var, **kw))
    print(f"{name:17s}: {v*1e3:7.2f} ms", flush=True)

v = timeit(lambda d, mi, mj: _traceback_walk_rle(d, mi, mj, "nw", L, P)[2])
print(f"library rle walk : {v*1e3:7.2f} ms", flush=True)
v = timeit(lambda d, mi, mj: _traceback_walk(d, mi, mj, "nw", L, P)[2])
print(f"library densewalk: {v*1e3:7.2f} ms", flush=True)
