#!/usr/bin/env python
"""RLE-walk cost decomposition: gather vs decode vs DUS vs while overhead."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from vechat_tpu.ops.kernels.poa_pallas import (
    _decode_move, DELTA_BITS, RUN_PN_SHIFT, RUN_R_BITS,
)

B, D, W, N1P = 64, 64, 512, 704
BD = B * D
P = 8
L = 640 + 512
rng = np.random.default_rng(0)
dirs = jnp.asarray(rng.integers(0, 30000, (B, N1P, D, W)).astype(np.int16))
i0j = jnp.asarray(rng.integers(1, 600, BD).astype(np.int32))
j0j = jnp.asarray(rng.integers(1, 500, BD).astype(np.int32))

STEPS = 228
bidx = jnp.arange(BD, dtype=jnp.int32) // D
didx = jnp.arange(BD, dtype=jnp.int32) % D


def walk(dirs, i0, j0, do_gather, do_decode, do_dus, unroll):
    cf = dirs.reshape(-1)
    LP = L + unroll
    runs0 = jnp.zeros((LP, BD), jnp.int32)

    def one(step, i, j, cnt, runs):
        if do_gather:
            flat = ((bidx * N1P + i) * D + didx) * W + j
            code = jnp.take(cf, flat).astype(jnp.int32)
        else:
            code = (i * 37 + j * 11) & 0x3FFF
        if do_decode:
            is_diag, is_vert, delta, is_run, r, is_stop = _decode_move(
                code, P, "nw"
            )
            prev_i1 = jnp.where(is_diag | is_vert, i - delta, i)
            prev_i1 = jnp.where(
                delta == 0, jnp.where(is_diag | is_vert, 0, i), prev_i1
            )
            prev_j1 = jnp.where(is_diag | (~is_vert), j - 1, j)
            pn0 = jnp.where(prev_i1 == i, -1, i - 1)
            pp0 = jnp.where(prev_j1 == j, -1, j - 1)
            prev_i = jnp.where(is_run, i - r, prev_i1)
            prev_j = jnp.where(is_run & is_diag, j - r, prev_j1)
            header = (
                ((pn0 + 2) << RUN_PN_SHIFT)
                | ((pp0 + 2) << RUN_R_BITS)
                | jnp.where(is_run, r, 1)
            )
            rstep = jnp.where(is_run, r, 1)
        else:
            prev_i = jnp.maximum(i - 1 - (code & 1), 1)
            prev_j = jnp.maximum(j - 1, 1)
            header = code
            rstep = 1
        i = jnp.maximum(prev_i, 1)
        j = jnp.maximum(prev_j, 1)
        if do_dus:
            runs = lax.dynamic_update_slice(runs, header[None, :], (step, 0))
        cnt = cnt + rstep
        return i, j, cnt, runs

    def body(st):
        step, i, j, cnt, runs = st
        for u in range(unroll):
            i, j, cnt, runs = one(step + u, i, j, cnt, runs)
        return step + unroll, i, j, cnt, runs

    def cond(st):
        step, i, j, cnt, _ = st
        return (step < STEPS) & jnp.any(cnt < 10**9)

    st = (jnp.int32(0), i0, j0, jnp.zeros(BD, jnp.int32), runs0)
    step, i, j, cnt, runs = lax.while_loop(cond, body, st)
    return cnt.ravel()[0] + runs[0, 0]


def t(fn, args, reps=3):
    f = jax.jit(fn, static_argnames=("do_gather", "do_decode", "do_dus", "unroll"))
    best = 1e9
    kw = args[1]
    float(f(dirs, i0j, j0j, **kw))
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(dirs, i0j, j0j, **kw))
        best = min(best, time.perf_counter() - t0)
    return best


full = t(walk, (None, dict(do_gather=True, do_decode=True, do_dus=True, unroll=4)))
print(f"full (u4):        {full*1e3:7.2f} ms  ({full/STEPS*1e6:5.1f} us/step)")
for name, kw in [
    ("no gather", dict(do_gather=False, do_decode=True, do_dus=True, unroll=4)),
    ("no decode", dict(do_gather=True, do_decode=False, do_dus=True, unroll=4)),
    ("no dus", dict(do_gather=True, do_decode=True, do_dus=False, unroll=4)),
    ("gather only", dict(do_gather=True, do_decode=False, do_dus=False, unroll=4)),
    ("full u8", dict(do_gather=True, do_decode=True, do_dus=True, unroll=8)),
    ("full u16", dict(do_gather=True, do_decode=True, do_dus=True, unroll=16)),
]:
    v = t(walk, (None, kw))
    print(f"{name:14s}:   {v*1e3:7.2f} ms  ({v/STEPS*1e6:5.1f} us/step)", flush=True)
