#!/usr/bin/env python
"""Which part of the real walk body costs 35 us/step beyond the gather?"""
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

from vechat_tpu.ops.kernels.poa_pallas import (
    _decode_move, RUN_PN_SHIFT, RUN_R_BITS,
)

B, D, W, N1P = 64, 64, 512, 704
BD = B * D
P = 8
SZ = B * N1P * D * W
rng = np.random.default_rng(0)
cfj = jnp.asarray(rng.integers(0, 16384, SZ).astype(np.int16))
i0j = jnp.asarray(rng.integers(200, 640, BD).astype(np.int32))
j0j = jnp.asarray(rng.integers(200, 500, BD).astype(np.int32))
STEPS = 240
bidx = jnp.arange(BD, dtype=jnp.int32) // D
didx = jnp.arange(BD, dtype=jnp.int32) % D


def walk(cf, i0, j0, variant, steps=STEPS):
    runs0 = jnp.zeros((STEPS + 16, BD), jnp.int32)

    def one(step, i, j, cnt, active, runsb):
        flat = ((bidx * N1P + i) * D + didx) * W + j
        code = jnp.take(cf, flat).astype(jnp.int32)
        # movement: always simple clamped descent so step count is fixed
        ni = jnp.maximum(i - 1 - (code & 1), 1)
        nj = jnp.maximum(j - 1, 1)
        if variant >= 1:  # + full decode (results unused for movement)
            is_diag, is_vert, delta, is_run, r, is_stop = _decode_move(
                code, P, "nw")
            prev_i1 = jnp.where(is_diag | is_vert, i - delta, i)
            prev_i1 = jnp.where(
                delta == 0, jnp.where(is_diag | is_vert, 0, i), prev_i1)
            prev_j1 = jnp.where(is_diag | (~is_vert), j - 1, j)
            pn0 = jnp.where(prev_i1 == i, -1, i - 1)
            pp0 = jnp.where(prev_j1 == j, -1, j - 1)
        if variant >= 2:  # + header pack
            header = (
                ((pn0 + 2) << RUN_PN_SHIFT) | ((pp0 + 2) << RUN_R_BITS)
                | jnp.where(is_run, r, 1))
        else:
            header = code
        if variant >= 3:  # + active masking of state updates
            ni = jnp.where(active, ni, i)
            nj = jnp.where(active, nj, j)
            header = jnp.where(active, header, 0)
        if variant >= 4:  # + cnt accumulation
            cnt = cnt + jnp.where(active, jnp.where(is_run, r, 1), 0)
        if variant >= 5:  # + DUS write
            runsb = lax.dynamic_update_slice(runsb, header[None, :], (step, 0))
        else:
            cnt = cnt + header  # keep header alive
        if variant >= 6:  # movement through the REAL decode chain
            prev_i = jnp.where(is_run, i - r, prev_i1)
            prev_j = jnp.where(is_run & is_diag, j - r, prev_j1)
            ni = jnp.clip(jnp.where(active, prev_i, i), 1, N1P - 1)
            nj = jnp.clip(jnp.where(active, prev_j, j), 1, W - 1)
        nactive = active & (ni > 1)
        return step + 1, ni, nj, cnt, nactive, runsb

    def body(st):
        step, i, j, cnt, active, runsb = st
        for _ in range(16):
            step, i, j, cnt, active, runsb = one(step, i, j, cnt, active, runsb)
        return step, i, j, cnt, active, runsb

    def cond(st):
        return st[0] < steps

    st = (jnp.int32(0), i0, j0, jnp.zeros(BD, jnp.int32),
          jnp.ones(BD, bool), runs0)
    step, i, j, cnt, active, runsb = lax.while_loop(cond, body, st)
    return cnt.ravel()[0] + runsb[0, 0] + i.ravel()[0]


def timeit(v, reps=4):
    f = jax.jit(functools.partial(walk, variant=v))
    float(f(cfj, i0j, j0j))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(cfj, i0j, j0j))
        best = min(best, time.perf_counter() - t0)
    return best


import functools as _ft


def slope(v):
    fs = {}
    best = {}
    for st in (112, 240):
        f = jax.jit(_ft.partial(walk, variant=v, steps=st))
        float(f(cfj, i0j, j0j))
        b = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            float(f(cfj, i0j, j0j))
            b = min(b, time.perf_counter() - t0)
        best[st] = b
    per = (best[240] - best[112]) / (240 - 112) * 1e6
    print(f"slope v{v}: {per:6.2f} us/step  [112st={best[112]*1e3:.1f}ms "
          f"240st={best[240]*1e3:.1f}ms]", flush=True)


slope(0)
slope(6)

names = ["gather+simple", "+decode", "+header", "+active-mask", "+cnt",
         "+dus", "+decoded-movement"]
prev = None
for v in range(7):
    t = timeit(v)
    d = "" if prev is None else f"  (delta {1e3*(t-prev):+6.2f} ms)"
    print(f"v{v} {names[v]:18s}: {t*1e3:7.2f} ms{d}", flush=True)
    prev = t
