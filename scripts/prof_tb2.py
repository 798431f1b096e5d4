#!/usr/bin/env python
"""Traceback-walk cost decomposition v2 (round 5) on the real chip.

Candidates for closing the dp+tb vs dp-only gap (VERDICT r4 #3):
  * gather granularity: one 4096-index take vs 16x256 chunks
  * pair-store layout: current [BD, LP] column DUS writes (stride-LP
    scatter per step) vs [LP, BD] row-contiguous packed single write
  * packed emit: (pn+2)<<16 | (pp+2) in one int32 write, unpack at the end
Shapes = the full bench stage (B=64 N=640 P=8 D=64 W=512).
"""
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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ktime import chain_time  # noqa: E402

B, D, W = 64, 64, 512
N, P = 640, 8
ROW_CHUNK = 32
NC = -(-(N + 1) // ROW_CHUNK)
N1P = NC * ROW_CHUNK
L = N + W
BD = B * D
DELTA_BITS = 9
rng = np.random.default_rng(0)

# realistic-ish dirs: mostly diagonal prio with delta 1
prio = rng.integers(1, 2 * P + 2, (B, N1P, D, W)).astype(np.int32)
delta = rng.integers(0, 4, (B, N1P, D, W)).astype(np.int32)
dirs = jnp.asarray(((prio << DELTA_BITS) | delta).astype(np.int16))
maxi = jnp.asarray(np.full((B, 1, D), N, np.int32))
maxj = jnp.asarray(np.full((B, 1, D), 480, np.int32))

STEPS = 1100


def gather_chunked(dirs, maxi, maxj, gchunk):
    cf = dirs.reshape(-1)
    bidx = jnp.arange(BD, dtype=jnp.int32) // D
    didx = jnp.arange(BD, dtype=jnp.int32) % D
    i = maxi[:, 0, :].reshape(BD)
    j = maxj[:, 0, :].reshape(BD)
    NG = -(-BD // gchunk)

    def g(flat):
        if NG == 1:
            return jnp.take(cf, flat).astype(jnp.int32)
        parts = [
            jnp.take(cf, lax.dynamic_slice(flat, (k * gchunk,), (gchunk,)))
            for k in range(NG)
        ]
        return jnp.concatenate(parts).astype(jnp.int32)

    def body(k, st):
        i, j, acc = st
        flat = ((bidx * N1P + i) * D + didx) * W + j
        code = g(flat)
        i = jnp.maximum(i - 1 + (code & 1), 1)
        j = jnp.maximum(j - (code & 1), 1)
        return i, j, acc + code

    i, j, acc = lax.fori_loop(0, STEPS, body, (i, j, jnp.zeros(BD, jnp.int32)))
    return acc


def update_cols(dirs, maxi, maxj):
    """Current layout: two [BD, LP] buffers, one column DUS each per step."""
    i = maxi[:, 0, :].reshape(BD)
    j = maxj[:, 0, :].reshape(BD)
    pn0 = jnp.full((BD, L), -2, jnp.int32)
    pp0 = jnp.full((BD, L), -2, jnp.int32)

    def body(k, st):
        i, j, pn, pp = st
        col = L - 1 - k
        pn = lax.dynamic_update_slice(pn, (i - k)[:, None], (0, col))
        pp = lax.dynamic_update_slice(pp, (j + k)[:, None], (0, col))
        i = jnp.maximum(i - 1, 1)
        j = jnp.maximum(j - 1, 1)
        return i, j, pn, pp

    i, j, pn, pp = lax.fori_loop(0, STEPS, body, (i, j, pn0, pp0))
    return pn[:, 0] + pp[:, 0] + i + j


def update_rows_packed(dirs, maxi, maxj):
    """[LP, BD] buffer, ONE row-contiguous packed int32 write per step."""
    i = maxi[:, 0, :].reshape(BD)
    j = maxj[:, 0, :].reshape(BD)
    pk0 = jnp.zeros((L, BD), jnp.int32)

    def body(k, st):
        i, j, pk = st
        row = L - 1 - k
        v = (((i - k) + 2) << 16) | ((j + k + 2) & 0xFFFF)
        pk = lax.dynamic_update_slice(pk, v[None, :], (row, 0))
        i = jnp.maximum(i - 1, 1)
        j = jnp.maximum(j - 1, 1)
        return i, j, pk

    i, j, pk = lax.fori_loop(0, STEPS, body, (i, j, pk0))
    return pk[0] + i + j


def full_walk_current(dirs, maxi, maxj):
    from vechat_tpu.ops.kernels.poa_pallas import _traceback_walk

    pn, pp, cnt = _traceback_walk(dirs, maxi, maxj, "nw", L, P)
    return cnt[:, 0]


def run(name, fn, args, feed_idx, probe):
    t = chain_time(fn, args, feed_idx, probe, K=8)
    print(f"{name}: {t*1e3:.2f} ms", flush=True)
    return t


jd = [dirs, maxi, maxj]
pr = lambda o: o[0]
run(f"gather 1x{BD}", lambda d, a, b: gather_chunked(d, a, b, BD), jd, 1, pr)
run("gather 16x256", lambda d, a, b: gather_chunked(d, a, b, 256), jd, 1, pr)
run("gather 8x512", lambda d, a, b: gather_chunked(d, a, b, 512), jd, 1, pr)
run("gather 4x1024", lambda d, a, b: gather_chunked(d, a, b, 1024), jd, 1, pr)
run("update cols (current)", update_cols, jd, 1, pr)
run("update rows packed", update_rows_packed, jd, 1, pr)
run("full_walk current", full_walk_current, jd, 1, pr)
