#!/usr/bin/env python
"""Traceback-walk cost decomposition on the real chip."""
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

B, N1P, D, W = 64, 704, 32, 512
N, P, L = 640, 8, N1P + W
BD = B * D
rng = np.random.default_rng(0)

dirs = jnp.asarray(rng.integers(0, 2 * P + 2, (B, N1P, D, W)).astype(np.int8))
preds = jnp.asarray(
    np.maximum(
        np.arange(N, dtype=np.int32)[None, None, :]
        - rng.integers(0, 5, (B, P, N)),
        0,
    ).astype(np.int32)
)
nid = jnp.asarray(np.tile(np.arange(N, dtype=np.int32)[None, None, :], (B, 1, 1)))
maxi = jnp.asarray(np.full((B, 1, D), N, np.int32))
maxj = jnp.asarray(np.full((B, 1, D), 480, np.int32))

STEPS = 1100


def mk_probe(name):
    return {"p": lambda o: o, "t": lambda o: o[0]}


def gather_only(dirs, maxi, maxj):
    """STEPS dependent gathers, nothing else."""
    cf = dirs.reshape(-1)
    bidx = jnp.arange(BD, dtype=jnp.int32) // D
    didx = jnp.arange(BD, dtype=jnp.int32) % D
    i = maxi[:, 0, :].reshape(BD)
    j = maxj[:, 0, :].reshape(BD)

    def body(k, st):
        i, j, acc = st
        flat = ((bidx * N1P + i) * D + didx) * W + j
        code = jnp.take(cf, flat).astype(jnp.int32)
        i = jnp.maximum(i - 1 + (code & 1), 0)
        j = jnp.maximum(j - (code & 1), 0)
        return i, j, acc + code

    i, j, acc = lax.fori_loop(0, STEPS, body, (i, j, jnp.zeros(BD, jnp.int32)))
    return acc


def update_only(dirs, maxi, maxj):
    """STEPS dynamic_update_slice pairs, no big gather."""
    i = maxi[:, 0, :].reshape(BD)
    j = maxj[:, 0, :].reshape(BD)
    pn0 = jnp.full((BD, L), -2, jnp.int32)
    pp0 = jnp.full((BD, L), -2, jnp.int32)

    def body(k, st):
        i, j, pn, pp = st
        col = L - 1 - k
        pn = lax.dynamic_update_slice(pn, (i - k)[:, None], (0, col))
        pp = lax.dynamic_update_slice(pp, (j + k)[:, None], (0, col))
        i = jnp.maximum(i - 1, 0)
        j = jnp.maximum(j - 1, 0)
        return i, j, pn, pp

    i, j, pn, pp = lax.fori_loop(0, STEPS, body, (i, j, pn0, pp0))
    return pn[:, 0] + pp[:, 0] + i + j


def full_walk(dirs, preds, nid, maxi, maxj):
    from vechat_tpu.ops.kernels.poa_pallas import _traceback_walk

    pn, pp, cnt = _traceback_walk(dirs, preds, nid, maxi, maxj, "nw", L, P)
    return cnt[:, 0]


jd = [dirs, preds, nid, maxi, maxj]

t = chain_time(
    lambda d_, mi, mj: gather_only(d_, mi, mj),
    [dirs, maxi, maxj], 1, lambda o: o[0], K=8)
print(f"gather_only ({STEPS} steps): {t*1e3:.2f} ms", flush=True)

t = chain_time(
    lambda d_, mi, mj: update_only(d_, mi, mj),
    [dirs, maxi, maxj], 1, lambda o: o[0], K=8)
print(f"update_only ({STEPS} steps): {t*1e3:.2f} ms", flush=True)

t = chain_time(full_walk, jd, 3, lambda o: o[0], K=8)
print(f"full_walk: {t*1e3:.2f} ms", flush=True)
