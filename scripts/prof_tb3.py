#!/usr/bin/env python
"""Micro-costs of candidate RLE-expansion primitives on the real chip.

The run-compressed walk needs a device-side expansion from per-step runs to
dense right-aligned pairs. Candidates measured at the full-stage scale
(BD=4096 walks x L=1152 slots ~ 4.7M elements):
  * one big independent gather (4.7M indices, 3GB table)
  * take_along_axis within rows of a [BD, L] table (small per-row tables)
  * vmapped searchsorted (sorted per-row) -- the direct expansion map
  * scatter .at[].set of 4.7M values
  * associative_scan (tuple carry) reverse over [BD, L]
  * cumsum over [BD, L]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ktime import dep  # noqa: E402
import time  # noqa: E402


def chain_time_scalar(fn, args, feed_idx, probe, K=8, roundtrip=0.065):
    """Like ktime.chain_time but fetches ONE element of the fed arg, not the
    whole array (feeding a large array back through chain_time fetches it
    over the ~10 MB/s tunnel and poisons the measurement)."""

    @jax.jit
    def chained(*a):
        def body(i, a):
            out = fn(*a)
            a = list(a)
            a[feed_idx] = dep(a[feed_idx], probe(out))
            return tuple(a)

        return lax.fori_loop(0, K, body, tuple(a))[feed_idx].ravel()[0]

    r = chained(*args)
    np.asarray(r)
    t0 = time.perf_counter()
    r = chained(*args)
    np.asarray(r)
    tot = time.perf_counter() - t0
    return max(tot - roundtrip, 1e-9) / K

B, D, W, N1P = 64, 64, 512, 704
BD = B * D
L = 1152
rng = np.random.default_rng(0)

big = jnp.asarray(rng.integers(0, 100, B * N1P * D * W).astype(np.int16))
idx_flat = jnp.asarray(
    rng.integers(0, B * N1P * D * W, BD * L).astype(np.int32)
)
tab = jnp.asarray(rng.integers(0, 100, (BD, L)).astype(np.int32))
rowidx = jnp.asarray(rng.integers(0, L, (BD, L)).astype(np.int32))
sorted_rows = jnp.asarray(
    np.sort(rng.integers(0, 4 * L, (BD, L)).astype(np.int32), axis=1)
)
q = jnp.asarray(rng.integers(0, 4 * L, (BD, L)).astype(np.int32))
scat_idx = jnp.asarray(rng.permutation(BD * L).astype(np.int32))
vals = jnp.asarray(rng.integers(0, 100, BD * L).astype(np.int32))


def big_gather(big, idx):
    return jnp.take(big, idx).astype(jnp.int32).sum()[None]


def row_take(tab, rowidx):
    return jnp.take_along_axis(tab, rowidx, axis=1).sum()[None]


def vsearch(sorted_rows, q):
    f = jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="right"))
    return f(sorted_rows, q).sum()[None]


def scatter_set(vals, scat_idx):
    out = jnp.zeros(BD * L, jnp.int32)
    return out.at[scat_idx].set(vals).sum()[None]


def ascan(tab, rowidx):
    def comb(a, b):
        ka, va = a
        kb, vb = b
        take_b = kb >= ka
        return jnp.where(take_b, kb, ka), jnp.where(take_b, vb, va)

    k, v = lax.associative_scan(comb, (rowidx, tab), reverse=True, axis=1)
    return (k + v).sum()[None]


def cs(tab, rowidx):
    return jnp.cumsum(tab, axis=1).sum()[None]


def run(name, fn, args):
    t = chain_time_scalar(fn, list(args), 1, lambda o: o[0], K=8)
    print(f"{name}: {t*1e3:.3f} ms", flush=True)


def ewise_add(tab, rowidx):
    return (tab + rowidx).sum()[None]


run("ewise add (calibration)", ewise_add, [tab, rowidx])


run("big_gather 4.7M/3GB", big_gather, [big, idx_flat])
run("row take_along_axis 4.7M", row_take, [tab, rowidx])
run("vmap searchsorted", vsearch, [sorted_rows, q])
run("scatter_set 4.7M", scatter_set, [vals, scat_idx])
run("associative_scan tuple", ascan, [tab, rowidx])
run("cumsum", cs, [tab, rowidx])
