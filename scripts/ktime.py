#!/usr/bin/env python
"""Kernel variant timing harness (device-side, tunnel-latency-proof).

Times jitted functions by chaining K dependent iterations inside one jit
(dependency built with a runtime-true `where` XLA cannot fold) and fetching
one tiny value at the end; the ~65 ms host<->device roundtrip of this
machine's tunneled TPU is paid once, not per iteration.
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def dep(x, v):
    """Data dependency of x on scalar v that XLA cannot constant-fold."""
    return jnp.where(v > jnp.int32(-(2**30)), x, x - 1)


def chain_time(fn, args, feed_idx, probe, K=8, warm=True, roundtrip=0.065):
    """Time fn(*args) per call. fn's output is reduced by `probe` (out ->
    int32 scalar); that scalar feeds back into args[feed_idx] via dep().
    All args are passed explicitly (no closure constants -> no giant HLO).
    """

    @jax.jit
    def chained(*a):
        def body(i, a):
            out = fn(*a)
            a = list(a)
            a[feed_idx] = dep(a[feed_idx], probe(out))
            return tuple(a)

        return lax.fori_loop(0, K, body, tuple(a))[feed_idx]

    r = chained(*args)
    np.asarray(r).ravel()[:1]
    t0 = time.perf_counter()
    r = chained(*args)
    np.asarray(r).ravel()[:1]
    tot = time.perf_counter() - t0
    return max(tot - roundtrip, 1e-9) / K
