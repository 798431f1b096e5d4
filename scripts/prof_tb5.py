#!/usr/bin/env python
"""Dependent-gather chain cost vs indices-per-step, real chip.

If cost/step is convex in index count, splitting BD walks into G groups
walked sequentially (each gathering BD/G indices/step) cuts total walk
time despite G x the serial steps.
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

B, D, W, N1P = 64, 64, 512, 704
SZ = B * N1P * D * W
rng = np.random.default_rng(0)
big = jnp.asarray(rng.integers(0, 100, SZ).astype(np.int16))

def mk(m, steps):
    i0 = jnp.asarray(rng.integers(0, SZ // 2, m).astype(np.int32))

    @jax.jit
    def chain(big, i0):
        def body(k, st):
            i, acc = st
            code = jnp.take(big, i).astype(jnp.int32)
            i = i + 1 + (code & 1)
            return i, acc + code

        i, acc = lax.fori_loop(0, steps, body, (i0, jnp.zeros(m, jnp.int32)))
        return acc.ravel()[0]

    return chain, i0


def t(chain, big, i0, reps=3):
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chain(big, i0))
        best = min(best, time.perf_counter() - t0)
    return best


S1, S2 = 256, 2048
for m in (128, 256, 512, 1024, 2048, 4096):
    c1, i1 = mk(m, S1)
    c2, i2 = mk(m, S2)
    float(c1(big, i1)); float(c2(big, i2))  # warm/compile
    t1 = t(c1, big, i1)
    t2 = t(c2, big, i2)
    per = (t2 - t1) / (S2 - S1) * 1e6
    print(
        f"m={m:5d}: {per:8.2f} us/step  ({per/m*1e3:6.2f} ns/idx)  "
        f"[t256={t1*1e3:.1f}ms t2048={t2*1e3:.1f}ms]",
        flush=True,
    )
