#!/usr/bin/env python
"""Gather cost vs element dtype and index locality (slope method)."""
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
M = B * D
rng = np.random.default_rng(0)

S1, S2 = 256, 2048


def run(name, table, i0, wrap):
    @jax.jit
    def chain(table, i0, steps):
        def body(k, st):
            i, acc = st
            code = jnp.take(table, i).astype(jnp.int32)
            i = wrap(i, code)
            return i, acc + code

        i, acc = lax.fori_loop(
            0, steps, body, (i0, jnp.zeros(M, jnp.int32))
        )
        return acc.ravel()[0]

    best = {S1: 1e9, S2: 1e9}
    for s in (S1, S2):
        float(chain(table, i0, s))
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(table, i0, s))
            best[s] = min(best[s], time.perf_counter() - t0)
    per = (best[S2] - best[S1]) / (S2 - S1) * 1e6
    print(f"{name:28s}: {per:7.2f} us/step ({per/M*1e3:5.2f} ns/idx)",
          flush=True)


idx_uniform = jnp.asarray(rng.integers(0, SZ // 2, M).astype(np.int32))
# per-walk-local: walk w confined to slab [w*SLAB, w*SLAB + SLAB)
SLAB = SZ // M
base = (np.arange(M, dtype=np.int64) * SLAB).astype(np.int32)
idx_local = jnp.asarray(
    base + rng.integers(0, SLAB // 2, M).astype(np.int32)
)

wrap_u = lambda i, c: i + 1 + (c & 1)
t16 = jnp.asarray(rng.integers(0, 100, SZ).astype(np.int16))
run("int16 uniform", t16, idx_uniform, wrap_u)
t8 = jnp.asarray(rng.integers(0, 100, SZ).astype(np.int8))
run("int8 uniform", t8, idx_uniform, wrap_u)
t32 = jnp.asarray(rng.integers(0, 100, SZ).astype(np.int32))
run("int32 uniform", t32, idx_uniform, wrap_u)
run("int16 walk-local slabs", t16, idx_local, wrap_u)
# small table (VMEM-resident scale)
small = jnp.asarray(rng.integers(0, 100, 1 << 14).astype(np.int16))
idx_small = jnp.asarray(rng.integers(0, 1 << 13, M).astype(np.int32))
run("int16 16K-entry table", small, idx_small,
    lambda i, c: (i + 1 + (c & 1)) & ((1 << 13) - 1))
# deeper dependent chain: 8 serial elementwise ops between gathers
def wrap_deep(i, c):
    x = c & 511
    y = c >> 9
    a = jnp.where(y == 31, 1, x)
    b = jnp.where(y == 30, x, 1)
    i2 = i - a + b
    i3 = jnp.where(x == 0, i, i2)
    return jnp.maximum(i3 + 2, 1)

run("int16 uniform deep-decode", t16, idx_uniform, wrap_deep)
