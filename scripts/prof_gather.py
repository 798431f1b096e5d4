#!/usr/bin/env python
"""Dependent-gather latency vs table size / index count / dtype."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ktime import chain_time  # noqa: E402

STEPS = 1000


def chain_gather(table, idx0, nidx):
    def body(k, st):
        i, acc = st
        v = jnp.take(table, i).astype(jnp.int32)
        i = (i + v + k) % table.shape[0]
        return i, acc + v

    i, acc = lax.fori_loop(
        0, STEPS, body, (idx0, jnp.zeros(nidx, jnp.int32))
    )
    return acc


rng = np.random.default_rng(0)
for size, nidx, dt in [
    (369_000_000, 2048, np.int8),
    (4_000_000, 2048, np.int8),
    (65536, 2048, np.int8),
    (369_000_000, 256, np.int8),
    (369_000_000, 8192, np.int8),
    (92_000_000, 2048, np.int32),
]:
    table = jnp.asarray(rng.integers(0, 100, size).astype(dt))
    idx0 = jnp.asarray(rng.integers(0, size, nidx).astype(np.int32))
    t = chain_time(
        lambda tb, i0: chain_gather(tb, i0, nidx),
        [table, idx0], 1, lambda o: o[0], K=4)
    print(
        f"table={size/1e6:.0f}M {np.dtype(dt).name} nidx={nidx}: "
        f"{t/STEPS*1e6:.2f} us/step",
        flush=True,
    )
