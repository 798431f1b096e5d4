#!/usr/bin/env python
"""Profiling harness for the POA Pallas kernel: DP-only vs DP+traceback."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import synth_graph_batch
from vechat_tpu.ops.kernels.poa_pallas import poa_align_pallas


def timeit(fn, a, iters=6):
    out = fn(a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(a) for _ in range(iters)]
    for o in outs:
        jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def main():
    B, N, P, D, W = 64, 640, 8, 8, 512
    args_np, cells = synth_graph_batch(B, N, P, D, W, seed=0)
    a = [jnp.asarray(x) for x in args_np]

    for name, kw in [
        ("dp_only", dict(dp_only=True)),
        ("dp+traceback", dict()),
    ]:
        dt = timeit(lambda a: poa_align_pallas(*a, align_type="nw", m=3, x=-5, g=-4, **kw), a)
        print(f"{name:14s} {dt*1e3:8.2f} ms  {cells/dt/1e9:8.2f} GCUPS")


if __name__ == "__main__":
    main()
