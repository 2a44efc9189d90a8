#!/usr/bin/env python
"""Op-level TPU microbenchmarks guiding kernel optimization.

Times (with explicit value-fetch sync — see BENCH_NOTES.md) the hot
sub-graphs of the attention generator at 512^2, plus the two ConvTranspose
lowerings head-to-head.  Run on an otherwise-idle chip.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from floodgan_tpu.ops.nn_ops import conv2d, conv_transpose2d, instance_norm


def timeit(fn, *args, iters=20, warmup=3):
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    B = 8
    dt = jnp.bfloat16

    x256 = jnp.asarray(rng.standard_normal((B, 128, 128, 256), np.float32)).astype(dt)
    w3 = jnp.asarray(rng.standard_normal((3, 3, 256, 256), np.float32)).astype(dt)
    t = timeit(lambda x, w: conv2d(x, w, padding=1), x256, w3)
    flops = 2 * B * 128 * 128 * 256 * 256 * 9
    print(f"res-trunk conv3x3 256ch@128^2:  {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TF/s")

    t = timeit(lambda x: instance_norm(x), x256)
    print(f"instance_norm 256ch@128^2:      {t*1e3:7.2f} ms")

    wt = jnp.asarray(rng.standard_normal((3, 3, 256, 128), np.float32)).astype(dt)
    for method in ("dilated", "subpixel"):
        t = timeit(
            lambda x, w: conv_transpose2d(x, w, stride=2, padding=1, output_padding=1, method=method),
            x256, wt,
        )
        flops = 2 * B * 256 * 256 * 128 * 256 * 9
        print(f"convT k3s2 256->128 ({method:8s}): {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TF/s")

    x64 = jnp.asarray(rng.standard_normal((B, 512, 512, 64), np.float32)).astype(dt)
    w7 = jnp.asarray(rng.standard_normal((7, 7, 64, 27), np.float32)).astype(dt)
    t = timeit(lambda x, w: conv2d(x, w, padding=0), jnp.pad(x64, ((0,0),(3,3),(3,3),(0,0))), w7)
    print(f"content head conv7 64->27@512^2: {t*1e3:7.2f} ms")

    x9 = jnp.asarray(rng.standard_normal((B, 512, 512, 9), np.float32)).astype(dt)
    w7s = jnp.asarray(rng.standard_normal((7, 7, 9, 64), np.float32)).astype(dt)
    t = timeit(lambda x, w: conv2d(x, w, padding=0), jnp.pad(x9, ((0,0),(3,3),(3,3),(0,0))), w7s)
    print(f"stem conv7 9->64@512^2:          {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
