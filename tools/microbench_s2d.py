#!/usr/bin/env python
"""A/B the two space_to_depth_phases lowerings on the real chip at the
train-step conversion shapes (512^2 b8): 4D strided-slice concat vs the
6D reshape/transpose view.  The round-3 profile charged ~2.6 ms/step to
the 6D form's relayout + trailing-(2,2,C) transpose copies."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np
import jax
import jax.numpy as jnp

from floodgan_tpu.ops import nn_ops as N


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    x9 = jnp.asarray(rng.standard_normal((8, 512, 512, 9), np.float32)).astype(jnp.bfloat16)
    y3 = jnp.asarray(rng.standard_normal((8, 512, 512, 3), np.float32))

    CASES = {
        "slices_x9_bf16": (N._s2d_slices, x9),
        "sixd_x9_bf16": (N._space_to_depth_phases_6d, x9),
        "slices_y3_f32": (N._s2d_slices, y3),
        "sixd_y3_f32": (N._space_to_depth_phases_6d, y3),
    }

    for name, (fn, x) in CASES.items():
        def step(x, s):
            return s + jnp.sum(fn(x).astype(jnp.float32))

        g = jax.jit(step)
        s = g(x, jnp.float32(0))
        float(jax.device_get(s))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s = g(x, s)
        float(jax.device_get(s))
        t = (time.perf_counter() - t0) / args.iters
        print(f"{name:16s} fwd {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
