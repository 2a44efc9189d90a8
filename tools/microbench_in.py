#!/usr/bin/env python
"""Instance-norm implementation shootout on TPU (the current jnp IN costs
~2ms at 128^2x256xB8 — comparable to a full 3x3 conv; find the fast form).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def timeit(fn, *args, iters=30, warmup=3):
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


EPS = 1e-5


def in_current(x):
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    return ((x32 - mean) * lax.rsqrt(var + EPS)).astype(dt)


def in_meansq(x):
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    meansq = jnp.mean(x32 * x32, axis=(1, 2), keepdims=True)
    var = meansq - mean * mean
    return ((x32 - mean) * lax.rsqrt(var + EPS)).astype(dt)


def in_reshaped(x):
    dt = x.dtype
    n, h, w, c = x.shape
    x32 = x.reshape(n, h * w, c).astype(jnp.float32)
    mean = jnp.mean(x32, axis=1, keepdims=True)
    meansq = jnp.mean(x32 * x32, axis=1, keepdims=True)
    var = meansq - mean * mean
    return ((x32 - mean) * lax.rsqrt(var + EPS)).astype(dt).reshape(n, h, w, c)


def in_bf16stats(x):
    # bf16 reductions (numerically risky — measurement only)
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
    return (x - mean) * lax.rsqrt(var + EPS)


def main():
    rng = np.random.default_rng(0)
    B = 8
    x = jnp.asarray(rng.standard_normal((B, 128, 128, 256), np.float32)).astype(jnp.bfloat16)

    for name, fn in [
        ("current (mean+var, 2 axes)", in_current),
        ("mean/meansq one pass", in_meansq),
        ("reshape (N,HW,C)", in_reshaped),
        ("bf16 stats", in_bf16stats),
    ]:
        t = timeit(fn, x)
        print(f"IN {name:28s}: {t*1e3:7.3f} ms")

    # conv + IN fused in one jit (does fusion change the picture?)
    w3 = jnp.asarray(rng.standard_normal((3, 3, 256, 256), np.float32)).astype(jnp.bfloat16)

    def conv_only(x, w):
        return lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv_in(x, w):
        return in_meansq(conv_only(x, w))

    t0 = timeit(conv_only, x, w3)
    t1 = timeit(conv_in, x, w3)
    print(f"conv3x3 alone: {t0*1e3:7.3f} ms ; conv3x3+IN(one jit): {t1*1e3:7.3f} ms ; IN marginal {1e3*(t1-t0):7.3f} ms")

    # content-head conv7 in f32 vs bf16
    x64 = jnp.asarray(rng.standard_normal((B, 518, 518, 64), np.float32))
    w7 = jnp.asarray(rng.standard_normal((7, 7, 64, 27), np.float32))
    for dt in (jnp.bfloat16, jnp.float32):
        t = timeit(lambda a, b: conv_only(a.astype(dt), b.astype(dt)).astype(jnp.float32)[:, :512, :512],
                   x64, w7)
        print(f"head conv7 64->27 {dt.__name__:9s}: {t*1e3:7.2f} ms")
    # padded cout variant
    w7p = jnp.pad(w7, ((0, 0), (0, 0), (0, 0), (0, 101)))
    t = timeit(lambda a, b: conv_only(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))[:, :512, :512, :27].astype(jnp.float32),
               x64, w7p)
    print(f"head conv7 64->128(pad27) bf16: {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
