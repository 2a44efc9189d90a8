#!/usr/bin/env python
"""Dispatch-floor-free op microbenchmarks: each op runs ITERS times inside
one jitted lax.scan, so the tunnel's per-dispatch latency (~1.3 ms) is
amortized away and the number is true device time per op.

Measures the attention-generator hot ops at 512^2 batch 8 bf16 plus
candidate alternative lowerings.  Run on an otherwise-idle chip.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from floodgan_tpu.ops.nn_ops import DIMSPEC

ITERS = 50


def timeit_scan(fn, x, iters=ITERS, reps=3):
    """Run fn iters times sequentially inside one jit (x -> f(x) chained via
    a dummy perturbation that prevents CSE), return per-iteration seconds."""

    def body(carry, _):
        y = fn(carry)
        # feed a scalar back into the input so iterations can't collapse
        carry = carry + y.ravel()[0].astype(carry.dtype) * 1e-12
        return carry, ()

    f = jax.jit(lambda x: lax.scan(body, x, None, length=iters)[0])
    y = f(x)
    float(jnp.asarray(y).ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = f(x)
        float(jnp.asarray(y).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters


def report(name, t, flops=None):
    line = f"{name:42s} {t*1e6:9.1f} us"
    if flops:
        line += f"  {flops/t/1e12:6.1f} TF/s  ({flops/t/1e12/197*100:4.1f}% MFU)"
    print(line)


def main():
    rng = np.random.default_rng(0)
    B = 8
    dt = jnp.bfloat16

    def arr(shape):
        return jnp.asarray(rng.standard_normal(shape, np.float32)).astype(dt)

    # ---- trunk conv3x3 256ch @ 128^2 (the 18x hot op) ----
    w3 = arr((3, 3, 256, 256))
    flops3 = 2 * B * 128 * 128 * 256 * 256 * 9
    x = arr((B, 128, 128, 256))
    report("trunk conv3x3 256@128^2 (conv)", timeit_scan(lambda x: lax.conv_general_dilated(
        x, w3, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DIMSPEC), x), flops3)

    # im2col variant: unfold 3x3 patches -> one (B*H*W, 2304)x(2304, 256) matmul
    def conv_im2col(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [xp[:, i:i + 128, j:j + 128, :] for i in range(3) for j in range(3)]
        patches = jnp.concatenate(cols, axis=-1)          # (B,128,128,2304)
        return patches.reshape(-1, 2304) @ w3.reshape(2304, 256)

    report("trunk conv3x3 256@128^2 (im2col)", timeit_scan(conv_im2col, x), flops3)

    # ---- stem conv7x7 9->64 @ 512^2 ----
    x9 = arr((B, 518, 518, 9))
    w7 = arr((7, 7, 9, 64))
    flops7 = 2 * B * 512 * 512 * 9 * 64 * 49
    report("stem conv7 9->64@512^2 (conv)", timeit_scan(lambda x: lax.conv_general_dilated(
        x, w7, (1, 1), "VALID", dimension_numbers=DIMSPEC), x9), flops7)

    # cin pad 9->16 (sublane-aligned)
    x16 = jnp.pad(x9, ((0, 0), (0, 0), (0, 0), (0, 7)))
    w16 = jnp.pad(w7, ((0, 0), (0, 0), (0, 7), (0, 0)))
    report("stem conv7 16->64@512^2 (cin pad)", timeit_scan(lambda x: lax.conv_general_dilated(
        x, w16, (1, 1), "VALID", dimension_numbers=DIMSPEC), x16), flops7)

    # im2col stem: (B*512*512, 441) @ (441, 64)
    def stem_im2col(x):
        cols = [x[:, i:i + 512, j:j + 512, :] for i in range(7) for j in range(7)]
        patches = jnp.concatenate(cols, axis=-1)          # (B,512,512,441)
        return patches.reshape(-1, 441) @ w7.reshape(441, 64)

    report("stem conv7 9->64@512^2 (im2col)", timeit_scan(stem_im2col, x9), flops7)

    # space-to-depth: 512^2x9 -> 256^2x36, 7x7 s1 -> 4x4 s... not shape-
    # preserving for odd k; skipped.

    # ---- content head conv7x7 64->27 @ 512^2 (cout padded to 128 today) ----
    x64 = arr((B, 518, 518, 64))
    wh = arr((7, 7, 64, 27))
    flopsh = 2 * B * 512 * 512 * 64 * 27 * 49
    whp = jnp.pad(wh, ((0, 0), (0, 0), (0, 0), (0, 101)))
    report("head conv7 64->27@512^2 (pad128)", timeit_scan(lambda x: lax.conv_general_dilated(
        x, whp, (1, 1), "VALID", dimension_numbers=DIMSPEC)[..., :27], x64), flopsh)
    report("head conv7 64->27@512^2 (raw)", timeit_scan(lambda x: lax.conv_general_dilated(
        x, wh, (1, 1), "VALID", dimension_numbers=DIMSPEC), x64), flopsh)

    def head_im2col(x):
        cols = [x[:, i:i + 512, j:j + 512, :] for i in range(7) for j in range(7)]
        patches = jnp.concatenate(cols, axis=-1)          # (B,512,512,3136)
        return patches.reshape(-1, 3136) @ whp.reshape(3136, 128)

    report("head conv7 64->27@512^2 (im2col)", timeit_scan(head_im2col, x64), flopsh)

    # ---- convT 256->128 @128^2 -> 256^2 ----
    wt = arr((3, 3, 256, 128))
    flopst = 2 * B * 256 * 256 * 128 * 256 * 9 // 4  # lhs-dilated: 1/4 taps real
    report("convT k3s2 256->128 (dilated)", timeit_scan(lambda x: lax.conv_general_dilated(
        x, jnp.flip(wt, (0, 1)), (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
        dimension_numbers=DIMSPEC), x), 4 * flopst)


if __name__ == "__main__":
    main()
