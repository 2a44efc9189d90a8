#!/usr/bin/env python
"""Time the phase-head chain PIECES fwd+bwd to find where the phase path
loses to the image-space path (tools/microbench_phasehead.py: img 27.0 ms
vs phase 37 ms for the content-head chain at 512^2 b8).

Pieces (shapes of the 512^2 b8 content head):
  p2p_k7        conv2d_phase_to_phase 7x7 64->27 on (8,260,260,256)
  fold_k7       image-space phasefold k7 on padded (8,518,518,64)
  pad_phase     reflect_pad_phases(3) on (8,256,256,256)
  pad_img       reflect_pad2d(3) on (8,512,512,64)
  in_phase      instance_norm_act_phases on (8,256,256,256)
  in_img        instance_norm_act on (8,512,512,64)
  dct_merged    one-conv phase_out ConvTranspose 128->64 from (8,256,256,128)
  dct_dilated   lhs-dilated ConvTranspose 128->64 (image out 512^2)
"""

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

B = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    xp260 = jnp.asarray(rng.standard_normal((B, 260, 260, 256), np.float32)).astype(dt)
    xi518 = jnp.asarray(rng.standard_normal((B, 518, 518, 64), np.float32)).astype(dt)
    xp256 = jnp.asarray(rng.standard_normal((B, 256, 256, 256), np.float32)).astype(dt)
    xi512 = jnp.asarray(rng.standard_normal((B, 512, 512, 64), np.float32)).astype(dt)
    c128 = jnp.asarray(rng.standard_normal((B, 256, 256, 128), np.float32)).astype(dt)
    w7 = jnp.asarray(rng.standard_normal((7, 7, 64, 27), np.float32) * 0.05).astype(dt)
    wt = jnp.asarray(rng.standard_normal((3, 3, 128, 64), np.float32) * 0.05).astype(dt)

    CASES = {
        "p2p_k7": (lambda x, w: N.conv2d_phase_to_phase(x, w, 3)[:, 2:258, 2:258], xp260, w7),
        "fold_k7": (lambda x, w: N._conv2d_phasefold_phases(x, w, 0)[0], xi518, w7),
        "pad_phase": (lambda x, w: N.reflect_pad_phases(x, 3, 64), xp256, w7),
        "pad_img": (lambda x, w: N.reflect_pad2d(x, 3), xi512, w7),
        "in_phase": (lambda x, w: N.instance_norm_act_phases(x, relu=True), xp256, w7),
        "in_img": (lambda x, w: N.instance_norm_act(x, relu=True), xi512, w7),
        "dct_merged": (
            lambda x, w: N._conv_transpose_phase_out_merged(x, w, 1, 1), c128, wt),
        "dct_dilated": (
            lambda x, w: N.conv_transpose2d(x, w, stride=2, padding=1, output_padding=1),
            c128, wt),
    }

    for name, (fn, x, w) in CASES.items():
        if args.only and name != args.only:
            continue

        def loss(x, w):
            return jnp.sum(fn(x, w).astype(jnp.float32) ** 2)

        def gsum(x, w, s):
            gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
            return s + jnp.sum(gx.astype(jnp.float32) ** 2) + jnp.sum(gw.astype(jnp.float32))

        g = jax.jit(gsum)
        s = g(x, w, jnp.float32(0))
        float(jax.device_get(s))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s = g(x, w, s)
        float(jax.device_get(s))
        t = (time.perf_counter() - t0) / args.iters
        print(f"{name:12s} fwd+bwd {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
