#!/usr/bin/env python
"""Race the content-head chain lowerings (deconv2 -> IN/relu -> reflectpad
-> k7 head conv -> phases) fwd+bwd, in the production context.

The round-3 profile attributes ~13 ms of the 144 ms headline step to the
image-space content-head k7 chain (fwd 3.4 + d-input 5.8 at padded 518^2 +
wgrad 4.0) plus ~12 ms of 64-channel elementwise fusions at 512^2 (IN
stats/backward, relu masks: 64 lanes = half a 128-lane register wasted)
and ~6 ms of 518^2 pad/slice/reverse traffic.  The phase head removes all
three but measured SLOWER (50.79 vs 54.07 samples/s) with the 4-conv
subpixel deconv2 split (each conv emits cout=64 -> half-empty lanes).
This bench isolates the chain and races:

  img          dilated convT 128->64 @512^2, image IN/relu, reflect pad,
               phasefold k7 (the production default path)
  phase_split  4-conv subpixel phase_out + phase IN + phase pad + p2p
               (the measured-and-losing FLOODGAN_PHASE_HEAD=1 build)
  phase_merged ONE-conv phase_out (2x2 kernel, 128->256ch) + same tail

All variants end in the SAME phase-major (8,256,256,108) tensor feeding
the compose, so outputs are directly comparable (check mode).
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
S = 256  # deconv2 input spatial (512^2 model: trunk 128^2 -> deconv1 256^2)


def chain_img(c, wt, bt, w7, b7):
    x = N.conv_transpose2d(c, wt, bt, stride=2, padding=1, output_padding=1)
    x = N.instance_norm_act(x, relu=True)
    x = N.reflect_pad2d(x, 3)
    p, oh, ow = N._conv2d_phasefold_phases(x, w7, 0)
    return p + jnp.tile(b7, 4)


def _chain_phase(c, wt, bt, w7, b7, split):
    os.environ["FLOODGAN_PHASE_OUT_SPLIT"] = "1" if split else "0"
    try:
        xp = N.conv_transpose2d_phase_out(c, wt, bt, padding=1, output_padding=1)
    finally:
        os.environ.pop("FLOODGAN_PHASE_OUT_SPLIT", None)
    xp = N.instance_norm_act_phases(xp, relu=True)
    xp = N.reflect_pad_phases(xp, 3, 64)
    out = N.conv2d_phase_to_phase(xp, w7, 3, b7)
    return out[:, 2 : 2 + S, 2 : 2 + S]


def chain_phase_split(c, wt, bt, w7, b7):
    return _chain_phase(c, wt, bt, w7, b7, split=True)


def chain_phase_merged(c, wt, bt, w7, b7):
    return _chain_phase(c, wt, bt, w7, b7, split=False)


CHAINS = {
    "img": chain_img,
    "phase_split": chain_phase_split,
    "phase_merged": chain_phase_merged,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", choices=sorted(CHAINS) + ["all", "check"], default="all")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    c = jnp.asarray(rng.standard_normal((B, S, S, 128), np.float32)).astype(dt)
    wt = jnp.asarray(rng.standard_normal((3, 3, 128, 64), np.float32) * 0.05).astype(dt)
    bt = jnp.zeros((64,), dt)
    w7 = jnp.asarray(rng.standard_normal((7, 7, 64, 27), np.float32) * 0.05).astype(dt)
    b7 = jnp.zeros((27,), dt)

    if args.variant == "check":
        outs = {
            name: np.asarray(jax.jit(fn)(c, wt, bt, w7, b7), np.float32)
            for name, fn in CHAINS.items()
        }
        # img emits phases of the UNSLICED padded grid in phasefold layout;
        # align: chain_img output is phases of the 512^2 result directly.
        base = outs["img"]
        for name, o in outs.items():
            print(name, o.shape, "max|diff| =", float(np.abs(o - base).max()))
        return

    names = sorted(CHAINS) if args.variant == "all" else [args.variant]
    for name in names:
        fn = CHAINS[name]

        def loss(c, wt, w7):
            out = fn(c, wt, bt, w7, b7)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        # Keep every jit output SCALAR: fetching a big grad array through
        # the dev tunnel (~17 MB/s) dwarfs the compute being timed.
        def gsum(c, wt, w7, s):
            gc, gwt, gw7 = jax.grad(loss, argnums=(0, 1, 2))(c, wt, w7)
            return s + jnp.sum(gc.astype(jnp.float32) ** 2) + jnp.sum(
                gwt.astype(jnp.float32)
            ) + jnp.sum(gw7.astype(jnp.float32))

        g = jax.jit(gsum)
        s = g(c, wt, w7, jnp.float32(0))
        float(jax.device_get(s))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s = g(c, wt, w7, s)
        float(jax.device_get(s))
        t = (time.perf_counter() - t0) / args.iters
        print(f"{name:13s} fwd+bwd {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
