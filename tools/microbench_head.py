#!/usr/bin/env python
"""Content-head conv experiments in the layout context that makes XLA slow.

In the full train step the 7x7 64->27 content-head conv (and its input
transpose in the backward) runs ~8x slower than the same conv isolated:
layout assignment gives its input {3,0,2,1} (from the producing
ConvTranspose) and the conv emitter picked for that layout is terrible
(~20 TF/s).  This bench reproduces the context — convT 128->64 (256^2 ->
512^2), reflect pad, head conv, then grads w.r.t. the convT input — and
races reformulations of the head conv inside it.
"""

from __future__ import annotations

import argparse
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

from floodgan_tpu.ops.nn_ops import DIMSPEC, reflect_pad2d

B = 8


def head_pad128(xp, w):                      # current production path
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, 101)))
    return lax.conv_general_dilated(xp, wp, (1, 1), "VALID",
                                    dimension_numbers=DIMSPEC)[..., :27]


def head_raw(xp, w):
    return lax.conv_general_dilated(xp, w, (1, 1), "VALID",
                                    dimension_numbers=DIMSPEC)


def head_rowsum(xp, w):
    # 7x7 = sum of 7 row-shifted 1x7 convs; each 1x7 conv is a clean
    # (W-window, full-channel) MXU op.
    out = None
    for r in range(7):
        part = lax.conv_general_dilated(
            xp[:, r:r + 512], w[r:r + 1], (1, 1), "VALID",
            dimension_numbers=DIMSPEC)
        out = part if out is None else out + part
    return out


def head_s2d(xp, w):
    # space-to-depth: 518^2x64 -> pad to 520 -> 260^2x256, 7x7 conv becomes
    # 4 output phases of a 4x4 conv, interleaved back (stride-1 full-res).
    # Output phase (r, c) at position (2t+r, 2u+c) sums taps (j, k) over
    # x[2t+r+j, 2u+c+k] — in s2d coords tap (j, k) lands in block
    # ((r+j)//2, (c+k)//2) channel-phase ((r+j)%2, (c+k)%2).
    xq = jnp.pad(xp, ((0, 0), (0, 2), (0, 2), (0, 0)))  # 520^2
    n, H, W, C = xq.shape
    xs = xq.reshape(n, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(n, H // 2, W // 2, 4 * C)            # (8,260,260,256)
    outs = []
    for r in (0, 1):
        row = []
        for c in (0, 1):
            wk = jnp.zeros((4, 4, 4 * C, 27), w.dtype)
            for j in range(7):
                for k in range(7):
                    bj, pj = (r + j) // 2, (r + j) % 2
                    bk, pk = (c + k) // 2, (c + k) % 2
                    wk = wk.at[bj, bk, (pj * 2 + pk) * C:(pj * 2 + pk) * C + C].set(
                        w[j, k])
            row.append(lax.conv_general_dilated(
                xs, wk, (1, 1), "VALID", dimension_numbers=DIMSPEC)[:, :256, :256])
        outs.append(row)
    grid = jnp.stack([jnp.stack(r, axis=3) for r in outs], axis=2)
    return grid.reshape(n, 512, 512, 27)


def head_s2d2(xp, w):
    # like head_s2d but ONE conv with all 4 output phases folded into the
    # channel dim (cout 4*27=108: ~84% lane utilization vs 27 -> 21%)
    xq = jnp.pad(xp, ((0, 0), (0, 2), (0, 2), (0, 0)))  # 520^2
    n, H, W, C = xq.shape
    xs = xq.reshape(n, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(n, H // 2, W // 2, 4 * C)            # (8,260,260,256)
    wk = jnp.zeros((4, 4, 4 * C, 4 * 27), w.dtype)
    for r in (0, 1):
        for c in (0, 1):
            o = (r * 2 + c) * 27
            for j in range(7):
                for k in range(7):
                    bj, pj = (r + j) // 2, (r + j) % 2
                    bk, pk = (c + k) // 2, (c + k) % 2
                    wk = wk.at[bj, bk, (pj * 2 + pk) * C:(pj * 2 + pk + 1) * C,
                               o:o + 27].set(w[j, k])
    out = lax.conv_general_dilated(xs, wk, (1, 1), "VALID",
                                   dimension_numbers=DIMSPEC)[:, :256, :256]
    # out[t, u, (r*2+c)*27+ch] -> y[2t+r, 2u+c, ch]
    out = out.reshape(n, 256, 256, 2, 2, 27).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(n, 512, 512, 27)


def head_raw_ob(xp, w):
    # materialize the reflect-pad: stop XLA fusing the pad's reverse/concat
    # chain into the conv (suspected bad-emitter trigger)
    (xp,) = lax.optimization_barrier((xp,))
    return head_raw(xp, w)


def head_pad128_ob(xp, w):
    (xp,) = lax.optimization_barrier((xp,))
    return head_pad128(xp, w)


def head_raw_nchw(xp, w):
    # physically transpose to NCHW: different conv emitter family
    xt = jnp.transpose(xp, (0, 3, 1, 2))
    wt = jnp.transpose(w, (3, 2, 0, 1))  # HWIO -> OIHW
    out = lax.conv_general_dilated(xt, wt, (1, 1), "VALID",
                                   dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return jnp.transpose(out, (0, 2, 3, 1))


def head_raw_relayout(xp, w):
    # force a row-major relayout: collapse to 2D (layout {1,0}), barrier so
    # the reshapes can't cancel, reshape back -> conv sees {3,2,1,0} input
    n, h, wd, c = xp.shape
    x2 = xp.reshape(-1, c)
    (x2,) = lax.optimization_barrier((x2,))
    return head_raw(x2.reshape(n, h, wd, c), w)


def head_raw_pallasfence(xp, w):
    # a trivial Pallas passthrough pins its operand/result to the standard
    # row-major tiled layout — a "layout fence" before the conv
    from jax.experimental import pallas as pl

    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    n, h, wd, c = xp.shape
    fenced = pl.pallas_call(
        copy_kernel,
        out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
        grid=(n, h),
        in_specs=[pl.BlockSpec((1, 1, wd, c), lambda i, j: (i, j, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, wd, c), lambda i, j: (i, j, 0, 0)),
    )(xp)
    return head_raw(fenced, w)


def head_none(xp, w):
    # context baseline: no head conv at all (convT + reflect pad + loss)
    return xp[:, 3:-3, 3:-3, :27]


HEADS = {"pad128": head_pad128, "raw": head_raw, "rowsum": head_rowsum,
         "s2d": head_s2d, "s2d2": head_s2d2, "raw_ob": head_raw_ob, "pad128_ob": head_pad128_ob,
         "raw_nchw": head_raw_nchw, "none": head_none,
         "raw_relayout": head_raw_relayout,
         "raw_pallasfence": head_raw_pallasfence}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", choices=sorted(HEADS) + ["all", "check"], default="all")
    ap.add_argument("--fwd", action="store_true", help="time forward only")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    h = jnp.asarray(rng.standard_normal((B, 256, 256, 128), np.float32)).astype(dt)
    wt = jnp.asarray(rng.standard_normal((3, 3, 128, 64), np.float32) * 0.05).astype(dt)
    w7 = jnp.asarray(rng.standard_normal((7, 7, 64, 27), np.float32) * 0.05).astype(dt)
    flops = 2 * B * 512 * 512 * 64 * 27 * 49 * 3  # fwd + ~2x bwd

    if args.variant == "check":
        outs = {}
        for name, fn in HEADS.items():
            def full(h):
                x = lax.conv_general_dilated(h, jnp.flip(wt, (0, 1)), (1, 1),
                                             ((1, 2), (1, 2)), lhs_dilation=(2, 2),
                                             dimension_numbers=DIMSPEC)
                return fn(reflect_pad2d(x, 3), w7)
            outs[name] = np.asarray(jax.jit(full)(h), np.float32)
        base = outs["raw"]
        for name, o in outs.items():
            print(name, "max|diff| =", float(np.abs(o - base).max()))
        return

    names = sorted(HEADS) if args.variant == "all" else [args.variant]
    for name in names:
        fn = HEADS[name]

        def loss(h):
            x = lax.conv_general_dilated(h, jnp.flip(wt, (0, 1)), (1, 1),
                                         ((1, 2), (1, 2)), lhs_dilation=(2, 2),
                                         dimension_numbers=DIMSPEC)
            out = fn(reflect_pad2d(x, 3), w7)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.jit(loss) if args.fwd else jax.jit(jax.grad(loss))
        y = g(h)
        float(jnp.asarray(y).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            y = g(h)
        float(jnp.asarray(y).ravel()[0])
        t = (time.perf_counter() - t0) / args.iters
        print(f"{name:8s} fwd+bwd {t*1e3:7.2f} ms   ~{flops/t/1e12:6.1f} TF/s (head-only flops)")


if __name__ == "__main__":
    main()
