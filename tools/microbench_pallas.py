#!/usr/bin/env python
"""Pallas-vs-XLA head-to-head on the real TPU chip.

Benches the two Pallas kernels (fused instance norm, attention compose)
against their jnp/XLA-fused equivalents at the model's real shapes, forward
and forward+backward.  Each (op, impl, mode) is a separate invocation so a
stalled remote compile only loses one data point:

    python tools/microbench_pallas.py --op in --impl pallas
    python tools/microbench_pallas.py --op in --impl jnp --grad
    python tools/microbench_pallas.py --op compose --impl pallas --grad
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--op", choices=["in", "in_res", "compose"], required=True)
    p.add_argument("--impl", choices=["pallas", "jnp"], required=True)
    p.add_argument("--grad", action="store_true")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    os.environ["FLOODGAN_PALLAS"] = "1" if args.impl == "pallas" else "0"

    import numpy as np
    import jax
    import jax.numpy as jnp

    from floodgan_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(0)
    B = args.batch
    dt = jnp.bfloat16

    if args.op in ("in", "in_res"):
        # trunk shape: 256ch @ 128^2 (9 residual blocks live here)
        x = jnp.asarray(rng.standard_normal((B, 128, 128, 256), np.float32)).astype(dt)
        res = (
            jnp.asarray(rng.standard_normal((B, 128, 128, 256), np.float32)).astype(dt)
            if args.op == "in_res"
            else None
        )
        if args.impl == "pallas":
            fn = lambda x: pk.fused_instance_norm(x, residual=res, relu=True)
        else:
            fn = lambda x: pk._instance_norm_jnp(x, res, True, 1e-5)
        nbytes = x.size * 2 * (2 if res is None else 3)
    else:
        content = jnp.asarray(rng.standard_normal((B, 512, 512, 27), np.float32)).astype(dt)
        logits = jnp.asarray(rng.standard_normal((B, 512, 512, 10), np.float32)).astype(dt)
        rgb = jnp.asarray(rng.standard_normal((B, 512, 512, 3), np.float32)).astype(dt)
        if args.impl == "pallas":
            fn0 = pk.attention_compose
        else:
            fn0 = pk._attention_compose_jnp
        fn = lambda c: fn0(c, logits, rgb)[0]
        x = content
        nbytes = (content.size + logits.size + rgb.size + B * 512 * 512 * 4) * 2

    if args.grad:
        f = jax.jit(jax.grad(lambda x: jnp.sum(fn(x).astype(jnp.float32))))
    else:
        f = jax.jit(fn)

    t_compile0 = time.perf_counter()
    out = f(x)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    compile_s = time.perf_counter() - t_compile0
    for _ in range(3):
        out = f(x)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = f(x)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    dt_s = (time.perf_counter() - t0) / args.iters
    print(
        json.dumps(
            {
                "op": args.op,
                "impl": args.impl,
                "grad": args.grad,
                "ms": round(dt_s * 1e3, 3),
                "GB/s": round(nbytes / dt_s / 1e9, 1),
                "compile_s": round(compile_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
