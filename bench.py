#!/usr/bin/env python
"""Headline benchmark: PairedAttention adversarial training steps/sec/chip
at 512x512 with the full 9-channel topography stack (the reference's
headline config: train.py --model=PairedAttention --topography=all
--resize=512 --crop=4 -> 512^2 after resize, 256^2 tiles with crop; we
bench the uncropped 512^2 step, the heavier case).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md).  We use a
documented engineering estimate of the PyTorch reference on one A100:
~1.5 TFLOP/step at 512^2 through an eager per-item python loop with
host-side TIFF decode + bicubic resize per sample at batch 1 — measured
reference-style loops of this shape run ~4 steps/s on A100-class hardware
(data-bound, not FLOP-bound).  vs_baseline = our steps/s / 4.0.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

A100_REFERENCE_STEPS_PER_SEC = 4.0


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="pairedattention")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"],
                   help="compute dtype (f32 master params either way)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialise generator activations (needed for the "
                        "cycle strategies at 512^2 with batch > 1)")
    p.add_argument("--remat_policy", default="convs", choices=["full", "convs"],
                   help="convs = save conv outputs, recompute only norms")
    p.add_argument("--pallas", nargs="?", const="1", default=None,
                   help="enable the Pallas kernel paths: '1' = all, or a "
                        "comma list of kernels ('in', 'compose').  Default "
                        "off — measured slower than XLA's own fusion on v5e "
                        "(BENCH_NOTES.md round 2)")
    args = p.parse_args()

    if args.pallas is not None:
        os.environ["FLOODGAN_PALLAS"] = args.pallas
    # Persistent compilation cache: repeat bench runs skip the multi-minute
    # XLA compile (honored by local runtimes; harmless where it is not).
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )

    import jax
    import jax.numpy as jnp
    import numpy as np

    from floodgan_tpu.train.paired import PairedTrainer
    from floodgan_tpu.train.cycle import CycleTrainer
    from floodgan_tpu.core.config import model_is_cycle

    rng = np.random.default_rng(47)
    x = jnp.asarray(rng.standard_normal((args.batch, args.size, args.size, 9), dtype=np.float32))
    y = jnp.asarray(rng.standard_normal((args.batch, args.size, args.size, 3), dtype=np.float32))

    if model_is_cycle(args.model):
        trainer = CycleTrainer(args.model, 9, compute_dtype=args.dtype,
                               remat=args.remat, remat_policy=args.remat_policy)
    else:
        trainer = PairedTrainer(args.model, 9, compute_dtype=args.dtype, remat=args.remat)
    state = trainer.init(jax.random.key(0), x, y)
    lr = jnp.float32(2e-4)

    def step(state, i):
        return trainer.train_step(state, x, y, lr, jax.random.key(i))

    # NB: sync via a host value fetch — on the tunneled (axon) backend
    # block_until_ready alone does not wait for execution.
    def sync(metrics):
        return float(jax.device_get(next(iter(metrics.values()))))

    for i in range(args.warmup):
        state, metrics = step(state, i)
    sync(metrics)

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = step(state, 100 + i)
    sync(metrics)
    dt = time.perf_counter() - t0

    steps_per_sec = args.steps / dt
    print(
        json.dumps(
            {
                "metric": f"{args.model} {args.size}^2 topo=all train steps/sec/chip (batch {args.batch})",
                "value": round(steps_per_sec * args.batch, 4),
                "unit": "steps/sec (batch-1-equivalent samples/sec)",
                "vs_baseline": round(steps_per_sec * args.batch / A100_REFERENCE_STEPS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
