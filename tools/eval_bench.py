#!/usr/bin/env python
"""Evaluation-path benchmark: the full calculate_metrics device pipeline.

Measures the per-batch metric suite exactly as Model.calculate_metrics
runs it (reference hot loop: models/model.py:388-410) — generator
forward, denormalize, per-image PSNR/SSIM/MS-SSIM, two segmentation
U-Net mask predictions (output + ground truth), and the confusion-count
update — with device-resident batches, so the number is the eval
throughput ceiling a host pipeline must feed.  Prints one JSON line.

    python tools/eval_bench.py [--model pairedattention] [--size 512] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="pairedattention")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )

    import jax
    import jax.numpy as jnp
    import numpy as np

    from floodgan_tpu.core.config import model_is_cycle
    from floodgan_tpu.eval.metrics import (
        MS_SSIM_MIN_SIDE,
        MaskMetricsAccumulator,
        make_eval_batch_metrics,
    )
    from floodgan_tpu.train.cycle import CycleTrainer
    from floodgan_tpu.train.paired import PairedTrainer
    from floodgan_tpu.train.seg import SegTrainer

    rng = np.random.default_rng(47)
    x = jnp.asarray(rng.standard_normal((args.batch, args.size, args.size, 9), dtype=np.float32))
    y = jnp.asarray(rng.standard_normal((args.batch, args.size, args.size, 3), dtype=np.float32))

    if model_is_cycle(args.model):
        trainer = CycleTrainer(args.model, 9, compute_dtype=args.dtype)
        state = trainer.init(jax.random.key(0), x, y)
        gen = lambda xx: trainer.generate(state.gen_params, xx, "ab")[0]
    else:
        trainer = PairedTrainer(args.model, 9, compute_dtype=args.dtype)
        state = trainer.init(jax.random.key(0), x, y)
        key = jax.random.key(47)
        gen = lambda xx: trainer.generate(state.gen_params, xx, key)[0]

    seg = SegTrainer(compute_dtype=args.dtype)
    seg_params = seg.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3))).params

    ms_ok = args.size >= MS_SSIM_MIN_SIDE
    masks = MaskMetricsAccumulator()
    fused = make_eval_batch_metrics(seg._predict_mask)

    def eval_batch(xx, yy):
        # Same fused one-dispatch metric block as Model.calculate_metrics
        # and bench.py --mode eval (measured +10% over the unfused loop).
        imgm, counts = jax.device_get(
            fused(seg_params, gen(xx), yy, with_ms_ssim=ms_ok)
        )
        masks.add_counts(counts)
        return imgm

    for _ in range(args.warmup):
        imgm = eval_batch(x, y)
    _ = masks.compute()  # force the accumulated counts (host sync)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        imgm = eval_batch(x, y)
    _ = masks.compute()
    dt = time.perf_counter() - t0

    images_per_sec = args.iters * args.batch / dt
    print(json.dumps({
        "metric": f"{args.model} {args.size}^2 eval-metrics images/sec/chip (batch {args.batch})",
        "value": round(images_per_sec, 2),
        "ms_per_image": round(1000 * dt / (args.iters * args.batch), 3),
        "includes": "generator fwd + denorm + PSNR/SSIM"
                    + ("/MS-SSIM" if ms_ok else "")
                    + " + 2x seg U-Net masks + confusion counts",
        "dtype": args.dtype,
    }))


if __name__ == "__main__":
    main()
