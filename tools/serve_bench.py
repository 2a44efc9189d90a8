#!/usr/bin/env python
"""Serving-path benchmark: AOT-compiled generator latency/throughput.

Measures the InferenceEngine (floodgan_tpu/serve.py) at fixed batch
shapes — the numbers that matter for deployment: single-image latency
(batch 1) and peak batched throughput.  Prints one JSON line per config.

    python tools/serve_bench.py [--model pairedattention] [--size 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="pairedattention")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batches", type=int, nargs="+", default=[1, 8])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )

    import jax
    import jax.numpy as jnp

    from floodgan_tpu.core.config import model_is_cycle
    from floodgan_tpu.serve import InferenceEngine
    from floodgan_tpu.train.cycle import CycleTrainer
    from floodgan_tpu.train.paired import PairedTrainer

    trainer_cls = CycleTrainer if model_is_cycle(args.model) else PairedTrainer
    trainer = trainer_cls(args.model, 9)
    # pix2pix's U-Net requires 256-divisible spatial dims even at init
    init_hw = 256 if args.model.lower() == "pix2pix" else 64
    state = trainer.init(
        jax.random.key(0),
        jnp.zeros((1, init_hw, init_hw, 9)),
        jnp.zeros((1, init_hw, init_hw, 3)),
    )

    for b in args.batches:
        engine = InferenceEngine(
            args.model, state.gen_params, "all",
            batch_size=b, image_size=args.size, compute_dtype=args.dtype,
        )
        stats = engine.benchmark(iters=args.iters)
        print(json.dumps({
            "metric": f"{args.model} {args.size}^2 serve batch {b}",
            "latency_ms": round(stats["latency_ms"], 3),
            "images_per_sec": round(stats["images_per_sec"], 2),
            "dtype": args.dtype,
        }))


if __name__ == "__main__":
    main()
