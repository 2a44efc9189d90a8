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
    p.add_argument("--wire_dtype", default="float32",
                   help="host->device input transfer dtype (bfloat16 "
                        "halves wire bytes; BENCH_NOTES round 5)")
    p.add_argument("--frontend", action="store_true",
                   help="bench the BatchingFrontend micro-batcher under "
                        "concurrent client threads (p50/p99 per-request "
                        "latency + aggregate throughput) instead of the "
                        "bare engine")
    p.add_argument("--clients", type=int, nargs="+", default=[1, 8, 32],
                   help="frontend mode: concurrent client thread counts")
    p.add_argument("--requests_per_client", type=int, default=20)
    p.add_argument("--max_delay_ms", type=float, default=5.0)
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

    if args.frontend:
        return run_frontend(args, state)

    for b in args.batches:
        engine = InferenceEngine(
            args.model, state.gen_params, "all",
            batch_size=b, image_size=args.size, compute_dtype=args.dtype,
            wire_dtype=args.wire_dtype,
        )
        stats = engine.benchmark(iters=args.iters)
        print(json.dumps({
            "metric": f"{args.model} {args.size}^2 serve batch {b}",
            "latency_ms": round(stats["latency_ms"], 3),
            "images_per_sec": round(stats["images_per_sec"], 2),
            "dtype": args.dtype,
            "wire_dtype": args.wire_dtype,
        }))


def run_frontend(args, state) -> None:
    """Concurrent-load benchmark of the BatchingFrontend (round-5 VERDICT
    item 7): N client threads issue sequential single-image predict()
    calls through the micro-batcher; report per-request p50/p99 wall
    latency, aggregate images/s, and the frontend's measured batch
    occupancy for each N.  One engine batch shape serves every N (the
    frontend zero-pads partial batches), so the device program compiles
    once."""
    import threading
    import time

    import numpy as np

    from floodgan_tpu.serve import BatchingFrontend, InferenceEngine

    engine = InferenceEngine(
        args.model, state.gen_params, "all",
        batch_size=max(args.batches), image_size=args.size,
        compute_dtype=args.dtype, wire_dtype=args.wire_dtype,
    )
    stack = np.random.default_rng(47).standard_normal(
        engine.input_shape, dtype=np.float32
    )

    for n_clients in args.clients:
        frontend = BatchingFrontend(engine, max_delay_ms=args.max_delay_ms)
        frontend.predict(stack)  # warm the AOT path outside the clock

        lat_lock = threading.Lock()
        latencies = []

        def client():
            mine = []
            for _ in range(args.requests_per_client):
                t0 = time.perf_counter()
                frontend.predict(stack)
                mine.append(time.perf_counter() - t0)
            with lat_lock:
                latencies.extend(mine)

        threads = [threading.Thread(target=client) for _ in range(n_clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        stats = frontend.stats()
        frontend.close()

        lat_ms = np.sort(np.array(latencies)) * 1e3
        total = n_clients * args.requests_per_client
        print(json.dumps({
            "metric": f"{args.model} {args.size}^2 frontend batch<= "
                      f"{engine.batch_size} clients {n_clients}",
            "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
            "p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
            "images_per_sec": round(total / wall, 2),
            "mean_batch_occupancy": round(stats["mean_occupancy"], 3),
            "max_delay_ms": args.max_delay_ms,
            "requests": total,
            "dtype": args.dtype,
            "wire_dtype": args.wire_dtype,
        }))


if __name__ == "__main__":
    main()
