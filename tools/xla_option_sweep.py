#!/usr/bin/env python
"""Sweep XLA TPU compiler options on the headline train step, one process.

The tunneled (axon) backend compiles server-side, so XLA_FLAGS set in this
process never reach the TPU compiler (and TPU-only flag names crash the
local CPU-build flag parser).  ``compiler_options`` on lowered.compile()
DOES propagate (a bogus option name comes back as a remote-compile error),
so each candidate is compiled explicitly from the same lowered step and
timed back to back in one session — same chip, same tunnel, same host.

Usage: python tools/xla_option_sweep.py [--steps 50] [--warmup 5]
       [--set name=value[,name=value...]]...   (default: builtin candidates)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUILTIN = [
    {},  # control — same-session baseline
    {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    {"xla_tpu_enable_latency_hiding_scheduler": "true"},
]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="pairedattention")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--set", action="append", default=None,
                   help="name=value[,name=value...] option set (repeatable); "
                        "overrides the builtin candidate list")
    args = p.parse_args()

    if args.set is not None:
        candidates = [{}]
        for s in args.set:
            candidates.append(dict(kv.split("=", 1) for kv in s.split(",") if kv))
    else:
        candidates = BUILTIN

    # Neutralize the trainers' measured-default compiler options so the
    # sweep's control is a true control (candidates come in explicitly via
    # lowered.compile(compiler_options=...)).
    os.environ.setdefault("FLOODGAN_XLA_OPTIONS", "off")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from floodgan_tpu.core.config import model_is_cycle
    from floodgan_tpu.train.cycle import CycleTrainer
    from floodgan_tpu.train.paired import PairedTrainer

    rng = np.random.default_rng(47)
    x = jnp.asarray(rng.standard_normal((args.batch, args.size, args.size, 9), dtype=np.float32))
    y = jnp.asarray(rng.standard_normal((args.batch, args.size, args.size, 3), dtype=np.float32))

    if model_is_cycle(args.model):
        trainer = CycleTrainer(args.model, 9, compute_dtype="bfloat16", remat=True)
    else:
        trainer = PairedTrainer(args.model, 9, compute_dtype="bfloat16", remat=args.remat)
    state0 = trainer.init(jax.random.key(0), x, y)
    lr = jnp.float32(2e-4)
    x, y = trainer.prepare_batch(x, y)

    lowered = trainer.train_step.lower(state0, x, y, lr, jax.random.key(0))

    def sync(metrics):
        return float(jax.device_get(next(iter(metrics.values()))))

    results = []
    for opts in candidates:
        label = ",".join(f"{k}={v}" for k, v in opts.items()) or "(control)"
        try:
            t0 = time.perf_counter()
            compiled = lowered.compile(compiler_options=opts or None)
            compile_s = time.perf_counter() - t0
        except Exception as e:  # invalid option name / remote-compile failure
            print(json.dumps({"options": label, "error": str(e)[:200]}))
            continue
        # The step donates its state: thread it through so every call has a
        # live buffer (the first donated call consumes state0's copy).
        state = jax.tree_util.tree_map(lambda a: a.copy() if hasattr(a, "copy") else a, state0)
        for i in range(args.warmup):
            state, metrics = compiled(state, x, y, lr, jax.random.key(i))
        sync(metrics)
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, metrics = compiled(state, x, y, lr, jax.random.key(100 + i))
        sync(metrics)
        dt = time.perf_counter() - t0
        sps = args.steps * args.batch / dt
        results.append((label, sps))
        print(json.dumps({"options": label, "samples_per_sec": round(sps, 3),
                          "ms_per_step": round(1e3 * dt / args.steps, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)

    if results:
        best = max(results, key=lambda r: r[1])
        print(json.dumps({"best": best[0], "samples_per_sec": round(best[1], 3)}))


if __name__ == "__main__":
    main()
