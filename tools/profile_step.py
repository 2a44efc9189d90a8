#!/usr/bin/env python
"""Capture a jax.profiler trace of the full train step on the real chip and
print a per-op time breakdown (aggregated over fusions, sorted).

Usage: python tools/profile_step.py [--model pairedattention] [--steps 3]

The xplane protobuf is parsed directly (tensorboard_plugin_profile /
tensorflow ship the proto), no TensorBoard UI needed.  Events from the
device plane are aggregated by op name; the HLO fusion names XLA emits
(e.g. 'fusion.123', 'convolution.45') are bucketed by their originating
metadata where present.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(path: str, min_ms: float = 0.1):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore
    except ImportError:
        try:
            from tensorflow.core.profiler.protobuf import xplane_pb2  # type: ignore
        except ImportError:
            from tsl.profiler.protobuf import xplane_pb2  # type: ignore

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    results = []
    for plane in space.planes:
        events = collections.defaultdict(lambda: [0.0, 0])  # name -> [ps, count]
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        total_ps = 0.0
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                events[name][0] += ev.duration_ps
                events[name][1] += 1
                total_ps += ev.duration_ps
        results.append((plane.name, total_ps, dict(events)))
    return results


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="pairedattention")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--out", default=None, help="profile dir (default: tmp)")
    args = p.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )

    import jax
    import jax.numpy as jnp
    import numpy as np

    from floodgan_tpu.core.config import model_is_cycle
    from floodgan_tpu.train.cycle import CycleTrainer
    from floodgan_tpu.train.paired import PairedTrainer

    rng = np.random.default_rng(47)
    is_seg = args.model.lower() in ("unet", "segmentation")
    if is_seg:
        from floodgan_tpu.train.seg import SegTrainer

        x = jnp.asarray(rng.standard_normal((args.batch, args.size, args.size, 3), dtype=np.float32))
        y = jnp.asarray((rng.random((args.batch, args.size, args.size, 1)) > 0.5).astype(np.float32))
        trainer = SegTrainer(compute_dtype=args.dtype, remat=args.remat)
        state = trainer.init(jax.random.key(0), x)
        lr = jnp.float32(1e-4)
        step = lambda state, i: trainer.train_step(state, x, y, lr)
    elif model_is_cycle(args.model):
        trainer = CycleTrainer(args.model, 9, compute_dtype=args.dtype, remat=args.remat)
    else:
        trainer = PairedTrainer(args.model, 9, compute_dtype=args.dtype, remat=args.remat)
    if not is_seg:
        x = jnp.asarray(rng.standard_normal((args.batch, args.size, args.size, 9), dtype=np.float32))
        y = jnp.asarray(rng.standard_normal((args.batch, args.size, args.size, 3), dtype=np.float32))
        state = trainer.init(jax.random.key(0), x, y)
        lr = jnp.float32(2e-4)

        # Same layout real training feeds (pipeline-side prep, e.g. phase-major
        # for the attention phase step) so the profiled program is the bench one.
        x, y = trainer.prepare_batch(x, y)
        step = lambda state, i: trainer.train_step(state, x, y, lr, jax.random.key(i))

    def sync(metrics):
        return float(jax.device_get(next(iter(metrics.values()))))

    for i in range(3):
        state, metrics = step(state, i)
    sync(metrics)

    prof_dir = args.out or tempfile.mkdtemp(prefix="floodgan_prof_")
    jax.profiler.start_trace(prof_dir)
    for i in range(args.steps):
        state, metrics = step(state, 100 + i)
    sync(metrics)
    jax.profiler.stop_trace()

    pbs = glob.glob(os.path.join(prof_dir, "**", "*.xplane.pb"), recursive=True)
    if not pbs:
        print(f"no xplane.pb under {prof_dir} — device tracing unsupported here?")
        return
    for pb in pbs:
        for plane_name, total_ps, events in parse_xplane(pb):
            if "TPU" not in plane_name and "device" not in plane_name.lower():
                continue
            print(f"\n=== plane: {plane_name}  (total {total_ps/1e9/args.steps:.2f} ms/step) ===")
            rows = sorted(events.items(), key=lambda kv: -kv[1][0])
            for name, (ps, cnt) in rows[: args.top]:
                ms = ps / 1e9 / args.steps
                if ms < 0.05:
                    break
                print(f"{ms:9.3f} ms/step  x{cnt:4d}  {name}")
    print(f"\ntrace dir: {prof_dir}")


if __name__ == "__main__":
    main()
