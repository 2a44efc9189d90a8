#!/usr/bin/env python
"""Headline benchmark: PairedAttention adversarial training at 512x512 with
the full 9-channel topography stack (the reference's headline config:
train.py --model=PairedAttention --topography=all --resize=512).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} where
value is batch-1-equivalent samples/sec/chip and the extra keys carry the
primary efficiency metrics (achieved TFLOP/s and MFU, with FLOPs taken from
XLA's cost analysis of the compiled step — not an estimate).

Baseline (vs_baseline): the reference publishes no numbers (BASELINE.md).
What is MEASURED: the reference's own torch training step on this host's
CPU runs 0.042 steps/s = 74 GFLOP/s on one core (tools/ref_torch_bench.py),
i.e. essentially compute-bound at the core's FLOP envelope.  The A100
anchor is therefore a documented FLOPs-envelope extrapolation, deliberately
generous to the reference: credit the eager batch-1 fp32 loop (cuDNN TF32
convs, per-item host TIFF decode ignored) with 15% of the A100's 156
TFLOP/s TF32 peak = 23.4 TFLOP/s.  At the measured 1.765 TFLOP/sample this
gives REF_A100_EST = 13.3 samples/s.  vs_baseline = ours / 13.3 — a lower
bound on the true ratio (eager batch-1 loops with host-side data stalls do
not reach 15% of peak end to end).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# A100 anchor, derived above from the measured FLOPs/sample and a generous
# 15%-of-TF32-peak credit; see BENCH_NOTES.md "Baseline" for the full math.
REF_A100_SAMPLES_PER_SEC_EST = 13.3
# Host-CPU measurement of the actual reference loop (2026-08, 1 core):
REF_CPU_MEASURED_SAMPLES_PER_SEC = 0.042

# bf16 MXU peak per chip, by device kind prefix.
_PEAK_TFLOPS = {
    "TPU v5 lite": 197.0,   # v5e
    "TPU v5": 459.0,        # v5p
    "TPU v4": 275.0,
    "TPU v6": 918.0,        # trillium
}


def _peak_for(device) -> float:
    kind = getattr(device, "device_kind", "")
    for prefix, peak in sorted(_PEAK_TFLOPS.items(), key=lambda kv: -len(kv[0])):
        if kind.startswith(prefix):
            return peak
    return 197.0


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="train", choices=["train", "eval", "pipeline"],
                   help="train = the headline jitted train step (device-resident "
                        "batch); eval = the calculate_metrics device pipeline "
                        "(generator fwd + 2x seg U-Net + PSNR/SSIM/MS-SSIM + "
                        "confusion counts — reference models/model.py:388-410); "
                        "pipeline = END-TO-END training through the real "
                        "BatchLoader over an on-disk synthetic dataset (decode "
                        "cache + device transform + H2D + train step), reported "
                        "next to step-only")
    p.add_argument("--model", default="pairedattention")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--raw_size", type=int, default=1024,
                   help="pipeline mode: on-disk tile resolution (xBD tiles are "
                        "1024^2); the device transform resizes to --size")
    p.add_argument("--pipeline_images", type=int, default=12,
                   help="pipeline mode: distinct on-disk images (x2 versions = "
                        "train samples)")
    p.add_argument("--pipeline_epochs", type=int, default=4,
                   help="pipeline mode: measured epochs after the warm epoch")
    # 50 steps: the 10-step default left ~3.5 ms/step of tunnel dispatch
    # latency in the wall clock (65.2 vs 63.6 samples/s measured, device
    # time 121.4 ms vs 125.8 wall) — real training runs thousands of
    # steps, so steady state is the honest number.
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"],
                   help="compute dtype (f32 master params either way)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialise generator activations (needed for the "
                        "cycle strategies at 512^2 with batch > 1)")
    p.add_argument("--remat_policy", default="convs", choices=["full", "convs", "boundaries"],
                   help="convs = save conv outputs, recompute only norms; "
                        "boundaries = save only segment boundaries (least memory)")
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
    from floodgan_tpu.train.seg import SegTrainer
    from floodgan_tpu.core.config import model_is_cycle

    if args.mode == "eval":
        return run_eval(args)
    if args.mode == "pipeline":
        return run_pipeline(args)

    rng = np.random.default_rng(47)
    is_seg = args.model.lower() in ("unet", "segmentation")
    if is_seg:
        # Segmentation family (reference segment.py --train): U-Net on RGB
        # image -> 1-channel flood-mask logits, BCE, Adam lr 1e-4.
        x = jnp.asarray(rng.standard_normal((args.batch, args.size, args.size, 3), dtype=np.float32))
        y = jnp.asarray((rng.random((args.batch, args.size, args.size, 1)) > 0.5).astype(np.float32))
        trainer = SegTrainer(compute_dtype=args.dtype, remat=args.remat)
        state = trainer.init(jax.random.key(0), x)
        lr = jnp.float32(1e-4)
        step_args = lambda i: (x, y, lr)
    else:
        x = jnp.asarray(rng.standard_normal((args.batch, args.size, args.size, 9), dtype=np.float32))
        y = jnp.asarray(rng.standard_normal((args.batch, args.size, args.size, 3), dtype=np.float32))
        if model_is_cycle(args.model):
            trainer = CycleTrainer(args.model, 9, compute_dtype=args.dtype,
                                   remat=args.remat, remat_policy=args.remat_policy)
        else:
            trainer = PairedTrainer(
                args.model, 9, compute_dtype=args.dtype, remat=args.remat,
                remat_policy="full" if args.remat_policy == "full" else "boundaries",
            )
        state = trainer.init(jax.random.key(0), x, y)
        lr = jnp.float32(2e-4)

        # Batches are stored in the layout the step consumes natively (the
        # input pipeline's prepare_batch stage — phase-major for the attention
        # phase step); the step-only measurement matches real training, where
        # the transform emits this layout.
        x, y = trainer.prepare_batch(x, y)
        step_args = lambda i: (x, y, lr, jax.random.key(i))

    def step(state, i):
        return trainer.train_step(state, *step_args(i))

    # FLOPs of the compiled step from XLA's own cost analysis (train_step
    # is a per-instance jitted callable — see PairedTrainer.__init__).
    flops_per_step = None
    try:
        lowered = trainer.train_step.lower(state, *step_args(0))
        ca = lowered.compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops_per_step = float(ca["flops"])
    except Exception:
        pass

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
    samples_per_sec = steps_per_sec * args.batch
    workload = "mask train" if is_seg else "topo=all train"
    result = {
        "metric": f"{args.model} {args.size}^2 {workload} samples/sec/chip (batch {args.batch})",
        "value": round(samples_per_sec, 4),
        "unit": "batch-1-equivalent samples/sec/chip",
        # The A100 anchor is derived from the GAN step's FLOPs/sample, so
        # vs_baseline is only meaningful for the GAN families.
        "vs_baseline": (None if is_seg
                        else round(samples_per_sec / REF_A100_SAMPLES_PER_SEC_EST, 4)),
        "baseline": f"reference credited 15% of A100 TF32 peak = {REF_A100_SAMPLES_PER_SEC_EST} "
                    f"samples/s (measured same-host CPU: {REF_CPU_MEASURED_SAMPLES_PER_SEC}/s; "
                    "see bench.py docstring + BENCH_NOTES.md)",
    }
    if flops_per_step:
        peak = _peak_for(jax.devices()[0])
        tflops = flops_per_step * steps_per_sec / 1e12
        result["tflops_per_sec"] = round(tflops, 2)
        result["mfu"] = round(tflops / peak, 4)
        result["flops_per_sample_tf"] = round(flops_per_step / args.batch / 1e12, 4)
        result["peak_tflops"] = peak

    # Regression guard: the >=5x north star was crossed in round 3
    # (67.1-67.4 samples/s across sessions, ~+-0.7 noise band vs the 66.5
    # bar — BENCH_NOTES.md).  A headline-config run on a real TPU that
    # measures below 5.0x is flagged loudly so a future change can't
    # silently regress the crossed target; FLOODGAN_BENCH_STRICT=1 turns
    # the flag into a nonzero exit (wired into the TPU-gated slow tier).
    is_headline = (
        args.model.lower() == "pairedattention"
        and args.size == 512
        and args.batch == 8
        and args.dtype == "bfloat16"
        and result["vs_baseline"] is not None
    )
    on_tpu = jax.devices()[0].platform != "cpu"
    regressed = is_headline and on_tpu and result["vs_baseline"] < 5.0
    if regressed:
        result["below_target"] = True
        print(
            f"WARNING: headline vs_baseline {result['vs_baseline']} < 5.0 "
            "(target crossed in round 3 at 67.1-67.4 samples/s; noise band "
            "~+-0.7) — this is a REGRESSION",
            file=sys.stderr,
        )
    print(json.dumps(result))
    if regressed and os.environ.get("FLOODGAN_BENCH_STRICT") == "1":
        sys.exit(1)


def run_eval(args) -> None:
    """The eval/metrics hot loop (reference models/model.py:388-410) with
    device-resident batches: generator forward, denormalize, per-image
    PSNR/SSIM/MS-SSIM, two seg-U-Net mask predictions, confusion-count
    update.  Same computation as tools/eval_bench.py, surfaced as a bench
    row.  vs_baseline is null: the A100 anchor is derived from the train
    step's FLOPs/sample (bench.py docstring) and does not transfer."""
    import time

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
        # One compiled metric block + one device_get per batch (the fused
        # path Model.calculate_metrics uses; see eval/metrics.py).
        imgm, counts = jax.device_get(
            fused(seg_params, gen(xx), yy, with_ms_ssim=ms_ok)
        )
        masks.add_counts(counts)
        return imgm

    for _ in range(args.warmup):
        eval_batch(x, y)
    masks.compute()  # host sync on the accumulated counts

    t0 = time.perf_counter()
    for _ in range(args.steps):
        eval_batch(x, y)
    masks.compute()
    dt = time.perf_counter() - t0

    images_per_sec = args.steps * args.batch / dt
    print(json.dumps({
        "metric": f"{args.model} {args.size}^2 eval-metrics images/sec/chip (batch {args.batch})",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": None,
        "ms_per_image": round(1000 * dt / (args.steps * args.batch), 3),
        "includes": "generator fwd + denorm + PSNR/SSIM"
                    + ("/MS-SSIM" if ms_ok else "")
                    + " + 2x seg U-Net masks + confusion counts",
    }))


def _build_pipeline_fixture(root: str, raw: int, n_images: int):
    """Synthetic on-disk dataset at the xBD tile contract: float32 TIFF
    stacks (9ch input, 3ch output) + a dataset_split.csv row pair
    (original + flipped) per image, all split=train, country=usa,
    same_DEM=10m.  Only the files the 'usa'/'same' loader reads are
    written."""
    import numpy as np
    import pandas as pd

    from floodgan_tpu.data import tiff

    meta_dir = os.path.join(root, "metadata")
    os.makedirs(os.path.join(root, "dataset_input"), exist_ok=True)
    os.makedirs(os.path.join(root, "dataset_output"), exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)
    rng = np.random.default_rng(47)
    rows = []
    for i in range(n_images):
        image = f"hurricane-harvey_{i:08d}"
        for version in ("original", "flipped"):
            rows.append(dict(image=image, best_DEM="01m", same_DEM="10m",
                             version=version, split="train",
                             disaster="hurricane-harvey", country="usa"))
        tiff.imwrite(os.path.join(root, "dataset_input", f"{image}_10m.tif"),
                     rng.random((raw, raw, 9), dtype=np.float32))
        tiff.imwrite(os.path.join(root, "dataset_output", f"{image}.tif"),
                     rng.random((raw, raw, 3), dtype=np.float32))
    pd.DataFrame(rows).to_csv(os.path.join(meta_dir, "dataset_split.csv"), index=False)
    return meta_dir


def run_pipeline(args) -> None:
    """END-TO-END feed proof (round-4 VERDICT item 2): drive the real
    train step through BatchLoader over an on-disk synthetic dataset —
    TIFF decode (RAM-hot LRU cache after the warm epoch), device-side
    transform (resize raw->size, normalize), H2D, phase-major
    prepare_batch, jitted train step — and report it NEXT TO the
    step-only rate plus the host-feed-only rate and the explicit
    bytes/s budget a real TPU host needs at the step rate.  On the dev
    tunnel H2D moves ~17 MB/s (BENCH_NOTES round 1), so `value` here is
    tunnel-bound by construction; the budget line is the portable claim."""
    import shutil
    import tempfile
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from floodgan_tpu.data.pipeline import BatchLoader, FloodDataset
    from floodgan_tpu.train.paired import PairedTrainer

    keep = os.environ.get("FLOODGAN_PIPELINE_DATA")
    root = keep or tempfile.mkdtemp(prefix="floodgan_bench_")
    try:
        if not os.path.exists(os.path.join(root, "metadata", "dataset_split.csv")):
            meta_dir = _build_pipeline_fixture(root, args.raw_size, args.pipeline_images)
        else:
            meta_dir = os.path.join(root, "metadata")

        resize = args.size if args.size != args.raw_size else None
        ds = FloodDataset("usa", "same", "train", root, "all", resize, None,
                          metadata_dir=meta_dir)
        n_samples = len(ds)
        loader = BatchLoader(ds, batch_size=args.batch, shuffle=True,
                             drop_remainder=True)
        steps_per_epoch = len(loader)

        trainer = PairedTrainer(args.model, 9, compute_dtype=args.dtype,
                                remat=args.remat)
        state = trainer.init(
            jax.random.key(0),
            jnp.zeros((args.batch, args.size, args.size, 9)),
            jnp.zeros((args.batch, args.size, args.size, 3)),
        )
        lr = jnp.float32(2e-4)

        def sync(metrics):
            return float(jax.device_get(next(iter(metrics.values()))))

        # warm epoch: fills the decode cache, compiles transform + step
        step_i = 0
        for batch in loader.epoch_iter(0):
            xb, yb = trainer.prepare_batch(batch["input"], batch["output"])
            state, metrics = trainer.train_step(state, xb, yb, lr, jax.random.key(step_i))
            step_i += 1
        if step_i == 0:
            raise SystemExit(
                f"--mode pipeline produced zero batches: batch {args.batch} "
                f"> {n_samples} fixture samples (raise --pipeline_images "
                "or lower --batch)"
            )
        sync(metrics)

        # pipelined steady state: post-transform cache (epochs >= 2 ship the
        # small feed tensors; decode + transform drop out), prefetch
        # overlapping steps
        t0 = time.perf_counter()
        n_steps = 0
        feed_bytes_per_sample = None
        for e in range(1, 1 + args.pipeline_epochs):
            for batch in loader.epoch_iter(e):
                if feed_bytes_per_sample is None:
                    feed_bytes_per_sample = (
                        batch["input"].nbytes + batch["output"].nbytes
                    ) // batch["input"].shape[0]
                xb, yb = trainer.prepare_batch(batch["input"], batch["output"])
                state, metrics = trainer.train_step(
                    state, xb, yb, lr, jax.random.key(step_i)
                )
                step_i += 1
                n_steps += 1
        sync(metrics)
        pipelined = n_steps * args.batch / (time.perf_counter() - t0)

        # host-feed-only: the loader's ceiling (decode cache + transform
        # dispatch + H2D), no train step
        t0 = time.perf_counter()
        n_feed = 0
        for e in range(100, 100 + args.pipeline_epochs):
            for batch in loader.epoch_iter(e):
                last = batch["input"]
                n_feed += 1
        _ = float(jax.device_get(last[0, 0, 0, 0]))
        host_feed = n_feed * args.batch / (time.perf_counter() - t0)

        # step-only on the SAME shapes (device-resident batch)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((args.batch, args.size, args.size, 9), dtype=np.float32))
        y = jnp.asarray(rng.standard_normal((args.batch, args.size, args.size, 3), dtype=np.float32))
        x, y = trainer.prepare_batch(x, y)
        for i in range(3):
            state, metrics = trainer.train_step(state, x, y, lr, jax.random.key(i))
        sync(metrics)
        t0 = time.perf_counter()
        for i in range(20):
            state, metrics = trainer.train_step(state, x, y, lr, jax.random.key(i))
        sync(metrics)
        step_only = 20 * args.batch / (time.perf_counter() - t0)

        from floodgan_tpu.core import flags as _flags

        raw_bytes_per_sample = args.raw_size * args.raw_size * (9 + 3) * 4
        # Steady-state wire bytes: with the post-transform cache (default
        # on) epochs >= 2 ship the transformed feed tensors; without it
        # every epoch ships the raw stacks.  Gate the claim on the
        # MEASURED hit rate of the last measured epoch, not the flag —
        # the cache self-disables on splits that exceed its byte bound
        # (pipeline.py capacity guard), and then the honest steady bytes
        # are the raw ones.
        total = max(loader.post_cache_total, 1)
        post_cache_hit_rate = loader.post_cache_hits / total
        post_cache = (
            _flags.post_transform_cache()
            and feed_bytes_per_sample is not None
            and post_cache_hit_rate > 0.5
        )
        wire_bytes = feed_bytes_per_sample if post_cache else raw_bytes_per_sample
        print(json.dumps({
            "metric": f"{args.model} {args.size}^2 end-to-end pipelined train "
                      f"samples/sec/chip (batch {args.batch}, raw {args.raw_size}^2 TIFFs)",
            "value": round(pipelined, 4),
            "unit": "samples/sec/chip end-to-end (post-transform cache + H2D + step)"
                    if post_cache else
                    "samples/sec/chip end-to-end (decode cache + device transform + H2D + step)",
            "vs_baseline": None,
            "step_only_samples_per_sec": round(step_only, 4),
            "host_feed_samples_per_sec": round(host_feed, 4),
            "overlap_ratio": round(pipelined / step_only, 4),
            "raw_mb_per_sample": round(raw_bytes_per_sample / 1e6, 1),
            "steady_wire_mb_per_sample": round(wire_bytes / 1e6, 1),
            "required_gbps_at_step_rate": round(step_only * wire_bytes / 1e9, 3),
            "post_transform_cache": post_cache,
            "post_cache_hit_rate": round(post_cache_hit_rate, 3),
            "dataset": f"{n_samples} samples ({args.pipeline_images} images x2 versions), "
                       f"{steps_per_epoch} steps/epoch, {args.pipeline_epochs} measured epochs",
        }))
    finally:
        if not keep:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
