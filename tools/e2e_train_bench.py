#!/usr/bin/env python
"""End-to-end training throughput: on-disk 1024^2 9-channel TIFFs ->
C++/python decode -> device-side resize/crop/normalize -> jitted
adversarial step.  Validates that the input pipeline feeds the chip at
training speed (the reference's per-item CPU decode+resize is its
dominant bottleneck — SURVEY.md §7)."""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from fixtures import make_flood_fixture
    from floodgan_tpu.api import Model

    tmp = tempfile.mkdtemp(prefix="floodgan_e2e_")
    print(f"building {n_images}-image 1024^2 fixture under {tmp} ...")
    data_path, meta_dir = make_flood_fixture(
        tmp, size=1024, n_per_disaster=max(3, n_images // 4)
    )

    model = Model(
        model="PairedAttention", dataset_subset="usa", dataset_dem="same",
        data_path=data_path, num_epochs=epochs, topography="all",
        resize=512, crop=None, batch_size=batch, metadata_dir=meta_dir,
        compute_dtype="bfloat16", verbose=True,
    )
    n_train = len(model.train_loader.dataset)
    print(f"train samples: {n_train}, batch {batch}")

    # ---- component breakdown (measured, not claimed) ----
    import jax

    loader = model.train_loader
    # decode only (host threads, C++ decoder when built)
    t0 = time.time()
    order = np.arange(n_train)
    nb = 0
    for i in range(0, n_train, batch):
        loader._load_raw_batch(order[i : i + batch])
        nb += len(order[i : i + batch])
    t_decode = time.time() - t0
    print(f"breakdown/decode-only:        {nb / t_decode:7.1f} samples/s")
    # decode + device transform + H2D (full loader, prefetch threads)
    for _ in loader.epoch_iter(0):
        pass  # warm the transform jit
    t0 = time.time()
    last = None
    for b in loader.epoch_iter(1):
        last = b
    jax.block_until_ready(last["input"])
    t_loader = time.time() - t0
    print(f"breakdown/loader (dec+xform+H2D): {n_train / t_loader:7.1f} samples/s")
    # train step only (device-resident batch, in the step's native layout —
    # matches bench.py and Model._device_batch)
    st, bt = model.state, last
    bx, by = model.trainer.prepare_batch(bt["input"], bt["output"])
    bt = {"input": bx, "output": by}
    model.state, m = model.trainer.train_step(
        model.state, bt["input"], bt["output"], np.float32(2e-4), jax.random.key(0)
    )
    float(jax.device_get(next(iter(m.values()))))  # compile + sync
    t0 = time.time()
    for i in range(10):
        model.state, m = model.trainer.train_step(
            model.state, bt["input"], bt["output"], np.float32(2e-4), jax.random.key(i)
        )
    float(jax.device_get(next(iter(m.values()))))
    t_step = (time.time() - t0) / 10
    print(f"breakdown/train-step-only:    {batch / t_step:7.1f} samples/s")

    times = []
    t_all = time.time()
    orig_save = model.save_results

    def timed_save(epoch, losses, epoch_start_time):
        times.append(time.time() - epoch_start_time)
        orig_save(epoch, losses, epoch_start_time)

    model.save_results = timed_save
    model.train_paired()
    steady = times[1:] or times
    sec_per_epoch = sum(steady) / len(steady)
    samples_per_sec = n_train / sec_per_epoch
    print(
        f"e2e (decode+transform+train): {samples_per_sec:.1f} samples/s "
        f"({sec_per_epoch:.1f}s/epoch steady-state; first epoch {times[0]:.1f}s incl. compile; "
        f"total {time.time()-t_all:.0f}s)"
    )


if __name__ == "__main__":
    main()
