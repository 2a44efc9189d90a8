"""Serving path: AOT-compiled inference engine + predict CLI."""

import glob
import os

import numpy as np
import pytest

import jax

from fixtures import make_flood_fixture


@pytest.mark.slow
def test_inference_engine_and_predict_cli(tmp_path, rng):
    from floodgan_tpu.api import Model
    from floodgan_tpu.serve import InferenceEngine
    from predict import main as predict_main

    data_path, meta_dir = make_flood_fixture(tmp_path / "data", size=32)
    m = Model(
        model="PairedAttention", dataset_subset="usa", dataset_dem="same",
        data_path=data_path, num_epochs=1, topography="all", resize=None,
        save_model_interval=1, metadata_dir=meta_dir,
    )
    m.train_paired()
    ckpt = glob.glob(f"{data_path}/models/PairedAttention_*.ckpt")[0]

    engine = InferenceEngine.from_checkpoint(ckpt, batch_size=2, image_size=32)
    stacks = rng.random((2, 32, 32, 9), dtype=np.float32)
    x = engine.preprocess(stacks, resize=32)
    out = np.asarray(engine.predict(x))
    assert out.shape == (2, 32, 32, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # AOT path is deterministic
    out2 = np.asarray(engine.predict(x))
    np.testing.assert_array_equal(out, out2)
    stats = engine.benchmark(iters=3)
    assert stats["images_per_sec"] > 0

    # CLI over real fixture TIFFs
    inputs = sorted(glob.glob(f"{data_path}/dataset_input/*.tif"))[:2]
    out_dir = str(tmp_path / "preds")
    predict_main([
        f"--pretrained_model_path={ckpt}",
        "--inputs", *inputs,
        f"--output_dir={out_dir}",
        "--resize=32",
    ])
    assert len(glob.glob(f"{out_dir}/*_prediction.png")) == 2
