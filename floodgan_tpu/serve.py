"""Batched inference engine for production serving.

The reference's only inference surface is matplotlib plotting inside
evaluate.py.  This module provides the deployment-grade path: an
AOT-compiled (jit -> lower -> compile) generator for one fixed batch
shape, fed by the device-side preprocessing pipeline, with optional
segmentation-mask post-processing — suitable for a serving loop where
per-request latency matters and compilation must happen once at startup.

    engine = InferenceEngine.from_checkpoint("model.ckpt", batch_size=8,
                                             image_size=512)
    outputs = engine.predict(stacks_uint_or_float_01)   # (B,H,W,3) in [0,1]
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from floodgan_tpu.ckpt import load_checkpoint
from floodgan_tpu.core.config import TOPOGRAPHY_CHANNELS
from floodgan_tpu.core.rng import RngStreams
from floodgan_tpu.data.transforms import apply_transformations_batch, denormalize
from flax import serialization


class InferenceEngine:
    def __init__(
        self,
        model: str,
        gen_params,
        topography: Optional[str],
        batch_size: int = 1,
        image_size: int = 512,
        seed: int = 47,
        compute_dtype: str = "bfloat16",
        aot: bool = True,
    ):
        from floodgan_tpu.train.paired import PairedTrainer
        from floodgan_tpu.train.cycle import CycleTrainer
        from floodgan_tpu.core.config import model_is_cycle

        self.model = model
        self.topography = topography
        self.batch_size = batch_size
        self.image_size = image_size
        self.channels = TOPOGRAPHY_CHANNELS[topography]
        self.gen_params = gen_params
        self._key = RngStreams(seed).inference()

        if model_is_cycle(model):
            trainer = CycleTrainer(model, self.channels, compute_dtype=compute_dtype)

            def forward(params, x):
                out, _ = trainer.generate(params, x, "ab")
                return denormalize(out)
        else:
            trainer = PairedTrainer(model, self.channels, compute_dtype=compute_dtype)
            key = self._key

            def forward(params, x):
                out, _ = trainer.generate(params, x, key)
                return denormalize(out)

        self._fn = jax.jit(forward)
        if aot:
            # Ahead-of-time compile for the fixed serving shape so the
            # first request pays zero compilation latency.
            shape = jax.ShapeDtypeStruct(
                (batch_size, image_size, image_size, self.channels), jnp.float32
            )
            params_shapes = jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
                gen_params,
            )
            self._compiled = self._fn.lower(params_shapes, shape).compile()
        else:
            self._compiled = None

    @classmethod
    def from_checkpoint(
        cls, ckpt_path: str, batch_size: int = 1, image_size: int = 512, **kwargs
    ) -> "InferenceEngine":
        from floodgan_tpu.train.paired import PairedTrainer
        from floodgan_tpu.train.cycle import CycleTrainer
        from floodgan_tpu.core.config import model_is_cycle

        meta, raw = load_checkpoint(ckpt_path)
        model = meta["model"]
        topography = meta["topography"]
        channels = TOPOGRAPHY_CHANNELS[topography]
        trainer_cls = CycleTrainer if model_is_cycle(model) else PairedTrainer
        trainer = trainer_cls(model, channels)
        template = trainer.init(
            jax.random.key(0),
            jnp.zeros((1, 64, 64, channels)),
            jnp.zeros((1, 64, 64, 3)),
        )
        state = serialization.from_state_dict(template, raw)
        return cls(
            model, state.gen_params, topography,
            batch_size=batch_size, image_size=image_size, **kwargs,
        )

    def preprocess(self, stacks: np.ndarray, resize: Optional[int] = None) -> jax.Array:
        """Raw [0,1] 9-channel stacks -> normalized, sliced, resized model
        input (same device transforms as training)."""
        b = stacks.shape[0]
        x, _ = apply_transformations_batch(
            stacks,
            np.zeros((b, stacks.shape[1], stacks.shape[2], 3), np.float32),
            np.zeros(b, bool),
            np.zeros(b, np.int32),
            topography=self.topography,
            resize=resize or self.image_size,
            crop=None,
        )
        return x

    def predict(self, inputs) -> jax.Array:
        """Normalized (B, S, S, C) inputs -> (B, S, S, 3) images in [0,1]."""
        inputs = jnp.asarray(inputs, jnp.float32)
        if self._compiled is not None and inputs.shape == (
            self.batch_size, self.image_size, self.image_size, self.channels
        ):
            return self._compiled(self.gen_params, inputs)
        return self._fn(self.gen_params, inputs)

    def benchmark(self, iters: int = 20) -> dict:
        x = jnp.zeros(
            (self.batch_size, self.image_size, self.image_size, self.channels),
            jnp.float32,
        )
        out = self.predict(x)
        float(jnp.sum(out))  # sync
        t0 = time.perf_counter()
        for _ in range(iters):
            out = self.predict(x)
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / iters
        return {
            "latency_ms": dt * 1e3,
            "images_per_sec": self.batch_size / dt,
        }
