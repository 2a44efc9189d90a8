"""Supervised U-Net segmentation training as one jitted step.

Faithful restructuring of the reference loop (reference
models/segmentation_model.py:250-277): BCE-with-logits on the mask logits,
Adam lr 1e-4 betas (0.5, 0.999) (ref :66), plus the reference's pixel
accuracy — fraction of pixels where sigmoid(logit) > 0.5 agrees with
(label > 0.5) (ref :273, :244-248).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from floodgan_tpu.core.config import TrainConfig
from floodgan_tpu.models.unet import UNet
from floodgan_tpu.train.losses import bce_with_logits
from floodgan_tpu.train.optim import adam_tx, apply_adam


class SegState(flax.struct.PyTreeNode):
    params: dict
    opt: tuple


class SegTrainer:
    def __init__(self, cfg: TrainConfig = TrainConfig(), compute_dtype: str = "float32",
                 remat: bool = False):
        self.cfg = cfg
        self.model = UNet()
        self.tx = adam_tx(b1=cfg.adam_b1, b2=cfg.adam_b2)
        self.compute_dtype = jnp.dtype(compute_dtype)
        # Recompute U-Net activations in the backward (the skip-connected
        # stem holds 64ch full-resolution tensors live through the whole
        # decode; remat trades one extra forward for them — unlocks
        # 1024^2 batch 8 on one 16GB chip).
        self.remat = remat
        # Per-instance jit so backend-specific XLA compiler options apply
        # (core/flags.step_compiler_options); see PairedTrainer.__init__.
        from floodgan_tpu.core.flags import step_compiler_options

        opts = step_compiler_options() or None
        self.train_step = jax.jit(
            self._train_step, donate_argnums=0, compiler_options=opts
        )
        self.predict_logits = jax.jit(self._predict_logits, compiler_options=opts)
        self.predict_mask = jax.jit(self._predict_mask, compiler_options=opts)

    def _apply(self, params, image):
        if self.compute_dtype == jnp.float32:
            return self.model.apply({"params": params}, image)
        cast = jax.tree_util.tree_map(lambda p: p.astype(self.compute_dtype), params)
        return self.model.apply({"params": cast}, image.astype(self.compute_dtype)).astype(jnp.float32)

    def init(self, rng, sample_input) -> SegState:
        params = self.model.init({"params": rng}, sample_input)["params"]
        return SegState(params=params, opt=self.tx.init(params))

    def _train_step(
        self, state: SegState, image, true_mask, lr
    ) -> Tuple[SegState, Dict[str, jax.Array]]:
        apply = jax.checkpoint(self._apply) if self.remat else self._apply

        def loss_fn(p):
            logits = apply(p, image)
            return bce_with_logits(logits, true_mask), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        params, opt = apply_adam(self.tx, state.params, state.opt, grads, lr)
        predicted = jax.nn.sigmoid(logits) > 0.5
        accuracy = jnp.mean((predicted == (true_mask > 0.5)).astype(jnp.float32))
        return SegState(params, opt), {"loss": loss, "accuracy": accuracy}

    def _predict_logits(self, params, image):
        return self._apply(params, image)

    def _predict_mask(self, params, image):
        """sigmoid > 0.5 binary mask (reference segmentation_model.py:244-248)."""
        return (jax.nn.sigmoid(self._apply(params, image)) > 0.5).astype(jnp.float32)
