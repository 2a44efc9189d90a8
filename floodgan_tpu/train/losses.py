"""Loss functions of the reference recipe (reference models/model.py:107-120,
models/segmentation_model.py:65): LSGAN MSE vs constant patch targets, L1,
and BCE-with-logits, all mean-reduced like their torch counterparts."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lsgan_mse(prediction: jax.Array, target: float) -> jax.Array:
    """nn.MSELoss()(prediction, full_like(prediction, target)) — the LSGAN
    objective applied to PatchGAN logit maps (reference model.py:626-642).
    Accumulates in f32 whatever the activation dtype (bf16 sums over
    patch maps would lose mantissa)."""
    p = prediction.astype(jnp.float32)
    return jnp.mean(jnp.square(p - target))


def l1_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    """Mean absolute error with f32 accumulation: the elementwise |a-b|
    stays in the activation dtype (bandwidth), the reduction upcasts."""
    return jnp.mean(jnp.abs(a - b).astype(jnp.float32))


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """nn.BCEWithLogitsLoss twin (mean reduction), numerically stable."""
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
