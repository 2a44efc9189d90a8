"""Pix2Pix 8-level U-Net generator and its 1-logit-head segmentation variant.

Behavioral twin of the recursive ``Pix2PixGenerator``/``Pix2PixBlock``
(reference models/model_architectures.py:9-62) and ``Pix2PixUNet``
(:447-500), rewritten iteratively: the recursion is just a down-conv stack
followed by an up-conv stack with channel-concat skips, which XLA schedules
far better than nested calls.  Layer spec (outermost -> innermost):

  down: conv(in, 64, k4 s2 p1, no bias)                        [no norm]
        lrelu(0.2) conv(64,128) bn  ... (128,256) (256,512)
        3x lrelu conv(512,512) bn                               [dropout up]
  inner down: lrelu conv(512,512)                               [no norm]
  inner up:   relu convT(512,512, k4 s2 p1, no bias) bn
  up:   relu convT(cat -> 512) bn dropout(0.5)  x3
        relu convT(1024,256) bn ; (512,128) ; (256,64)
  out:  relu convT(128, out, k4 s2 p1, bias) tanh|sigmoid

Dropout is applied to the up-path output *before* the skip concat
(reference :52, :62), reproduced here exactly.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from floodgan_tpu import ops
from floodgan_tpu.models.layers import (
    TorchBatchNorm,
    TorchConv,
    TorchConvTranspose,
    TorchDropout,
)

# (inner_channels, use_dropout) per non-outermost level, outermost->innermost.
# Mirrors the construction loop at reference model_architectures.py:13-19.
_LEVELS = [
    (128, False),
    (256, False),
    (512, False),
    (512, True),
    (512, True),
    (512, True),
    (512, None),  # innermost: no down-norm, single-width up
]


class _UNet8(nn.Module):
    """Shared body of Pix2PixGenerator (tanh/3ch) and Pix2PixUNet (sigmoid/1ch)."""

    out_channels: int
    final_activation: str  # "tanh" | "sigmoid"
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x):
        if x.shape[1] % 256 or x.shape[2] % 256:
            raise ValueError(
                f"Pix2Pix U-Net needs spatial dims divisible by 256 (8 "
                f"stride-2 levels); got {x.shape[1]}x{x.shape[2]}.  Use "
                f"--resize 256/512 (optionally with --crop) like the "
                f"reference configurations."
            )
        # --- down path ---
        skips = []
        h = TorchConv(64, 4, 2, 1, use_bias=False, name="down0_conv")(x)
        skips.append(h)
        for i, (ch, _) in enumerate(_LEVELS, start=1):
            h = ops.leaky_relu(h, 0.2)
            h = TorchConv(ch, 4, 2, 1, use_bias=False, name=f"down{i}_conv")(h)
            if i < len(_LEVELS):  # innermost down block has no norm (ref :44)
                h = TorchBatchNorm(name=f"down{i}_norm")(h)
            if i < len(_LEVELS):
                skips.append(h)

        # --- up path ---
        # innermost up: convT(512 -> 512) on the un-concatenated bottleneck.
        h = jnp.maximum(h, 0.0)
        h = TorchConvTranspose(512, 4, 2, 1, use_bias=False, name="up7_conv")(h)
        h = TorchBatchNorm(name="up7_norm")(h)
        for i in range(len(_LEVELS) - 1, 0, -1):
            outer_ch = 64 * (2 ** (i - 1)) if i <= 3 else 512
            use_dropout = _LEVELS[i - 1][1]
            h = jnp.concatenate([skips[i], h], axis=-1)
            h = jnp.maximum(h, 0.0)
            h = TorchConvTranspose(outer_ch, 4, 2, 1, use_bias=False, name=f"up{i}_conv")(h)
            h = TorchBatchNorm(name=f"up{i}_norm")(h)
            if use_dropout:
                h = TorchDropout(self.dropout_rate, name=f"up{i}_dropout")(h)

        h = jnp.concatenate([skips[0], h], axis=-1)
        h = jnp.maximum(h, 0.0)
        h = TorchConvTranspose(self.out_channels, 4, 2, 1, use_bias=True, name="up0_conv")(h)
        if self.final_activation == "tanh":
            return jnp.tanh(h)
        return nn.sigmoid(h)


class Pix2PixGenerator(nn.Module):
    """reference model_architectures.py:9-22 twin (tanh RGB head)."""

    input_channels: int = 3
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x):
        return _UNet8(
            out_channels=3, final_activation="tanh",
            dropout_rate=self.dropout_rate, name="unet",
        )(x)


class Pix2PixUNet(nn.Module):
    """reference model_architectures.py:447-460 twin (sigmoid 1ch head).
    Defined-but-unused in the reference; kept for inventory completeness."""

    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x):
        return _UNet8(
            out_channels=1, final_activation="sigmoid",
            dropout_rate=self.dropout_rate, name="unet",
        )(x)
