"""Flood-segmentation U-Net (milesial variant).

Behavioral twin of reference model_architectures.py:508-587: DoubleConv
stem to 64; four maxpool+DoubleConv downs to 1024; four ups (ConvTranspose
k2 s2 + pad-to-match + skip concat + DoubleConv); 1x1 conv to a single
logit channel.  ``bilinear=True`` halves the bottleneck and upsamples with
align-corners bilinear (reference :519, :568); the reference always
instantiates the default ``bilinear=False``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from floodgan_tpu import ops
from floodgan_tpu.models.layers import TorchBatchNorm, TorchConv, TorchConvTranspose
from floodgan_tpu.ops.nn_ops import pad_to_match


class DoubleConv(nn.Module):
    out_channels: int
    mid_channels: int = 0  # 0 -> out_channels

    @nn.compact
    def __call__(self, x):
        mid = self.mid_channels or self.out_channels
        h = TorchConv(mid, 3, 1, 1, use_bias=False, name="conv1")(x)
        h = jnp.maximum(TorchBatchNorm(name="norm1")(h), 0.0)
        h = TorchConv(self.out_channels, 3, 1, 1, use_bias=False, name="conv2")(h)
        return jnp.maximum(TorchBatchNorm(name="norm2")(h), 0.0)


class UNet(nn.Module):
    n_channels: int = 3
    n_classes: int = 1
    bilinear: bool = False

    @nn.compact
    def __call__(self, x):
        factor = 2 if self.bilinear else 1
        x1 = DoubleConv(64, name="inc")(x)
        x2 = DoubleConv(128, name="down1")(ops.max_pool2d(x1))
        x3 = DoubleConv(256, name="down2")(ops.max_pool2d(x2))
        x4 = DoubleConv(512, name="down3")(ops.max_pool2d(x3))
        x5 = DoubleConv(1024 // factor, name="down4")(ops.max_pool2d(x4))

        h = x5
        for i, (skip, out_ch) in enumerate(
            [(x4, 512 // factor), (x3, 256 // factor), (x2, 128 // factor), (x1, 64)],
            start=1,
        ):
            in_ch = h.shape[-1]
            if self.bilinear:
                # torch Up(in_channels=2*in_ch) uses mid = in_channels//2
                # = in_ch (reference model_architectures.py:569)
                h = _align_corners_bilinear_2x(h)
                h = _up_merge(h, skip)
                h = DoubleConv(out_ch, mid_channels=in_ch, name=f"up{i}_conv")(h)
            else:
                h = TorchConvTranspose(
                    in_ch // 2, 2, 2, 0, use_bias=True, name=f"up{i}_upconv"
                )(h)
                h = _up_merge(h, skip)
                h = DoubleConv(out_ch, name=f"up{i}_conv")(h)

        return TorchConv(self.n_classes, 1, 1, 0, name="outc")(h)


def _up_merge(h: jax.Array, skip: jax.Array) -> jax.Array:
    """Pad to the skip's spatial dims and concat skip-first (reference
    model_architectures.py:573-580)."""
    h = pad_to_match(h, skip.shape[1], skip.shape[2])
    return jnp.concatenate([skip, h], axis=-1)


def _align_corners_bilinear_2x(x: jax.Array) -> jax.Array:
    """torch Upsample(scale_factor=2, mode='bilinear', align_corners=True)."""
    n, h, w, c = x.shape
    oh, ow = 2 * h, 2 * w
    # align_corners=True: in coordinate = out * (in-1)/(out-1)
    def grid(in_s, out_s):
        if out_s == 1:
            return jnp.zeros((1,))
        return jnp.arange(out_s) * (in_s - 1) / (out_s - 1)

    ys, xs = grid(h, oh), grid(w, ow)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy
