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
    def __call__(self, x, phase_cin: int = 0):
        """``phase_cin > 0``: x is 2x2 phase-major (n, H/2, W/2, 4*phase_cin)
        and both convs + BNs evaluate in phase space (identical parameters —
        the kernels are the image-space (3, 3, cin, cout) tensors either
        way; see core/flags.seg_phase)."""
        mid = self.mid_channels or self.out_channels
        if phase_cin:
            h = TorchConv(mid, 3, 1, 1, use_bias=False, name="conv1")(
                x, phase_p2p=(1, phase_cin)
            )
            h = jnp.maximum(TorchBatchNorm(name="norm1")(h, phases=True), 0.0)
            h = TorchConv(self.out_channels, 3, 1, 1, use_bias=False, name="conv2")(
                h, phase_p2p=(1, mid)
            )
            return jnp.maximum(TorchBatchNorm(name="norm2")(h, phases=True), 0.0)
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
        from floodgan_tpu.core.flags import seg_phase
        from floodgan_tpu.ops.nn_ops import (
            concat_channels_phases,
            depth_to_space_phases,
            max_pool2d_phases,
            space_to_depth_phases,
        )

        factor = 2 if self.bilinear else 1
        # Phase-space stem/tail (core/flags.seg_phase): the lane-starved
        # 64-channel full-resolution levels run as 256-channel convs on the
        # 2x2 space-to-depth grid.  Eligibility: the up4 ConvTranspose
        # output must land exactly on x1's grid (H, W divisible by 4 — no
        # pad_to_match halo in phase space) and the bilinear variant keeps
        # its image-space tail (its up4 is an upsample, not a k2 s2
        # deconv).  Parameters are identical across both lowerings.
        use_phase = (
            seg_phase()
            and not self.bilinear
            and x.shape[1] % 4 == 0
            and x.shape[2] % 4 == 0
        )

        if use_phase:
            H, W = x.shape[1], x.shape[2]
            xp = space_to_depth_phases(x)
            x1p = DoubleConv(64, name="inc")(xp, phase_cin=self.n_channels)
            x1 = max_pool2d_phases(x1p, 64)  # the pooled IMAGE tensor
        else:
            x1_full = DoubleConv(64, name="inc")(x)
            x1 = ops.max_pool2d(x1_full)
        x2 = DoubleConv(128, name="down1")(x1)
        x3 = DoubleConv(256, name="down2")(ops.max_pool2d(x2))
        x4 = DoubleConv(512, name="down3")(ops.max_pool2d(x3))
        x5 = DoubleConv(1024 // factor, name="down4")(ops.max_pool2d(x4))

        h = x5
        for i, (skip, out_ch) in enumerate(
            [(x4, 512 // factor), (x3, 256 // factor), (x2, 128 // factor)],
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

        # up4 — the full-resolution level.  In phase mode the k2 s2 deconv
        # emits phases directly (its subpixel decomposition IS the phase
        # decomposition), the skip concat happens per phase block, and the
        # 1x1 outc is a per-phase matmul; one depth-to-space at the very
        # end reassembles the logits.
        in_ch = h.shape[-1]
        if use_phase:
            hp = TorchConvTranspose(
                in_ch // 2, 2, 2, 0, use_bias=True, name="up4_upconv"
            )(h, phase_out=True)
            hp = concat_channels_phases([(x1p, 64), (hp, in_ch // 2)])
            hp = DoubleConv(64, name="up4_conv")(hp, phase_cin=64 + in_ch // 2)
            logits_p = TorchConv(self.n_classes, 1, 1, 0, name="outc")(
                hp, phase_p2p=(0, 64)
            )
            return depth_to_space_phases(logits_p, H, W, self.n_classes)
        if self.bilinear:
            h = _align_corners_bilinear_2x(h)
            h = _up_merge(h, x1_full)
            h = DoubleConv(64, mid_channels=in_ch, name="up4_conv")(h)
        else:
            h = TorchConvTranspose(
                in_ch // 2, 2, 2, 0, use_bias=True, name="up4_upconv"
            )(h)
            h = _up_merge(h, x1_full)
            h = DoubleConv(64, name="up4_conv")(h)
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
