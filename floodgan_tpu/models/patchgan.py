"""70x70 PatchGAN discriminator, covering all four reference variants.

The reference defines four discriminators (model_architectures.py:64-85,
:136-157, :278-299, :420-441) that differ only in (a) norm layer — BatchNorm
(Pix2Pix) vs InstanceNorm (the rest) — and (b) whether the input is the
condition stack concatenated with the RGB image (+3 channels, Pix2Pix and
PairedAttention) or the image alone (CycleGAN, AttentionGAN).  Conditioning
is the *caller's* concatenation, so one module parameterised by norm type
covers all four:

  C64(k4 s2, lrelu) - C128(norm, lrelu) - C256(norm, lrelu)
  - C512(k4 s1, norm, lrelu) - C1(k4 s1)           [patch logit map, LSGAN]

torch bias conventions preserved: with BatchNorm the normed convs drop
their bias (ref :74, :78); with InstanceNorm they keep it (ref :146, :150).
"""

from __future__ import annotations

import flax.linen as nn

from floodgan_tpu import ops
from floodgan_tpu.models.layers import TorchBatchNorm, TorchConv


class PatchGANDiscriminator(nn.Module):
    norm: str = "instance"  # "batch" | "instance"

    @nn.compact
    def __call__(self, x, phase_splits=None):
        """``phase_splits``: when given, ``x`` is a channel-concat of
        2x2 phase-major space-to-depth groups (sizes in phase_splits) at
        H/2 x W/2, and the k4 s2 stem is evaluated directly in phase
        space (ops.conv2d_s2_phase_input — numerically the same conv,
        but the full-resolution 3/12-channel input never materialises;
        see BENCH_NOTES high-resolution study).  The stem's output grid
        is H/2 either way, so every later layer is untouched and the
        parameters are identical between the two calling conventions."""
        use_bias = self.norm != "batch"

        # The patch head is three stride-2 convs then two k4 s1 p1 convs
        # (each -1): below 24 pixels the logit map has no elements and the
        # LSGAN mean over it is silently NaN under XLA (torch errors out at
        # the zero-size conv).  Fail loudly like the Pix2Pix U-Net's
        # divisibility check does.
        scale = 2 if phase_splits is not None else 1
        h_in, w_in = x.shape[1] * scale, x.shape[2] * scale
        if h_in // 8 - 2 < 1 or w_in // 8 - 2 < 1:
            raise ValueError(
                "PatchGAN needs spatial dims >= 24 (three stride-2 levels "
                f"then two k4 s1 p1 convs); got {h_in}x{w_in}.  Use "
                "--resize 256/512 (optionally with --crop) like the "
                "reference configurations."
            )

        def normed_lrelu(h, name):
            if self.norm == "batch":
                return ops.leaky_relu(TorchBatchNorm(name=name)(h), 0.2)
            # fused IN + leaky-relu (Pallas on TPU)
            return ops.instance_norm_act(h, relu=True, negative_slope=0.2)

        h = TorchConv(64, 4, 2, 1, name="conv0")(x, phase_splits=phase_splits)
        h = ops.leaky_relu(h, 0.2)
        for n, chl in enumerate([128, 256], start=1):
            h = TorchConv(chl, 4, 2, 1, use_bias=use_bias, name=f"conv{n}")(h)
            h = normed_lrelu(h, f"norm{n}")
        h = TorchConv(512, 4, 1, 1, use_bias=use_bias, name="conv3")(h)
        h = normed_lrelu(h, "norm3")
        return TorchConv(1, 4, 1, 1, name="conv4")(h)
