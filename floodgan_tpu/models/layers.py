"""Flax linen wrappers over the torch-semantics ops.

Parameter initialisation follows the reference's ``initialise_weights``
(reference models/model.py:162-173): conv/linear weights ~ N(0, 0.02) with
zero bias, BatchNorm scale ~ N(1, 0.02) with zero bias.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from floodgan_tpu import ops

conv_init = nn.initializers.normal(stddev=0.02)


def bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


class TorchConv(nn.Module):
    """nn.Conv2d twin (HWIO kernel, cross-correlation).

    ``__call__(x, phases=True)`` asks for phase-space output when the
    phase-fold lowering applies (see ops/nn_ops.py): returns
    ("phases", p, out_h, out_w) with p = (n, out_h/2, out_w/2, 4*features),
    or ("full", y) when ineligible — parameters are identical either way,
    so checkpoints don't care which path ran."""

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(
        self, x, phases: bool = False, phase_splits=None, phase_p2p=None,
        phase_rp2p=None,
    ):
        from floodgan_tpu.ops.nn_ops import (
            _conv2d_phasefold_phases,
            _phasefold_eligible,
            conv2d_phase_to_phase,
            conv2d_s2_phase_input,
            reflect_conv_phases,
        )

        if phase_rp2p is not None:
            # x is phase-major and UNPADDED; computes
            # conv(reflect_pad(x, pad)) in phase space as one composite
            # (ops.reflect_conv_phases) — the padded tensor never
            # materializes.  phase_rp2p carries (image_pad, cin); params
            # are the ordinary image-space kernel.
            pad, cin = phase_rp2p
            w = self.param("weight", conv_init, (self.kernel, self.kernel, cin, self.features))
            b = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
            return reflect_conv_phases(x, w, b, pad, cin)

        if phase_p2p is not None:
            # x is phase-major (n, H/2, W/2, 4*cin) and the output stays in
            # phase space (ops.conv2d_phase_to_phase).  phase_p2p carries
            # (image_padding, cin); parameters are the ordinary image-space
            # kernel — checkpoints are identical across calling conventions.
            pad, cin, *rest = phase_p2p
            crop = rest[0] if rest else 0
            w = self.param("weight", conv_init, (self.kernel, self.kernel, cin, self.features))
            b = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
            return conv2d_phase_to_phase(x, w, padding=pad, b=b, crop=crop)

        if phase_splits is not None:
            # x is a phase-space concat (see ops.conv2d_s2_phase_input);
            # parameters are the ordinary image-space kernel, so the two
            # calling conventions share checkpoints bit for bit.  The
            # lowering is derived for s2 p1 (any k) — reject anything else
            # loudly rather than silently computing those semantics.
            if self.stride != 2 or self.padding != 1:
                raise ValueError(
                    "phase_splits requires an s2 p1 conv (got "
                    f"k{self.kernel} s{self.stride} p{self.padding})"
                )
            cin = sum(phase_splits)
            w = self.param("weight", conv_init, (self.kernel, self.kernel, cin, self.features))
            b = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
            return conv2d_s2_phase_input(x, w, phase_splits, b)

        w = self.param(
            "weight", conv_init, (self.kernel, self.kernel, x.shape[-1], self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        if phases and _phasefold_eligible(x, w, self.stride, self.padding):
            p, out_h, out_w = _conv2d_phasefold_phases(x, w, self.padding)
            if b is not None:
                p = p + jnp.tile(b, 4)
            return "phases", p, out_h, out_w
        y = ops.conv2d(x, w, b, stride=self.stride, padding=self.padding)
        return ("full", y) if phases else y


class TorchConvTranspose(nn.Module):
    """nn.ConvTranspose2d twin ((kh, kw, C_in, C_out) kernel)."""

    features: int
    kernel: int
    stride: int = 2
    padding: int = 1
    output_padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, phase_out: bool = False):
        w = self.param(
            "weight", conv_init, (self.kernel, self.kernel, x.shape[-1], self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        if phase_out:
            # output in 2x2 phase-major space-to-depth form (the subpixel
            # decomposition without the interleave) — same parameters.
            from floodgan_tpu.ops.nn_ops import conv_transpose2d_phase_out

            if self.stride != 2:
                raise ValueError("phase_out is derived for stride 2")
            return conv_transpose2d_phase_out(
                x, w, b, padding=self.padding, output_padding=self.output_padding
            )
        return ops.conv_transpose2d(
            x, w, b, stride=self.stride, padding=self.padding,
            output_padding=self.output_padding,
        )


class ConvTransposeParams(nn.Module):
    """Parameter twin of TorchConvTranspose: declares the SAME weight/bias
    (names, shapes, init) without computing anything — for callers that
    fuse several deconvs over one input into a single conv pass (e.g. the
    attention generator's merged content/attention deconv1).  Checkpoints
    are interchangeable with TorchConvTranspose by construction."""

    features: int
    kernel: int
    in_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        w = self.param(
            "weight", conv_init,
            (self.kernel, self.kernel, self.in_features, self.features),
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return w, b


class TorchBatchNorm(nn.Module):
    """nn.BatchNorm2d twin, permanently in training mode (batch statistics).

    The reference never switches its networks to eval mode (SURVEY.md §2.7),
    so running statistics would never be read and are not kept.
    """

    @nn.compact
    def __call__(self, x, phases: bool = False):
        if phases:
            # x is 2x2 phase-major (n, H/2, W/2, 4C).  BN statistics pool
            # over every (N, H, W) pixel of each image channel, and the
            # phase grouping only permutes pixels — folding the phase axis
            # into a spatial dim reuses ops.batch_norm (and its
            # closed-form VJP) unchanged.  Parameters stay the image-space
            # (C,) vectors, so checkpoints are layout-independent.
            c = x.shape[-1] // 4
            scale = self.param("scale", bn_scale_init, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            n, h, w, _ = x.shape
            y = ops.batch_norm(x.reshape(n, h, w * 4, c), scale, bias)
            return y.reshape(n, h, w, 4 * c)
        c = x.shape[-1]
        scale = self.param("scale", bn_scale_init, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return ops.batch_norm(x, scale, bias)


class TorchDropout(nn.Module):
    """nn.Dropout twin.  Always active — the reference runs dropout at
    inference under a pinned RNG (reference models/model.py:393,497,579);
    callers control determinism purely through the 'dropout' rng they pass."""

    rate: float = 0.5

    @nn.compact
    def __call__(self, x):
        if self.rate == 0.0:
            return x
        return ops.dropout(x, self.rate, self.make_rng("dropout"))
