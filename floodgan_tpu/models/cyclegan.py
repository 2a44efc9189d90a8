"""CycleGAN ResNet generator (c7s1-64, d128, d256, 9x R256, u128, u64, c7s1-3).

Behavioral twin of reference model_architectures.py:91-134: reflect-padded
7x7 stem, two stride-2 downs, nine residual blocks at 256ch (the FLOPs hot
spot — at 512^2 input these run at 128x128 spatial), two ConvTranspose ups
(k3 s2 p1 op1), reflect-padded 7x7 RGB head with tanh.  All norms are
torch-default InstanceNorm2d (no affine params).

Phase-space calling conventions (phase_input / phase_output) reuse the
attention generator's lowering (models/attention.py): the stem consumes the
2x2 space-to-depth phase-major form and the head emits it, so at eligible
sizes NO full-resolution tensor exists inside the generator — the
(B, H, W, 3..9)-channel tensors that pad 42.7x on TPU lanes never
materialise.  Parameters are identical across conventions (same names,
same shapes), so checkpoints don't care which path ran.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from floodgan_tpu import ops
from floodgan_tpu.models.layers import TorchConv, TorchConvTranspose
from floodgan_tpu.models.trunk import ResnetTrunk


class ResnetBlock(nn.Module):
    """Residual block: [reflpad conv3 IN relu reflpad conv3 IN] + skip
    (reference model_architectures.py:122-134 == :260-276 == :402-418)."""

    dim: int = 256

    @nn.compact
    def __call__(self, x):
        h = ops.reflect_pad2d(x, 1)
        h = TorchConv(self.dim, 3, 1, 0, name="conv1")(h)
        h = ops.instance_norm_act(h, relu=True)
        h = ops.reflect_pad2d(h, 1)
        h = TorchConv(self.dim, 3, 1, 0, name="conv2")(h)
        return ops.instance_norm_act(h, residual=x)


class CycleGANGenerator(nn.Module):
    input_channels: int = 3
    trunk_unroll: int = 0
    # phase_output=True returns the RGB output in 2x2 phase-major form
    # (n, H/2, W/2, 12); phase_input=True consumes x in the same form
    # (n, H/2, W/2, 4*input_channels).  See models/attention.py for the
    # lowering derivations (reflect_pad_phases, conv2d_phase_to_phase,
    # conv2d_s2_phase_input, conv_transpose2d_phase_out).
    phase_output: bool = False
    phase_input: bool = False

    @nn.compact
    def __call__(self, x):
        # Named remat boundaries — see models/attention.py: under the
        # "boundaries" remat policy the backward recomputes one
        # encoder/trunk/decoder segment at a time from these.
        from jax.ad_checkpoint import checkpoint_name

        from floodgan_tpu.ops.nn_ops import (
            instance_norm_act_phases,
            space_to_depth_phases,
        )

        if self.phase_input:
            cin = self.input_channels
            # ReflectionPad2d(3) + the k7 stem as one phase-space composite
            # (ops.reflect_conv_phases) — identical values to reflpad3 +
            # conv7 in image space, no padded tensor materialized.
            hp = TorchConv(64, 7, 1, 0, name="conv_in")(x, phase_rp2p=(3, cin))
            hp = instance_norm_act_phases(hp, relu=True)
            h = TorchConv(128, 3, 2, 1, name="down1")(hp, phase_splits=(64,))
            h = ops.instance_norm_act(h, relu=True)
        else:
            h = ops.reflect_pad2d(x, 3)
            h = TorchConv(64, 7, 1, 0, name="conv_in")(h)
            h = ops.instance_norm_act(h, relu=True)
            h = TorchConv(128, 3, 2, 1, name="down1")(h)
            h = ops.instance_norm_act(h, relu=True)
        h = TorchConv(256, 3, 2, 1, name="down2")(h)
        h = ops.instance_norm_act(h, relu=True)
        h = checkpoint_name(h, "seg_boundary")
        h = ResnetTrunk(256, 9, unroll=self.trunk_unroll, name="trunk")(h)
        h = checkpoint_name(h, "seg_boundary")

        # Decoder head — same eligibility rule as the attention heads
        # (square, even output, half-res >= 128 profit floor): ConvTranspose2
        # emits subpixel phases directly, IN pools phase groups, and the k7
        # RGB head runs phase-to-phase.
        from floodgan_tpu.core.flags import phase_head

        head_h = h.shape[1] * 4
        use_phase_head = (
            self.phase_output
            and phase_head()  # same revert switch as the attention heads
            and h.shape[1] == h.shape[2]
            and head_h % 2 == 0
            and head_h // 2 >= 128
        )

        h = TorchConvTranspose(128, 3, 2, 1, output_padding=1, name="up1")(h)
        h = ops.instance_norm_act(h, relu=True)
        h = checkpoint_name(h, "seg_boundary")
        if use_phase_head:
            hp = TorchConvTranspose(64, 3, 2, 1, output_padding=1, name="up2")(
                h, phase_out=True
            )
            hp = instance_norm_act_phases(hp, relu=True)
            hp = checkpoint_name(hp, "seg_boundary")
            hp = TorchConv(3, 7, 1, 0, name="conv_out")(hp, phase_rp2p=(3, 64))
            return jnp.tanh(hp)
        h = TorchConvTranspose(64, 3, 2, 1, output_padding=1, name="up2")(h)
        h = ops.instance_norm_act(h, relu=True)
        h = checkpoint_name(h, "seg_boundary")
        h = ops.reflect_pad2d(h, 3)
        h = TorchConv(3, 7, 1, 0, name="conv_out")(h)
        out = jnp.tanh(h)
        if self.phase_output:
            # small-resolution fallback (phase head ineligible): keep the
            # phase-space contract by converting explicitly.
            return space_to_depth_phases(out)
        return out
