"""CycleGAN ResNet generator (c7s1-64, d128, d256, 9x R256, u128, u64, c7s1-3).

Behavioral twin of reference model_architectures.py:91-134: reflect-padded
7x7 stem, two stride-2 downs, nine residual blocks at 256ch (the FLOPs hot
spot — at 512^2 input these run at 128x128 spatial), two ConvTranspose ups
(k3 s2 p1 op1), reflect-padded 7x7 RGB head with tanh.  All norms are
torch-default InstanceNorm2d (no affine params).
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

    @nn.compact
    def __call__(self, x):
        # Named remat boundaries — see models/attention.py: under the
        # "boundaries" remat policy the backward recomputes one
        # encoder/trunk/decoder segment at a time from these.
        from jax.ad_checkpoint import checkpoint_name

        h = ops.reflect_pad2d(x, 3)
        h = TorchConv(64, 7, 1, 0, name="conv_in")(h)
        h = ops.instance_norm_act(h, relu=True)
        for i in range(2):
            h = TorchConv(64 * 2 ** (i + 1), 3, 2, 1, name=f"down{i + 1}")(h)
            h = ops.instance_norm_act(h, relu=True)
        h = checkpoint_name(h, "seg_boundary")
        h = ResnetTrunk(256, 9, unroll=self.trunk_unroll, name="trunk")(h)
        h = checkpoint_name(h, "seg_boundary")
        for i in range(2):
            h = TorchConvTranspose(
                64 * 2 ** (1 - i), 3, 2, 1, output_padding=1, name=f"up{i + 1}"
            )(h)
            h = ops.instance_norm_act(h, relu=True)
            h = checkpoint_name(h, "seg_boundary")
        h = ops.reflect_pad2d(h, 3)
        h = TorchConv(3, 7, 1, 0, name="conv_out")(h)
        return jnp.tanh(h)
