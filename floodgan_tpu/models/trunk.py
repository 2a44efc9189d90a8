"""Rolled ResNet trunk: the 9 residual blocks as one lax.scan.

The CycleGAN/Attention generators run 9 structurally-identical residual
blocks at 256ch (reference model_architectures.py:104-105, :177-180).
Tracing them unrolled makes every generator graph ~9x larger than needed —
the cycle train step (6 generator applies + discriminators, forward and
backward) produced multi-hundred-thousand-op XLA programs with
multi-minute compiles.  Rolling the trunk into a scan over stacked
per-block parameters keeps the compiled program one block deep.

Parameters are stored stacked: conv{1,2}_weight (B, 3, 3, C, C),
conv{1,2}_bias (B, C).  ``roll_resnet_params`` converts a flat
res0..res{B-1} tree (the torch_import layout) into this layout;
``unroll_resnet_params`` inverts it.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from floodgan_tpu import ops
from floodgan_tpu.models.layers import conv_init


class ResnetTrunk(nn.Module):
    dim: int = 256
    num_blocks: int = 9
    # scan unroll factor: 1 = minimal compile (one block deep), num_blocks
    # = full unrolling (XLA overlaps across blocks, ~9% faster at 512^2).
    # 0 resolves to 1; FLOODGAN_TRUNK_UNROLL overrides everything.
    unroll: int = 0

    @nn.compact
    def __call__(self, x):
        nb, d = self.num_blocks, self.dim
        w1 = self.param("conv1_weight", conv_init, (nb, 3, 3, d, d))
        b1 = self.param("conv1_bias", nn.initializers.zeros, (nb, d))
        w2 = self.param("conv2_weight", conv_init, (nb, 3, 3, d, d))
        b2 = self.param("conv2_bias", nn.initializers.zeros, (nb, d))

        def block(h, p):
            pw1, pb1, pw2, pb2 = p
            y = ops.reflect_conv2d(h, pw1, pb1, pad=1)
            y = ops.instance_norm_act(y, relu=True)
            y = ops.reflect_conv2d(y, pw2, pb2, pad=1)
            return ops.instance_norm_act(y, residual=h), None

        import os

        env = os.environ.get("FLOODGAN_TRUNK_UNROLL")
        unroll = int(env) if env else (self.unroll or 1)
        out, _ = jax.lax.scan(block, x, (w1, b1, w2, b2), unroll=max(1, unroll))
        return out


def roll_resnet_params(tree: dict, num_blocks: int = 9, prefix: str = "res") -> dict:
    """res0..res{B-1}/{conv1,conv2}/{weight,bias} -> trunk stacked layout.
    Leaves the rest of the tree untouched; no-op if no res blocks present."""
    if f"{prefix}0" not in tree:
        return tree
    tree = dict(tree)
    stacked = {}
    for conv in ("conv1", "conv2"):
        for leaf in ("weight", "bias"):
            stacked[f"{conv}_{leaf}"] = jnp.stack(
                [jnp.asarray(tree[f"{prefix}{i}"][conv][leaf]) for i in range(num_blocks)]
            )
    for i in range(num_blocks):
        tree.pop(f"{prefix}{i}")
    tree["trunk"] = stacked
    return tree


def unroll_resnet_params(tree: dict, prefix: str = "res") -> dict:
    """Inverse of roll_resnet_params (for exporting back to per-block)."""
    if "trunk" not in tree:
        return tree
    tree = dict(tree)
    trunk = tree.pop("trunk")
    nb = trunk["conv1_weight"].shape[0]
    for i in range(nb):
        tree[f"{prefix}{i}"] = {
            conv: {
                "weight": trunk[f"{conv}_weight"][i],
                "bias": trunk[f"{conv}_bias"][i],
            }
            for conv in ("conv1", "conv2")
        }
    return tree
