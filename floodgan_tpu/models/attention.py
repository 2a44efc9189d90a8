"""Attention generator shared by AttentionGAN and PairedAttention.

Behavioral twin of reference model_architectures.py:163-258 (AttentionGAN)
and :305-400 (PairedAttention) — the two classes are computationally
identical; the repo's novelty is pairing this generator with a conditional
discriminator and pix2pix-style training (SURVEY.md §2.3).

Structure: shared encoder (reflpad conv7 -> 64, conv3 s2 -> 128,
conv3 s2 -> 256, all IN+relu) -> 9 residual blocks at 256ch -> two decoder
heads:
  content:   convT -> 128, convT -> 64, reflpad conv7 -> 27ch, tanh
             (9 RGB content images)
  attention: convT -> 128, convT -> 64, conv1 -> 10ch, softmax over channel
             (9 foreground masks + 1 background mask)
Output: sum_i content_i * attn_i + input_RGB * attn_10 (reference :241-258).

Instead of the reference's ``last_attention_mask`` mutable attribute
(:254), this module *returns* (output, background_mask) — functional state
for jit.  The 9-way multiply-accumulate + background blend is a single
einsum, which XLA fuses with the softmax; a hand-fused Pallas epilogue
lives in ops/pallas_kernels.py.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from floodgan_tpu import ops
from floodgan_tpu.models.layers import TorchConv, TorchConvTranspose
from floodgan_tpu.models.trunk import ResnetTrunk


class AttentionGenerator(nn.Module):
    input_channels: int = 3
    trunk_unroll: int = 0

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array]:
        # --- shared encoder ---
        h = ops.reflect_pad2d(x, 3)
        h = TorchConv(64, 7, 1, 0, name="conv1")(h)
        h = ops.instance_norm_act(h, relu=True)
        h = TorchConv(128, 3, 2, 1, name="conv2")(h)
        h = ops.instance_norm_act(h, relu=True)
        h = TorchConv(256, 3, 2, 1, name="conv3")(h)
        h = ops.instance_norm_act(h, relu=True)
        h = ResnetTrunk(256, 9, unroll=self.trunk_unroll, name="trunk")(h)

        # --- content head: 9 RGB content images ---
        c = TorchConvTranspose(128, 3, 2, 1, output_padding=1, name="deconv1_content")(h)
        c = ops.instance_norm_act(c, relu=True)
        c = TorchConvTranspose(64, 3, 2, 1, output_padding=1, name="deconv2_content")(c)
        c = ops.instance_norm_act(c, relu=True)
        c = ops.reflect_pad2d(c, 3)
        content = jnp.tanh(TorchConv(27, 7, 1, 0, name="deconv3_content")(c))

        # --- attention head: 10 mask logits (softmax inside the fused
        # composition, reference model_architectures.py:227-228) ---
        a = TorchConvTranspose(128, 3, 2, 1, output_padding=1, name="deconv1_attention")(h)
        a = ops.instance_norm_act(a, relu=True)
        a = TorchConvTranspose(64, 3, 2, 1, output_padding=1, name="deconv2_attention")(a)
        a = ops.instance_norm_act(a, relu=True)
        attn_logits = TorchConv(10, 1, 1, 0, name="deconv3_attention")(a)

        # --- compose: softmax + 9 content*mask products + background blend
        # (Pallas epilogue on TPU, jnp elsewhere) ---
        from floodgan_tpu.core.flags import use_pallas
        from floodgan_tpu.ops import pallas_kernels as pk

        compose = pk.attention_compose if use_pallas("compose") else pk._attention_compose_jnp
        output, background_mask = compose(content, attn_logits, x[..., :3])
        return output, background_mask
