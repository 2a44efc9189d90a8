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
    # phase_output=True returns (output, background_mask) in 2x2 phase-major
    # space-to-depth form — (n, H/2, W/2, 12) and (n, H/2, W/2, 4) — for the
    # phase-native train step (full-resolution 3-channel tensors pad 42.7x
    # on TPU; see ops.conv2d_s2_phase_input).  Parameters are identical.
    phase_output: bool = False
    # phase_input=True consumes x in the same phase-major form
    # (n, H/2, W/2, 4*input_channels): reflect-pad runs in phase
    # coordinates (ops.reflect_pad_phases), the k7 stem runs
    # phase-to-phase (ops.conv2d_phase_to_phase), and the first s2 conv
    # consumes phases directly (ops.conv2d_s2_phase_input) — NO
    # full-resolution tensor ever exists in the generator, which is what
    # unlocks 2048^2 single-chip training (the 42.7x-padded 3-channel and
    # 1GB 64-channel full-res tensors were the binding OOM terms,
    # BENCH_NOTES high-resolution study).  Parameters are identical.
    phase_input: bool = False

    def _deconv1_pair(self, h, checkpoint_name):
        """The content/attention deconv1 stages (ConvTranspose 256->128 +
        IN/relu, both over the SAME trunk output).  Under
        FLOODGAN_MERGED_DECONV1 (opt-in; measured-and-REJECTED on v5e —
        64.23 vs 65.45 samples/s, BENCH_NOTES round 3: merging serialises
        the two head branches XLA otherwise overlaps) they run as ONE
        conv with concatenated kernels + one IN over the 256 concatenated
        channels — exactly the two separate stages, since instance norm
        statistics are per-channel.  Parameter names, shapes and init are
        identical either way (ConvTransposeParams)."""
        from floodgan_tpu.core.flags import merged_deconv1
        from floodgan_tpu.models.layers import ConvTransposeParams

        if merged_deconv1():
            w_c, b_c = ConvTransposeParams(128, 3, h.shape[-1], name="deconv1_content")()
            w_a, b_a = ConvTransposeParams(128, 3, h.shape[-1], name="deconv1_attention")()
            m = ops.conv_transpose2d(
                h,
                jnp.concatenate([w_c, w_a], axis=-1),
                jnp.concatenate([b_c, b_a]),
                stride=2, padding=1, output_padding=1,
            )
            m = ops.instance_norm_act(m, relu=True)
            m = checkpoint_name(m, "seg_boundary")
            return m[..., :128], m[..., 128:]
        c = TorchConvTranspose(128, 3, 2, 1, output_padding=1, name="deconv1_content")(h)
        c = ops.instance_norm_act(c, relu=True)
        c = checkpoint_name(c, "seg_boundary")
        a = TorchConvTranspose(128, 3, 2, 1, output_padding=1, name="deconv1_attention")(h)
        a = ops.instance_norm_act(a, relu=True)
        a = checkpoint_name(a, "seg_boundary")
        return c, a

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array]:
        # Named remat boundaries: under segmented rematerialisation
        # (train/paired.py remat policy save_only_these_names) the backward
        # pass recomputes one encoder/trunk/head segment at a time from
        # these saved tensors instead of replaying the whole forward —
        # peak memory drops from the full forward live-set to the largest
        # segment (this is what lets 2048^2 tiles train on one 16GB chip).
        from jax.ad_checkpoint import checkpoint_name

        # --- shared encoder ---
        if self.phase_input:
            from floodgan_tpu.ops.nn_ops import instance_norm_act_phases

            xp = x  # (n, H/2, W/2, 4*C) phase-major
            cin = self.input_channels
            # ReflectionPad2d(3) + the k7 conv as ONE phase-space composite
            # (ops.reflect_conv_phases): interior conv at exact size + four
            # thin halo band convs — neither the padded image nor the
            # padded phase grid ever materializes.
            hp = TorchConv(64, 7, 1, 0, name="conv1")(xp, phase_rp2p=(3, cin))
            hp = instance_norm_act_phases(hp, relu=True)
            h = TorchConv(128, 3, 2, 1, name="conv2")(hp, phase_splits=(64,))
            h = ops.instance_norm_act(h, relu=True)
        else:
            h = ops.reflect_pad2d(x, 3)
            h = TorchConv(64, 7, 1, 0, name="conv1")(h)
            h = ops.instance_norm_act(h, relu=True)
            h = TorchConv(128, 3, 2, 1, name="conv2")(h)
            h = ops.instance_norm_act(h, relu=True)
        h = TorchConv(256, 3, 2, 1, name="conv3")(h)
        h = ops.instance_norm_act(h, relu=True)
        h = checkpoint_name(h, "seg_boundary")
        h = ResnetTrunk(256, 9, unroll=self.trunk_unroll, name="trunk")(h)
        h = checkpoint_name(h, "seg_boundary")

        # --- decoder heads.  Two lowerings of the same parameters:
        # image-space (golden path), or — FLOODGAN_PHASE_HEAD=1, at
        # phase-eligible sizes — fully phase-space: ConvTranspose2 emits
        # phases directly (subpixel decomposition minus the interleave),
        # IN/relu pools phase groups, and the k7/k1 head convs run
        # phase-to-phase.  The round-3 per-op profile attributed ~13 ms of
        # the 150 ms step to the content k7 chain's full-resolution
        # operands (fwd 3.4 + d-input 5.8 at padded 518^2 + wgrad 4.0).
        from floodgan_tpu.core.flags import phase_head
        from floodgan_tpu.ops.nn_ops import instance_norm_act_phases

        head_h = h.shape[1] * 4  # decoder output H (trunk is at H/4)
        use_phase_head = (
            phase_head()
            and h.shape[1] == h.shape[2]  # square (model configs are)
            and head_h % 2 == 0
            and head_h // 2 >= 128  # same profit floor as _phasefold_eligible
        )

        # deconv1 stage (content + attention, both reading the trunk
        # output) — shared by the phase and image head branches.
        c1, a1 = self._deconv1_pair(h, checkpoint_name)

        if use_phase_head:
            # --- content head, phase space ---
            cp = TorchConvTranspose(64, 3, 2, 1, output_padding=1, name="deconv2_content")(
                c1, phase_out=True
            )
            cp = instance_norm_act_phases(cp, relu=True)
            cp = checkpoint_name(cp, "seg_boundary")
            cp = TorchConv(27, 7, 1, 0, name="deconv3_content")(cp, phase_rp2p=(3, 64))
            content_r = ("phases", cp, head_h, head_h)

            # --- attention head, phase space ---
            ap = TorchConvTranspose(64, 3, 2, 1, output_padding=1, name="deconv2_attention")(
                a1, phase_out=True
            )
            ap = instance_norm_act_phases(ap, relu=True)
            ap = checkpoint_name(ap, "seg_boundary")
            ap = TorchConv(10, 1, 1, 0, name="deconv3_attention")(ap, phase_p2p=(0, 64))
            attn_r = ("phases", ap, head_h, head_h)
        else:
            # --- content head: 9 RGB content images ---
            c = TorchConvTranspose(64, 3, 2, 1, output_padding=1, name="deconv2_content")(c1)
            c = ops.instance_norm_act(c, relu=True)
            c = checkpoint_name(c, "seg_boundary")
            c = ops.reflect_pad2d(c, 3)
            content_r = TorchConv(27, 7, 1, 0, name="deconv3_content")(c, phases=True)

            # --- attention head: 10 mask logits (softmax inside the fused
            # composition, reference model_architectures.py:227-228) ---
            a = TorchConvTranspose(64, 3, 2, 1, output_padding=1, name="deconv2_attention")(a1)
            a = ops.instance_norm_act(a, relu=True)
            a = checkpoint_name(a, "seg_boundary")
            attn_r = TorchConv(10, 1, 1, 0, name="deconv3_attention")(a, phases=True)

        # --- compose: softmax + 9 content*mask products + background blend.
        # At large resolutions both head convs come back in PHASE SPACE
        # (2x2 space-to-depth, ops/nn_ops.py) and the pointwise compose runs
        # there too — 108/40-channel tensors at H/2 x W/2 instead of
        # 27/10-channel at H x W (4x the MXU/VPU lane utilization), with a
        # single depth-to-space for the final RGB + mask.  Same math: the
        # compose is per-pixel, so phase grouping only permutes pixels.
        from floodgan_tpu.core.flags import use_pallas
        from floodgan_tpu.ops import pallas_kernels as pk
        from floodgan_tpu.ops.nn_ops import (
            depth_to_space_phases,
            space_to_depth_phases,
        )

        if content_r[0] == "phases" or attn_r[0] == "phases":
            # Both heads see the same H/W and stride-1 narrow-cout convs,
            # so phase-fold eligibility must agree.  Raise (not assert —
            # stripped under python -O) rather than let a future
            # eligibility tweak feed a phase-space tensor into the
            # full-resolution compose below, which would produce silently
            # wrong outputs.
            if not (content_r[0] == attn_r[0] == "phases"):
                raise RuntimeError(
                    "phase-fold eligibility diverged between the content and "
                    f"attention heads ({content_r[0]} vs {attn_r[0]})"
                )
            _, content_p, out_h, out_w = content_r
            _, attn_p, _, _ = attn_r
            n, h2, w2, _ = content_p.shape
            if self.phase_input:
                # x is already phase-major on exactly this grid
                from floodgan_tpu.ops.nn_ops import slice_channels_phases

                rgb_p12 = slice_channels_phases(x, self.input_channels, 0, 3)
            else:
                rgb_p12 = space_to_depth_phases(x[..., :3])

            from floodgan_tpu.core.flags import flat_compose

            if flat_compose():
                # Flat-channel compose (ops.attention_compose_phases): the
                # per-phase softmax + 9-way MAC as constant 0/1-matrix
                # matmuls — no (…, 4, 10)/(…, 4, 9, 3) intermediates.
                from floodgan_tpu.ops.nn_ops import attention_compose_phases

                out12, bg4 = attention_compose_phases(
                    jnp.tanh(content_p), attn_p, rgb_p12
                )
                out12 = out12.astype(content_p.dtype)
                bg4 = bg4.astype(content_p.dtype)
            else:
                content_5 = jnp.tanh(content_p).reshape(n, h2, w2, 4, 9, 3)
                logits_p = attn_p.reshape(n, h2, w2, 4, 10)
                rgb_p = rgb_p12.reshape(n, h2, w2, 4, 3)
                attn = jax.nn.softmax(logits_p.astype(jnp.float32), axis=-1)
                attn = attn.astype(content_5.dtype)
                fg = jnp.einsum("nhwpkc,nhwpk->nhwpc", content_5, attn[..., :9])
                out_p = fg + rgb_p.astype(content_5.dtype) * attn[..., 9:10]
                out12 = out_p.reshape(n, h2, w2, 4 * 3)
                bg4 = attn[..., 9].reshape(n, h2, w2, 4)
            if self.phase_output:
                return out12, bg4
            output = depth_to_space_phases(out12, out_h, out_w, 3)
            background_mask = depth_to_space_phases(bg4, out_h, out_w, 1)[..., 0]
            return output, background_mask

        content = jnp.tanh(content_r[1])
        attn_logits = attn_r[1]
        if self.phase_input:
            # small-resolution fallback (phase-fold tail ineligible):
            # reconstruct the image view of the input for the compose
            n, S, T, _ = x.shape
            rgb = depth_to_space_phases(
                x.reshape(n, S, T, 4, self.input_channels)[..., :3].reshape(
                    n, S, T, 12
                ),
                2 * S, 2 * T, 3,
            )
        else:
            rgb = x[..., :3]
        compose = pk.attention_compose if use_pallas("compose") else pk._attention_compose_jnp
        output, background_mask = compose(content, attn_logits, rgb)
        if self.phase_output:
            # small-resolution fallback (phase-fold tail ineligible): keep
            # the phase-space contract by converting explicitly.
            return (
                space_to_depth_phases(output),
                space_to_depth_phases(background_mask[..., None]),
            )
        return output, background_mask
