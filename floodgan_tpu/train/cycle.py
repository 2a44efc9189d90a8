"""Cycle (CycleGAN-style) adversarial training as one jitted step.

Faithful restructuring of the reference batch loop (reference
models/model.py:660-758):

  forwards: synthetic_post = G_ab(real_pre);
            synthetic_pre  = G_ba(real_post ⊕ cond);
            both synthetics re-concatenated with the condition channels
            (ref :682-689) before the cycle passes
            recreated_post = G_ab(synthetic_pre ⊕ cond),
            recreated_pre  = G_ba(synthetic_post ⊕ cond);
  G update first (ref :693-714, against the *current* discriminators):
            LSGAN(D_post(syn_post⊕cond), 1) + LSGAN(D_pre(syn_pre⊕cond), 1)
            + 10·L1(recreated_pre, pre_rgb) + 10·L1(recreated_post, post_rgb)
            + optional 5·identity L1 ×2,
            one Adam over both generators' chained params (ref :112-114);
  replay buffers (ref :723-724 → :275-294): device-resident 50-slot ring
            per direction; if not full -> store & return new; else 50% swap
            with a uniformly random old image;
  D update (ref :726-739): per-direction (real vs buffered-synthetic) MSE
            pairs, each halved, one Adam over both discriminators.

Loss keys match the reference storage schema (ref :189-199, :741-751).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from floodgan_tpu.core.config import TrainConfig
from floodgan_tpu.models.registry import (
    build_discriminator,
    build_generator,
    generator_returns_mask,
)
from floodgan_tpu.train.losses import l1_loss, lsgan_mse
from floodgan_tpu.train.optim import adam_tx, apply_adam


class ImageBuffer(flax.struct.PyTreeNode):
    """50-image replay buffer (reference models/model.py:275-294) as device
    state: the reference's python-list + CPU-roundtrip buffer reformulated
    as a fixed ring with explicit RNG (SURVEY.md §7 'hard parts')."""

    images: jax.Array  # (cap, H, W, C)
    count: jax.Array   # () int32

    @staticmethod
    def create(capacity: int, h: int, w: int, c: int, dtype=jnp.float32) -> "ImageBuffer":
        # Under the bf16 compute policy the buffer stores bf16: the
        # discriminator casts its input to bf16 anyway, so the stored
        # values are exactly what D would see — at half the HBM footprint
        # (a 50-slot 512^2x9 buffer is 236MB in f32).
        return ImageBuffer(
            images=jnp.zeros((capacity, h, w, c), dtype),
            count=jnp.zeros((), jnp.int32),
        )

    def query(self, image: jax.Array, rng: jax.Array) -> Tuple["ImageBuffer", jax.Array]:
        """One image in -> one image out + updated buffer.  Matches the
        reference policy: fill first; afterwards 50% (store new, return a
        random old) / 50% (return new)."""
        cap = self.images.shape[0]
        kp, ki = jax.random.split(rng)
        p = jax.random.uniform(kp)
        rand_ix = jax.random.randint(ki, (), 0, cap)
        not_full = self.count < cap
        store_ix = jnp.where(not_full, self.count, rand_ix)
        old = self.images[store_ix]
        do_store = not_full | (p > 0.5)
        # Always write ONE slot (the kept value when not storing), never a
        # whole-buffer select: the previous where(do_store, set(...), images)
        # materialized a full (cap,H,W,C) select per query — ~240MB of HBM
        # traffic per item at 512^2.
        slot_val = jnp.where(do_store, image.astype(self.images.dtype), old)
        new_images = self.images.at[store_ix].set(slot_val)
        returned = jnp.where(not_full | (p <= 0.5), image, old.astype(image.dtype))
        return (
            ImageBuffer(new_images, jnp.where(not_full, self.count + 1, self.count)),
            returned,
        )

    def query_batch(self, images: jax.Array, rng: jax.Array):
        """Sequential per-item queries over the batch (the reference
        processes one image per step; ordering is preserved)."""
        keys = jax.random.split(rng, images.shape[0])

        def body(buf, xs):
            img, key = xs
            buf, out = buf.query(img, key)
            return buf, out

        return jax.lax.scan(body, self, (images, keys))


class CycleState(flax.struct.PyTreeNode):
    gen_params: dict    # {"ab": ..., "ba": ...}
    disc_params: dict   # {"post": ..., "pre": ...}
    gen_opt: tuple
    disc_opt: tuple
    pre_buffer: ImageBuffer
    post_buffer: ImageBuffer


class CycleTrainer:
    def __init__(
        self,
        model: str,
        input_channels: int,
        cfg: TrainConfig = TrainConfig(),
        add_identity_loss: bool = False,
        compute_dtype: str = "float32",
        remat: bool = False,
        remat_policy: str = "convs",  # "convs" | "boundaries" (segmented) | "full"
        phase_d: bool = None,
        phase_gen: bool = None,
    ):
        import os

        # Phase-space discriminator path: replay buffers store 2x2
        # space-to-depth tensors and the PatchGAN stem consumes them
        # directly (ops.conv2d_s2_phase_input) — the (B, H, W, 9) D-input
        # tensors that pad 9 -> 128 lanes (14x) never materialise on the
        # D side, and the buffers store at 128/(4*9) = 3.6x padding
        # instead.  Same values, same replay policy, same parameters.
        from floodgan_tpu.core.flags import _env_bool

        phase_d_explicit = phase_d is not None or (
            os.environ.get("FLOODGAN_CYCLE_PHASE_D") is not None
        )
        if phase_d is None:
            phase_d = _env_bool("FLOODGAN_CYCLE_PHASE_D", False)
        self.phase_d = bool(phase_d)
        self.model = model
        # Fully phase-space cycle step (FLOODGAN_CYCLE_PHASE): BOTH
        # generators consume and emit the 2x2 phase-major form
        # (models/cyclegan.py / models/attention.py phase_input+phase_output)
        # and the discriminators read phases too (phase_d forced on) — so
        # the whole G_ab/G_ba/cycle/D graph holds NO full-resolution
        # few-channel tensor.  This is the configuration that won for the
        # paired step (46.9 -> 61.6 samples/s across round 2-3); phase_d
        # ALONE was measured slower in round 2 because the image-space
        # generators forced s2d conversions at every D interface — with
        # phase generators those conversions vanish.  Same math: the cycle
        # L1 is a mean over the same elements and every lowering is
        # golden-tested (tests/test_train_steps.py equivalence).
        # Measured on v5e 512^2 b8 --remat: image-space 10.35 samples/s
        # (28.1% MFU) -> fully phase-space 14.23 (51.4% MFU).  Default ON
        # on TPU-class backends; OFF on CPU, where the phase lowerings'
        # band/scatter forms are slower (same rationale as the composite
        # reflect-conv VJP) and the extra graph size risks the 1-core
        # dryrun's 40 s collective-rendezvous watchdog.
        # FLOODGAN_CYCLE_PHASE=0/1 overrides either way.
        if phase_gen is None:
            if os.environ.get("FLOODGAN_CYCLE_PHASE") is None:
                import jax as _jax

                phase_gen = _jax.default_backend() != "cpu"
            else:
                phase_gen = _env_bool("FLOODGAN_CYCLE_PHASE", False)
        self.phase_gen = bool(phase_gen)
        if self.phase_gen and not self.phase_d:
            # phase generators require phase discriminators/buffers.  An
            # EXPLICIT phase_d=False (arg or env) must not be silently
            # overridden — that would make the disable flag a no-op on TPU
            # hosts where phase_gen defaults on.
            if phase_d_explicit:
                raise ValueError(
                    "phase_d=False conflicts with the phase-space cycle step "
                    "(phase generators emit phase-major tensors the D/buffers "
                    "must consume); disable both with FLOODGAN_CYCLE_PHASE=0 "
                    "or phase_gen=False"
                )
            self.phase_d = True
        self.cfg = cfg
        self.add_identity_loss = add_identity_loss
        self.input_channels = input_channels
        self.has_condition = input_channels > 3
        self.generator = build_generator(model, input_channels)
        self.discriminator = build_discriminator(model)
        self.returns_mask = generator_returns_mask(model)
        if self.phase_gen:
            # Same parameter names/shapes as self.generator — checkpoints
            # and init are shared; only the calling convention differs.
            self.generator_phase = build_generator(
                model, input_channels, phase_output=True, phase_input=True
            )
        self.tx = adam_tx(b1=cfg.adam_b1, b2=cfg.adam_b2)
        # Mixed precision: f32 master params, bf16 activations/flops on the
        # MXU, f32 norm statistics and losses (ops upcast internally).
        self.compute_dtype = jnp.dtype(compute_dtype)
        # Rematerialise generator forwards in the backward pass (the cycle
        # step holds 4-6 generator graphs live; remat trades recompute for
        # O(#forwards) activation memory).  policy="convs" keeps conv
        # outputs resident and recomputes only the cheap norm/elementwise
        # chains — far less recompute than full remat while still fitting
        # 512^2 batch>1 in HBM.
        if remat_policy not in ("convs", "boundaries", "full"):
            raise ValueError(f"unknown remat_policy {remat_policy!r}")
        self.remat = remat
        self.remat_policy = remat_policy
        # Per-instance jit so backend-specific XLA compiler options apply
        # (core/flags.step_compiler_options — measured scoped-VMEM default
        # on TPU, {} elsewhere); class decorators would fix options at
        # import time, before the backend is known.
        from floodgan_tpu.core.flags import step_compiler_options

        opts = step_compiler_options() or None
        self.train_step = jax.jit(
            self._train_step, donate_argnums=0, compiler_options=opts
        )
        self.generate = jax.jit(
            self._generate, static_argnums=2, compiler_options=opts
        )

    def _cast(self, tree):
        if self.compute_dtype == jnp.float32:
            return tree
        return jax.tree_util.tree_map(lambda p: p.astype(self.compute_dtype), tree)

    def _maybe_remat(self, fwd):
        if self.remat:
            if self.remat_policy == "convs":
                policy = lambda prim, *_, **__: prim.name == "conv_general_dilated"
                return jax.checkpoint(fwd, policy=policy)
            if self.remat_policy == "boundaries":
                # Segmented remat (see models/cyclegan.py markers): saves
                # only segment boundaries — far less memory than "convs"
                # (which keeps every conv output), more recompute; the
                # policy for resolutions where "convs" overflows HBM.
                return jax.checkpoint(
                    fwd,
                    policy=jax.checkpoint_policies.save_only_these_names("seg_boundary"),
                )
            return jax.checkpoint(fwd)
        return fwd

    def gen_apply(self, params, x):
        def fwd(p, xx):
            out = self.generator.apply(
                {"params": self._cast(p)}, xx.astype(self.compute_dtype)
            )
            out = out[0] if self.returns_mask else out
            return out.astype(jnp.float32)

        return self._maybe_remat(fwd)(params, x)

    def gen_apply_pair(self, stacked_params, x2):
        """Both generators as ONE two-group application: params stacked on a
        leading axis of 2, inputs (2, B, H, W, C).  vmap lowers the paired
        convolutions to grouped convs — one generator graph instead of two,
        which halves the rolled-trunk loop overhead and runs the MXU at
        effective batch 2B (the cycle step's four generator forwards become
        two; measured in BENCH_NOTES round 2)."""

        gen = self.generator_phase if self.phase_gen else self.generator

        def fwd(p, xx):
            def single(pp, xs):
                out = gen.apply({"params": pp}, xs)
                out = out[0] if self.returns_mask else out
                return out

            out = jax.vmap(single)(self._cast(p), xx.astype(self.compute_dtype))
            # f32 at the boundary: a compute-dtype wire between the cycle's
            # generator passes measured no better (10.09 vs 10.2 samples/s,
            # BENCH_NOTES) — XLA fuses the converts either way.
            return out.astype(jnp.float32)

        return self._maybe_remat(fwd)(stacked_params, x2)

    def disc_apply_pair(self, stacked_params, x2, phase_splits=None):
        def single(pp, xs):
            return self.discriminator.apply({"params": pp}, xs, phase_splits=phase_splits)

        return jax.vmap(single)(
            self._cast(stacked_params), x2.astype(self.compute_dtype)
        ).astype(jnp.float32)

    def disc_apply(self, params, x):
        return self.discriminator.apply(
            {"params": self._cast(params)}, x.astype(self.compute_dtype)
        ).astype(jnp.float32)

    def init(self, rng, sample_input, sample_output) -> CycleState:
        kab, kba, kdpre, kdpost = jax.random.split(rng, 4)
        gen_params = {
            "ab": self.generator.init({"params": kab}, sample_input)["params"],
            "ba": self.generator.init({"params": kba}, sample_input)["params"],
        }
        disc_params = {
            "post": self.discriminator.init({"params": kdpost}, sample_input)["params"],
            "pre": self.discriminator.init({"params": kdpre}, sample_input)["params"],
        }
        _, h, w, _ = sample_input.shape
        cap = self.cfg.buffer_size
        if self.phase_d:
            bshape = (h // 2, w // 2, 4 * self.input_channels)
        else:
            bshape = (h, w, self.input_channels)
        return CycleState(
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt=self.tx.init(gen_params),
            disc_opt=self.tx.init(disc_params),
            pre_buffer=ImageBuffer.create(cap, *bshape, self.compute_dtype),
            post_buffer=ImageBuffer.create(cap, *bshape, self.compute_dtype),
        )

    def _with_condition(self, rgb, conditions):
        if self.has_condition:
            return jnp.concatenate([rgb, conditions], axis=-1)
        return rgb

    def prepare_batch(self, input_stack, output_image):
        """Device-side batch layout prep, run by the input pipeline (after
        the transform, before train_step): phase-major for the fully
        phase-space cycle step, identity (in Python, pre-jit — no device
        copy) otherwise.  train_step accepts either layout, so callers may
        skip this (see PairedTrainer.prepare_batch for the rationale)."""
        if self.phase_gen:
            from floodgan_tpu.ops.nn_ops import s2d_batch

            return s2d_batch(input_stack, output_image)
        return input_stack, output_image

    def _train_step(
        self, state: CycleState, input_stack, output_image, lr, rng
    ) -> Tuple[CycleState, Dict[str, jax.Array]]:
        cfg = self.cfg
        if self.phase_gen:
            # Fully phase-space step: inputs arrive in (or are converted
            # once to) the 2x2 phase-major form; generators, cycle L1,
            # buffers and discriminators all stay there (accepts EITHER
            # layout so prepare_batch can move the s2d into the pipeline).
            from floodgan_tpu.ops.nn_ops import (
                concat_channels_phases,
                slice_channels_phases,
                space_to_depth_phases,
            )

            C = self.input_channels
            x_is_phase = input_stack.shape[-1] == 4 * C
            real_pre = input_stack if x_is_phase else space_to_depth_phases(input_stack)
            y_rep = (
                output_image
                if output_image.shape[-1] == 12
                else space_to_depth_phases(output_image)
            )
            if self.has_condition:
                conditions = slice_channels_phases(real_pre, C, 3, C)
                with_cond = lambda rgb_p: concat_channels_phases(
                    [(rgb_p, 3), (conditions, C - 3)]
                )
            else:
                with_cond = lambda rgb_p: rgb_p
            real_post = with_cond(y_rep)
            pre_rgb, post_rgb = slice_channels_phases(real_pre, C, 0, 3), y_rep
            d_form, d_splits = (lambda t: t), (C,)
        else:
            real_pre = input_stack                       # (B,H,W,C)
            conditions = input_stack[..., 3:]            # (B,H,W,C-3)
            with_cond = lambda rgb: self._with_condition(rgb, conditions)
            real_post = with_cond(output_image)
            pre_rgb, post_rgb = real_pre[..., :3], real_post[..., :3]
            if self.phase_d:
                from floodgan_tpu.ops.nn_ops import space_to_depth_phases as s2d

                d_form, d_splits = s2d, (self.input_channels,)
            else:
                d_form, d_splits = (lambda t: t), None

        stack_pair = lambda a, b: jax.tree_util.tree_map(
            lambda u, v: jnp.stack([u, v]), a, b
        )

        # ---- generator update (reference model.py:693-714) ----
        # The four generator forwards run as two 2-group applications
        # (G_ab and G_ba stacked), the two discriminator reads as one.
        def g_loss_fn(gp):
            gboth = stack_pair(gp["ab"], gp["ba"])
            syn = self.gen_apply_pair(gboth, jnp.stack([real_pre, real_post]))
            synthetic_post, synthetic_pre = syn[0], syn[1]
            synthetic_post_c = with_cond(synthetic_post)
            synthetic_pre_c = with_cond(synthetic_pre)
            rec = self.gen_apply_pair(
                gboth, jnp.stack([synthetic_pre_c, synthetic_post_c])
            )
            recreated_post, recreated_pre = rec[0], rec[1]

            dboth = stack_pair(state.disc_params["post"], state.disc_params["pre"])
            pred = self.disc_apply_pair(
                dboth,
                jnp.stack([d_form(synthetic_post_c), d_form(synthetic_pre_c)]),
                phase_splits=d_splits,
            )
            post_gen_loss = lsgan_mse(pred[0], 1.0)
            pre_gen_loss = lsgan_mse(pred[1], 1.0)
            pre_to_post_cycle = l1_loss(recreated_pre, pre_rgb) * cfg.cycle_weight
            post_to_pre_cycle = l1_loss(recreated_post, post_rgb) * cfg.cycle_weight
            total = post_gen_loss + pre_gen_loss + pre_to_post_cycle + post_to_pre_cycle
            aux = {
                "losses_generator_post": post_gen_loss,
                "losses_generator_pre": pre_gen_loss,
                "losses_pre_to_post_cycle": pre_to_post_cycle,
                "losses_post_to_pre_cycle": post_to_pre_cycle,
            }
            if self.add_identity_loss:
                ident = self.gen_apply_pair(gboth, jnp.stack([real_post, real_pre]))
                identity_post = l1_loss(ident[0], post_rgb) * cfg.identity_weight
                identity_pre = l1_loss(ident[1], pre_rgb) * cfg.identity_weight
                total = total + identity_post + identity_pre
                aux["losses_identity_post"] = identity_post
                aux["losses_identity_pre"] = identity_pre
            return total, (aux, synthetic_post_c, synthetic_pre_c)

        g_grads, (aux, synthetic_post_c, synthetic_pre_c) = jax.grad(
            g_loss_fn, has_aux=True
        )(state.gen_params)
        gen_params, gen_opt = apply_adam(
            self.tx, state.gen_params, state.gen_opt, g_grads, lr
        )

        # ---- replay buffers (reference model.py:723-724) ----
        # Under phase_d the buffers hold the 2x2 space-to-depth form —
        # the policy swaps whole images either way, so the returned
        # tensors are exactly the phase form of what the image-space
        # buffer would return.  (Under phase_gen everything is already
        # phase-major and d_form is the identity.)
        real_pre_d, real_post_d = d_form(real_pre), d_form(real_post)
        syn_pre_d, syn_post_d = d_form(synthetic_pre_c), d_form(synthetic_post_c)
        k_pre, k_post = jax.random.split(rng)
        pre_buffer, buffered_pre = state.pre_buffer.query_batch(
            jax.lax.stop_gradient(syn_pre_d), k_pre
        )
        post_buffer, buffered_post = state.post_buffer.query_batch(
            jax.lax.stop_gradient(syn_post_d), k_post
        )

        # ---- discriminator update (reference model.py:726-739) ----
        # All four discriminator reads as ONE 2-group application: reals and
        # buffered synthetics concatenated on the batch axis per direction.
        def d_loss_fn(dp):
            dboth = stack_pair(dp["pre"], dp["post"])
            b = real_pre.shape[0]
            x2 = jnp.stack(
                [
                    jnp.concatenate([real_pre_d, buffered_pre.astype(real_pre_d.dtype)], axis=0),
                    jnp.concatenate([real_post_d, buffered_post.astype(real_post_d.dtype)], axis=0),
                ]
            )
            pred = self.disc_apply_pair(dboth, x2, phase_splits=d_splits)
            loss_real_pre = lsgan_mse(pred[0, :b], 1.0)
            loss_syn_pre = lsgan_mse(pred[0, b:], 0.0)
            loss_real_post = lsgan_mse(pred[1, :b], 1.0)
            loss_syn_post = lsgan_mse(pred[1, b:], 0.0)
            total = (loss_real_pre + loss_syn_pre) * cfg.disc_weight + (
                loss_real_post + loss_syn_post
            ) * cfg.disc_weight
            return total, {
                "losses_discriminator_pre_real": loss_real_pre,
                "losses_discriminator_post_real": loss_real_post,
                "losses_discriminator_pre_synthetic": loss_syn_pre,
                "losses_discriminator_post_synthetic": loss_syn_post,
            }

        d_grads, d_aux = jax.grad(d_loss_fn, has_aux=True)(state.disc_params)
        disc_params, disc_opt = apply_adam(
            self.tx, state.disc_params, state.disc_opt, d_grads, lr
        )

        new_state = CycleState(
            gen_params, disc_params, gen_opt, disc_opt, pre_buffer, post_buffer
        )
        return new_state, {**aux, **d_aux}

    def _generate(self, gen_params, input_stack, direction: str = "ab"):
        out = self.generator.apply({"params": gen_params[direction]}, input_stack)
        return out if self.returns_mask else (out, None)
