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

import functools
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
    def create(capacity: int, h: int, w: int, c: int) -> "ImageBuffer":
        return ImageBuffer(
            images=jnp.zeros((capacity, h, w, c), jnp.float32),
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
        new_images = jnp.where(
            do_store,
            self.images.at[store_ix].set(image),
            self.images,
        )
        returned = jnp.where(not_full | (p <= 0.5), image, old)
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
        remat_policy: str = "convs",  # "convs" (save conv outputs) | "full"
    ):
        self.model = model
        self.cfg = cfg
        self.add_identity_loss = add_identity_loss
        self.input_channels = input_channels
        self.has_condition = input_channels > 3
        self.generator = build_generator(model, input_channels)
        self.discriminator = build_discriminator(model)
        self.returns_mask = generator_returns_mask(model)
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
        self.remat = remat
        self.remat_policy = remat_policy

    def _cast(self, tree):
        if self.compute_dtype == jnp.float32:
            return tree
        return jax.tree_util.tree_map(lambda p: p.astype(self.compute_dtype), tree)

    def gen_apply(self, params, x):
        def fwd(p, xx):
            out = self.generator.apply(
                {"params": self._cast(p)}, xx.astype(self.compute_dtype)
            )
            out = out[0] if self.returns_mask else out
            return out.astype(jnp.float32)

        if self.remat:
            if self.remat_policy == "convs":
                policy = lambda prim, *_, **__: prim.name == "conv_general_dilated"
                return jax.checkpoint(fwd, policy=policy)(params, x)
            return jax.checkpoint(fwd)(params, x)
        return fwd(params, x)

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
        return CycleState(
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt=self.tx.init(gen_params),
            disc_opt=self.tx.init(disc_params),
            pre_buffer=ImageBuffer.create(cap, h, w, self.input_channels),
            post_buffer=ImageBuffer.create(cap, h, w, self.input_channels),
        )

    def _with_condition(self, rgb, conditions):
        if self.has_condition:
            return jnp.concatenate([rgb, conditions], axis=-1)
        return rgb

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self, state: CycleState, input_stack, output_image, lr, rng
    ) -> Tuple[CycleState, Dict[str, jax.Array]]:
        cfg = self.cfg
        real_pre = input_stack                       # (B,H,W,C)
        conditions = input_stack[..., 3:]            # (B,H,W,C-3)
        real_post = self._with_condition(output_image, conditions)

        # ---- generator update (reference model.py:693-714) ----
        def g_loss_fn(gp):
            synthetic_post = self.gen_apply(gp["ab"], real_pre)
            synthetic_pre = self.gen_apply(gp["ba"], real_post)
            synthetic_post_c = self._with_condition(synthetic_post, conditions)
            synthetic_pre_c = self._with_condition(synthetic_pre, conditions)
            recreated_post = self.gen_apply(gp["ab"], synthetic_pre_c)
            recreated_pre = self.gen_apply(gp["ba"], synthetic_post_c)

            post_gen_loss = lsgan_mse(
                self.disc_apply(state.disc_params["post"], synthetic_post_c), 1.0
            )
            pre_gen_loss = lsgan_mse(
                self.disc_apply(state.disc_params["pre"], synthetic_pre_c), 1.0
            )
            pre_to_post_cycle = l1_loss(recreated_pre, real_pre[..., :3]) * cfg.cycle_weight
            post_to_pre_cycle = l1_loss(recreated_post, real_post[..., :3]) * cfg.cycle_weight
            total = post_gen_loss + pre_gen_loss + pre_to_post_cycle + post_to_pre_cycle
            aux = {
                "losses_generator_post": post_gen_loss,
                "losses_generator_pre": pre_gen_loss,
                "losses_pre_to_post_cycle": pre_to_post_cycle,
                "losses_post_to_pre_cycle": post_to_pre_cycle,
            }
            if self.add_identity_loss:
                identity_post = l1_loss(self.gen_apply(gp["ab"], real_post), real_post[..., :3]) * cfg.identity_weight
                identity_pre = l1_loss(self.gen_apply(gp["ba"], real_pre), real_pre[..., :3]) * cfg.identity_weight
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
        k_pre, k_post = jax.random.split(rng)
        pre_buffer, buffered_pre = state.pre_buffer.query_batch(
            jax.lax.stop_gradient(synthetic_pre_c), k_pre
        )
        post_buffer, buffered_post = state.post_buffer.query_batch(
            jax.lax.stop_gradient(synthetic_post_c), k_post
        )

        # ---- discriminator update (reference model.py:726-739) ----
        def d_loss_fn(dp):
            loss_real_pre = lsgan_mse(self.disc_apply(dp["pre"], real_pre), 1.0)
            loss_syn_pre = lsgan_mse(self.disc_apply(dp["pre"], buffered_pre), 0.0)
            loss_real_post = lsgan_mse(self.disc_apply(dp["post"], real_post), 1.0)
            loss_syn_post = lsgan_mse(self.disc_apply(dp["post"], buffered_post), 0.0)
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

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def generate(self, gen_params, input_stack, direction: str = "ab"):
        out = self.generator.apply({"params": gen_params[direction]}, input_stack)
        return out if self.returns_mask else (out, None)
