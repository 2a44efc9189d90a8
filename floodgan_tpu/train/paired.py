"""Paired (pix2pix-style) adversarial training as one jitted step.

Faithful restructuring of the reference batch loop (reference
models/model.py:598-658) into a single fused XLA program:

  1. one generator forward (captured with jax.vjp so its backward is
     reused — the reference reuses the same autograd graph),
  2. discriminator update on (stop-gradient synthetic, real), LSGAN MSE
     targets 0/1, summed and halved (ref :624-633),
  3. generator update against the *updated* discriminator (the reference
     steps D before G's backward, ref :633 vs :640), loss =
     LSGAN(D(x ⊕ G(x)), 1) + 100·L1(G(x), y) (ref :640-646),
     with the generator gradient pulled back through the saved vjp.

The reference's requires_grad freeze/unfreeze flags (:620-621, :636-637)
are subsumed by taking gradients only w.r.t. the relevant parameter tree.
Loss scalars are returned with the reference's key names (:648-651).
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


class PairedState(flax.struct.PyTreeNode):
    gen_params: dict
    disc_params: dict
    gen_opt: tuple
    disc_opt: tuple


class PairedTrainer:
    """Builds and jit-compiles the paired train/infer steps for one model
    family (pix2pix or pairedattention)."""

    def __init__(
        self,
        model: str,
        input_channels: int,
        cfg: TrainConfig = TrainConfig(),
        dropout_rate: float = 0.5,
        compute_dtype: str = "float32",
        remat: bool = False,
        remat_policy: str = "boundaries",  # "boundaries" (segmented) | "full"
        phase_step: bool = None,
    ):
        self.model = model
        self.cfg = cfg
        self.generator = build_generator(model, input_channels, dropout_rate)
        self.discriminator = build_discriminator(model)
        self.returns_mask = generator_returns_mask(model)
        # Phase-native train step (attention family): the generator output,
        # the L1, and the discriminator stem all stay in 2x2 phase space —
        # the (N, H, W, 3/12) image tensors (42.7x lane padding on TPU,
        # BENCH_NOTES high-resolution study) never materialise inside the
        # step.  Same math: the L1 is a mean over the same elements, and
        # the phase-space stem is the identical k4 s2 conv
        # (ops.conv2d_s2_phase_input, golden-tested; loss-trajectory
        # equivalence pinned in tests/test_train_steps.py).  Measured
        # 46.9 -> 50.3 samples/s at 512^2 b8 on v5e — DEFAULT ON;
        # FLOODGAN_PHASE_STEP=0 restores the image-space step.
        from floodgan_tpu.core.flags import _env_bool

        if phase_step is None:
            # Default ON everywhere: measured 46.9 -> 50.3 samples/s for
            # the attention family and 157 -> 174.4 for pix2pix (whose
            # U-Net still emits full-res; the phase win there is every
            # downstream consumer).  FLOODGAN_PHASE_STEP=0 reverts.
            phase_step = _env_bool("FLOODGAN_PHASE_STEP", True)
        self.phase_step = bool(phase_step)
        # Phase-space ENCODER (default ON for the attention family): the
        # generator consumes the phase-major input directly
        # (models/attention.py phase_input) so no full-resolution tensor
        # exists anywhere in the step.  Measured 51.3 -> 54.07 samples/s
        # (46.8% MFU) at 512^2 b8 on v5e (BENCH_NOTES round 3);
        # FLOODGAN_PHASE_STEM=0 reverts.  (The analogous phase DECODER
        # HEAD measured -6% at 512^2 — embedded-zero FLOPs — and stays
        # opt-in via FLOODGAN_PHASE_HEAD for memory-bound resolutions.)
        self.phase_stem = (
            self.phase_step
            and self.returns_mask
            and _env_bool("FLOODGAN_PHASE_STEM", True)
        )
        if self.phase_step and self.returns_mask:
            self.generator_phase = build_generator(
                model, input_channels, dropout_rate,
                phase_output=True, phase_input=self.phase_stem,
            )
        self.tx = adam_tx(b1=cfg.adam_b1, b2=cfg.adam_b2)
        self.input_channels = input_channels
        # Mixed precision: f32 master params, bf16 activations/flops on the
        # MXU, f32 norm statistics and losses (ops upcast internally).
        self.compute_dtype = jnp.dtype(compute_dtype)
        # Rematerialisation: recompute generator activations in the backward
        # pass (trades ~1 extra forward for O(depth) activation memory —
        # enables large batches at 512^2 in 16GB HBM).
        # "boundaries" saves the named segment boundaries (peak = largest
        # segment + the saves); "full" saves only the remat region's inputs
        # (peak = one whole recomputed forward, but no boundary saves — the
        # smaller-memory choice when the boundary tensors themselves bind,
        # e.g. 1024^2 batch 8 where they are (8, 256^2, 256)-class).
        if remat_policy not in ("boundaries", "full"):
            raise ValueError(f"unknown remat_policy {remat_policy!r}")
        self.remat = remat
        self.remat_policy = remat_policy
        # Jit the steps per instance so backend-specific XLA compiler
        # options apply (step_compiler_options: measured scoped-VMEM
        # default on TPU, {} elsewhere).  Class-level decorators would fix
        # the options at import time, before the backend is known.
        from floodgan_tpu.core.flags import step_compiler_options

        opts = step_compiler_options() or None
        self.train_step = jax.jit(
            self._train_step, donate_argnums=0, compiler_options=opts
        )
        self.generate = jax.jit(self._generate, compiler_options=opts)

    def _cast(self, tree):
        if self.compute_dtype == jnp.float32:
            return tree
        return jax.tree_util.tree_map(lambda p: p.astype(self.compute_dtype), tree)

    # -- generator forward normalised to a single output image ------------
    def gen_apply(self, params, x, rng):
        """f32 output whatever the policy.  A bf16 image wire through the
        step was measured WORSE twice on v5e and removed both times:
        slower at 512^2 (45.6-46.1 vs 47.2 samples/s — the f32 boundary
        converts fuse for free and the bf16 wire perturbed fusion
        shapes), and 3.2GB MORE memory at 1024^2 batch 8 (3-channel
        tensors pad C 3->128 lanes either way, and bf16's (16,128)
        native tile doubles the sublane padding at batch 8, erasing the
        byte savings).  See BENCH_NOTES 'dtype experiments'."""
        out = self.generator.apply(
            {"params": self._cast(params)},
            x.astype(self.compute_dtype),
            rngs={"dropout": rng},
        )
        out = out[0] if self.returns_mask else out
        return out.astype(jnp.float32)

    def disc_apply(self, params, x):
        return self.discriminator.apply(
            {"params": self._cast(params)}, x.astype(self.compute_dtype)
        ).astype(jnp.float32)

    def prepare_batch(self, input_stack, output_image):
        """Device-side batch layout prep, run by the input pipeline (after
        the transform, before train_step): emits the representation the
        step consumes natively.  For the attention family's phase-stem
        step that is the 2x2 phase-major form — the s2d permutation of
        full-resolution few-channel tensors costs ~2.6 ms/step inside the
        step (lane-padded relayout + (2,2,C) transpose, round-3 profile)
        and belongs with the transform stage.  Identity for image-space
        trainers and pix2pix — returned in PYTHON, before any jit: a
        jitted identity cannot alias its non-donated inputs, so it would
        copy the whole batch on device every step.  train_step accepts
        either layout, so callers may skip this."""
        # phase_stem (set in __init__) already implies phase_step and
        # returns_mask — one predicate, one definition of eligibility.
        if self.phase_stem:
            from floodgan_tpu.ops.nn_ops import s2d_batch

            return s2d_batch(input_stack, output_image)
        return input_stack, output_image

    # -- phase-space twins (active when self.phase_step) ------------------
    def _gen_apply_phase(self, params, x, rng):
        """(B, H/2, W/2, 12) phase-major f32 output (same parameters)."""
        out, _mask = self.generator_phase.apply(
            {"params": self._cast(params)},
            x.astype(self.compute_dtype),
            rngs={"dropout": rng},
        )
        return out.astype(jnp.float32)

    def _disc_apply_phase(self, params, xp, splits):
        return self.discriminator.apply(
            {"params": self._cast(params)},
            xp.astype(self.compute_dtype),
            phase_splits=splits,
        ).astype(jnp.float32)

    def init(self, rng, sample_input, sample_output) -> PairedState:
        kg, kd, kdrop = jax.random.split(rng, 3)
        gen_params = self.generator.init(
            {"params": kg, "dropout": kdrop}, sample_input
        )["params"]
        disc_in = jnp.concatenate([sample_input, sample_output], axis=-1)
        disc_params = self.discriminator.init({"params": kd}, disc_in)["params"]
        return PairedState(
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt=self.tx.init(gen_params),
            disc_opt=self.tx.init(disc_params),
        )

    def _train_step(
        self, state: PairedState, input_stack, output_image, lr, rng
    ) -> Tuple[PairedState, Dict[str, jax.Array]]:
        """One adversarial step, in one of two REPRESENTATIONS of the same
        math (reference models/model.py:598-658):

        - image space (the reference-pinned golden path), or
        - 2x2 phase space (self.phase_step, default): the generator
          output, L1 operands and discriminator reads stay space-to-
          depth'd — the generator's phase tail never materialises the
          full-res image (attention family) or it is s2d'd once
          (pix2pix), and the D stem is the identical k4 s2 conv evaluated
          on phase channels (ops.conv2d_s2_phase_input, golden-tested).
          (N, H, W, 3/12) tensors pad C -> 128 lanes (42.7x) on TPU;
          their phase forms pad 128/(4C) — measured 46.9 -> 50.3
          samples/s (attention) and 157 -> 174.4 (pix2pix) at 512^2 b8.

        Everything after the representation choice — D update, G update
        against the updated D, Adam, metrics — is the single body below.
        """
        from floodgan_tpu.ops.nn_ops import space_to_depth_phases

        if self.phase_step:
            # Accept batches in EITHER layout: image (N, H, W, C) or the
            # phase-major form prepare_batch emits.  Storing train batches
            # phase-major moves the s2d permutation (~2.6 ms/step at 512^2
            # b8 — full-res few-channel tensors relayout lane-padded,
            # round-3 profile) into the input pipeline's transform stage;
            # the step consumes its native representation directly.
            x_is_phase = input_stack.shape[-1] == 4 * self.input_channels
            if x_is_phase and not (self.returns_mask and self.phase_stem):
                raise ValueError(
                    "phase-major batches require the phase-stem attention path "
                    "(use prepare_batch, which only converts when eligible)"
                )
            splits = (self.input_channels, 3)
            x_rep = input_stack if x_is_phase else space_to_depth_phases(input_stack)
            y_rep = (
                output_image
                if output_image.shape[-1] == 12
                else space_to_depth_phases(output_image)
            )
            if self.returns_mask:
                # attention family: the tail already lives in phase space;
                # with the phase stem the ENCODER consumes x_rep too and
                # the step never sees a full-resolution tensor.
                gen_in = x_rep if self.phase_stem else input_stack
                gen_fwd = lambda gp: self._gen_apply_phase(gp, gen_in, rng)
            else:
                # pix2pix: the U-Net head emits full-res; one explicit s2d
                # keeps everything downstream off the padded layouts.
                gen_fwd = lambda gp: space_to_depth_phases(
                    self.gen_apply(gp, input_stack, rng)
                )
            disc_fn = lambda dp, x: self._disc_apply_phase(dp, x, splits)
        else:
            x_rep, y_rep = input_stack, output_image
            gen_fwd = lambda gp: self.gen_apply(gp, input_stack, rng)
            disc_fn = self.disc_apply

        if self.remat:
            if self.remat_policy == "boundaries":
                # Segmented remat: save only the named segment boundaries
                # the generators mark (models/attention.py) — the backward
                # recomputes one segment at a time, so peak memory is the
                # largest segment, not the whole forward.  Falls back to
                # full recompute-from-inputs when a model has no markers.
                gen_fwd = jax.checkpoint(
                    gen_fwd,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "seg_boundary"
                    ),
                )
            else:  # "full": save nothing, replay the whole forward
                gen_fwd = jax.checkpoint(gen_fwd)
        return self._adversarial_update(state, x_rep, y_rep, gen_fwd, disc_fn, lr)

    def _adversarial_update(
        self, state: PairedState, x_rep, y_rep, gen_fwd, disc_fn, lr
    ) -> Tuple[PairedState, Dict[str, jax.Array]]:
        """The shared D-then-G body; x_rep/y_rep/gen_fwd outputs must all
        live in the same representation (image or phase space)."""
        cfg = self.cfg
        synthetic, gen_vjp = jax.vjp(gen_fwd, state.gen_params)
        concat_real = jnp.concatenate([x_rep, y_rep], axis=-1)
        concat_syn = jnp.concatenate(
            [x_rep, jax.lax.stop_gradient(synthetic)], axis=-1
        )

        # ---- discriminator update (reference model.py:620-633) ----
        # Two separate D reads.  Batching them into one 2B application is
        # exact for the instance-norm discriminators (per-sample stats —
        # invariant pinned in tests) and was measured a WASH on v5e at the
        # headline config (63.40 vs 63.60 samples/s): at batch 8 the D is
        # already MXU-efficient and XLA schedules the two reads back to
        # back, so the simpler form (and the smaller live set) stays.
        def d_loss_fn(dp):
            pred_syn = disc_fn(dp, concat_syn)
            loss_syn = lsgan_mse(pred_syn, 0.0)
            pred_real = disc_fn(dp, concat_real)
            loss_real = lsgan_mse(pred_real, 1.0)
            return (loss_syn + loss_real) * cfg.disc_weight, (loss_syn, loss_real)

        d_grads, (loss_d_syn, loss_d_real) = jax.grad(d_loss_fn, has_aux=True)(
            state.disc_params
        )
        disc_params, disc_opt = apply_adam(
            self.tx, state.disc_params, state.disc_opt, d_grads, lr
        )

        # ---- generator update against the updated D (ref :636-646) ----
        def g_loss_from_syn(syn):
            pred = disc_fn(disc_params, jnp.concatenate([x_rep, syn], axis=-1))
            loss_adv = lsgan_mse(pred, 1.0)
            loss_l1 = l1_loss(syn, y_rep) * cfg.l1_weight
            return loss_adv + loss_l1, (loss_adv, loss_l1)

        (_, (loss_g_adv, loss_g_l1)), syn_grad = jax.value_and_grad(
            g_loss_from_syn, has_aux=True
        )(synthetic)
        (g_grads,) = gen_vjp(syn_grad)
        gen_params, gen_opt = apply_adam(
            self.tx, state.gen_params, state.gen_opt, g_grads, lr
        )

        new_state = PairedState(gen_params, disc_params, gen_opt, disc_opt)
        metrics = {
            "losses_discriminator_real": loss_d_real,
            "losses_discriminator_synthetic": loss_d_syn,
            "losses_generator_synthetic": loss_g_adv,
            "l1_losses_generator_synthetic": loss_g_l1,
        }
        return new_state, metrics

    def _generate(self, gen_params, input_stack, rng):
        """Inference forward; callers pass the fixed stochastic-eval key
        (reference pins torch.manual_seed(47) before eval-time calls)."""
        out = self.generator.apply(
            {"params": gen_params}, input_stack, rngs={"dropout": rng}
        )
        return out if self.returns_mask else (out, None)
