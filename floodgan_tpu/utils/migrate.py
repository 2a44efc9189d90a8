"""Migrate reference (PyTorch) checkpoints into floodgan_tpu checkpoints.

The reference saves a self-describing torch pickle per interval
(reference models/model.py:335-358: config + starting_epoch + loss history
+ model/optimizer/scheduler state dicts; models/segmentation_model.py:
121-130 for the U-Net).  This tool rebuilds the equivalent floodgan_tpu
train state — parameters via the positional specs in torch_import, and
Adam first/second moments via the *same* specs (torch Adam state_dict
entries follow parameter construction order), so training can resume here
with identical optimizer dynamics.

Usage:
    python -m floodgan_tpu.utils.migrate gan  ref.pth.tar out.ckpt --resize 512 --crop 4
    python -m floodgan_tpu.utils.migrate seg  ref.pth.tar out.ckpt
"""

from __future__ import annotations

import argparse
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from floodgan_tpu.ckpt import save_checkpoint
from floodgan_tpu.core.config import TOPOGRAPHY_CHANNELS, model_is_cycle
from floodgan_tpu.utils import torch_import as ti


def _load_torch(path: str):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def _tree_from_spec(spec: ti.Spec, tensors: Sequence) -> Dict:
    return ti.params_from_torch(spec, [("", t) for t in tensors])


def _ordered_tensors(state_dict: Dict, reference_keys: List[str]):
    """state_dict values in the order of ``reference_keys`` (a module's
    parameter names in registration order)."""
    return [state_dict[k] for k in reference_keys]


def _param_keys(state_dict: Dict) -> List[str]:
    """Parameter (not buffer) keys in insertion order: reference nets only
    carry num_batches_tracked/running_* buffers for BatchNorm."""
    skip = ("running_mean", "running_var", "num_batches_tracked")
    return [k for k in state_dict if not k.endswith(skip)]


def _adam_moments(opt_state: Dict, spec: ti.Spec, offset: int = 0):
    """(mu_tree, nu_tree, count) from a torch Adam state_dict, taking
    ``len(spec)`` params starting at ``offset`` in param-group order."""
    state = opt_state.get("state", {})
    groups = opt_state.get("param_groups", [])
    indices: List[int] = []
    for g in groups:
        indices.extend(g["params"])
    indices = indices[offset : offset + len(spec)]
    mus, nus, count = [], [], 0
    for idx in indices:
        entry = state.get(idx)
        if entry is None:
            mus.append(None)
            nus.append(None)
        else:
            mus.append(entry["exp_avg"])
            nus.append(entry["exp_avg_sq"])
            step = entry["step"]
            count = int(step.item() if hasattr(step, "item") else step)
    return mus, nus, count


def _moment_tree(spec: ti.Spec, moments, params_tree, model: str = ""):
    """Convert ordered torch moments with the weight-layout spec; missing
    entries (unstepped params) become zeros like the param leaf."""
    if all(m is None for m in moments):
        return jax.tree_util.tree_map(jnp.zeros_like, params_tree)
    filled = []
    for (path, kind), m in zip(spec, moments):
        if m is None:
            raise ValueError(f"optimizer state missing for {path}")
        filled.append(("", m))
    tree = jax.tree_util.tree_map(jnp.asarray, ti.params_from_torch(spec, filled))
    if model:
        tree = ti.finalize_generator_params(model, tree)
    return tree


def migrate_gan(
    in_path: str,
    out_path: str,
    resize: Optional[int] = 256,
    crop: Optional[int] = None,
    batch_size: int = 1,
) -> str:
    import optax

    saved = _load_torch(in_path)
    model = saved["model"]
    topography = saved["topography"]
    input_channels = TOPOGRAPHY_CHANNELS[topography]
    h = w = resize or 256
    if crop:
        h = w = h // int(np.sqrt(crop))

    gen_spec = ti.GENERATOR_SPECS[model]()
    disc_spec = ti.patchgan_spec("batch" if model == "pix2pix" else "instance")

    meta = {
        "model": model,
        "starting_epoch": int(saved["starting_epoch"]),
        "num_epochs": int(saved["num_epochs"]),
        "topography": topography,
        "all_losses": {k: [float(x) for x in v] for k, v in saved["all_losses"].items()},
        "add_identity_loss": bool(saved["add_identity_loss"]),
    }

    def params_of(key):
        sd = saved[key]
        is_gen = "generator" in key
        spec = gen_spec if is_gen else disc_spec
        tensors = _ordered_tensors(sd, _param_keys(sd))
        tree = jax.tree_util.tree_map(jnp.asarray, _tree_from_spec(spec, tensors))
        return ti.finalize_generator_params(model, tree) if is_gen else tree

    if model_is_cycle(model):
        from floodgan_tpu.core.config import TrainConfig
        from floodgan_tpu.train.cycle import CycleState, ImageBuffer

        gen_params = {
            "ab": params_of("pre_to_post_generator"),
            "ba": params_of("post_to_pre_generator"),
        }
        disc_params = {
            "post": params_of("post_discriminator"),
            "pre": params_of("pre_discriminator"),
        }
        # chained optimizers: generator group order = ab then ba
        g_mu_ab, g_nu_ab, g_count = _adam_moments(saved["optimizer_generator"], gen_spec, 0)
        g_mu_ba, g_nu_ba, _ = _adam_moments(saved["optimizer_generator"], gen_spec, len(gen_spec))
        d_mu_post, d_nu_post, d_count = _adam_moments(saved["optimizer_discriminator"], disc_spec, 0)
        d_mu_pre, d_nu_pre, _ = _adam_moments(saved["optimizer_discriminator"], disc_spec, len(disc_spec))
        gen_opt = optax.ScaleByAdamState(
            count=jnp.int32(g_count),
            mu={"ab": _moment_tree(gen_spec, g_mu_ab, gen_params["ab"], model),
                "ba": _moment_tree(gen_spec, g_mu_ba, gen_params["ba"], model)},
            nu={"ab": _moment_tree(gen_spec, g_nu_ab, gen_params["ab"], model),
                "ba": _moment_tree(gen_spec, g_nu_ba, gen_params["ba"], model)},
        )
        disc_opt = optax.ScaleByAdamState(
            count=jnp.int32(d_count),
            mu={"post": _moment_tree(disc_spec, d_mu_post, disc_params["post"]),
                "pre": _moment_tree(disc_spec, d_mu_pre, disc_params["pre"])},
            nu={"post": _moment_tree(disc_spec, d_nu_post, disc_params["post"]),
                "pre": _moment_tree(disc_spec, d_nu_pre, disc_params["pre"])},
        )
        # TrainConfig default directly — constructing a CycleTrainer here
        # built both network module trees (and read runtime phase env
        # flags) just to read this one constant
        cap = TrainConfig().buffer_size
        state = CycleState(
            gen_params=gen_params, disc_params=disc_params,
            gen_opt=gen_opt, disc_opt=disc_opt,
            # reference buffers are process-local and never checkpointed
            pre_buffer=ImageBuffer.create(cap, h, w, input_channels),
            post_buffer=ImageBuffer.create(cap, h, w, input_channels),
        )
    else:
        from floodgan_tpu.train.paired import PairedState

        gen_params = params_of("generator")
        disc_params = params_of("discriminator")
        g_mu, g_nu, g_count = _adam_moments(saved["optimizer_generator"], gen_spec)
        d_mu, d_nu, d_count = _adam_moments(saved["optimizer_discriminator"], disc_spec)
        state = PairedState(
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt=optax.ScaleByAdamState(
                count=jnp.int32(g_count),
                mu=_moment_tree(gen_spec, g_mu, gen_params, model),
                nu=_moment_tree(gen_spec, g_nu, gen_params, model),
            ),
            disc_opt=optax.ScaleByAdamState(
                count=jnp.int32(d_count),
                mu=_moment_tree(disc_spec, d_mu, disc_params),
                nu=_moment_tree(disc_spec, d_nu, disc_params),
            ),
        )

    save_checkpoint(out_path, meta, jax.device_get(state))
    print(f"migrated {in_path} -> {out_path} ({model}, epoch {meta['starting_epoch']})")
    return out_path


def migrate_seg(in_path: str, out_path: str) -> str:
    saved = _load_torch(in_path)
    from floodgan_tpu.train.seg import SegState, SegTrainer

    trainer = SegTrainer()
    sd = saved["model"]
    tensors = _ordered_tensors(sd, _param_keys(sd))
    params = jax.tree_util.tree_map(jnp.asarray, _tree_from_spec(ti.unet_spec(), tensors))
    state = SegState(params=params, opt=trainer.tx.init(params))
    meta = {
        "current_epoch": int(saved["current_epoch"]),
        "num_epochs": int(saved["num_epochs"]),
        "all_losses": [float(x) for x in saved["all_losses"]],
        "all_accuracies": [float(x) for x in saved["all_accuracies"]],
    }
    save_checkpoint(out_path, meta, jax.device_get(state))
    print(f"migrated {in_path} -> {out_path} (segmentation, epoch {meta['current_epoch']})")
    return out_path


def is_torch_checkpoint(path: str) -> bool:
    """True when ``path`` is a reference-format torch save rather than a
    floodgan_tpu msgpack checkpoint.  torch>=1.6 saves are zip archives
    (``PK\\x03\\x04``); legacy saves are raw pickles (protocol marker
    ``\\x80``).  Our msgpack files start with a map marker, never either."""
    with open(path, "rb") as f:
        head = f.read(4)
    return head.startswith(b"PK\x03\x04") or head[:1] == b"\x80"


def maybe_migrate(
    path: str,
    kind: str = "gan",
    resize: Optional[int] = 256,
    crop: Optional[int] = None,
) -> str:
    """Auto-migrate a reference torch checkpoint on load (reference
    evaluate.py feeds its own ``.pth.tar`` straight to Model —
    models/model.py:52-57; this closes the same interop seam here).

    Returns ``path`` unchanged for native checkpoints.  For torch files,
    converts once to ``<path>.floodgan.ckpt`` next to the original (reused
    on later loads while newer than the source) and returns that."""
    import os

    if not is_torch_checkpoint(path):
        return path
    out = path + ".floodgan.ckpt"
    if os.path.isfile(out) and os.path.getmtime(out) >= os.path.getmtime(path):
        return out
    print(f"Reference (PyTorch) checkpoint detected - migrating to {out}")
    if kind == "seg":
        return migrate_seg(path, out)
    return migrate_gan(path, out, resize=resize, crop=crop)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("kind", choices=["gan", "seg"])
    p.add_argument("torch_checkpoint")
    p.add_argument("output_checkpoint")
    p.add_argument("--resize", type=int, default=256)
    p.add_argument("--crop", type=int, default=None)
    args = p.parse_args(argv)
    if args.kind == "gan":
        migrate_gan(args.torch_checkpoint, args.output_checkpoint, args.resize, args.crop)
    else:
        migrate_seg(args.torch_checkpoint, args.output_checkpoint)


if __name__ == "__main__":
    main()
