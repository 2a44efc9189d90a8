"""Export floodgan_tpu parameters back into reference (PyTorch) layout —
the inverse of torch_import, enabling round-trips with reference tooling.

``state_dict_from_params`` produces an ordered {torch_name: numpy array}
mapping given a torch module's parameter-name list (registration order) and
the matching layout spec; ``export_gan_checkpoint`` writes a complete
reference-schema ``.pth.tar`` (config + epoch + loss history + model and
optimizer state dicts) loadable by the reference's
``Model(load_pretrained_model=True)`` (reference models/model.py:52-57,
127-148).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import numpy as np

from floodgan_tpu.ckpt import load_checkpoint
from floodgan_tpu.core.config import TOPOGRAPHY_CHANNELS, model_is_cycle
from floodgan_tpu.utils import torch_import as ti


def _invert(kind: str, arr: np.ndarray) -> np.ndarray:
    if kind == ti.CONV:   # HWIO -> OIHW
        return np.ascontiguousarray(np.transpose(arr, (3, 2, 0, 1)))
    if kind == ti.CONVT:  # (kh, kw, Cin, Cout) -> (Cin, Cout, kh, kw)
        return np.ascontiguousarray(np.transpose(arr, (2, 3, 0, 1)))
    return np.asarray(arr)


def _leaf(tree: Dict, path: str):
    node = tree
    for part in path.split("/"):
        node = node[part]
    return node


def ordered_arrays(spec: ti.Spec, tree: Dict) -> List[np.ndarray]:
    """Spec-ordered torch-layout arrays from a flax param tree (unrolls a
    scanned trunk first if present)."""
    from floodgan_tpu.models.trunk import unroll_resnet_params

    tree = unroll_resnet_params(dict(tree))
    return [_invert(kind, np.asarray(_leaf(tree, path))) for path, kind in spec]


def state_dict_from_params(
    spec: ti.Spec, tree: Dict, torch_param_names: Sequence[str]
):
    """{torch_name: tensor} in registration order.  ``torch_param_names``
    comes from ``[n for n, _ in module.named_parameters()]``."""
    import torch

    arrays = ordered_arrays(spec, tree)
    if len(arrays) != len(torch_param_names):
        raise ValueError(
            f"spec has {len(arrays)} params, torch module has {len(torch_param_names)}"
        )
    return {n: torch.from_numpy(a.copy()) for n, a in zip(torch_param_names, arrays)}


def _adam_state_dict(spec: ti.Spec, mu_tree, nu_tree, count: int, offset: int = 0):
    import torch

    mus = ordered_arrays(spec, mu_tree)
    nus = ordered_arrays(spec, nu_tree)
    state = {}
    for i, (m, v) in enumerate(zip(mus, nus)):
        state[offset + i] = {
            "step": torch.tensor(float(count)),
            "exp_avg": torch.from_numpy(m.copy()),
            "exp_avg_sq": torch.from_numpy(v.copy()),
        }
    return state


def export_gan_checkpoint(
    ckpt_path: str, out_path: str, torch_module_names: Dict[str, Sequence[str]]
) -> str:
    """Write a reference-schema .pth.tar from a floodgan_tpu checkpoint.

    ``torch_module_names`` maps checkpoint keys ('generator',
    'discriminator', or the four cycle keys) to the torch modules'
    parameter-name lists (from freshly constructed reference modules).
    """
    import torch

    meta, raw = load_checkpoint(ckpt_path)
    model = meta["model"]
    gen_spec = ti.GENERATOR_SPECS[model]()
    disc_spec = ti.patchgan_spec("batch" if model == "pix2pix" else "instance")

    saved = {
        "model": model,
        "starting_epoch": meta["starting_epoch"],
        "num_epochs": meta["num_epochs"],
        "topography": meta["topography"],
        "all_losses": meta["all_losses"],
        "add_identity_loss": meta["add_identity_loss"],
        "scheduler_generator": {"last_epoch": meta["starting_epoch"] - 1},
        "scheduler_discriminator": {"last_epoch": meta["starting_epoch"] - 1},
    }

    gp, dp = raw["gen_params"], raw["disc_params"]
    g_opt, d_opt = raw["gen_opt"], raw["disc_opt"]
    count_g = int(np.asarray(g_opt["count"]))
    count_d = int(np.asarray(d_opt["count"]))

    if model_is_cycle(model):
        saved["pre_to_post_generator"] = state_dict_from_params(
            gen_spec, gp["ab"], torch_module_names["pre_to_post_generator"])
        saved["post_to_pre_generator"] = state_dict_from_params(
            gen_spec, gp["ba"], torch_module_names["post_to_pre_generator"])
        saved["post_discriminator"] = state_dict_from_params(
            disc_spec, dp["post"], torch_module_names["post_discriminator"])
        saved["pre_discriminator"] = state_dict_from_params(
            disc_spec, dp["pre"], torch_module_names["pre_discriminator"])
        n_g = len(gen_spec)
        saved["optimizer_generator"] = {
            "state": {**_adam_state_dict(gen_spec, g_opt["mu"]["ab"], g_opt["nu"]["ab"], count_g, 0),
                      **_adam_state_dict(gen_spec, g_opt["mu"]["ba"], g_opt["nu"]["ba"], count_g, n_g)},
            "param_groups": [{"params": list(range(2 * n_g)), "lr": 2e-4,
                              "betas": (0.5, 0.999), "eps": 1e-8, "weight_decay": 0,
                              "amsgrad": False, "maximize": False, "foreach": None,
                              "capturable": False, "differentiable": False, "fused": None}],
        }
        n_d = len(disc_spec)
        saved["optimizer_discriminator"] = {
            "state": {**_adam_state_dict(disc_spec, d_opt["mu"]["post"], d_opt["nu"]["post"], count_d, 0),
                      **_adam_state_dict(disc_spec, d_opt["mu"]["pre"], d_opt["nu"]["pre"], count_d, n_d)},
            "param_groups": [{"params": list(range(2 * n_d)), "lr": 2e-4,
                              "betas": (0.5, 0.999), "eps": 1e-8, "weight_decay": 0,
                              "amsgrad": False, "maximize": False, "foreach": None,
                              "capturable": False, "differentiable": False, "fused": None}],
        }
    else:
        saved["generator"] = state_dict_from_params(
            gen_spec, gp, torch_module_names["generator"])
        saved["discriminator"] = state_dict_from_params(
            disc_spec, dp, torch_module_names["discriminator"])
        saved["optimizer_generator"] = {
            "state": _adam_state_dict(gen_spec, g_opt["mu"], g_opt["nu"], count_g),
            "param_groups": [{"params": list(range(len(gen_spec))), "lr": 2e-4,
                              "betas": (0.5, 0.999), "eps": 1e-8, "weight_decay": 0,
                              "amsgrad": False, "maximize": False, "foreach": None,
                              "capturable": False, "differentiable": False, "fused": None}],
        }
        saved["optimizer_discriminator"] = {
            "state": _adam_state_dict(disc_spec, d_opt["mu"], d_opt["nu"], count_d),
            "param_groups": [{"params": list(range(len(disc_spec))), "lr": 2e-4,
                              "betas": (0.5, 0.999), "eps": 1e-8, "weight_decay": 0,
                              "amsgrad": False, "maximize": False, "foreach": None,
                              "capturable": False, "differentiable": False, "fused": None}],
        }

    torch.save(saved, out_path)
    print(f"exported {ckpt_path} -> {out_path} ({model})")
    return out_path
