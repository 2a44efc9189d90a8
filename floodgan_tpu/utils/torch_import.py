"""Import reference (PyTorch) weights into floodgan_tpu parameter trees.

A migration path for users of the reference stack: a torch
``named_parameters()`` sequence (registration order) maps positionally onto
our parameter tree via per-architecture ordered specs.  Layout conversion:

  conv weight      OIHW  -> HWIO   (permute 2,3,1,0)
  convT weight     IOHW  -> HWIO'  (permute 2,3,0,1; our convT kernels are
                                    (kh, kw, C_in, C_out))
  bias / bn affine  as-is

The specs replay each torch module's registration order (see reference
models/model_architectures.py); they double as the ground truth for the
full-architecture parity tests in tests/test_models_vs_torch.py.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Tuple

import numpy as np

CONV, CONVT, VEC = "conv", "convt", "vec"

Spec = List[Tuple[str, str]]


def pix2pix_generator_spec() -> Spec:
    s: Spec = [("unet/down0_conv/weight", CONV)]
    for i in range(1, 7):
        s += [
            (f"unet/down{i}_conv/weight", CONV),
            (f"unet/down{i}_norm/scale", VEC),
            (f"unet/down{i}_norm/bias", VEC),
        ]
    s += [("unet/down7_conv/weight", CONV)]
    s += [
        ("unet/up7_conv/weight", CONVT),
        ("unet/up7_norm/scale", VEC),
        ("unet/up7_norm/bias", VEC),
    ]
    for i in range(6, 0, -1):
        s += [
            (f"unet/up{i}_conv/weight", CONVT),
            (f"unet/up{i}_norm/scale", VEC),
            (f"unet/up{i}_norm/bias", VEC),
        ]
    s += [("unet/up0_conv/weight", CONVT), ("unet/up0_conv/bias", VEC)]
    return s


def patchgan_spec(norm: str) -> Spec:
    s: Spec = [("conv0/weight", CONV), ("conv0/bias", VEC)]
    for n in (1, 2, 3):
        s += [(f"conv{n}/weight", CONV)]
        if norm == "batch":
            s += [(f"norm{n}/scale", VEC), (f"norm{n}/bias", VEC)]
        else:
            s += [(f"conv{n}/bias", VEC)]
    s += [("conv4/weight", CONV), ("conv4/bias", VEC)]
    return s


def cyclegan_generator_spec() -> Spec:
    s: Spec = [("conv_in/weight", CONV), ("conv_in/bias", VEC)]
    for i in (1, 2):
        s += [(f"down{i}/weight", CONV), (f"down{i}/bias", VEC)]
    for r in range(9):
        for c in ("conv1", "conv2"):
            s += [(f"res{r}/{c}/weight", CONV), (f"res{r}/{c}/bias", VEC)]
    for i in (1, 2):
        s += [(f"up{i}/weight", CONVT), (f"up{i}/bias", VEC)]
    s += [("conv_out/weight", CONV), ("conv_out/bias", VEC)]
    return s


def attention_generator_spec() -> Spec:
    s: Spec = []
    for c in ("conv1", "conv2", "conv3"):
        s += [(f"{c}/weight", CONV), (f"{c}/bias", VEC)]
    for r in range(9):
        for c in ("conv1", "conv2"):
            s += [(f"res{r}/{c}/weight", CONV), (f"res{r}/{c}/bias", VEC)]
    for head in ("content", "attention"):
        s += [
            (f"deconv1_{head}/weight", CONVT),
            (f"deconv1_{head}/bias", VEC),
            (f"deconv2_{head}/weight", CONVT),
            (f"deconv2_{head}/bias", VEC),
            (f"deconv3_{head}/weight", CONV),
            (f"deconv3_{head}/bias", VEC),
        ]
    return s


def _double_conv(prefix: str) -> Spec:
    return [
        (f"{prefix}/conv1/weight", CONV),
        (f"{prefix}/norm1/scale", VEC),
        (f"{prefix}/norm1/bias", VEC),
        (f"{prefix}/conv2/weight", CONV),
        (f"{prefix}/norm2/scale", VEC),
        (f"{prefix}/norm2/bias", VEC),
    ]


def unet_spec() -> Spec:
    s: Spec = _double_conv("inc")
    for i in (1, 2, 3, 4):
        s += _double_conv(f"down{i}")
    for i in (1, 2, 3, 4):
        s += [(f"up{i}_upconv/weight", CONVT), (f"up{i}_upconv/bias", VEC)]
        s += _double_conv(f"up{i}_conv")
    s += [("outc/weight", CONV), ("outc/bias", VEC)]
    return s


def unet_bilinear_spec() -> Spec:
    """UNet(bilinear=True): parameter-free upsampling — no upconvs."""
    s: Spec = _double_conv("inc")
    for i in (1, 2, 3, 4):
        s += _double_conv(f"down{i}")
    for i in (1, 2, 3, 4):
        s += _double_conv(f"up{i}_conv")
    s += [("outc/weight", CONV), ("outc/bias", VEC)]
    return s


GENERATOR_SPECS = {
    "pix2pix": pix2pix_generator_spec,
    "cyclegan": cyclegan_generator_spec,
    "attentiongan": attention_generator_spec,
    "pairedattention": attention_generator_spec,
}

# Architectures whose per-block res0..res8 parameters are stored rolled
# (models/trunk.py) in this framework's parameter trees.
TRUNKED_GENERATORS = ("cyclegan", "attentiongan", "pairedattention")


def finalize_generator_params(model: str, tree: Dict) -> Dict:
    """Convert a spec-layout tree into the framework's canonical layout
    (rolls the residual blocks into the scanned trunk where applicable)."""
    from floodgan_tpu.models.trunk import roll_resnet_params

    if model.lower() in TRUNKED_GENERATORS:
        return roll_resnet_params(tree)
    return tree


def _convert(kind: str, array: np.ndarray) -> np.ndarray:
    # Copy: torch tensors' .numpy() shares memory with the live module, and
    # in-place optimizer steps on the torch side must not alias our params.
    if kind == CONV:
        return np.ascontiguousarray(np.transpose(array, (2, 3, 1, 0)))
    if kind == CONVT:
        return np.ascontiguousarray(np.transpose(array, (2, 3, 0, 1)))
    return np.array(array, copy=True)


def params_from_torch(
    spec: Spec, torch_params: Iterable[Tuple[str, "object"]]
) -> Dict:
    """Build a flax param dict from (name, tensor) pairs in torch
    ``named_parameters()`` order."""
    arrays = [np.asarray(t.detach().numpy() if hasattr(t, "detach") else t) for _, t in torch_params]
    if len(arrays) != len(spec):
        raise ValueError(f"spec has {len(spec)} entries but torch module has {len(arrays)} params")
    tree: Dict = {}
    for (path, kind), arr in zip(spec, arrays):
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _convert(kind, arr)
    return tree
