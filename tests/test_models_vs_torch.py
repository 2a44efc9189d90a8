"""Full-architecture parity: floodgan_tpu models vs the reference torch nets.

Loads the reference's ``model_architectures.py`` directly from
/root/reference (read-only) — no code is copied — builds each torch net,
imports its weights via floodgan_tpu.utils.torch_import, and compares
outputs.  Dropout is disabled on both sides (RNG streams can't be matched
across frameworks); BatchNorm stays in training mode on both sides, which
is the reference's permanent operating mode (SURVEY.md §2.7).
"""

import importlib.util
import pathlib

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from floodgan_tpu.models import (
    AttentionGenerator,
    CycleGANGenerator,
    PatchGANDiscriminator,
    Pix2PixGenerator,
    UNet,
)
from floodgan_tpu.utils import torch_import as ti

_REF = pathlib.Path("/root/reference/models/model_architectures.py")
pytestmark = pytest.mark.skipif(not _REF.exists(), reason="reference checkout not present")


def _load_ref():
    spec = importlib.util.spec_from_file_location("ref_arch", _REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    return _load_ref()


def _disable_dropout(m):
    for sub in m.modules():
        if isinstance(sub, torch.nn.Dropout):
            sub.eval()
    return m


def _run_pair(torch_model, flax_model, spec, x_nchw, atol, model_name=""):
    torch_model.train()
    _disable_dropout(torch_model)
    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(x_nchw))
    params = ti.params_from_torch(spec, list(torch_model.named_parameters()))
    if model_name:
        params = ti.finalize_generator_params(model_name, params)
    x = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    out = flax_model.apply({"params": params}, x)
    return ref_out, out, params


def test_pix2pix_generator_parity(ref, rng):
    torch.manual_seed(47)
    tm = ref.Pix2PixGenerator(input_channels=9)
    fm = Pix2PixGenerator(input_channels=9, dropout_rate=0.0)
    x = rng.standard_normal((1, 9, 256, 256), dtype=np.float32)
    ref_out, out, params = _run_pair(tm, fm, ti.pix2pix_generator_spec(), x, 1e-4)
    assert sum(p.numel() for p in tm.parameters()) == sum(
        np.size(l) for l in jax.tree_util.tree_leaves(params)
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), atol=2e-4
    )


@pytest.mark.parametrize("norm,cin", [("batch", 12), ("instance", 9), ("instance", 12)])
def test_patchgan_parity(ref, rng, norm, cin):
    torch.manual_seed(47)
    if norm == "batch":
        tm = ref.Pix2PixDiscriminator(input_channels=cin - 3)
    elif cin == 12:
        tm = ref.PairedAttentionDiscriminator(input_channels=cin - 3)
    else:
        tm = ref.CycleGANDiscriminator(input_channels=cin)
    fm = PatchGANDiscriminator(norm=norm)
    x = rng.standard_normal((1, cin, 64, 64), dtype=np.float32)
    ref_out, out, params = _run_pair(tm, fm, ti.patchgan_spec(norm), x, 1e-4)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), atol=2e-4
    )


def test_cyclegan_generator_parity(ref, rng):
    torch.manual_seed(47)
    tm = ref.CycleGANGenerator(input_channels=4)
    fm = CycleGANGenerator(input_channels=4)
    x = rng.standard_normal((1, 4, 64, 64), dtype=np.float32)
    ref_out, out, params = _run_pair(
        tm, fm, ti.cyclegan_generator_spec(), x, 1e-4, model_name="cyclegan"
    )
    assert sum(p.numel() for p in tm.parameters()) == sum(
        np.size(l) for l in jax.tree_util.tree_leaves(params)
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), atol=2e-4
    )


@pytest.mark.parametrize("cls_name", ["AttentionGANGenerator", "PairedAttentionGenerator"])
def test_attention_generator_parity(ref, rng, cls_name):
    torch.manual_seed(47)
    tm = getattr(ref, cls_name)(input_channels=9)
    fm = AttentionGenerator(input_channels=9)
    x = rng.standard_normal((1, 9, 64, 64), dtype=np.float32)
    tm.train()
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x))
    ref_mask = tm.last_attention_mask
    params = ti.finalize_generator_params(
        "attentiongan",
        ti.params_from_torch(ti.attention_generator_spec(), list(tm.named_parameters())),
    )
    out, mask = fm.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(mask), ref_mask.numpy(), atol=2e-4)


def test_unet_parity(ref, rng):
    torch.manual_seed(47)
    tm = ref.UNet()
    fm = UNet()
    x = rng.standard_normal((1, 3, 64, 64), dtype=np.float32)
    ref_out, out, params = _run_pair(tm, fm, ti.unet_spec(), x, 1e-4)
    assert sum(p.numel() for p in tm.parameters()) == sum(
        np.size(l) for l in jax.tree_util.tree_leaves(params)
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), atol=3e-4
    )


def test_pix2pix_dropout_active_by_default(rng):
    """Production mode: dropout stays active; fixed rng -> deterministic."""
    fm = Pix2PixGenerator(input_channels=3)
    x = jnp.asarray(rng.standard_normal((1, 256, 256, 3), dtype=np.float32))
    params = fm.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x)
    key = jax.random.key(47)
    y1 = fm.apply(params, x, rngs={"dropout": key})
    y2 = fm.apply(params, x, rngs={"dropout": key})
    y3 = fm.apply(params, x, rngs={"dropout": jax.random.key(48)})
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert not np.allclose(np.asarray(y1), np.asarray(y3))


def test_unet_bilinear_variant_parity(ref, rng):
    """The bilinear=True U-Net (align-corners upsample + halved bottleneck,
    reference model_architectures.py:519,:568) — unused by the reference
    runtime but part of the inventory."""
    torch.manual_seed(47)
    tm = ref.UNet(bilinear=True)
    fm = UNet(bilinear=True)
    x = rng.standard_normal((1, 3, 64, 64), dtype=np.float32)
    tm.train()
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x))
    spec = ti.unet_bilinear_spec()
    params = ti.params_from_torch(spec, list(tm.named_parameters()))
    out = fm.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), atol=3e-4
    )


def test_attention_phase_native_tail_matches_plain(rng):
    """At phase-fold-eligible sizes the attention generator computes its
    decoder heads + compose in 2x2 phase space; output must equal the
    plain-lowering path (pointwise compose is permutation-invariant)."""
    import os
    from floodgan_tpu.models import AttentionGenerator

    x = jnp.asarray(rng.standard_normal((1, 128, 128, 9), dtype=np.float32) * 0.3)
    model = AttentionGenerator(input_channels=9, trunk_unroll=9)
    params = model.init({"params": jax.random.key(0)}, x)

    out_p, mask_p = jax.jit(model.apply)(params, x)
    os.environ["FLOODGAN_PHASEFOLD"] = "0"
    try:
        out_f, mask_f = jax.jit(model.apply)(params, x)
    finally:
        del os.environ["FLOODGAN_PHASEFOLD"]
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_f), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mask_p), np.asarray(mask_f), atol=3e-5, rtol=1e-4)
    assert out_p.shape == (1, 128, 128, 3) and mask_p.shape == (1, 128, 128)
