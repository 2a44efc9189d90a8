"""Round-trip: floodgan_tpu checkpoint -> reference .pth.tar -> reference
torch module produces identical outputs; and migrate(export(x)) == x."""

import importlib.util
import pathlib

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

_REF = pathlib.Path("/root/reference/models/model_architectures.py")
pytestmark = pytest.mark.skipif(not _REF.exists(), reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location("ref_arch4", _REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_export_roundtrip_paired(ref, rng, tmp_path):
    from floodgan_tpu.train.paired import PairedTrainer
    from floodgan_tpu.ckpt import save_checkpoint, load_checkpoint
    from floodgan_tpu.utils.torch_export import export_gan_checkpoint
    from floodgan_tpu.utils.migrate import migrate_gan
    from flax import serialization

    trainer = PairedTrainer("pairedattention", 9)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 9), dtype=np.float32) * 0.5)
    y = jnp.asarray(rng.standard_normal((1, 64, 64, 3), dtype=np.float32) * 0.5)
    state = trainer.init(jax.random.key(3), x, y)
    # one step so optimizer moments are non-trivial
    state, _ = trainer.train_step(state, x, y, jnp.float32(2e-4), jax.random.key(0))

    meta = {
        "model": "pairedattention", "starting_epoch": 2, "num_epochs": 5,
        "topography": "all", "add_identity_loss": False,
        "all_losses": {"all_losses_discriminator_real": [0.5],
                       "all_losses_discriminator_synthetic": [0.5],
                       "all_losses_generator_synthetic": [0.5],
                       "all_l1_losses_generator_synthetic": [0.5]},
    }
    ours = str(tmp_path / "ours.ckpt")
    save_checkpoint(ours, meta, jax.device_get(state))

    # export to reference schema
    tg = ref.PairedAttentionGenerator(input_channels=9)
    td = ref.PairedAttentionDiscriminator(input_channels=9)
    names = {
        "generator": [n for n, _ in tg.named_parameters()],
        "discriminator": [n for n, _ in td.named_parameters()],
    }
    exported = str(tmp_path / "exported.pth.tar")
    export_gan_checkpoint(ours, exported, names)

    saved = torch.load(exported, map_location="cpu", weights_only=False)
    tg.load_state_dict(saved["generator"], strict=True)
    tg.train()

    # torch forward with exported weights == our forward
    xin = rng.standard_normal((1, 9, 64, 64), dtype=np.float32) * 0.5
    with torch.no_grad():
        torch_out = tg(torch.from_numpy(xin))
    out, _ = trainer.generate(
        state.gen_params, jnp.asarray(xin.transpose(0, 2, 3, 1)), jax.random.key(0)
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), torch_out.numpy(), atol=3e-4
    )

    # migrate(export(x)) == x: params and Adam moments bit-identical
    back = str(tmp_path / "back.ckpt")
    migrate_gan(exported, back, resize=64, crop=None)
    _, raw_orig = load_checkpoint(ours)
    _, raw_back = load_checkpoint(back)
    for a, b in zip(
        jax.tree_util.tree_leaves(raw_orig["gen_params"]),
        jax.tree_util.tree_leaves(raw_back["gen_params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for part in ("mu", "nu"):
        for a, b in zip(
            jax.tree_util.tree_leaves(raw_orig["gen_opt"][part]),
            jax.tree_util.tree_leaves(raw_back["gen_opt"][part]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
