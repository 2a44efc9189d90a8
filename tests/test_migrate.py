"""Reference-checkpoint migration: build a reference-schema torch
checkpoint (actual reference architectures + torch Adam, one training step
taken), migrate it, and verify training *continues* here with the same
losses the torch recipe produces — params AND optimizer moments carried."""

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
    spec = importlib.util.spec_from_file_location("ref_arch3", _REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _torch_paired_step(tg, td, opt_g, opt_d, x, y):
    import torch.nn.functional as F

    synthetic = tg(x)
    concat_real = torch.cat((x, y), 1)
    concat_syn = torch.cat((x, synthetic), 1)
    opt_d.zero_grad()
    ps = td(concat_syn.detach()); ld_s = F.mse_loss(ps, torch.zeros_like(ps))
    pr = td(concat_real); ld_r = F.mse_loss(pr, torch.ones_like(pr))
    ((ld_s + ld_r) * 0.5).backward(); opt_d.step()
    for p in td.parameters():
        p.requires_grad = False
    opt_g.zero_grad()
    pg = td(concat_syn); lg = F.mse_loss(pg, torch.ones_like(pg))
    ll1 = F.l1_loss(synthetic, y) * 100
    (lg + ll1).backward(); opt_g.step()
    for p in td.parameters():
        p.requires_grad = True
    return ld_s.item(), ld_r.item(), lg.item(), ll1.item()


def _make_ref_gan_checkpoint(ref, rng, tmp_path, steps=1):
    """Build a reference-schema .pth.tar: real reference modules, torch
    Adam, ``steps`` paired training steps taken.  Returns (path, tg, td,
    opt_g, opt_d) so callers can continue the torch side."""
    torch.manual_seed(47)
    tg = ref.PairedAttentionGenerator(input_channels=9).train()
    td = ref.PairedAttentionDiscriminator(input_channels=9).train()
    opt_g = torch.optim.Adam(tg.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(td.parameters(), lr=2e-4, betas=(0.5, 0.999))
    for _ in range(steps):
        x1 = torch.from_numpy(rng.standard_normal((1, 9, 64, 64), dtype=np.float32) * 0.5)
        y1 = torch.from_numpy(rng.standard_normal((1, 3, 64, 64), dtype=np.float32) * 0.5)
        _torch_paired_step(tg, td, opt_g, opt_d, x1, y1)
    saved = {
        "model": "pairedattention",
        "starting_epoch": 2,
        "num_epochs": 10,
        "topography": "all",
        "optimizer_generator": opt_g.state_dict(),
        "optimizer_discriminator": opt_d.state_dict(),
        "scheduler_generator": {"last_epoch": 1},
        "scheduler_discriminator": {"last_epoch": 1},
        "all_losses": {"all_losses_discriminator_real": [1.0],
                       "all_losses_discriminator_synthetic": [1.0],
                       "all_losses_generator_synthetic": [1.0],
                       "all_l1_losses_generator_synthetic": [1.0]},
        "add_identity_loss": False,
        "discriminator": td.state_dict(),
        "generator": tg.state_dict(),
    }
    torch_path = str(tmp_path / "ref.pth.tar")
    torch.save(saved, torch_path)
    return torch_path, tg, td, opt_g, opt_d


@pytest.mark.slow
def test_migrate_gan_checkpoint_continues_training(ref, rng, tmp_path):
    from floodgan_tpu.utils.migrate import migrate_gan
    from floodgan_tpu.ckpt import load_checkpoint
    from floodgan_tpu.train.paired import PairedTrainer
    from flax import serialization

    torch_path, tg, td, opt_g, opt_d = _make_ref_gan_checkpoint(ref, rng, tmp_path)

    out_path = str(tmp_path / "migrated.ckpt")
    migrate_gan(torch_path, out_path, resize=64, crop=None)

    meta, raw = load_checkpoint(out_path)
    assert meta["model"] == "pairedattention"
    assert meta["starting_epoch"] == 2
    trainer = PairedTrainer("pairedattention", 9)
    template = trainer.init(
        jax.random.key(0),
        jnp.zeros((1, 64, 64, 9)), jnp.zeros((1, 64, 64, 3)),
    )
    state = serialization.from_state_dict(template, raw)
    assert int(state.gen_opt.count) == 1

    # step 2 on both sides must match (params + Adam moments both migrated)
    x2 = torch.from_numpy(rng.standard_normal((1, 9, 64, 64), dtype=np.float32) * 0.5)
    y2 = torch.from_numpy(rng.standard_normal((1, 3, 64, 64), dtype=np.float32) * 0.5)
    t_losses = _torch_paired_step(tg, td, opt_g, opt_d, x2, y2)

    state, m = trainer.train_step(
        state,
        jnp.asarray(x2.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(y2.numpy().transpose(0, 2, 3, 1)),
        jnp.float32(2e-4),
        jax.random.key(0),
    )
    np.testing.assert_allclose(float(m["losses_discriminator_synthetic"]), t_losses[0], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(m["losses_discriminator_real"]), t_losses[1], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(m["losses_generator_synthetic"]), t_losses[2], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(m["l1_losses_generator_synthetic"]), t_losses[3], rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_migrate_seg_checkpoint(ref, rng, tmp_path):
    from floodgan_tpu.utils.migrate import migrate_seg
    from floodgan_tpu.ckpt import load_checkpoint
    from floodgan_tpu.train.seg import SegTrainer
    from flax import serialization

    torch.manual_seed(47)
    tm = ref.UNet().train()
    saved = {
        "current_epoch": 5,
        "num_epochs": 100,
        "model": tm.state_dict(),
        "all_losses": [0.5, 0.4],
        "all_accuracies": [0.8, 0.9],
    }
    torch_path = str(tmp_path / "seg.pth.tar")
    torch.save(saved, torch_path)
    out_path = str(tmp_path / "seg.ckpt")
    migrate_seg(torch_path, out_path)

    meta, raw = load_checkpoint(out_path)
    assert meta["current_epoch"] == 5
    assert meta["all_accuracies"] == [0.8, 0.9]
    trainer = SegTrainer()
    template = trainer.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    state = serialization.from_state_dict(template, raw)

    x = rng.random((1, 3, 64, 64), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = trainer.predict_logits(state.params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=3e-4
    )


@pytest.mark.slow
def test_auto_migrate_reference_checkpoint_on_model_load(ref, rng, tmp_path):
    """evaluate-style interop: a reference-format .pth.tar passed straight
    to Model(load_pretrained_model=True) must auto-detect, migrate once,
    and serve inference (reference models/model.py:52-57 loads its own
    torch pickle directly; round-2 verdict item 2)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_flood_fixture

    import jax.numpy as jnp

    from floodgan_tpu.api.model import Model

    torch_path, *_ = _make_ref_gan_checkpoint(ref, rng, tmp_path)
    data_path, meta_dir = make_flood_fixture(tmp_path / "d", size=32)

    m = Model(
        data_path=data_path,
        load_pretrained_model=True,
        pretrained_model_path=torch_path,
        training_model=False,
        resize=None,
        dataset_subset="usa",
        dataset_dem="same",
        metadata_dir=meta_dir,
    )
    # config reconstructed from the torch file (self-describing contract)
    assert m.model == "pairedattention"
    assert m.topography == "all"
    migrated = torch_path + ".floodgan.ckpt"
    assert os.path.isfile(migrated)

    out, mask = m.generate(jnp.zeros((1, 64, 64, 9), jnp.float32))
    assert out.shape == (1, 64, 64, 3)
    assert mask.shape[-2:] == (64, 64)

    # second load reuses the migrated artifact (no second conversion)
    mtime = os.path.getmtime(migrated)
    Model(
        data_path=data_path,
        load_pretrained_model=True,
        pretrained_model_path=torch_path,
        training_model=False,
        resize=None,
        dataset_subset="usa",
        dataset_dem="same",
        metadata_dir=meta_dir,
    )
    assert os.path.getmtime(migrated) == mtime
