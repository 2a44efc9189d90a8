"""End-to-end tests of the public API + CLI over the synthetic fixture:
train -> checkpoint -> resume -> evaluate -> compare, mirroring the
reference's testing-subset smoke-run strategy (SURVEY.md §4)."""

import glob
import os

import numpy as np
import pytest

import jax

from fixtures import make_flood_fixture, make_masks_fixture


@pytest.fixture(scope="module")
def flood_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("flood")
    return make_flood_fixture(root, size=32, n_per_disaster=3)


@pytest.fixture(scope="module")
def masks_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("masks")
    return make_masks_fixture(root, size=32)


def test_fast_paired_train_resume_evaluate(flood_fixture):
    """FAST-tier orchestration e2e (round-4 VERDICT item 8): train ->
    checkpoint -> resume -> evaluate through the public API at 32^2 on
    the 'testing'-style fixture, so `-m "not slow"` exercises the API
    layer beyond a single path.  Kept minimal: 2 epochs on the smallest
    subset, loss-figure + single-image artifacts asserted by name."""
    from floodgan_tpu.api import Model

    data_path, meta_dir = flood_fixture
    model = Model(
        model="PairedAttention", dataset_subset="nepal-flooding", dataset_dem="same",
        data_path=data_path, num_epochs=2, topography="dem", resize=None,
        crop=None, save_model_interval=2, verbose=False, metadata_dir=meta_dir,
    )
    model.train_paired()
    assert len(model.all_losses["all_losses_generator_synthetic"]) == 2
    ckpts = glob.glob(
        f"{data_path}/models/PairedAttention_*epoch2*nepal-floodingData*.ckpt"
    )
    assert len(ckpts) >= 1

    ev = Model(
        dataset_subset="nepal-flooding", dataset_dem="same", data_path=data_path,
        load_pretrained_model=True, pretrained_model_path=ckpts[0],
        training_model=False, verbose=False, metadata_dir=meta_dir,
    )
    # self-describing checkpoint reconstructs config (reference stores the
    # architecture/topography in the file, models/model.py:52-57)
    assert ev.model == "pairedattention"
    assert ev.topography == "dem"
    assert len(ev.all_losses["all_losses_generator_synthetic"]) == 2
    ev.plot_losses()
    figs = glob.glob(f"{data_path}/figures/PairedAttention_losses_*.png")
    assert figs, "plot_losses must write the metadata-named loss figure"
    ev.plot_sample_images(num_images=1, use_test_data=False)
    imgs = glob.glob(f"{data_path}/images/PairedAttention_validation*.png")
    assert imgs, "plot_sample_images must write the sample grid artifact"


@pytest.mark.slow
def test_paired_train_checkpoint_resume(flood_fixture):
    from floodgan_tpu.api import Model

    data_path, meta_dir = flood_fixture
    model = Model(
        model="PairedAttention", dataset_subset="usa", dataset_dem="same",
        data_path=data_path, num_epochs=2, topography="all", resize=None,
        crop=None, save_model_interval=2, verbose=True, metadata_dir=meta_dir,
    )
    model.train_paired()
    assert len(model.all_losses["all_losses_discriminator_real"]) == 2
    ckpts = glob.glob(f"{data_path}/models/PairedAttention_*epoch2*.ckpt")
    assert len(ckpts) == 1

    resumed = Model(
        dataset_subset="usa", dataset_dem="same", data_path=data_path,
        load_pretrained_model=True, pretrained_model_path=ckpts[0],
        training_model=True, verbose=True, metadata_dir=meta_dir, resize=None,
    )
    # self-describing checkpoint reconstructs config
    assert resumed.model == "pairedattention"
    assert resumed.topography == "all"
    assert resumed.starting_epoch == 3
    assert resumed.num_epochs == 2
    assert len(resumed.all_losses["all_losses_discriminator_real"]) == 2
    # restored params match saved ones
    a = jax.tree_util.tree_leaves(model.state.gen_params)
    b = jax.tree_util.tree_leaves(resumed.state.gen_params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_cycle_train_with_identity(flood_fixture):
    from floodgan_tpu.api import Model

    data_path, meta_dir = flood_fixture
    model = Model(
        model="AttentionGAN", dataset_subset="hurricane-harvey", dataset_dem="same",
        data_path=data_path, num_epochs=1, topography="dem", resize=None,
        add_identity_loss=True, verbose=True, metadata_dir=meta_dir,
    )
    model.train_cycle()
    assert len(model.all_losses["all_losses_identity_pre"]) == 1
    assert len(model.all_losses["all_losses_pre_to_post_cycle"]) == 1


@pytest.mark.slow
def test_seg_train_eval_and_cli(masks_fixture, capsys):
    from floodgan_tpu.api import SegmentationModel

    data_path, meta_dir = masks_fixture
    seg = SegmentationModel(
        dataset_subset="usa", data_path=data_path, num_epochs=1,
        save_model_interval=1, verbose=True, train=True, metadata_dir=meta_dir,
    )
    seg.train_model()
    assert len(seg.all_losses) == 1
    ckpts = glob.glob(f"{data_path}/models/SegmentationModel_*.ckpt")
    assert ckpts

    ev = SegmentationModel(
        dataset_subset="usa", data_path=data_path,
        pretrained_model_path=ckpts[0], train=False, metadata_dir=meta_dir,
    )
    results = ev.calculate_metrics(use_test_data=False)
    assert 0.0 <= results["Accuracy"] <= 1.0
    metric_files = glob.glob(f"{data_path}/metrics/SegmentationModel_*.csv")
    assert metric_files


@pytest.mark.slow
def test_evaluate_flow(flood_fixture, masks_fixture):
    from floodgan_tpu.api import Model, SegmentationModel

    data_path, meta_dir = flood_fixture
    mask_path, mask_meta = masks_fixture

    # resize=256 without crop: pix2pix needs 256-divisible spatial dims
    # (crop=4 at resize=256 would give 128^2, which crashes the reference's
    # torch net too).
    train_model = Model(
        model="Pix2Pix", dataset_subset="usa", dataset_dem="same",
        data_path=data_path, num_epochs=1, topography=None, resize=256,
        crop=None, save_model_interval=1, metadata_dir=meta_dir,
    )
    train_model.train_paired()
    gan_ckpt = glob.glob(f"{data_path}/models/Pix2Pix_*.ckpt")[0]

    seg = SegmentationModel(
        dataset_subset="usa", data_path=mask_path, num_epochs=1,
        save_model_interval=1, train=True, metadata_dir=mask_meta, verbose=False,
    )
    seg.train_model()
    seg_ckpt = glob.glob(f"{mask_path}/models/SegmentationModel_*.ckpt")[0]

    ev = Model(
        dataset_subset="usa", dataset_dem="same", data_path=data_path,
        load_pretrained_model=True, pretrained_model_path=gan_ckpt,
        training_model=False, resize=256, crop=None, metadata_dir=meta_dir,
        verbose=True,
    )
    assert ev.model == "pix2pix"
    ev.plot_losses()
    results = ev.calculate_metrics(use_test_data=False, seg_model_path=seg_ckpt)
    assert np.isfinite(results["PSNR"])
    assert np.isfinite(results["SSIM"])
    assert 0.0 <= results["Accuracy"] <= 1.0
    assert "IoU_Flood" in results
    assert glob.glob(f"{data_path}/metrics/Pix2Pix_*.csv")

    img = ev.train_loader.dataset.samples[0].image_name
    ev.plot_image(image_name=img, plot_single_image="output", plot_image_set=True)
    assert glob.glob(f"{data_path}/images/Pix2Pix_{img}_*.png")


@pytest.mark.slow
def test_compare_two_models(flood_fixture, masks_fixture):
    from floodgan_tpu.api import Model, ModelsGroup

    data_path, meta_dir = flood_fixture
    mask_path, _ = masks_fixture

    ckpts = []
    for name in ("PairedAttention", "AttentionGAN"):
        m = Model(
            model=name, dataset_subset="usa", dataset_dem="same",
            data_path=data_path, num_epochs=1, topography="all", resize=None,
            save_model_interval=1, metadata_dir=meta_dir,
        )
        (m.train_cycle if m.model_is_cycle else m.train_paired)()
        ckpts.append(glob.glob(f"{data_path}/models/{name}_*epoch1*.ckpt")[0])

    seg_ckpt = glob.glob(f"{mask_path}/models/SegmentationModel_*.ckpt")[0]
    group = ModelsGroup(
        paths={"Model 1": ckpts[0], "Model 2": ckpts[1]},
        compare="two", dataset_subset="usa", dataset_dem="same",
        data_path=data_path, resize=None, crop=None, crop_index=0,
        topography="all", metadata_dir=meta_dir,
    )
    df = group.compare_metrics(use_test_data=False, seg_model_path=seg_ckpt)
    assert set(df.index) == {"Model 1", "Model 2"}
    assert glob.glob(f"{data_path}/metrics/two_comparison_*.csv")
    names = [group.models["Model 1"].train_loader.dataset.samples[0].image_name]
    group.compare_output_images(names)
    assert glob.glob(f"{data_path}/images/two_comparison_*.png")


def test_cli_train_smoke(flood_fixture):
    from floodgan_tpu.cli.train import main

    data_path, meta_dir = flood_fixture
    main([
        "--model=PairedAttention", "--dataset_subset=usa", "--dataset_dem=same",
        f"--data_path={data_path}", "--num_epochs=1", "--topography=dem",
        "--verbose", f"--metadata_dir={meta_dir}",
    ])


@pytest.mark.slow
def test_resume_bitwise_equivalence(flood_fixture):
    """2 epochs straight == 1 epoch -> checkpoint -> resume -> 1 epoch:
    identical parameters (deterministic data order, per-epoch RNG, LR
    schedule and optimizer state all survive the checkpoint)."""
    from floodgan_tpu.api import Model

    data_path, meta_dir = flood_fixture

    kwargs = dict(
        model="PairedAttention", dataset_subset="india", dataset_dem="same",
        data_path=data_path, topography="all", resize=None, crop=None,
        metadata_dir=meta_dir,
    )
    straight = Model(num_epochs=2, **kwargs)
    straight.train_paired()

    half = Model(num_epochs=2, **kwargs)
    half.num_epochs = 2
    # train only epoch 1 by temporarily claiming num_epochs=1 would change
    # the LR schedule; instead run the loop manually for epoch 1.
    import jax as _jax
    import jax.numpy as _jnp

    lr = _jnp.float32(half._epoch_lr(1))
    ek = half.streams.epoch(1)
    for step, batch in enumerate(half.train_loader.epoch_iter(1)):
        x, y = half._device_batch(batch)
        half.state, _ = half.trainer.train_step(
            half.state, x, y, lr, _jax.random.fold_in(ek, step)
        )
    half.current_epoch = 1
    for key in half.all_losses:
        half.all_losses[key].append(0.0)
    ckpt = half.save_checkpoint(1)

    resumed = Model(
        dataset_subset="india", dataset_dem="same", data_path=data_path,
        load_pretrained_model=True, pretrained_model_path=ckpt,
        training_model=True, metadata_dir=meta_dir, resize=None,
    )
    assert resumed.starting_epoch == 2
    resumed.train_paired()

    import numpy as _np
    a = _jax.tree_util.tree_leaves(straight.state.gen_params)
    b = _jax.tree_util.tree_leaves(resumed.state.gen_params)
    for xa, xb in zip(a, b):
        _np.testing.assert_array_equal(_np.asarray(xa), _np.asarray(xb))


@pytest.mark.slow
def test_model_data_parallel_training(flood_fixture):
    """Model-level DP: batch 4 sharded over a 4-device mesh trains and
    matches the single-device loss trajectory."""
    from floodgan_tpu.api import Model

    data_path, meta_dir = flood_fixture
    kwargs = dict(
        model="PairedAttention", dataset_subset="usa", dataset_dem="same",
        data_path=data_path, num_epochs=1, topography="all", resize=None,
        metadata_dir=meta_dir, batch_size=4,
    )
    single = Model(num_data_devices=1, **kwargs)
    single.train_loader.drop_remainder = True  # align with the DP loader
    single.train_paired()
    dp = Model(num_data_devices=4, **kwargs)
    dp.train_paired()
    for k in single.all_losses:
        np.testing.assert_allclose(
            single.all_losses[k], dp.all_losses[k], rtol=1e-4, atol=1e-5, err_msg=k
        )


@pytest.mark.slow
def test_model_spatial_parallel_training(flood_fixture):
    """Model-level (data=2, spatial=2) mesh: batch over data, image H over
    spatial; loss trajectory matches single-device."""
    from floodgan_tpu.api import Model

    data_path, meta_dir = flood_fixture
    kwargs = dict(
        model="PairedAttention", dataset_subset="usa", dataset_dem="same",
        data_path=data_path, num_epochs=1, topography="all", resize=None,
        metadata_dir=meta_dir, batch_size=4,
    )
    single = Model(**kwargs)
    single.train_loader.drop_remainder = True  # align with the sharded loader
    single.train_paired()
    sp = Model(num_data_devices=2, num_spatial_devices=2, **kwargs)
    sp.train_paired()
    for k in single.all_losses:
        np.testing.assert_allclose(
            single.all_losses[k], sp.all_losses[k], rtol=2e-4, atol=1e-5, err_msg=k
        )


@pytest.mark.slow
def test_cli_evaluate_and_segment_and_compare(flood_fixture, masks_fixture):
    """Drive the three remaining CLI mains end-to-end on the fixture."""
    from floodgan_tpu.cli.train import main as train_main
    from floodgan_tpu.cli.evaluate import main as evaluate_main
    from floodgan_tpu.cli.segment import main as segment_main
    from floodgan_tpu.cli.compare import main as compare_main

    data_path, meta_dir = flood_fixture
    mask_path, mask_meta = masks_fixture

    train_main([
        "--model=AttentionGAN", "--dataset_subset=usa", "--dataset_dem=same",
        f"--data_path={data_path}", "--num_epochs=1", "--topography=all",
        "--save_model_interval=1", f"--metadata_dir={meta_dir}",
    ])
    gan_ckpt = sorted(glob.glob(f"{data_path}/models/AttentionGAN_*epoch1*.ckpt"))[-1]

    segment_main([
        "--train", "--dataset_subset=usa", f"--data_path={mask_path}",
        "--num_epochs=1", "--save_model_interval=1", f"--metadata_dir={mask_meta}",
    ])
    seg_ckpt = sorted(glob.glob(f"{mask_path}/models/SegmentationModel_*.ckpt"))[-1]

    # segment eval mode (plot_loss + samples + metrics)
    segment_main([
        "--dataset_subset=usa", f"--data_path={mask_path}",
        f"--pretrained_model_path={seg_ckpt}", f"--metadata_dir={mask_meta}",
    ])

    from floodgan_tpu.data.splits import determine_flood_dataset
    some_image = determine_flood_dataset("usa", "same", metadata_dir=meta_dir)["train"][0].image_name
    evaluate_main([
        "--model=AttentionGAN", "--dataset_subset=usa", "--dataset_dem=same",
        f"--data_path={data_path}", f"--pretrained_model_path={gan_ckpt}",
        "--plot_losses", "--calculate_metrics",
        f"--image_name={some_image}", "--plot_single_image=attention mask",
        "--plot_image_set",
        f"--segmentation_model_path={seg_ckpt}", f"--metadata_dir={meta_dir}",
    ])
    assert glob.glob(f"{data_path}/metrics/AttentionGAN_*.csv")
    assert glob.glob(f"{data_path}/images/AttentionGAN_{some_image}_attentionMask_*.png")

    compare_main([
        "--compare=two", "--dataset_subset=usa", "--dataset_dem=same",
        f"--data_path={data_path}", "--topography=all",
        f"--model_1_path={gan_ckpt}", f"--model_2_path={gan_ckpt}",
        f"--segmentation_model_path={seg_ckpt}", "--calculate_metrics",
        f"--metadata_dir={meta_dir}",
    ])
    assert glob.glob(f"{data_path}/metrics/two_comparison_*.csv")


@pytest.mark.slow
def test_sigterm_preemption_checkpoint(flood_fixture):
    """SIGTERM (TPU-pool preemption) must produce a resume checkpoint —
    the same best-effort path as Ctrl-C (api/model.py _train_loop)."""
    import glob
    import signal
    import subprocess
    import sys
    import tempfile
    import time

    data_path, meta_dir = flood_fixture
    out_dir = tempfile.mkdtemp()
    code = f"""
import os, sys, shutil
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {os.getcwd()!r})
from floodgan_tpu.api import Model
m = Model(model="PairedAttention", dataset_subset="usa", dataset_dem="same",
          data_path={out_dir!r}, num_epochs=10000, topography="all", resize=None,
          metadata_dir={meta_dir!r}, batch_size=4, save_model_interval=1)
m.train_paired()
"""
    # give the child its own models dir but the fixture's data
    for sub in ("dataset_input", "dataset_output"):
        os.symlink(os.path.join(data_path, sub), os.path.join(out_dir, sub))
    log = open(os.path.join(out_dir, "child.log"), "w")
    p = subprocess.Popen([sys.executable, "-c", code], stdout=log,
                         stderr=subprocess.STDOUT, cwd=os.getcwd())
    try:
        deadline = time.time() + 900
        while time.time() < deadline and not glob.glob(f"{out_dir}/models/*.ckpt"):
            assert p.poll() is None, open(log.name).read()[-1000:]
            time.sleep(2)
        n_before = len(glob.glob(f"{out_dir}/models/*.ckpt"))
        assert n_before, "never saw a periodic checkpoint"
        p.send_signal(signal.SIGTERM)
        p.wait(timeout=600)
        text = open(log.name).read()
        assert "Interrupted" in text, text[-1000:]
        assert len(glob.glob(f"{out_dir}/models/*.ckpt")) >= n_before
    finally:
        if p.poll() is None:
            p.kill()


@pytest.mark.slow
def test_cycle_phase_step_checkpoint_cross_layout(flood_fixture, monkeypatch):
    """Cycle training under the fully phase-space step (FLOODGAN_CYCLE_PHASE=1,
    the TPU default) must produce checkpoints interchangeable with the
    image-space step: train one epoch phase-side (phase-major replay
    buffers ride the checkpoint), then resume WITHOUT the flag — the
    layout shim depth-to-space's the buffers — and train another epoch."""
    from floodgan_tpu.api import Model

    data_path, meta_dir = flood_fixture
    monkeypatch.setenv("FLOODGAN_CYCLE_PHASE", "1")
    m = Model(
        model="CycleGAN", dataset_subset="hurricane-harvey", dataset_dem="same",
        data_path=data_path, num_epochs=1, topography="dem", resize=None,
        save_model_interval=1, verbose=True, metadata_dir=meta_dir,
    )
    assert m.trainer.phase_gen and m.trainer.phase_d
    m.train_cycle()
    assert len(m.all_losses["all_losses_pre_to_post_cycle"]) == 1
    ckpts = glob.glob(f"{data_path}/models/CycleGAN_*epoch1*.ckpt")
    assert len(ckpts) == 1

    # explicit "0" (not delenv): with the env unset the default is
    # backend-dependent (ON for TPU), and this resume must be image-layout
    monkeypatch.setenv("FLOODGAN_CYCLE_PHASE", "0")
    resumed = Model(
        dataset_subset="hurricane-harvey", dataset_dem="same",
        data_path=data_path, load_pretrained_model=True,
        pretrained_model_path=ckpts[0], training_model=True,
        verbose=True, metadata_dir=meta_dir, resize=None,
    )
    assert not resumed.trainer.phase_gen
    # the phase-major buffers were depth-to-space'd back to image layout
    assert (
        resumed.state.pre_buffer.images.shape[-1]
        == resumed.trainer.input_channels
    )
    # generator params round-trip exactly (same tree either layout)
    a = jax.tree_util.tree_leaves(m.state.gen_params)
    b = jax.tree_util.tree_leaves(resumed.state.gen_params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # num_epochs is the ABSOLUTE target epoch (reference semantics), so
    # extend it to train one more epoch on the converted buffers.
    resumed.num_epochs = 2
    resumed.train_cycle()
    assert len(resumed.all_losses["all_losses_pre_to_post_cycle"]) == 2
