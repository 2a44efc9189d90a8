"""Multi-device tests on the 8-device virtual CPU mesh: the driver's
dryrun entry points, and data-parallel == single-device equivalence of the
jitted train step (gradient all-reduce inserted by GSPMD)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from floodgan_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from floodgan_tpu.train.paired import PairedTrainer


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, example_args = ge.entry()
    params, x = example_args
    # compile-check on tiny shapes (512^2 is the driver's job on real TPU)
    small_x = jnp.zeros((1, 64, 64, 9), jnp.float32)
    out = jax.jit(fn)(params, small_x)
    assert out.shape == (1, 64, 64, 3)


@pytest.mark.slow
def test_dryrun_multichip():
    """Full driver dryrun (8-device mesh, full train step) — ~4 min on one
    CPU core, so slow-tier; the driver itself re-runs this every round
    (MULTICHIP_rN.json) and test_graft_entry_compiles smokes the entry."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_data_parallel_matches_single_device(rng):
    """Same batch, sharded over 8 devices vs unsharded: identical losses
    and identical updated parameters (psum-mean equivalence)."""
    trainer = PairedTrainer("pairedattention", 4)
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 4), dtype=np.float32) * 0.3)
    y = jnp.asarray(rng.standard_normal((8, 32, 32, 3), dtype=np.float32) * 0.3)
    state = trainer.init(jax.random.key(0), x, y)
    key = jax.random.key(7)
    lr = jnp.float32(2e-4)

    mesh = make_mesh(8)
    x_dp, y_dp = shard_batch(x, mesh), shard_batch(y, mesh)

    # Gradients (pre-optimizer) must match between sharded and unsharded
    # execution — post-Adam params can't be compared (first-step updates are
    # +-lr*sign(grad); reduction order flips signs of ~zero grads).  Grads
    # are checked before the (donating) train steps run.
    def loss_fn(gp, xx, yy):
        return jnp.mean(jnp.abs(trainer.gen_apply(gp, xx, key) - yy))

    gen_copy = jax.tree_util.tree_map(jnp.copy, state.gen_params)
    g_single = jax.device_get(jax.jit(jax.grad(loss_fn))(gen_copy, x, y))
    g_dp = jax.device_get(
        jax.jit(jax.grad(loss_fn))(replicate_tree(gen_copy, mesh), x_dp, y_dp)
    )
    for xa, xb in zip(jax.tree_util.tree_leaves(g_single), jax.tree_util.tree_leaves(g_dp)):
        scale = max(float(np.abs(xa).max()), 1e-8)
        np.testing.assert_allclose(xa, xb, atol=1e-5 * scale + 1e-8)

    # Full train step: loss scalars identical between DP and single-device.
    state_dp = replicate_tree(jax.tree_util.tree_map(jnp.copy, state), mesh)
    state_single, m_single = trainer.train_step(state, x, y, lr, key)
    state_dp, m_dp = trainer.train_step(state_dp, x_dp, y_dp, lr, key)
    for k in m_single:
        np.testing.assert_allclose(
            float(m_single[k]), float(m_dp[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )


def test_spatial_sharded_forward_matches_single_device(rng):
    """Fast-tier halo-exchange check: the generator FORWARD under a
    (data=4, spatial=2) mesh (image H sharded over ``spatial``) must equal
    unsharded execution — GSPMD inserts conv halo exchange + cross-shard
    instance-norm statistics.  The full train-step equivalence (gradients
    through the halos) is the slow-tier test below."""
    from floodgan_tpu.parallel.mesh import shard_images

    trainer = PairedTrainer("pairedattention", 9)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 9), dtype=np.float32) * 0.3)
    y = jnp.asarray(rng.standard_normal((4, 64, 64, 3), dtype=np.float32) * 0.3)
    state = trainer.init(jax.random.key(0), x, y)
    key = jax.random.key(7)

    out_single = np.asarray(trainer.gen_apply(state.gen_params, x, key))

    mesh = make_mesh(8, spatial=2)
    gen_sp = replicate_tree(state.gen_params, mesh)
    out_sp = np.asarray(trainer.gen_apply(gen_sp, shard_images(x, mesh), key))
    np.testing.assert_allclose(out_single, out_sp, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_spatial_sharded_step_matches_single_device(rng):
    """(data=4, spatial=2) mesh: batch over data, image H over spatial
    (GSPMD conv halo exchange + cross-shard instance-norm statistics).
    Loss scalars must match unsharded execution to float tolerance."""
    from floodgan_tpu.parallel.mesh import shard_images

    trainer = PairedTrainer("pairedattention", 9)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 9), dtype=np.float32) * 0.3)
    y = jnp.asarray(rng.standard_normal((4, 64, 64, 3), dtype=np.float32) * 0.3)
    state = trainer.init(jax.random.key(0), x, y)
    key = jax.random.key(7)
    lr = jnp.float32(2e-4)

    mesh = make_mesh(8, spatial=2)
    state_sp = replicate_tree(jax.tree_util.tree_map(jnp.copy, state), mesh)
    x_sp, y_sp = shard_images(x, mesh), shard_images(y, mesh)

    _, m_single = trainer.train_step(state, x, y, lr, key)
    _, m_sp = trainer.train_step(state_sp, x_sp, y_sp, lr, key)
    for k in m_single:
        np.testing.assert_allclose(
            float(m_single[k]), float(m_sp[k]), rtol=2e-4, atol=1e-5, err_msg=k
        )


@pytest.mark.slow
def test_spatial_sharded_highres_step_matches_single_device(rng):
    """Round-4 hardening: the FULL production composition — phase-space
    paired step ∘ remat('boundaries') ∘ spatial sharding — at a
    halo-exercising resolution (H=512; every prior spatial execution ran
    at 64^2).  At spatial=4 each device holds 128 full-res rows, so the
    k7 reflect-conv stem, the s2 downs, the trunk's k3 convs at H/4=128
    and both ConvTranspose ups all exchange halos across shard
    boundaries, the phase-major (H/2) layout is itself the sharded axis,
    and the segment-boundary remat saves are sharded tensors.  Loss
    scalars must match unsharded execution (W=32 keeps the single-core
    CPU cost bounded; H is the sharded axis, so a narrow W loses no halo
    coverage).  2560^2-class feasibility notes: BENCH_NOTES round 4."""
    from floodgan_tpu.parallel.mesh import shard_images

    t = PairedTrainer("pairedattention", 9, remat=True, remat_policy="boundaries")
    assert t.phase_step and t.phase_stem, "test must cover the production phase path"
    x = jnp.asarray(rng.standard_normal((1, 512, 32, 9), dtype=np.float32) * 0.3)
    y = jnp.asarray(rng.standard_normal((1, 512, 32, 3), dtype=np.float32) * 0.3)
    # conv params are resolution-independent: init at small H keeps the
    # un-jitted init off this test's critical path
    state = t.init(
        jax.random.key(0), jnp.zeros((1, 64, 32, 9)), jnp.zeros((1, 64, 32, 3))
    )
    key = jax.random.key(7)
    lr = jnp.float32(2e-4)

    xp, yp = t.prepare_batch(x, y)
    _, m_single = t.train_step(
        jax.tree_util.tree_map(jnp.copy, state), xp, yp, lr, key
    )
    m_single = {k: float(v) for k, v in m_single.items()}

    for spatial in (2, 4):
        mesh = make_mesh(spatial, spatial=spatial)
        state_sp = replicate_tree(jax.tree_util.tree_map(jnp.copy, state), mesh)
        xs, ys = t.prepare_batch(shard_images(x, mesh), shard_images(y, mesh))
        _, m_sp = t.train_step(state_sp, xs, ys, lr, key)
        for k, want in m_single.items():
            np.testing.assert_allclose(
                want, float(m_sp[k]), rtol=2e-4, atol=1e-5,
                err_msg=f"spatial={spatial}: {k}",
            )


def test_make_mesh_spatial_validation():
    with pytest.raises(ValueError):
        make_mesh(8, spatial=3)
    assert make_mesh(8, spatial=4).shape == {"data": 2, "spatial": 4}


@pytest.mark.slow
def test_dryrun_multichip_other_sizes():
    """Mesh generality: the dry run works for 2 and 4 device meshes too."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(2)
    ge.dryrun_multichip(4)


@pytest.mark.slow
def test_dryrun_multichip_hostile_preinitialized_backend():
    """Driver-environment simulation: the JAX backend is already initialized
    with a single device before dryrun_multichip is called (this is what
    failed in MULTICHIP_r01.json).  The dry run must detect it and re-exec
    itself in a clean CPU subprocess rather than dying in make_mesh."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("_FLOODGAN_DRYRUN_CHILD", None)
    # Strip the virtual-device flag so the hostile process initializes with
    # exactly one CPU device before the dry run is invoked.
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    code = (
        "import jax\n"
        "assert len(jax.devices()) == 1, jax.devices()  # backend now initialized, 1 device\n"
        f"import sys; sys.path.insert(0, {repo!r})\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "print('HOSTILE_DRYRUN_OK')\n"
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    assert "HOSTILE_DRYRUN_OK" in res.stdout


# ---------------------------------------------------------- multi-host loading

def test_process_stripe_partitions_batch():
    from floodgan_tpu.parallel.multihost import process_stripe

    got = [process_stripe(8, p, 4) for p in range(4)]
    assert got == [(0, 2), (2, 4), (4, 6), (6, 8)]
    with pytest.raises(ValueError):
        process_stripe(6, 0, 4)


def test_multihost_loader_single_process_matches_batch_loader(tmp_path, rng):
    """process_count=1: the multi-host loader must yield the same batches
    (same epoch-seeded order, same transform) as the plain BatchLoader,
    as globally-sharded arrays over the (data, spatial) mesh."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_flood_fixture

    from floodgan_tpu.data.pipeline import BatchLoader, FloodDataset
    from floodgan_tpu.parallel.multihost import MultiHostBatchLoader

    data_path, meta_dir = make_flood_fixture(tmp_path / "d", size=32)
    ds = FloodDataset("usa", "same", "train", data_path, "all", None, None,
                      metadata_dir=meta_dir)
    mesh = make_mesh(8, spatial=2)

    plain = BatchLoader(ds, batch_size=4, shuffle=True, drop_remainder=True)
    mh = MultiHostBatchLoader(ds, mesh, batch_size=4,
                              process_index=0, process_count=1)
    assert len(mh) == len(ds) // 4

    got_batches = list(mh.epoch_iter(epoch=3))
    want_batches = list(plain.epoch_iter(epoch=3))
    assert len(got_batches) == len(want_batches) > 0
    for got, want in zip(got_batches, want_batches):
        assert got["names"] == want["names"]
        x = got["input"]
        assert x.shape == want["input"].shape
        # carries the 2-D mesh sharding end to end
        assert x.sharding.spec == jax.sharding.PartitionSpec("data", "spatial", None, None)
        np.testing.assert_allclose(np.asarray(x), np.asarray(want["input"]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(got["output"]), np.asarray(want["output"]), rtol=1e-6)


def test_multihost_loader_stripes_partition_global_batches(tmp_path, rng):
    """Simulated 2-process run: each process's local stripes, concatenated,
    must reconstruct every global batch of the single-host order exactly
    (contiguous striping, no overlap, no loss)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_flood_fixture

    from floodgan_tpu.data.pipeline import BatchLoader, FloodDataset
    from floodgan_tpu.parallel.multihost import MultiHostBatchLoader

    data_path, meta_dir = make_flood_fixture(tmp_path / "d", size=32)
    ds = FloodDataset("usa", "same", "train", data_path, "all", None, None,
                      metadata_dir=meta_dir)
    mesh = make_mesh(8, spatial=2)

    per_process = []
    for p in (0, 1):
        mh = MultiHostBatchLoader(ds, mesh, batch_size=4,
                                  process_index=p, process_count=2)
        mh._globalize = lambda a: a  # keep local stripes inspectable
        per_process.append(list(mh.epoch_iter(epoch=3)))

    plain = BatchLoader(ds, batch_size=4, shuffle=True, drop_remainder=True)
    want = list(plain.epoch_iter(epoch=3))
    assert len(per_process[0]) == len(per_process[1]) == len(want)
    for b0, b1, w in zip(per_process[0], per_process[1], want):
        assert b0["names"] + b1["names"] == w["names"]
        merged = np.concatenate([np.asarray(b0["input"]), np.asarray(b1["input"])])
        np.testing.assert_allclose(merged, np.asarray(w["input"]), rtol=1e-6)


@pytest.mark.slow
def test_seg_unet_spatial_sharded_forward(rng):
    """Segmentation U-Net under the (data, spatial) mesh: GSPMD partitions
    the maxpool/convT/concat pyramid with halo exchange — logits must
    match unsharded execution.  (Slow tier: the attention-generator
    spatial forward above is the fast-tier halo check.)"""
    from floodgan_tpu.parallel.mesh import shard_images
    from floodgan_tpu.train.seg import SegTrainer

    st = SegTrainer()
    xs = jnp.asarray(rng.standard_normal((4, 64, 64, 3), dtype=np.float32) * 0.3)
    ss = st.init(jax.random.key(0), xs)
    o1 = np.asarray(st.predict_logits(ss.params, xs))
    mesh = make_mesh(8, spatial=2)
    o2 = np.asarray(
        st.predict_logits(replicate_tree(ss.params, mesh), shard_images(xs, mesh))
    )
    np.testing.assert_allclose(o1, o2, atol=3e-5)


@pytest.mark.slow
def test_pix2pix_spatial_sharded_forward(rng):
    """Pix2Pix 8-level U-Net (256^2 minimum input) under the spatial mesh."""
    from floodgan_tpu.parallel.mesh import shard_images

    t = PairedTrainer("pix2pix", 9)
    x = jnp.asarray(rng.standard_normal((4, 256, 256, 9), dtype=np.float32) * 0.3)
    y = jnp.asarray(rng.standard_normal((4, 256, 256, 3), dtype=np.float32) * 0.3)
    s = t.init(jax.random.key(0), x, y)
    key = jax.random.key(7)
    out1 = np.asarray(t.gen_apply(s.gen_params, x, key))
    mesh = make_mesh(8, spatial=2)
    out2 = np.asarray(
        t.gen_apply(replicate_tree(s.gen_params, mesh), shard_images(x, mesh), key)
    )
    np.testing.assert_allclose(out1, out2, atol=3e-5)
