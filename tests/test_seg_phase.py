"""Phase-space segmentation stem/tail (core/flags.seg_phase) golden tests.

The U-Net's full-resolution levels can evaluate on the 2x2 space-to-depth
decomposition (models/unet.py) with identical parameters; every lowering
here must match the image-space path numerically — forward and gradients —
since checkpoints and training trajectories are layout-independent by
contract.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from floodgan_tpu import ops
from floodgan_tpu.models.unet import UNet
from floodgan_tpu.ops.nn_ops import (
    concat_channels_phases,
    conv_transpose2d_phase_out,
    depth_to_space_phases,
    max_pool2d_phases,
    space_to_depth_phases,
)


def test_max_pool2d_phases_matches_image(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 5)), jnp.float32)
    want = ops.max_pool2d(x)
    got = max_pool2d_phases(space_to_depth_phases(x), 5)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_concat_channels_phases_matches_image(rng):
    a = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, 8, 8, 5)), jnp.float32)
    want = space_to_depth_phases(jnp.concatenate([a, b], axis=-1))
    got = concat_channels_phases(
        [(space_to_depth_phases(a), 3), (space_to_depth_phases(b), 5)]
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_conv_transpose_phase_out_k2_s2_p0(rng):
    """The U-Net up-conv shape (k2 s2 p0 op0): phase output must equal the
    space-to-depth of the image-space ConvTranspose."""
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((2, 2, 8, 4)), jnp.float32) * 0.2
    b = jnp.asarray(rng.standard_normal((4,)), jnp.float32)
    want = space_to_depth_phases(
        ops.conv_transpose2d(x, w, b, stride=2, padding=0, output_padding=0)
    )
    got = conv_transpose2d_phase_out(x, w, b, padding=0, output_padding=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def _unet_logits(params, x):
    return UNet().apply({"params": params}, x)


def test_unet_phase_stem_matches_image(rng, monkeypatch):
    """Same parameters, both lowerings, forward + gradient equivalence."""
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    monkeypatch.setenv("FLOODGAN_SEG_PHASE", "0")
    params = UNet().init({"params": jax.random.key(47)}, x)["params"]
    want = _unet_logits(params, x)
    g = jnp.asarray(rng.standard_normal(want.shape), jnp.float32)
    grads_w = jax.grad(lambda p: jnp.sum(_unet_logits(p, x) * g))(params)

    monkeypatch.setenv("FLOODGAN_SEG_PHASE", "1")
    got = _unet_logits(params, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)
    grads_p = jax.grad(lambda p: jnp.sum(_unet_logits(p, x) * g))(params)
    flat_w, _ = jax.flatten_util.ravel_pytree(grads_w)
    flat_p, _ = jax.flatten_util.ravel_pytree(grads_p)
    # Gradient equivalence is norm-level, not elementwise: after BN+relu
    # ~7% of pool windows are all-zero ties and the two lowerings' values
    # differ by float reassociation (~1e-5), so argmax/relu decisions
    # legitimately flip at ties — a sparse set of gradient entries routes
    # through different (equally valid) subgradients.  The same divergence
    # exists between CPU and TPU compilations of ONE lowering.  Elementwise
    # exactness is pinned at the op level instead (the p2p conv / pool /
    # deconv goldens above and in test_phase_stem.py).
    diff = np.linalg.norm(np.asarray(flat_p) - np.asarray(flat_w))
    assert diff / np.linalg.norm(np.asarray(flat_w)) < 0.01


def test_unet_phase_params_identical(rng, monkeypatch):
    """init under either lowering produces the identical parameter tree
    (names, shapes) — checkpoints are layout-independent."""
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    monkeypatch.setenv("FLOODGAN_SEG_PHASE", "0")
    p_img = UNet().init({"params": jax.random.key(3)}, x)["params"]
    monkeypatch.setenv("FLOODGAN_SEG_PHASE", "1")
    p_ph = UNet().init({"params": jax.random.key(3)}, x)["params"]
    s_img = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), p_img)
    s_ph = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), p_ph)
    assert s_img == s_ph
    # Same key -> same values too (the param order inside flax's fold-in is
    # name-keyed, not call-order-keyed).
    flat_a, _ = jax.flatten_util.ravel_pytree(p_img)
    flat_b, _ = jax.flatten_util.ravel_pytree(p_ph)
    np.testing.assert_array_equal(np.asarray(flat_a), np.asarray(flat_b))


def test_unet_phase_ineligible_shapes_fall_back(rng, monkeypatch):
    """Odd-divisibility inputs keep the image-space path under the flag
    (H % 4 != 0 would misalign the up4 phase grid)."""
    monkeypatch.setenv("FLOODGAN_SEG_PHASE", "1")
    x = jnp.asarray(rng.standard_normal((1, 36, 36, 3)), jnp.float32)
    params = UNet().init({"params": jax.random.key(1)}, x)["params"]
    out = UNet().apply({"params": params}, x)
    assert out.shape == (1, 36, 36, 1)


def test_seg_trainer_step_matches_across_lowerings(rng, monkeypatch):
    """One SegTrainer step: loss/accuracy scalars agree across lowerings
    (the training trajectory is layout-independent)."""
    from floodgan_tpu.train.seg import SegTrainer

    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    y = jnp.asarray((rng.random((2, 32, 32, 1)) > 0.5).astype(np.float32))
    lr = jnp.float32(1e-4)

    monkeypatch.setenv("FLOODGAN_SEG_PHASE", "0")
    t0 = SegTrainer()
    s0 = t0.init(jax.random.key(47), x)
    _, m0 = t0.train_step(s0, x, y, lr)

    monkeypatch.setenv("FLOODGAN_SEG_PHASE", "1")
    t1 = SegTrainer()
    s1 = t1.init(jax.random.key(47), x)
    _, m1 = t1.train_step(s1, x, y, lr)

    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]), atol=1e-4)
    np.testing.assert_allclose(
        float(m1["accuracy"]), float(m0["accuracy"]), atol=1e-6
    )
