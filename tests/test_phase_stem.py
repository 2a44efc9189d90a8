"""Phase-space encoder ops + full generator equivalence.

The phase-input path computes the SAME network (same parameters, same
math) with every tensor in 2x2 phase-major space-to-depth form — golden
tested against the image-space lowering here."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from floodgan_tpu import ops
from floodgan_tpu.ops.nn_ops import (
    conv2d_phase_to_phase,
    conv2d_s2_phase_input,
    depth_to_space_phases,
    instance_norm_act_phases,
    reflect_pad_phases,
    space_to_depth_phases,
)


@pytest.fixture
def rng():
    return np.random.default_rng(13)


def test_reflect_pad_phases_matches_image_pad(rng):
    """s2d(reflect_pad(x, 4)) == reflect_pad_phases(s2d(x), 3) — the phase
    halo materializes the pad-4 (even, phase-aligned) envelope."""
    x = jnp.asarray(rng.standard_normal((2, 16, 20, 3)), jnp.float32)
    want = space_to_depth_phases(
        jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)), mode="reflect")
    )
    got = reflect_pad_phases(space_to_depth_phases(x), 3, 3)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


@pytest.mark.parametrize("k,pad", [(7, 3), (3, 1), (5, 2)])
def test_conv2d_phase_to_phase_matches_image_conv(rng, k, pad):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 5)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, 5, 8)), jnp.float32) * 0.2
    b = jnp.asarray(rng.standard_normal((8,)), jnp.float32)
    want = ops.conv2d(x, w, b, stride=1, padding=pad)
    got_p = conv2d_phase_to_phase(space_to_depth_phases(x), w, padding=pad, b=b)
    got = depth_to_space_phases(got_p, want.shape[1], want.shape[2], 8)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), rtol=1e-5, atol=1e-5)


def test_phase_stem_conv7_with_reflect_pad(rng):
    """The full stem recipe: reflect_pad_phases + phase conv(padding=3) +
    slice [2:2+S] == conv7(reflect_pad(x, 3))."""
    x = jnp.asarray(rng.standard_normal((2, 24, 24, 9)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 7, 9, 4)), jnp.float32) * 0.1
    want = ops.conv2d(ops.reflect_pad2d(x, 3), w, stride=1, padding=0)
    S = x.shape[1] // 2
    hp = reflect_pad_phases(space_to_depth_phases(x), 3, 9)
    got_p = conv2d_phase_to_phase(hp, w, padding=3)[:, 2 : 2 + S, 2 : 2 + S]
    got = depth_to_space_phases(got_p, x.shape[1], x.shape[2], 4)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), rtol=1e-5, atol=1e-5)
    # crop=2 folds that [2:2+S] halo crop into the conv's padding — same
    # values, one conv, no padded-grid materialization
    got_c = conv2d_phase_to_phase(hp, w, padding=3, crop=2)
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(got_c))


@pytest.mark.parametrize("k,pad,crop", [(7, 3, 0), (3, 1, 0), (5, 2, 0), (7, 3, 2)])
def test_conv2d_phase_to_phase_split_matches_dense(rng, k, pad, crop, monkeypatch):
    """FLOODGAN_P2P_SPLIT (four per-input-phase convs at exact ceil(k/2)
    extents — no embedded-zero MACs) must equal the dense embedded conv:
    forward, d-input and d-weight."""
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 5)), jnp.float32)
    xp = space_to_depth_phases(x)
    if crop:
        xp = reflect_pad_phases(xp, pad, 5)
    w = jnp.asarray(rng.standard_normal((k, k, 5, 8)), jnp.float32) * 0.2
    b = jnp.asarray(rng.standard_normal((8,)), jnp.float32)
    g = None

    def run(xp_, w_):
        return conv2d_phase_to_phase(xp_, w_, padding=pad, b=b, crop=crop)

    want = run(xp, w)
    g = jnp.asarray(rng.standard_normal(want.shape), jnp.float32)
    dx_w, dw_w = jax.grad(lambda a, ww: jnp.sum(run(a, ww) * g), (0, 1))(xp, w)

    monkeypatch.setenv("FLOODGAN_P2P_SPLIT", "1")
    got = run(xp, w)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    dx_g, dw_g = jax.grad(lambda a, ww: jnp.sum(run(a, ww) * g), (0, 1))(xp, w)
    np.testing.assert_allclose(np.asarray(dx_g), np.asarray(dx_w), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw_g), np.asarray(dw_w), atol=2e-3)


def test_reflect_conv_phases_composite_split_matches_dense(rng, monkeypatch):
    """The composite's interior conv under FLOODGAN_P2P_SPLIT equals the
    dense composite (the halo bands keep the dense kernel either way)."""
    from floodgan_tpu.ops.nn_ops import _reflect_conv_phases_composite

    cin, S = 5, 12
    x = jnp.asarray(rng.standard_normal((2, 2 * S, 2 * S, cin)), jnp.float32) * 0.5
    xp = space_to_depth_phases(x)
    w = jnp.asarray(rng.standard_normal((7, 7, cin, 6)), jnp.float32) * 0.1
    b = jnp.asarray(rng.standard_normal((6,)), jnp.float32)
    want = _reflect_conv_phases_composite(xp, w, b, 3, cin)
    g = jnp.asarray(rng.standard_normal(want.shape), jnp.float32)
    dx_w, dw_w = jax.grad(
        lambda a, ww: jnp.sum(_reflect_conv_phases_composite(a, ww, b, 3, cin) * g),
        (0, 1),
    )(xp, w)
    monkeypatch.setenv("FLOODGAN_P2P_SPLIT", "1")
    got = _reflect_conv_phases_composite(xp, w, b, 3, cin)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    dx_g, dw_g = jax.grad(
        lambda a, ww: jnp.sum(_reflect_conv_phases_composite(a, ww, b, 3, cin) * g),
        (0, 1),
    )(xp, w)
    np.testing.assert_allclose(np.asarray(dx_g), np.asarray(dx_w), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw_g), np.asarray(dw_w), atol=2e-3)


def test_conv2d_s2_phase_input_k3(rng):
    """The generalized stride-2 phase-input lowering at k=3 (the encoder's
    second conv) matches the image-space conv."""
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 6)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 8)), jnp.float32) * 0.2
    b = jnp.asarray(rng.standard_normal((8,)), jnp.float32)
    want = ops.conv2d(x, w, b, stride=2, padding=1)
    got = conv2d_s2_phase_input(space_to_depth_phases(x), w, (6,), b)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), rtol=1e-5, atol=1e-5)


def test_conv2d_s2_phase_input_k4_unchanged(rng):
    """k=4 (PatchGAN stem) behavior is pinned across the generalization."""
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 12)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((4, 4, 12, 16)), jnp.float32) * 0.2
    want = ops.conv2d(x, w, stride=2, padding=1)
    got = conv2d_s2_phase_input(space_to_depth_phases(x), w, (12,))
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("relu", [False, True])
def test_instance_norm_act_phases(rng, relu):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 6)), jnp.float32)
    want = space_to_depth_phases(ops.instance_norm_act(x, relu=relu))
    got = instance_norm_act_phases(space_to_depth_phases(x), relu=relu)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), rtol=1e-5, atol=1e-5)


def test_attention_generator_phase_input_equivalence(rng):
    """Full generator: phase_input path == image path with the SAME
    parameters (checkpoint compatibility) at a phase-eligible size."""
    from floodgan_tpu.models import AttentionGenerator

    x = jnp.asarray(rng.standard_normal((1, 256, 256, 9)), jnp.float32) * 0.5
    img_model = AttentionGenerator(input_channels=9)
    params = img_model.init({"params": jax.random.key(0)}, x)
    out_img, mask_img = img_model.apply(params, x)

    phase_model = AttentionGenerator(input_channels=9, phase_input=True)
    out_ph_p, mask_ph_p = phase_model.apply(
        params, space_to_depth_phases(x)
    )
    # phase_input returns full-res output unless phase_output also set
    np.testing.assert_allclose(
        np.asarray(out_img), np.asarray(out_ph_p), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(mask_img), np.asarray(mask_ph_p), rtol=2e-4, atol=2e-5
    )


def test_attention_generator_phase_input_small_fallback(rng):
    """At sizes below phase-fold eligibility the phase_input path must
    still be correct (image-reconstruction fallback)."""
    from floodgan_tpu.models import AttentionGenerator

    x = jnp.asarray(rng.standard_normal((1, 64, 64, 9)), jnp.float32) * 0.5
    img_model = AttentionGenerator(input_channels=9)
    params = img_model.init({"params": jax.random.key(0)}, x)
    out_img, mask_img = img_model.apply(params, x)
    phase_model = AttentionGenerator(input_channels=9, phase_input=True)
    out_ph, mask_ph = phase_model.apply(params, space_to_depth_phases(x))
    np.testing.assert_allclose(
        np.asarray(out_img), np.asarray(out_ph), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(mask_img), np.asarray(mask_ph), rtol=2e-4, atol=2e-5
    )


def test_conv_transpose_phase_out_matches_interleaved(rng):
    """conv_transpose2d_phase_out == s2d(conv_transpose2d) for the model's
    k3 s2 p1 op1 deconvolutions."""
    from floodgan_tpu.ops.nn_ops import conv_transpose2d_phase_out

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 6)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 4)), jnp.float32) * 0.2
    b = jnp.asarray(rng.standard_normal((4,)), jnp.float32)
    want = space_to_depth_phases(
        ops.conv_transpose2d(x, w, b, stride=2, padding=1, output_padding=1)
    )
    got = conv_transpose2d_phase_out(x, w, b, padding=1, output_padding=1)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), rtol=1e-5, atol=1e-6)


def test_attention_generator_phase_head_equivalence(rng, monkeypatch):
    """FLOODGAN_PHASE_HEAD=1 (decoder heads fully in phase space) produces
    the same outputs as the image path with the SAME parameters."""
    from floodgan_tpu.models import AttentionGenerator

    x = jnp.asarray(rng.standard_normal((1, 256, 256, 9)), jnp.float32) * 0.5
    model = AttentionGenerator(input_channels=9)
    params = model.init({"params": jax.random.key(0)}, x)
    out_img, mask_img = model.apply(params, x)

    monkeypatch.setenv("FLOODGAN_PHASE_HEAD", "1")
    out_ph, mask_ph = model.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out_img), np.asarray(out_ph), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(mask_img), np.asarray(mask_ph), rtol=2e-4, atol=2e-5
    )
