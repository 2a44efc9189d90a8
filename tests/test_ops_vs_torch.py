"""Golden tests: floodgan_tpu ops vs CPU torch layers.

These pin the behavioral contract of every primitive the architectures use
(reference models/model_architectures.py) by comparing against torch with
identical weights.  NHWC<->NCHW and HWIO<->OIHW mapping happens here.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from floodgan_tpu import ops
from floodgan_tpu.ops.nn_ops import pad_to_match
from floodgan_tpu.ops.resize import resize_bicubic_antialias, shorter_edge_size


def t2j_nchw(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def j2n_nhwc(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


def assert_close(jax_nhwc, torch_nchw, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(
        j2n_nhwc(jax_nhwc), torch_nchw.detach().numpy(), atol=atol, rtol=rtol
    )


@pytest.mark.parametrize(
    "cin,cout,k,s,p,bias",
    [(3, 64, 4, 2, 1, True), (64, 128, 3, 2, 1, True), (9, 64, 7, 1, 0, True), (256, 256, 3, 1, 0, False)],
)
def test_conv2d(rng, cin, cout, k, s, p, bias):
    x = rng.standard_normal((2, cin, 16, 16), dtype=np.float32)
    conv = torch.nn.Conv2d(cin, cout, k, s, p, bias=bias)
    ref = conv(torch.from_numpy(x))
    w = jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0))
    b = jnp.asarray(conv.bias.detach().numpy()) if bias else None
    out = ops.conv2d(t2j_nchw(torch.from_numpy(x)), w, b, stride=s, padding=p)
    assert_close(out, ref, atol=2e-5)


@pytest.mark.parametrize(
    "cin,cout,k,s,p,op,bias",
    [
        (128, 64, 4, 2, 1, 0, True),   # pix2pix up (outermost has bias)
        (512, 512, 4, 2, 1, 0, False),  # pix2pix up (inner, no bias)
        (256, 128, 3, 2, 1, 1, True),   # cyclegan/attention up
        (1024, 512, 2, 2, 0, 0, True),  # segmentation U-Net up
    ],
)
def test_conv_transpose2d(rng, cin, cout, k, s, p, op, bias):
    x = rng.standard_normal((2, cin, 8, 8), dtype=np.float32)
    conv = torch.nn.ConvTranspose2d(cin, cout, k, s, p, output_padding=op, bias=bias)
    ref = conv(torch.from_numpy(x))
    w = jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 0, 1))
    b = jnp.asarray(conv.bias.detach().numpy()) if bias else None
    out = ops.conv_transpose2d(
        t2j_nchw(torch.from_numpy(x)), w, b, stride=s, padding=p, output_padding=op
    )
    assert out.shape[1] == ref.shape[2] and out.shape[2] == ref.shape[3]
    assert_close(out, ref, atol=2e-5)


def test_batch_norm_train_mode(rng):
    x = rng.standard_normal((1, 32, 8, 8), dtype=np.float32)  # batch 1: the parity case
    bn = torch.nn.BatchNorm2d(32)
    with torch.no_grad():
        bn.weight.normal_(1.0, 0.02)
        bn.bias.zero_()
    bn.train()
    ref = bn(torch.from_numpy(x))
    out = ops.batch_norm(
        t2j_nchw(torch.from_numpy(x)),
        jnp.asarray(bn.weight.detach().numpy()),
        jnp.asarray(bn.bias.detach().numpy()),
    )
    assert_close(out, ref, atol=1e-4)


def test_instance_norm(rng):
    x = rng.standard_normal((2, 64, 8, 8), dtype=np.float32)
    inorm = torch.nn.InstanceNorm2d(64)  # reference default: affine=False
    ref = inorm(torch.from_numpy(x))
    out = ops.instance_norm(t2j_nchw(torch.from_numpy(x)))
    assert_close(out, ref, atol=1e-4)


def test_reflect_pad(rng):
    x = rng.standard_normal((2, 3, 8, 8), dtype=np.float32)
    ref = TF.pad(torch.from_numpy(x), (3, 3, 3, 3), "reflect")
    out = ops.reflect_pad2d(t2j_nchw(torch.from_numpy(x)), 3)
    assert_close(out, ref)


def test_leaky_relu(rng):
    x = rng.standard_normal((4, 7), dtype=np.float32)
    ref = TF.leaky_relu(torch.from_numpy(x), 0.2)
    out = ops.leaky_relu(jnp.asarray(x), 0.2)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-6)


def test_max_pool(rng):
    x = rng.standard_normal((2, 16, 9, 9), dtype=np.float32)
    ref = torch.nn.MaxPool2d(2)(torch.from_numpy(x))
    out = ops.max_pool2d(t2j_nchw(torch.from_numpy(x)), 2)
    assert_close(out, ref)


def test_pad_to_match(rng):
    x = rng.standard_normal((1, 8, 5, 5), dtype=np.float32)
    ref = TF.pad(torch.from_numpy(x), [1, 2, 1, 2])
    out = pad_to_match(t2j_nchw(torch.from_numpy(x)), 8, 8)
    assert_close(out, ref)


@pytest.mark.parametrize("in_hw,out_hw", [((64, 64), (32, 32)), ((50, 50), (32, 32)), ((16, 16), (32, 32)), ((40, 30), (20, 15))])
def test_resize_bicubic_antialias(rng, in_hw, out_hw):
    x = rng.random((2, 3, *in_hw), dtype=np.float32)
    ref = TF.interpolate(
        torch.from_numpy(x), size=out_hw, mode="bicubic", antialias=True
    )
    out = resize_bicubic_antialias(t2j_nchw(torch.from_numpy(x)), *out_hw)
    assert_close(out, ref, atol=1e-4)


def test_shorter_edge_size():
    assert shorter_edge_size(1024, 1024, 512) == (512, 512)
    assert shorter_edge_size(480, 640, 256) == (256, 341)
    assert shorter_edge_size(640, 480, 256) == (341, 256)


def test_dropout_scaling():
    x = jnp.ones((1000, 100))
    out = ops.dropout(x, 0.5, jax.random.key(0))
    vals = np.unique(np.asarray(out))
    assert set(np.round(vals, 5)) <= {0.0, 2.0}
    assert abs(float(out.mean()) - 1.0) < 0.05


@pytest.mark.parametrize(
    "k,s,p,op,hin",
    [(4, 2, 1, 0, 8), (3, 2, 1, 1, 8), (2, 2, 0, 0, 8), (4, 2, 1, 0, 7), (3, 2, 1, 1, 5)],
)
def test_conv_transpose_subpixel_equals_dilated(rng, k, s, p, op, hin):
    """The subpixel (phase-decomposed) lowering must match the dilated
    formulation (and therefore torch) for every reference convT config."""
    x = jnp.asarray(rng.standard_normal((2, hin, hin, 6), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((k, k, 6, 5), dtype=np.float32))
    a = ops.conv_transpose2d(x, w, stride=s, padding=p, output_padding=op, method="dilated")
    b = ops.conv_transpose2d(x, w, stride=s, padding=p, output_padding=op, method="subpixel")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize(
    "shape,kern,pad",
    [
        ((2, 134, 134, 16), (7, 7, 16, 27), 0),   # content head (scaled down)
        ((2, 128, 128, 16), (1, 1, 16, 10), 0),   # attention 1x1 head
        ((2, 134, 134, 16), (7, 7, 16, 3), 0),    # RGB head
        ((2, 128, 128, 16), (3, 3, 16, 4), 1),    # padded odd-kernel case
    ],
)
def test_conv2d_phasefold_matches_direct(rng, shape, kern, pad):
    """The phase-fold lowering (2x2 space-to-depth with output phases folded
    into channels) is the same convolution as the direct lowering."""
    from floodgan_tpu.ops.nn_ops import (
        _conv2d_phasefold,
        _phasefold_eligible,
    )
    from jax import lax
    from floodgan_tpu.ops.nn_ops import DIMSPEC

    x = jnp.asarray(rng.standard_normal(shape, dtype=np.float32))
    w = jnp.asarray(rng.standard_normal(kern, dtype=np.float32) * 0.1)
    assert _phasefold_eligible(x, w, 1, pad)
    direct = lax.conv_general_dilated(
        x, w, (1, 1), ((pad, pad), (pad, pad)), dimension_numbers=DIMSPEC
    )
    folded = jax.jit(lambda x, w: _conv2d_phasefold(x, w, pad))(x, w)
    assert folded.shape == direct.shape
    np.testing.assert_allclose(np.asarray(folded), np.asarray(direct),
                               atol=2e-4, rtol=2e-4)


def test_conv2d_phasefold_ineligible_cases(rng):
    from floodgan_tpu.ops.nn_ops import _phasefold_eligible

    w27 = jnp.zeros((7, 7, 16, 27))
    x = jnp.zeros((1, 134, 134, 16))
    assert _phasefold_eligible(x, w27, 1, 0)
    assert not _phasefold_eligible(x, w27, 2, 0)            # strided
    assert not _phasefold_eligible(x, jnp.zeros((7, 7, 16, 64)), 1, 0)  # wide out
    assert not _phasefold_eligible(jnp.zeros((1, 133, 133, 16)), w27, 1, 0)  # odd out
    assert not _phasefold_eligible(jnp.zeros((1, 70, 70, 16)), w27, 1, 0)   # small


def test_conv2d_phasefold_stem_shape(rng):
    """Thin-input stem conv (9->64 7x7) through the phase-fold path."""
    from floodgan_tpu.ops.nn_ops import _conv2d_phasefold, _phasefold_eligible
    from jax import lax
    from floodgan_tpu.ops.nn_ops import DIMSPEC

    x = jnp.asarray(rng.standard_normal((2, 134, 134, 9), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((7, 7, 9, 64), dtype=np.float32) * 0.1)
    assert _phasefold_eligible(x, w, 1, 0)
    direct = lax.conv_general_dilated(x, w, (1, 1), "VALID", dimension_numbers=DIMSPEC)
    folded = jax.jit(lambda x, w: _conv2d_phasefold(x, w, 0))(x, w)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(direct), atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize(
    "shape,kern,pad",
    [
        ((2, 512, 512, 12), (4, 4, 12, 8), 1),   # PatchGAN conv0 shape (thin out for speed)
        ((2, 514, 514, 9), (3, 3, 9, 8), 0),     # odd kernel stride-2
    ],
)
def test_conv2d_phasefold_s2_matches_direct(rng, shape, kern, pad, monkeypatch):
    from floodgan_tpu.ops.nn_ops import _conv2d_phasefold_s2, _phasefold_s2_eligible
    from jax import lax
    from floodgan_tpu.ops.nn_ops import DIMSPEC

    x = jnp.asarray(rng.standard_normal(shape, dtype=np.float32))
    w = jnp.asarray(rng.standard_normal(kern, dtype=np.float32) * 0.1)
    assert not _phasefold_s2_eligible(x, w, 2, pad)  # opt-in only
    monkeypatch.setenv("FLOODGAN_PHASEFOLD_S2", "1")
    assert _phasefold_s2_eligible(x, w, 2, pad)
    direct = lax.conv_general_dilated(
        x, w, (2, 2), ((pad, pad), (pad, pad)), dimension_numbers=DIMSPEC
    )
    folded = jax.jit(lambda x, w: _conv2d_phasefold_s2(x, w, pad))(x, w)
    assert folded.shape == direct.shape, (folded.shape, direct.shape)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(direct), atol=2e-4, rtol=2e-4)
