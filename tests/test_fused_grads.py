"""Closed-form VJPs (ops/fused_grads.py) vs autodiff through the plain
formulas.

Forward values must be IDENTICAL (same op order as the legacy paths);
gradients must agree with autodiff of the same forward — exactly in f32
(the closed form is the same math in the same precision), to bf16
tolerance under the bf16-arithmetic policy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from floodgan_tpu.ops import fused_grads
from floodgan_tpu.ops.pallas_kernels import _instance_norm_jnp


def _rand(rng, shape, dtype):
    return jnp.asarray(rng.standard_normal(shape), dtype)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize(
    "relu,slope,residual", [(False, 0.0, False), (True, 0.0, False),
                            (True, 0.2, False), (False, 0.0, True),
                            (True, 0.0, True)]
)
def test_in_act_forward_identical(rng, dtype, relu, slope, residual):
    x = _rand(rng, (2, 16, 16, 8), dtype)
    res = _rand(rng, x.shape, dtype) if residual else None
    legacy = _instance_norm_jnp(x, res, relu, 1e-5, slope)
    if residual:
        new = fused_grads.in_act_res(x, res, relu, slope)
    else:
        new = fused_grads.in_act(x, relu, slope)
    np.testing.assert_array_equal(np.asarray(legacy), np.asarray(new))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize(
    "relu,slope,residual", [(False, 0.0, False), (True, 0.0, False),
                            (True, 0.2, False), (False, 0.0, True),
                            (True, 0.0, True)]
)
def test_in_act_grads_vs_autodiff(rng, dtype, relu, slope, residual):
    x = _rand(rng, (2, 16, 16, 8), dtype)
    res = _rand(rng, x.shape, dtype) if residual else None
    cot = _rand(rng, x.shape, dtype)

    def legacy_loss(x, res):
        return jnp.sum(_instance_norm_jnp(x, res, relu, 1e-5, slope).astype(jnp.float32) * cot.astype(jnp.float32))

    def new_loss(x, res):
        if residual:
            y = fused_grads.in_act_res(x, res, relu, slope)
        else:
            y = fused_grads.in_act(x, relu, slope)
        return jnp.sum(y.astype(jnp.float32) * cot.astype(jnp.float32))

    argnums = (0, 1) if residual else (0,)
    g_legacy = jax.grad(legacy_loss, argnums)(x, res)
    g_new = jax.grad(new_loss, argnums)(x, res)
    if dtype == jnp.float32:
        # identical math in identical precision; allow only reassociation-
        # level noise from fusion-order differences
        for a, b in zip(g_legacy, g_new):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
            )
    else:
        for a, b in zip(g_legacy, g_new):
            np.testing.assert_allclose(
                np.asarray(a, dtype=np.float32),
                np.asarray(b, dtype=np.float32),
                rtol=0.05, atol=0.05,
            )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_batch_norm_forward_identical(rng, dtype):
    from floodgan_tpu.ops import nn_ops

    x = _rand(rng, (4, 8, 8, 16), dtype)
    scale = jnp.asarray(1.0 + 0.02 * rng.standard_normal(16), jnp.float32)
    bias = jnp.asarray(0.02 * rng.standard_normal(16), jnp.float32)
    new = fused_grads.batch_norm(x, scale, bias)

    # legacy formula inline (nn_ops.batch_norm now routes to fused_grads)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(x32, axis=(0, 1, 2), keepdims=True)
    inv = jax.lax.rsqrt(var + 1e-5)
    if dtype == jnp.bfloat16:
        legacy = (x - mean.astype(dtype)) * (inv.astype(dtype) * scale.astype(dtype)) + bias.astype(dtype)
    else:
        legacy = ((x32 - mean) * inv * scale + bias).astype(dtype)
    # the closed-form path computes variance in the one-pass E[x^2] form
    # (single fused read of x) where the legacy formula used jnp.var —
    # equal math, different rounding, so tight allclose instead of bitwise
    tol = dict(rtol=1e-5, atol=1e-5) if dtype == jnp.float32 else dict(rtol=0.02, atol=0.02)
    np.testing.assert_allclose(
        np.asarray(legacy, np.float32), np.asarray(new, np.float32), **tol
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_batch_norm_grads_vs_autodiff(rng, dtype):
    x = _rand(rng, (4, 8, 8, 16), dtype)
    scale = jnp.asarray(1.0 + 0.02 * rng.standard_normal(16), jnp.float32)
    bias = jnp.asarray(0.02 * rng.standard_normal(16), jnp.float32)
    cot = _rand(rng, x.shape, dtype)

    def autodiff_loss(x, scale, bias):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(x32, axis=(0, 1, 2), keepdims=True)
        inv = jax.lax.rsqrt(var + 1e-5)
        if dtype == jnp.bfloat16:
            y = (x - mean.astype(dtype)) * (inv.astype(dtype) * scale.astype(dtype)) + bias.astype(dtype)
        else:
            y = ((x32 - mean) * inv * scale + bias).astype(dtype)
        return jnp.sum(y.astype(jnp.float32) * cot.astype(jnp.float32))

    def new_loss(x, scale, bias):
        y = fused_grads.batch_norm(x, scale, bias)
        return jnp.sum(y.astype(jnp.float32) * cot.astype(jnp.float32))

    g_n = jax.grad(new_loss, (0, 1, 2))(x, scale, bias)
    if dtype == jnp.float32:
        g_a = jax.grad(autodiff_loss, (0, 1, 2))(x, scale, bias)
        for a, b in zip(g_a, g_n):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-4, atol=1e-4,
            )
    else:
        # Under the bf16 policy autodiff is NOT the gold standard: it
        # rounds the scale/bias cotangent to bf16 through the
        # scale.astype(bf16) edge, while the closed form accumulates the
        # parameter grads in f32.  Pin against the exact f32 gradient of
        # the same (bf16-valued) inputs instead.
        def exact_loss(x32, scale, bias):
            mean = jnp.mean(x32, axis=(0, 1, 2), keepdims=True)
            var = jnp.var(x32, axis=(0, 1, 2), keepdims=True)
            inv = jax.lax.rsqrt(var + 1e-5)
            y = (x32 - mean) * inv * scale + bias
            return jnp.sum(y * cot.astype(jnp.float32))

        g_e = jax.grad(exact_loss, (0, 1, 2))(x.astype(jnp.float32), scale, bias)
        for a, b in zip(g_e, g_n):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=0.06, atol=0.06,
            )


@pytest.mark.parametrize("pad", [1, 2, 3])
def test_reflect_pad_forward_and_adjoint(rng, pad):
    x = _rand(rng, (2, 9, 11, 3), jnp.float32)
    new = fused_grads.reflect_pad2d(x, pad)
    ref = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    np.testing.assert_array_equal(np.asarray(new), np.asarray(ref))

    cot = _rand(rng, ref.shape, jnp.float32)

    def loss_ref(x):
        return jnp.sum(
            jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect") * cot
        )

    def loss_new(x):
        return jnp.sum(fused_grads.reflect_pad2d(x, pad) * cot)

    g_ref = jax.grad(loss_ref)(x)
    g_new = jax.grad(loss_new)(x)
    # adjoint of the same linear map: exact agreement
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_new), rtol=1e-6, atol=1e-6)


def test_trunk_step_equivalence_with_and_without_custom_vjp(rng, monkeypatch):
    """End-to-end gradient through a trunk-like composition (pad-conv-IN
    chains with residuals) agrees between the custom-VJP routes and the
    legacy autodiff routes in f32."""
    from floodgan_tpu import ops

    w1 = _rand(rng, (3, 3, 8, 8), jnp.float32) * 0.1
    w2 = _rand(rng, (3, 3, 8, 8), jnp.float32) * 0.1
    x = _rand(rng, (2, 16, 16, 8), jnp.float32)

    def block(x, w1, w2):
        y = ops.reflect_pad2d(x, 1)
        y = ops.conv2d(y, w1)
        y = ops.instance_norm_act(y, relu=True)
        y = ops.reflect_pad2d(y, 1)
        y = ops.conv2d(y, w2)
        return ops.instance_norm_act(y, residual=x)

    def loss(w1, w2):
        return jnp.sum(jnp.square(block(x, w1, w2)))

    monkeypatch.setenv("FLOODGAN_CUSTOM_VJP", "0")
    v0, g0 = jax.value_and_grad(loss, (0, 1))(w1, w2)
    monkeypatch.setenv("FLOODGAN_CUSTOM_VJP", "1")
    v1, g1 = jax.value_and_grad(loss, (0, 1))(w1, w2)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for a, b in zip(g0, g1):
        # f32 reassociation noise only (different reduction/fusion order)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("relu,slope", [(False, 0.0), (True, 0.0), (True, 0.2)])
def test_in_act_phases_matches_legacy(rng, dtype, relu, slope, monkeypatch):
    """Phase-layout IN custom VJP: forward identical to the legacy
    nn_ops path, grads == autodiff of that path."""
    from floodgan_tpu.ops import nn_ops

    x = _rand(rng, (2, 12, 12, 4 * 5), dtype)
    cot = _rand(rng, x.shape, dtype)

    monkeypatch.setenv("FLOODGAN_CUSTOM_VJP", "0")
    legacy = nn_ops.instance_norm_act_phases(x, relu, slope)
    glegacy = jax.grad(
        lambda x: jnp.sum(
            nn_ops.instance_norm_act_phases(x, relu, slope).astype(jnp.float32)
            * cot.astype(jnp.float32)
        )
    )(x)

    new = fused_grads.in_act_phases(x, 5, relu, slope)
    gnew = jax.grad(
        lambda x: jnp.sum(
            fused_grads.in_act_phases(x, 5, relu, slope).astype(jnp.float32)
            * cot.astype(jnp.float32)
        )
    )(x)
    np.testing.assert_array_equal(np.asarray(legacy), np.asarray(new))
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(glegacy, np.float32), np.asarray(gnew, np.float32),
        rtol=tol, atol=tol,
    )


@pytest.mark.parametrize("pad", [1, 3])
def test_reflect_pad_phases_matches_legacy(rng, pad, monkeypatch):
    """4D-slice reflect_pad_phases + hand adjoint vs the 6D-view legacy
    construction: forward and gradient both exact (pure data movement)."""
    from floodgan_tpu.ops import nn_ops

    C = 3
    x = _rand(rng, (2, 10, 10, 4 * C), jnp.float32)
    cot = _rand(rng, (2, 10 + pad + 1, 10 + pad + 1, 4 * C), jnp.float32)

    monkeypatch.setenv("FLOODGAN_CUSTOM_VJP", "0")
    legacy = nn_ops.reflect_pad_phases(x, pad, C)
    glegacy = jax.grad(
        lambda x: jnp.sum(nn_ops.reflect_pad_phases(x, pad, C) * cot)
    )(x)

    new = fused_grads.reflect_pad_phases(x, pad, C)
    gnew = jax.grad(lambda x: jnp.sum(fused_grads.reflect_pad_phases(x, pad, C) * cot))(x)
    np.testing.assert_array_equal(np.asarray(legacy), np.asarray(new))
    np.testing.assert_array_equal(np.asarray(glegacy), np.asarray(gnew))


@pytest.mark.parametrize("pad", [1, 2, 3])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_reflect_conv2d_matches_pad_plus_conv(rng, pad, dtype):
    """Composite reflect-pad+conv custom VJP: forward identical to the
    pad-then-conv pair, all three grads == autodiff of that pair."""
    from jax import lax

    k = 2 * pad + 1
    x = _rand(rng, (2, 12, 14, 5), dtype)
    w = _rand(rng, (k, k, 5, 6), dtype) * 0.2
    b = _rand(rng, (6,), dtype)
    cot = _rand(rng, (2, 12, 14, 6), dtype)

    def legacy(x, w, b):
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
        out = lax.conv_general_dilated(
            xp, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return out + b

    def loss(f):
        return lambda x, w, b: jnp.sum(
            f(x, w, b).astype(jnp.float32) * cot.astype(jnp.float32)
        )

    want = legacy(x, w, b)
    got = fused_grads.reflect_conv2d(x, w, b, pad)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))

    gl = jax.grad(loss(legacy), argnums=(0, 1, 2))(x, w, b)
    gn = jax.grad(
        loss(lambda x, w, b: fused_grads.reflect_conv2d(x, w, b, pad)),
        argnums=(0, 1, 2),
    )(x, w, b)
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    for a, c in zip(gl[:2], gn[:2]):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(c, np.float32), rtol=tol, atol=tol
        )
    # bias grad: the composite accumulates in f32 while bf16 autodiff of
    # the legacy pair sums 336 bf16 terms — compare against the f32 truth
    db_true = np.sum(np.asarray(cot, np.float32), axis=(0, 1, 2))
    np.testing.assert_allclose(np.asarray(gn[2], np.float32), db_true, rtol=tol, atol=tol)


@pytest.mark.parametrize("mode", ["fwd", "all"])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_mxu_stats_matches_vpu_path(rng, dtype, mode, monkeypatch):
    """FLOODGAN_MXU_STATS (sum-of-squares / m2 reduces as Gram-matmul
    diagonals with f32 accumulation) must match the VPU convert+reduce
    path to reassociation tolerance — forward and gradients, image-space
    and phase-major IN."""
    x = _rand(rng, (2, 16, 16, 8), dtype)
    cot = _rand(rng, x.shape, dtype)

    def loss(x):
        return jnp.sum(
            fused_grads.in_act(x, True, 0.0).astype(jnp.float32)
            * cot.astype(jnp.float32)
        )

    def loss_p(x):
        return jnp.sum(
            fused_grads.in_act_phases(x, 2, True, 0.0).astype(jnp.float32)
            * cot.astype(jnp.float32)
        )

    monkeypatch.setenv("FLOODGAN_MXU_STATS", "0")
    want, gw = jax.value_and_grad(loss)(x)
    want_p, gw_p = jax.value_and_grad(loss_p)(x)
    monkeypatch.setenv("FLOODGAN_MXU_STATS", mode)
    got, gm = jax.value_and_grad(loss)(x)
    got_p, gm_p = jax.value_and_grad(loss_p)(x)

    tol = dict(rtol=1e-5, atol=1e-5) if dtype == jnp.float32 else dict(rtol=0.02, atol=0.02)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    np.testing.assert_allclose(float(got_p), float(want_p), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gm, np.float32), np.asarray(gw, np.float32), **tol
    )
    np.testing.assert_allclose(
        np.asarray(gm_p, np.float32), np.asarray(gw_p, np.float32), **tol
    )
