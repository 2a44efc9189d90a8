"""Pallas kernel golden tests (interpret mode on CPU) vs the jnp reference
implementations, across the model family's actual shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from floodgan_tpu.ops import pallas_kernels as pk


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pk, "_INTERPRET", True)


@pytest.mark.parametrize("relu,residual", [(False, False), (True, False), (False, True)])
@pytest.mark.parametrize("shape", [(1, 32, 32, 256), (2, 16, 16, 128), (1, 8, 8, 64)])
def test_fused_instance_norm(rng, shape, relu, residual):
    x = jnp.asarray(rng.standard_normal(shape, dtype=np.float32))
    res = jnp.asarray(rng.standard_normal(shape, dtype=np.float32)) if residual else None
    got = pk.fused_instance_norm(x, residual=res, relu=relu)
    want = pk._instance_norm_jnp(x, res, relu, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_instance_norm_bf16(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 128), dtype=np.float32)).astype(jnp.bfloat16)
    got = pk.fused_instance_norm(x, relu=True)
    want = pk._instance_norm_jnp(x, None, True, 1e-5)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )


def test_fused_instance_norm_fallback_path(rng):
    # odd channel count -> jnp fallback, still correct
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 96), dtype=np.float32))
    got = pk.fused_instance_norm(x, relu=True)
    want = pk._instance_norm_jnp(x, None, True, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("hw", [(32, 64), (16, 16)])
def test_attention_compose(rng, hw):
    h, w = hw
    content = jnp.asarray(np.tanh(rng.standard_normal((1, h, w, 27), dtype=np.float32)))
    logits = jnp.asarray(rng.standard_normal((1, h, w, 10), dtype=np.float32))
    rgb = jnp.asarray(rng.standard_normal((1, h, w, 3), dtype=np.float32))
    got_out, got_mask = pk.attention_compose(content, logits, rgb)
    want_out, want_mask = pk._attention_compose_jnp(content, logits, rgb)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_mask), np.asarray(want_mask), atol=1e-6)


def test_attention_compose_matches_model_head(rng):
    """The kernel must reproduce the AttentionGenerator composition exactly
    (softmax -> 9x content*mask + rgb*background)."""
    content = jnp.asarray(np.tanh(rng.standard_normal((2, 8, 8, 27), dtype=np.float32)))
    logits = jnp.asarray(rng.standard_normal((2, 8, 8, 10), dtype=np.float32))
    rgb = jnp.asarray(rng.standard_normal((2, 8, 8, 3), dtype=np.float32))
    out, mask = pk.attention_compose(content, logits, rgb)
    attn = jax.nn.softmax(logits, axis=-1)
    expect = sum(
        content[..., 3 * k : 3 * k + 3] * attn[..., k : k + 1] for k in range(9)
    ) + rgb * attn[..., 9:10]
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mask), np.asarray(attn[..., 9]), atol=1e-6)


def test_fused_instance_norm_grad(rng):
    """Custom-VJP backward kernel vs jnp autodiff."""
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 128), dtype=np.float32))
    res = jnp.asarray(rng.standard_normal((1, 8, 8, 128), dtype=np.float32))

    for relu, residual in [(False, None), (True, None), (False, res)]:
        def f_pallas(x_, r_=residual):
            return jnp.sum(jnp.sin(pk.fused_instance_norm(x_, residual=r_, relu=relu)))

        def f_jnp(x_, r_=residual):
            return jnp.sum(jnp.sin(pk._instance_norm_jnp(x_, r_, relu, 1e-5)))

        g1 = jax.grad(f_pallas)(x)
        g2 = jax.grad(f_jnp)(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)

    # residual grad passthrough
    def f_res(r_):
        return jnp.sum(pk.fused_instance_norm(x, residual=r_) * 2.0)

    gres = jax.grad(f_res)(res)
    np.testing.assert_allclose(np.asarray(gres), 2.0, atol=1e-6)


def test_attention_compose_grad(rng):
    content = jnp.asarray(np.tanh(rng.standard_normal((1, 8, 8, 27), dtype=np.float32)))
    logits = jnp.asarray(rng.standard_normal((1, 8, 8, 10), dtype=np.float32))
    rgb = jnp.asarray(rng.standard_normal((1, 8, 8, 3), dtype=np.float32))

    def f(fn):
        def g(c, l, r):
            out, mask = fn(c, l, r)
            return jnp.sum(out * out) + jnp.sum(jnp.cos(mask))
        return g

    g1 = jax.grad(f(pk.attention_compose), argnums=(0, 1, 2))(content, logits, rgb)
    g2 = jax.grad(f(pk._attention_compose_jnp), argnums=(0, 1, 2))(content, logits, rgb)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_instance_norm_multi_tile(rng):
    """hw > tile: exercises the two-phase stats/apply grid."""
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 256), dtype=np.float32))
    res = jnp.asarray(rng.standard_normal((1, 64, 64, 256), dtype=np.float32))
    got = pk.fused_instance_norm(x, residual=res, relu=False)
    want = pk._instance_norm_jnp(x, res, False, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    def f(fn):
        def g(x_):
            return jnp.sum(jnp.sin(fn(x_)))
        return g

    g1 = jax.grad(f(lambda x_: pk.fused_instance_norm(x_, relu=True)))(x)
    g2 = jax.grad(f(lambda x_: pk._instance_norm_jnp(x_, None, True, 1e-5)))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_leaky_slope_variant(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 128), dtype=np.float32))
    got = pk.fused_instance_norm(x, relu=True, negative_slope=0.2)
    want = pk._instance_norm_jnp(x, None, True, 1e-5, 0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
