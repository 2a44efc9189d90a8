"""Hand-derived VJPs for the normalisation/padding chains.

Autodiff of the instance/batch-norm formulas builds the backward out of
the forward's pieces: d(mean), d(E[x^2]), d(rsqrt) chains with f32
converts between them.  On the 512^2 batch-8 train step those chains
profiled at ~23 ms (15%) of the step — mostly HBM reads: every normed
tensor is touched ~3x forward+backward (BENCH_NOTES round 2, per-op
trace).  The closed-form gradients below cut the backward to its minimum
information flow:

  IN:  dx = inv * (g~ - mean(g~) - yhat * mean(g~ * yhat)),
       g~ = g masked by the activation, yhat = (x - mean) * inv

(exact, including the eps inside ``inv`` — the same identity the Pallas
backward kernel in ops/pallas_kernels.py implements), with (mean, inv)
saved from the forward so the backward reads exactly (x, g) in one
fused reduction pass plus one fused elementwise pass.  BatchNorm gets the
same treatment with (N, H, W) statistics and closed-form scale/bias
grads.  Reflect-pad's transpose is written as interior-slice plus
two border-row adds per axis instead of autodiff's concat/rev transpose
graph.

Forward numerics are IDENTICAL to the plain-jnp paths (same op order,
same f32-statistics / bf16-arithmetic policy — see
core.flags.norm_arith_bf16); backward numerics are the same math with the
same precision policy, pinned against autodiff in
tests/test_fused_grads.py.  FLOODGAN_CUSTOM_VJP=0 reverts every route.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_EPS = 1e-5


def _arith_bf16(dt) -> bool:
    from floodgan_tpu.core.flags import norm_arith_bf16

    return dt == jnp.bfloat16 and norm_arith_bf16()


def _in_stats(x):
    """f32 per-(N, C) mean and rsqrt(var + eps) over (H, W); E[x^2] form so
    both reductions fuse into one read of x."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    meansq = jnp.mean(x32 * x32, axis=(1, 2), keepdims=True)
    inv = lax.rsqrt(meansq - mean * mean + _EPS)
    return mean, inv


def _in_normalize(x, mean, inv, relu, slope):
    """(x - mean) * inv (+activation) in the policy arithmetic; returns the
    activated yhat."""
    dt = x.dtype
    if _arith_bf16(dt):
        y = (x - mean.astype(dt)) * inv.astype(dt)
        if relu:
            y = jnp.where(y >= 0, y, y * jnp.asarray(slope, dt))
        return y
    y = (x.astype(jnp.float32) - mean) * inv
    if relu:
        y = jnp.where(y >= 0.0, y, y * slope)
    return y.astype(dt)


def _in_bwd_core(x, mean, inv, g, relu, slope):
    """dx for y = act((x - mean) * inv): one fused reduction pass over
    (x, g) and one fused elementwise pass.  Reductions accumulate in f32;
    elementwise arithmetic follows the policy dtype."""
    dt = x.dtype
    if _arith_bf16(dt):
        yhat = (x - mean.astype(dt)) * inv.astype(dt)
        if relu:
            mask = jnp.where(yhat >= 0, jnp.asarray(1, dt), jnp.asarray(slope, dt))
            g = g * mask
        g32 = g.astype(jnp.float32)
        m1 = jnp.mean(g32, axis=(1, 2), keepdims=True)
        m2 = jnp.mean(g32 * yhat.astype(jnp.float32), axis=(1, 2), keepdims=True)
        return (g - m1.astype(dt) - yhat * m2.astype(dt)) * inv.astype(dt)
    x32 = x.astype(jnp.float32)
    yhat = (x32 - mean) * inv
    g32 = g.astype(jnp.float32)
    if relu:
        g32 = g32 * jnp.where(yhat >= 0.0, 1.0, slope)
    m1 = jnp.mean(g32, axis=(1, 2), keepdims=True)
    m2 = jnp.mean(g32 * yhat, axis=(1, 2), keepdims=True)
    return (inv * (g32 - m1 - yhat * m2)).astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def in_act(x, relu: bool, slope: float):
    """InstanceNorm(+activation) with the closed-form backward."""
    mean, inv = _in_stats(x)
    return _in_normalize(x, mean, inv, relu, slope)


def _in_act_fwd(x, relu, slope):
    mean, inv = _in_stats(x)
    return _in_normalize(x, mean, inv, relu, slope), (x, mean, inv)


def _in_act_bwd(relu, slope, res, g):
    x, mean, inv = res
    return (_in_bwd_core(x, mean, inv, g, relu, slope),)


in_act.defvjp(_in_act_fwd, _in_act_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def in_act_res(x, residual, relu: bool, slope: float):
    """InstanceNorm(+activation) + residual (the trunk block tail).  The
    residual add is a gradient passthrough, so it rides the same VJP."""
    mean, inv = _in_stats(x)
    return _in_normalize(x, mean, inv, relu, slope) + residual


def _in_act_res_fwd(x, residual, relu, slope):
    mean, inv = _in_stats(x)
    return _in_normalize(x, mean, inv, relu, slope) + residual, (x, mean, inv)


def _in_act_res_bwd(relu, slope, res, g):
    x, mean, inv = res
    return _in_bwd_core(x, mean, inv, g, relu, slope), g


in_act_res.defvjp(_in_act_res_fwd, _in_act_res_bwd)


def _bn_stats(x):
    """f32 per-channel mean and rsqrt(var + eps) over (N, H, W)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(0, 1, 2), keepdims=True)
    meansq = jnp.mean(x32 * x32, axis=(0, 1, 2), keepdims=True)
    inv = lax.rsqrt(meansq - mean * mean + _EPS)
    return mean, inv


def _bn_apply(x, scale, bias, mean, inv):
    dt = x.dtype
    if _arith_bf16(dt):
        return (x - mean.astype(dt)) * (inv.astype(dt) * scale.astype(dt)) + bias.astype(dt)
    x32 = x.astype(jnp.float32)
    return (
        (x32 - mean) * inv * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    ).astype(dt)


@jax.custom_vjp
def batch_norm(x, scale, bias):
    """Training-mode BatchNorm2d (batch statistics, biased variance) with
    the closed-form backward.  Same semantics as ops.batch_norm."""
    mean, inv = _bn_stats(x)
    return _bn_apply(x, scale, bias, mean, inv)


def _bn_fwd(x, scale, bias):
    mean, inv = _bn_stats(x)
    return _bn_apply(x, scale, bias, mean, inv), (x, scale, mean, inv)


def _bn_bwd(res, g):
    x, scale, mean, inv = res
    dt = x.dtype
    # scale/bias grads always accumulate in f32 (parameters are f32)
    g32 = g.astype(jnp.float32)
    if _arith_bf16(dt):
        yhat = (x - mean.astype(dt)) * inv.astype(dt)
        yh32 = yhat.astype(jnp.float32)
        dbias = jnp.sum(g32, axis=(0, 1, 2))
        dscale = jnp.sum(g32 * yh32, axis=(0, 1, 2))
        m1 = jnp.mean(g32, axis=(0, 1, 2), keepdims=True)
        m2 = jnp.mean(g32 * yh32, axis=(0, 1, 2), keepdims=True)
        s_inv = (inv * scale.astype(jnp.float32)).astype(dt)
        dx = (g - m1.astype(dt) - yhat * m2.astype(dt)) * s_inv
    else:
        yhat = (x.astype(jnp.float32) - mean) * inv
        dbias = jnp.sum(g32, axis=(0, 1, 2))
        dscale = jnp.sum(g32 * yhat, axis=(0, 1, 2))
        m1 = jnp.mean(g32, axis=(0, 1, 2), keepdims=True)
        m2 = jnp.mean(g32 * yhat, axis=(0, 1, 2), keepdims=True)
        dx = (inv * scale.astype(jnp.float32) * (g32 - m1 - yhat * m2)).astype(dt)
    return dx, dscale.astype(scale.dtype), dbias.astype(scale.dtype)


batch_norm.defvjp(_bn_fwd, _bn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def reflect_pad2d(x, pad: int):
    """jnp.pad(mode='reflect') on (H, W) with a slice+add transpose."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def _rp_fwd(x, pad):
    return (
        jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect"),
        None,
    )


def _rp_axis_adjoint(g, pad, axis):
    """Adjoint of 1-D reflect padding along ``axis``: interior slice plus
    the two reflected border blocks added at offsets 1..pad (rows h < pad
    mirror to pad - h; rows h >= H + pad mirror to 2H - 2 + pad - h)."""
    n = g.shape[axis] - 2 * pad

    def slc(a, b):
        idx = [slice(None)] * g.ndim
        idx[axis] = slice(a, b)
        return tuple(idx)

    core = g[slc(pad, pad + n)]
    lo = jnp.flip(g[slc(0, pad)], axis=axis)
    hi = jnp.flip(g[slc(n + pad, n + 2 * pad)], axis=axis)
    core = core.at[slc(1, pad + 1)].add(lo)
    return core.at[slc(n - pad - 1, n - 1)].add(hi)


def _rp_bwd(pad, _, g):
    return (_rp_axis_adjoint(_rp_axis_adjoint(g, pad, 1), pad, 2),)


reflect_pad2d.defvjp(_rp_fwd, _rp_bwd)
