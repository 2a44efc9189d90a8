"""Pallas TPU kernels for the model family's fusion-bound ops.

The FLOPs in this family live in XLA's MXU convolutions; what Pallas buys
is *fusion* — collapsing the elementwise/reduction chains between convs
into single VMEM-resident passes instead of separate HBM round trips:

- ``fused_instance_norm``: InstanceNorm (+ optional relu/leaky activation,
  + optional residual add) in one kernel.  Used around every conv of the
  CycleGAN/Attention generators (27 IN sites per generator forward).
  HW is tiled with a two-phase sequential grid (statistics pass, then
  apply pass) and per-(channel-tile) scratch accumulators, so the kernel
  covers every activation shape in the family (up to 512^2 x 256) within
  a fixed VMEM budget.
- ``attention_compose``: the AttentionGAN output head — softmax over the
  10 mask channels, 9x content*mask multiply-accumulate, background blend
  with the input RGB, plus the background-mask output — one pass over the
  39-channel decoder output instead of ~6 XLA fusions
  (reference model_architectures.py:225-258).

Training differentiates through both ops, so each carries a custom VJP
whose backward is itself a fused Pallas kernel (re-computing the cheap
statistics instead of saving normalized activations — memory-light
residuals).  All kernels keep f32 statistics regardless of activation
dtype and are golden-tested (values and gradients) against the jnp
reference implementations in tests/test_pallas.py (interpret mode on CPU;
compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False   # flipped by tests on CPU
_HW_TILE = 2048      # rows per VMEM block (x lanes x 4B ~ 1MB per buffer)


def _pick_tiles(hw: int, c: int):
    tile = min(hw, _HW_TILE)
    ct = min(c, 128)
    if hw % tile or c % ct:
        return None
    return tile, ct


# ============================================================ instance norm

def _in_fwd_kernel(x_ref, res_ref, out_ref, acc_ref, *, eps, relu,
                   negative_slope, has_residual, hw, n_tiles):
    """Two-phase grid over (N, C/ct, 2*n_tiles): phase A accumulates
    sum/sumsq per channel tile; phase B normalizes + activation
    (+ residual) and writes."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[0].astype(jnp.float32)  # (tile, ct)

    @pl.when(i < n_tiles)
    def _():
        acc_ref[0, :] += jnp.sum(x, axis=0)
        acc_ref[1, :] += jnp.sum(x * x, axis=0)

    @pl.when(i >= n_tiles)
    def _():
        mean = acc_ref[0, :] / hw
        var = acc_ref[1, :] / hw - mean * mean
        inv = jax.lax.rsqrt(var + eps)
        y = (x - mean[None, :]) * inv[None, :]
        if relu:
            y = jnp.where(y >= 0.0, y, y * negative_slope)
        if has_residual:
            y = y + res_ref[0].astype(jnp.float32)
        out_ref[0] = y.astype(out_ref.dtype)


def _in_pallas_fwd_call(x, residual, relu, eps, negative_slope=0.0):
    n, h, w, c = x.shape
    hw = h * w
    tile, ct = _pick_tiles(hw, c)
    n_tiles = hw // tile
    x3 = x.reshape(n, hw, c)
    res3 = residual.reshape(n, hw, c) if residual is not None else x3
    spec = pl.BlockSpec(
        (1, tile, ct), lambda b, j, i: (b, i % n_tiles, j), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _in_fwd_kernel, eps=eps, relu=relu, negative_slope=negative_slope,
            has_residual=residual is not None, hw=float(hw), n_tiles=n_tiles,
        ),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        grid=(n, c // ct, 2 * n_tiles),
        in_specs=[spec, spec],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((2, ct), jnp.float32)],
        interpret=_INTERPRET,
    )(x3, res3)
    return out.reshape(n, h, w, c)


def _in_bwd_kernel(x_ref, g_ref, dx_ref, acc_ref, *, eps, relu,
                   negative_slope, hw, n_tiles):
    """Three-phase backward: (A) x stats; (B) masked-grad stats
    mean(g~), mean(g~*y); (C) dx = inv*(g~ - mean(g~) - y*mean(g~*y))."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[0].astype(jnp.float32)

    @pl.when(i < n_tiles)
    def _():
        acc_ref[0, :] += jnp.sum(x, axis=0)
        acc_ref[1, :] += jnp.sum(x * x, axis=0)

    @pl.when((i >= n_tiles) & (i < 2 * n_tiles))
    def _():
        mean = acc_ref[0, :] / hw
        var = acc_ref[1, :] / hw - mean * mean
        inv = jax.lax.rsqrt(var + eps)
        y = (x - mean[None, :]) * inv[None, :]
        g = g_ref[0].astype(jnp.float32)
        if relu:
            g = g * jnp.where(y >= 0.0, 1.0, negative_slope)
        acc_ref[2, :] += jnp.sum(g, axis=0)
        acc_ref[3, :] += jnp.sum(g * y, axis=0)

    @pl.when(i >= 2 * n_tiles)
    def _():
        mean = acc_ref[0, :] / hw
        var = acc_ref[1, :] / hw - mean * mean
        inv = jax.lax.rsqrt(var + eps)
        y = (x - mean[None, :]) * inv[None, :]
        g = g_ref[0].astype(jnp.float32)
        if relu:
            g = g * jnp.where(y >= 0.0, 1.0, negative_slope)
        mg = acc_ref[2, :] / hw
        mgy = acc_ref[3, :] / hw
        dx = inv[None, :] * (g - mg[None, :] - y * mgy[None, :])
        dx_ref[0] = dx.astype(dx_ref.dtype)


def _in_pallas_bwd_call(x, g, relu, eps, negative_slope=0.0):
    n, h, w, c = x.shape
    hw = h * w
    tile, ct = _pick_tiles(hw, c)
    n_tiles = hw // tile
    spec = pl.BlockSpec(
        (1, tile, ct), lambda b, j, i: (b, i % n_tiles, j), memory_space=pltpu.VMEM
    )
    dx = pl.pallas_call(
        functools.partial(
            _in_bwd_kernel, eps=eps, relu=relu, negative_slope=negative_slope,
            hw=float(hw), n_tiles=n_tiles,
        ),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        grid=(n, c // ct, 3 * n_tiles),
        in_specs=[spec, spec],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((4, ct), jnp.float32)],
        interpret=_INTERPRET,
    )(x.reshape(n, hw, c), g.reshape(n, hw, c))
    return dx.reshape(n, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused_in_pallas(x, residual, relu, eps, negative_slope):
    return _in_pallas_fwd_call(x, residual, relu, eps, negative_slope)


def _fused_in_fwd(x, residual, relu, eps, negative_slope):
    return _in_pallas_fwd_call(x, residual, relu, eps, negative_slope), (x,)


def _fused_in_bwd(relu, eps, negative_slope, res, g):
    (x,) = res
    dx = _in_pallas_bwd_call(x, g, relu, eps, negative_slope)
    return dx, g  # residual add is a passthrough


_fused_in_pallas.defvjp(_fused_in_fwd, _fused_in_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _fused_in_no_res(x, relu, eps, negative_slope):
    return _in_pallas_fwd_call(x, None, relu, eps, negative_slope)


def _fused_in_nr_fwd(x, relu, eps, negative_slope):
    return _in_pallas_fwd_call(x, None, relu, eps, negative_slope), (x,)


def _fused_in_nr_bwd(relu, eps, negative_slope, res, g):
    (x,) = res
    return (_in_pallas_bwd_call(x, g, relu, eps, negative_slope),)


_fused_in_no_res.defvjp(_fused_in_nr_fwd, _fused_in_nr_bwd)


def fused_instance_norm(
    x: jax.Array,
    residual: Optional[jax.Array] = None,
    relu: bool = False,
    eps: float = 1e-5,
    negative_slope: float = 0.0,
) -> jax.Array:
    """InstanceNorm2d(+activation)(+residual-add) over NHWC in one Pallas
    pass, differentiable (custom VJP with a fused backward kernel).

    ``relu=True`` applies ``where(y >= 0, y, y * negative_slope)`` — slope 0
    is relu (generator blocks), 0.2 is the PatchGAN leaky-relu.  Models use
    either ``act(IN(x))`` (post-conv activation) or ``IN(x) + residual``
    (block tail); with both, the activation applies before the add.
    """
    if _pick_tiles(x.shape[1] * x.shape[2], x.shape[3]) is None:
        return _instance_norm_jnp(x, residual, relu, eps, negative_slope)
    if residual is None:
        return _fused_in_no_res(x, relu, eps, negative_slope)
    return _fused_in_pallas(x, residual, relu, eps, negative_slope)


def _instance_norm_jnp(x, residual, relu, eps, negative_slope=0.0):
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    meansq = jnp.mean(x32 * x32, axis=(1, 2), keepdims=True)
    var = meansq - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    if dt == jnp.bfloat16 and _norm_arith_bf16():
        # Statistics stay f32 (above); the normalize/activation/residual
        # elementwise chain runs in bf16 — the activations are bf16 on
        # both sides of the norm anyway, so the only loss is the rounding
        # of (x - mean), and the fwd+bwd elementwise passes over the
        # biggest tensors in the step halve their width (profiled 22.6
        # ms/step of convert+reduce/normalize chains at 512^2 batch 8).
        y = (x - mean.astype(dt)) * inv.astype(dt)
        if relu:
            y = jnp.where(y >= 0, y, y * jnp.asarray(negative_slope, dt))
        if residual is not None:
            y = y + residual
        return y
    y = (x32 - mean) * inv
    if relu:
        y = jnp.where(y >= 0.0, y, y * negative_slope)
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return y.astype(dt)


def _norm_arith_bf16() -> bool:
    from floodgan_tpu.core.flags import norm_arith_bf16

    return norm_arith_bf16()


# ======================================================== attention compose

_COMPOSE_TILE = 512  # 5 buffers x (512 x 128 lanes x 4B) stays well in VMEM


def _compose_kernel(content_ref, logits_ref, rgb_ref, out_ref, mask_ref):
    content = content_ref[0].astype(jnp.float32)        # (T, 27)
    logits = logits_ref[0].astype(jnp.float32)          # (T, 10)
    rgb = rgb_ref[0].astype(jnp.float32)                # (T, 3)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)       # (T, 10)
    cols = []
    for ch in range(3):
        acc = rgb[:, ch] * attn[:, 9]
        for k in range(9):
            acc = acc + content[:, 3 * k + ch] * attn[:, k]
        cols.append(acc)
    out_ref[0] = jnp.stack(cols, axis=-1).astype(out_ref.dtype)
    mask_ref[0] = attn[:, 9:10].astype(mask_ref.dtype)


def _compose_specs(tile):
    def spec(c):
        return pl.BlockSpec(
            (1, tile, c), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        )

    return spec


def _compose_fwd_call(content, attn_logits, rgb):
    n, h, w, _ = content.shape
    hw = h * w
    tile = min(hw, _COMPOSE_TILE)
    spec = _compose_specs(tile)
    out, mask = pl.pallas_call(
        _compose_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, hw, 3), content.dtype),
            jax.ShapeDtypeStruct((n, hw, 1), content.dtype),
        ),
        grid=(n, hw // tile),
        in_specs=[spec(27), spec(10), spec(3)],
        out_specs=(spec(3), spec(1)),
        interpret=_INTERPRET,
    )(content.reshape(n, hw, 27), attn_logits.reshape(n, hw, 10), rgb.reshape(n, hw, 3))
    return out.reshape(n, h, w, 3), mask.reshape(n, h, w)


def _compose_bwd_kernel(
    content_ref, logits_ref, rgb_ref, gout_ref, gmask_ref,
    dcontent_ref, dlogits_ref, drgb_ref,
):
    content = content_ref[0].astype(jnp.float32)
    logits = logits_ref[0].astype(jnp.float32)
    rgb = rgb_ref[0].astype(jnp.float32)
    gout = gout_ref[0].astype(jnp.float32)          # (T, 3)
    gmask = gmask_ref[0].astype(jnp.float32)        # (T, 1)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)   # (T, 10)

    dc_cols = []
    da_cols = []
    for k in range(9):
        da_k = jnp.zeros_like(gmask[:, 0])
        for ch in range(3):
            dc_cols.append(gout[:, ch] * attn[:, k])
            da_k = da_k + gout[:, ch] * content[:, 3 * k + ch]
        da_cols.append(da_k)
    da9 = gmask[:, 0]
    for ch in range(3):
        da9 = da9 + gout[:, ch] * rgb[:, ch]
    da_cols.append(da9)
    da = jnp.stack(da_cols, axis=-1)                # (T, 10)
    dlogits = attn * (da - jnp.sum(attn * da, axis=-1, keepdims=True))

    dcontent_ref[0] = jnp.stack(dc_cols, axis=-1).astype(dcontent_ref.dtype)
    dlogits_ref[0] = dlogits.astype(dlogits_ref.dtype)
    drgb_ref[0] = (gout * attn[:, 9:10]).astype(drgb_ref.dtype)


def _compose_bwd_call(content, attn_logits, rgb, gout, gmask):
    n, h, w, _ = content.shape
    hw = h * w
    tile = min(hw, _COMPOSE_TILE)
    spec = _compose_specs(tile)
    dcontent, dlogits, drgb = pl.pallas_call(
        _compose_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, hw, 27), content.dtype),
            jax.ShapeDtypeStruct((n, hw, 10), attn_logits.dtype),
            jax.ShapeDtypeStruct((n, hw, 3), rgb.dtype),
        ),
        grid=(n, hw // tile),
        in_specs=[spec(27), spec(10), spec(3), spec(3), spec(1)],
        out_specs=(spec(27), spec(10), spec(3)),
        interpret=_INTERPRET,
    )(
        content.reshape(n, hw, 27),
        attn_logits.reshape(n, hw, 10),
        rgb.reshape(n, hw, 3),
        gout.reshape(n, hw, 3),
        gmask.reshape(n, hw, 1),
    )
    return (
        dcontent.reshape(content.shape),
        dlogits.reshape(attn_logits.shape),
        drgb.reshape(rgb.shape),
    )


@jax.custom_vjp
def _attention_compose_pallas(content, attn_logits, rgb):
    return _compose_fwd_call(content, attn_logits, rgb)


def _compose_fwd(content, attn_logits, rgb):
    return _compose_fwd_call(content, attn_logits, rgb), (content, attn_logits, rgb)


def _compose_bwd(res, g):
    content, attn_logits, rgb = res
    gout, gmask = g
    return _compose_bwd_call(content, attn_logits, rgb, gout, gmask)


_attention_compose_pallas.defvjp(_compose_fwd, _compose_bwd)


def attention_compose(
    content: jax.Array,       # (N, H, W, 27) tanh'd content images
    attn_logits: jax.Array,   # (N, H, W, 10) pre-softmax mask logits
    rgb: jax.Array,           # (N, H, W, 3) input RGB
):
    """Returns (output (N,H,W,3), background_mask (N,H,W)) — the
    AttentionGAN composition head in one differentiable pass."""
    hw = content.shape[1] * content.shape[2]
    if hw % min(hw, _COMPOSE_TILE):
        return _attention_compose_jnp(content, attn_logits, rgb)
    return _attention_compose_pallas(content, attn_logits, rgb)


def _attention_compose_jnp(content, attn_logits, rgb):
    n, h, w, _ = content.shape
    # softmax statistics in f32; the 9-term multiply-accumulate runs in the
    # activation dtype (bf16 under the mixed-precision policy: tanh'd
    # content in [-1,1] x masks in [0,1] — well inside bf16 range; f32 at
    # eval, where metric parity is pinned).  Measured: the all-f32 version
    # dragged ~25 ms/step of converts + f32 dot_generals into the 512^2
    # train step (BENCH_NOTES round 2).
    attn = jax.nn.softmax(attn_logits.astype(jnp.float32), axis=-1)
    attn = attn.astype(content.dtype)
    content9 = content.reshape(n, h, w, 9, 3)
    fg = jnp.einsum("nhwkc,nhwk->nhwc", content9, attn[..., :9])
    out = fg + rgb.astype(content.dtype) * attn[..., 9:10]
    return out.astype(content.dtype), attn[..., 9]
