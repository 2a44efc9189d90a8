"""Jitted metric suite matching the reference's torchmetrics configuration
(reference models/model.py:367-378: PSNR/SSIM/MS-SSIM with data_range
(0, 1); MSE/Accuracy/F1/Precision/Recall on binary flood masks).

Image metrics are per-image (the reference computes one value per image and
resets the metric, model.py:404-406); mask metrics are split-level — the
reference concatenates every pixel of the split (model.py:409-418), which
is equivalent to accumulating a confusion matrix, so we keep O(1) state on
device instead of gigapixel vectors.  IoU is added on top (BASELINE.json
names flood-mask IoU; the reference's F1 is its harmonic twin).

SSIM/MS-SSIM follow the torchmetrics algorithm: 11x11 gaussian (sigma 1.5),
k1=0.01 k2=0.03, valid-region averaging, MS-SSIM betas
(0.0448, 0.2856, 0.3001, 0.2363, 0.1333) with 2x2 avg-pool between scales
and relu normalisation (the torchmetrics class default).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_MSSSIM_BETAS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)
# Smallest spatial side MS-SSIM accepts with the defaults: the final
# scale's 11-tap VALID gaussian window must fit after len(betas)-1
# floor-halvings (11 * 2^4 = 176).  NB torchmetrics documents the weaker
# (kernel-1)*2^4 = 160, under which 161-175px inputs reach an empty valid
# conv.  Callers gate the metric on this and NaN the column below it.
MS_SSIM_MIN_SIDE = 11 * 2 ** (len(_MSSSIM_BETAS) - 1)


# ------------------------------------------------------------------- PSNR

def psnr(pred: jax.Array, target: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Per-image PSNR over all pixels/channels: 10 log10(range^2 / mse)."""
    axes = tuple(range(1, pred.ndim))
    mse = jnp.mean(jnp.square(pred - target), axis=axes)
    return 10.0 * jnp.log10(data_range**2 / mse)


# ------------------------------------------------------------------- SSIM

@functools.lru_cache(maxsize=8)
def _gaussian_1d(size: int, sigma: float) -> np.ndarray:
    xs = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _gaussian_filter_valid(x: jax.Array, size: int, sigma: float) -> jax.Array:
    """Separable valid-mode gaussian filter over H, W of NHWC.

    precision=HIGHEST is load-bearing: on TPU the default conv precision
    truncates operands to bf16 on the MXU, and SSIM's variance form
    E[x^2] - mu^2 amplifies that truncation catastrophically wherever the
    local variance is small — measured on v5e, MS-SSIM's scale-5 CS came
    out 1.157 (> 1 is impossible; CS <= 1 by AM-GM) on a smooth pair
    whose true value is 0.9977.  Full-f32 convs restore agreement with a
    float64 scipy reference to ~1e-6 (tests/test_metrics.py goldens);
    the metric suite's conv cost is negligible next to the generator
    forward it scores."""
    k = jnp.asarray(_gaussian_1d(size, sigma))
    c = x.shape[-1]
    kh = jnp.tile(k.reshape(size, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k.reshape(1, size, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )
    return lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )


def _ssim_and_cs(
    pred: jax.Array, target: jax.Array, data_range: float, size: int, sigma: float
) -> Tuple[jax.Array, jax.Array]:
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_p = _gaussian_filter_valid(pred, size, sigma)
    mu_t = _gaussian_filter_valid(target, size, sigma)
    e_pp = _gaussian_filter_valid(pred * pred, size, sigma)
    e_tt = _gaussian_filter_valid(target * target, size, sigma)
    e_pt = _gaussian_filter_valid(pred * target, size, sigma)
    var_p = e_pp - mu_p * mu_p
    var_t = e_tt - mu_t * mu_t
    cov = e_pt - mu_p * mu_t
    cs_map = (2.0 * cov + c2) / (var_p + var_t + c2)
    ssim_map = ((2.0 * mu_p * mu_t + c1) / (mu_p * mu_p + mu_t * mu_t + c1)) * cs_map
    axes = tuple(range(1, pred.ndim))
    return jnp.mean(ssim_map, axis=axes), jnp.mean(cs_map, axis=axes)


def ssim(
    pred: jax.Array,
    target: jax.Array,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
) -> jax.Array:
    """Per-image SSIM, NHWC inputs."""
    s, _ = _ssim_and_cs(pred, target, data_range, kernel_size, sigma)
    return s


def _avg_pool2(x: jax.Array) -> jax.Array:
    return lax.reduce_window(
        x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) * 0.25


def ms_ssim(
    pred: jax.Array,
    target: jax.Array,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    betas: Tuple[float, ...] = _MSSSIM_BETAS,
    normalize: bool = True,
) -> jax.Array:
    """Per-image multi-scale SSIM, NHWC inputs.  The min spatial dim must
    be >= kernel_size * 2**(len(betas)-1) (176 for the defaults) so the
    final scale's VALID gaussian window still fits after the floor-halving
    downsamples; NB torchmetrics' own documented bound,
    (kernel_size-1) * 2**(len(betas)-1) = 160, is too weak — 161-175px
    inputs reach an empty valid conv at scale 5.  Callers guard with the
    true bound and NaN the column below it."""
    vals = []
    for i in range(len(betas)):
        s, cs = _ssim_and_cs(pred, target, data_range, kernel_size, sigma)
        vals.append(s if i == len(betas) - 1 else cs)
        if i != len(betas) - 1:
            pred = _avg_pool2(pred)
            target = _avg_pool2(target)
    stack = jnp.stack(vals)  # (scales, N)
    if normalize:
        stack = jnp.maximum(stack, 0.0)
    b = jnp.asarray(betas)[:, None]
    return jnp.prod(stack**b, axis=0)


@functools.partial(jax.jit, static_argnames=("with_ms_ssim",))
def image_pair_metrics(
    pred: jax.Array, target: jax.Array, with_ms_ssim: bool = True
) -> Dict[str, jax.Array]:
    """The per-image image-quality block of the reference metric table.
    Inputs are expected in [0, 1] (denormalized + clamped, reference
    model.py:397-398); we clamp again like torchmetrics' tuple data_range."""
    pred = jnp.clip(pred, 0.0, 1.0)
    target = jnp.clip(target, 0.0, 1.0)
    out = {
        "PSNR": psnr(pred, target),
        "SSIM": ssim(pred, target),
    }
    if with_ms_ssim:
        out["MS-SSIM"] = ms_ssim(pred, target)
    return out


# ----------------------------------------------------------- mask metrics

class MaskMetricsAccumulator:
    """Split-level binary mask metrics via an accumulated confusion matrix.

    Equivalent to the reference's concatenate-all-pixels-then-score
    approach (reference models/model.py:409-418,
    models/segmentation_model.py:144-173) for MSE / Accuracy / F1 /
    Precision / Recall on flood and inverted (no-flood) masks, plus IoU.
    """

    def __init__(self):
        self.counts = np.zeros(4, dtype=np.int64)  # tp, fp, fn, tn

    def update(self, pred_mask: jax.Array, true_mask: jax.Array) -> None:
        self.counts += np.asarray(_confusion_counts(pred_mask, true_mask))

    def add_counts(self, counts) -> None:
        """Accumulate precomputed (tp, fp, fn, tn) counts — a single
        vector or a (B, 4) per-image stack (the fused eval step returns
        per-image counts so per-disaster grouping shares the same one
        device_get; summing them here is exact)."""
        c = np.asarray(counts, dtype=np.int64)
        self.counts += c.reshape(-1, 4).sum(axis=0)

    def compute(self) -> Dict[str, float]:
        tp, fp, fn, tn = (float(v) for v in self.counts)
        total = tp + fp + fn + tn

        def prf(tp_, fp_, fn_):
            precision = tp_ / (tp_ + fp_) if tp_ + fp_ > 0 else 0.0
            recall = tp_ / (tp_ + fn_) if tp_ + fn_ > 0 else 0.0
            f1 = (
                2 * precision * recall / (precision + recall)
                if precision + recall > 0
                else 0.0
            )
            iou = tp_ / (tp_ + fp_ + fn_) if tp_ + fp_ + fn_ > 0 else 0.0
            return precision, recall, f1, iou

        p_f, r_f, f1_f, iou_f = prf(tp, fp, fn)
        p_n, r_n, f1_n, iou_n = prf(tn, fn, fp)  # inverted masks swap roles
        return {
            "MSE": (fp + fn) / total if total else 0.0,
            "Accuracy": (tp + tn) / total if total else 0.0,
            "F1_Flood": f1_f,
            "Precision_Flood": p_f,
            "Recall_Flood": r_f,
            "F1_No_Flood": f1_n,
            "Precision_No_Flood": p_n,
            "Recall_No_Flood": r_n,
            "IoU_Flood": iou_f,
            "IoU_No_Flood": iou_n,
        }


@jax.jit
def _confusion_counts_per_image(pred_mask: jax.Array, true_mask: jax.Array) -> jax.Array:
    """(B, 4) per-image (tp, fp, fn, tn) — the per-image form lets one
    fused fetch serve both the split-level accumulator and the
    per-disaster grouped accumulators (group.py).  int32 per update
    (accumulation to int64 happens host-side in numpy; a single image
    never reaches 2**31 pixels)."""
    axes = tuple(range(1, pred_mask.ndim))
    p = pred_mask > 0.5
    t = true_mask > 0.5
    tp = jnp.sum(p & t, axis=axes)
    fp = jnp.sum(p & ~t, axis=axes)
    fn = jnp.sum(~p & t, axis=axes)
    tn = jnp.sum(~p & ~t, axis=axes)
    return jnp.stack([tp, fp, fn, tn], axis=-1).astype(jnp.int32)


@jax.jit
def _confusion_counts(pred_mask: jax.Array, true_mask: jax.Array) -> jax.Array:
    """Batch-total (tp, fp, fn, tn): the per-image form summed — one
    count definition, two shapes (pinned equal in tests)."""
    return jnp.sum(_confusion_counts_per_image(pred_mask, true_mask), axis=0)


@functools.lru_cache(maxsize=8)
def make_eval_batch_metrics(seg_predict_mask):
    """Fuse the metric block of the eval hot loop into ONE compiled
    dispatch (reference models/model.py:397-410 runs denormalize, the
    image metrics, and two segmentation forwards as separate device
    calls).  ``seg_predict_mask(params, image) -> float mask`` must be
    the seg trainer's UNJITTED ``_predict_mask`` body (the jitted
    wrappers carry backend compiler options, which JAX rejects on a
    nested jit; reusing the trainer's own body keeps the sigmoid>0.5
    threshold defined in exactly one place).

    The two U-Net forwards stay SEPARATE inside the program — the
    reference never calls ``.eval()``, so BatchNorm uses per-call batch
    statistics and concatenating generator output with ground truth into
    one batch would mix their statistics (a numerics change, not a
    lowering).  XLA still schedules both forwards in one program and the
    caller pays one dispatch + one small device_get per batch instead of
    4-5 dispatches and 2-3 blocking fetches.

    Returns a jitted ``fn(seg_params, out, y, with_ms_ssim=) ->
    (per_image_metric_dict, per_image_confusion_counts(B, 4))`` taking
    NORMALIZED ([-1,1]) generator output and target.  Callers feed the
    counts to ``MaskMetricsAccumulator.add_counts`` (which sums any
    leading dims) and, for per-disaster grouping, slice rows.

    Two attributes support multi-model comparison (group.py), where the
    ground-truth side is identical for every model in a batch:
    ``fn.true_mask(seg_params, y)`` computes the reference mask once per
    batch, and ``fn.with_true_mask(seg_params, out, y, true_mask,
    with_ms_ssim=)`` skips the y-side U-Net forward — N compared models
    pay 1 + N forwards per batch instead of 2N.

    lru_cached so repeated ``calculate_metrics`` calls in one process
    reuse the jitted closures (bound methods of the same trainer hash
    equal), instead of recompiling the fused program per call.
    """

    from floodgan_tpu.data.transforms import denormalize

    @functools.partial(jax.jit, static_argnames="with_ms_ssim")
    def with_true_mask(seg_params, out, y, true_mask, with_ms_ssim=True):
        out01 = denormalize(out)
        y01 = denormalize(y)
        imgm = image_pair_metrics(out01, y01, with_ms_ssim=with_ms_ssim)
        out_mask = seg_predict_mask(seg_params, out01)
        return imgm, _confusion_counts_per_image(out_mask, true_mask)

    @jax.jit
    def true_mask_fn(seg_params, y):
        return seg_predict_mask(seg_params, denormalize(y))

    @functools.partial(jax.jit, static_argnames="with_ms_ssim")
    def _full(seg_params, out, y, with_ms_ssim=True):
        out01 = denormalize(out)
        y01 = denormalize(y)
        imgm = image_pair_metrics(out01, y01, with_ms_ssim=with_ms_ssim)
        out_mask = seg_predict_mask(seg_params, out01)
        true_mask = seg_predict_mask(seg_params, y01)
        return imgm, _confusion_counts_per_image(out_mask, true_mask)

    # plain-function wrapper so the two comparison-loop entry points can
    # ride along as attributes (jit objects reject attribute assignment)
    def eval_batch_metrics(seg_params, out, y, with_ms_ssim=True):
        return _full(seg_params, out, y, with_ms_ssim=with_ms_ssim)

    eval_batch_metrics.with_true_mask = with_true_mask
    eval_batch_metrics.true_mask = true_mask_fn
    return eval_batch_metrics
