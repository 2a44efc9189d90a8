"""Metric suite tests: SSIM against an independent scipy implementation,
PSNR closed form, MS-SSIM invariants, confusion-matrix mask metrics vs
direct numpy computation, LPIPS contract with synthetic weights."""

import numpy as np
import pytest
from scipy.ndimage import convolve

import jax.numpy as jnp

from floodgan_tpu.eval.lpips import LPIPS
from floodgan_tpu.eval.metrics import (
    MaskMetricsAccumulator,
    _gaussian_1d,
    image_pair_metrics,
    ms_ssim,
    psnr,
    ssim,
)


def _ssim_scipy(pred, target, data_range=1.0, size=11, sigma=1.5):
    """Independent valid-region gaussian SSIM (per channel, averaged)."""
    k1d = _gaussian_1d(size, sigma).astype(np.float64)
    kern = np.outer(k1d, k1d)
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    r = size // 2
    vals = []
    for c in range(pred.shape[-1]):
        p, t = pred[..., c].astype(np.float64), target[..., c].astype(np.float64)
        f = lambda im: convolve(im, kern, mode="constant")[r:-r, r:-r]
        mp, mt = f(p), f(t)
        vp, vt, cov = f(p * p) - mp**2, f(t * t) - mt**2, f(p * t) - mp * mt
        smap = ((2 * mp * mt + c1) * (2 * cov + c2)) / ((mp**2 + mt**2 + c1) * (vp + vt + c2))
        vals.append(smap.mean())
    return float(np.mean(vals))


def test_psnr_closed_form(rng):
    pred = rng.random((2, 16, 16, 3), dtype=np.float32)
    target = np.clip(pred + 0.1, 0, 1)
    got = np.asarray(psnr(jnp.asarray(pred), jnp.asarray(target)))
    for b in range(2):
        mse = np.mean((pred[b] - target[b]) ** 2)
        np.testing.assert_allclose(got[b], 10 * np.log10(1.0 / mse), rtol=1e-4)


def test_ssim_vs_scipy(rng):
    pred = rng.random((1, 48, 48, 3), dtype=np.float32)
    target = np.clip(pred + rng.normal(0, 0.05, pred.shape), 0, 1).astype(np.float32)
    got = float(ssim(jnp.asarray(pred), jnp.asarray(target))[0])
    want = _ssim_scipy(pred[0], target[0])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ssim_identity_is_one(rng):
    x = rng.random((1, 32, 32, 3), dtype=np.float32)
    assert abs(float(ssim(jnp.asarray(x), jnp.asarray(x))[0]) - 1.0) < 1e-5


def _ms_ssim_scipy(pred, target, data_range=1.0, size=11, sigma=1.5):
    """Independent float64 MS-SSIM: the scipy SSIM above extended through
    the 5-scale pyramid (2x2 avg-pool between scales, CS at scales 1-4,
    full SSIM at scale 5, relu + beta-weighted product — the torchmetrics
    class defaults the reference relies on, models/model.py:369)."""
    betas = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)
    k1d = _gaussian_1d(size, sigma).astype(np.float64)
    kern = np.outer(k1d, k1d)
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    r = size // 2

    def ssim_cs(p3, t3):
        s_maps, cs_maps = [], []
        for c in range(p3.shape[-1]):
            p, t = p3[..., c].astype(np.float64), t3[..., c].astype(np.float64)
            f = lambda im: convolve(im, kern, mode="constant")[r:-r, r:-r]
            mp, mt = f(p), f(t)
            vp, vt, cov = f(p * p) - mp**2, f(t * t) - mt**2, f(p * t) - mp * mt
            cs = (2 * cov + c2) / (vp + vt + c2)
            s_maps.append(((2 * mp * mt + c1) / (mp**2 + mt**2 + c1)) * cs)
            cs_maps.append(cs)
        return float(np.mean(s_maps)), float(np.mean(cs_maps))

    def pool(x3):
        h, w = x3.shape[0] // 2 * 2, x3.shape[1] // 2 * 2
        x3 = x3[:h, :w]
        return (x3[0::2, 0::2] + x3[0::2, 1::2] + x3[1::2, 0::2] + x3[1::2, 1::2]) / 4.0

    p, t = pred.astype(np.float64), target.astype(np.float64)
    vals = []
    for i in range(len(betas)):
        s, cs = ssim_cs(p, t)
        vals.append(s if i == len(betas) - 1 else cs)
        if i != len(betas) - 1:
            p, t = pool(p), pool(t)
    vals = np.maximum(np.asarray(vals), 0.0)
    return float(np.prod(vals ** np.asarray(betas)))


# Fixed-input goldens for the full 5-scale pyramid, computed by the
# independent float64 scipy implementation above (and reproducible from
# it in-test).  torchmetrics itself is not installed on this offline
# build host, so library-output goldens can't be generated here; these
# constants pin the algorithm torchmetrics documents (Wang et al. MS-SSIM
# with the class-default betas/kernel) instead, at float64 accuracy.
# They specifically guard the TPU precision regression found in round 4:
# default bf16 MXU conv precision drove scale-5 CS to 1.157 (impossible;
# CS <= 1) on the blurless pair below — full-f32 convs agree with these
# values to ~2e-6 (see eval/metrics._gaussian_filter_valid).
_MS_SSIM_GOLDENS = {
    "noise_0.05": 0.98805573,
    "noise_0.2": 0.84920936,
    "blurless_shift": 0.99547297,
}


def _ms_ssim_golden_cases():
    rng = np.random.default_rng(47)
    x = rng.random((192, 192, 3)).astype(np.float32)
    return x, {
        "noise_0.05": np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1).astype(np.float32),
        "noise_0.2": np.clip(x + rng.normal(0, 0.2, x.shape), 0, 1).astype(np.float32),
        # scale+shift: perfectly correlated, low local variance — the
        # worst case for E[x^2]-mu^2 cancellation at the deep scales.
        "blurless_shift": np.clip(x * 0.9 + 0.05, 0, 1).astype(np.float32),
    }


def test_ms_ssim_vs_scipy_pyramid_goldens():
    x, cases = _ms_ssim_golden_cases()
    for name, y in cases.items():
        got = float(ms_ssim(jnp.asarray(x[None]), jnp.asarray(y[None]))[0])
        want = _ms_ssim_scipy(x, y)
        # the checked-in constant pins the independent implementation too
        np.testing.assert_allclose(
            want, _MS_SSIM_GOLDENS[name], atol=1e-7, err_msg=f"{name} (scipy drifted)"
        )
        np.testing.assert_allclose(got, want, atol=2e-5, err_msg=name)
        assert got <= 1.0 + 1e-5, f"{name}: MS-SSIM > 1 (precision regression)"


def test_ms_ssim_invariants(rng):
    x = rng.random((1, 192, 192, 3), dtype=np.float32)
    same = float(ms_ssim(jnp.asarray(x), jnp.asarray(x))[0])
    assert abs(same - 1.0) < 1e-5
    mild = np.clip(x + rng.normal(0, 0.02, x.shape), 0, 1).astype(np.float32)
    heavy = np.clip(x + rng.normal(0, 0.2, x.shape), 0, 1).astype(np.float32)
    v_mild = float(ms_ssim(jnp.asarray(x), jnp.asarray(mild))[0])
    v_heavy = float(ms_ssim(jnp.asarray(x), jnp.asarray(heavy))[0])
    assert 1.0 > v_mild > v_heavy > 0.0


def test_image_pair_metrics_keys(rng):
    x = jnp.asarray(rng.random((1, 192, 192, 3), dtype=np.float32))
    out = image_pair_metrics(x, x)
    assert set(out) == {"PSNR", "SSIM", "MS-SSIM"}


def test_mask_metrics_vs_numpy(rng):
    acc = MaskMetricsAccumulator()
    preds, trues = [], []
    for _ in range(3):
        p = (rng.random((1, 32, 32, 1)) > 0.4).astype(np.float32)
        t = (rng.random((1, 32, 32, 1)) > 0.6).astype(np.float32)
        preds.append(p.ravel())
        trues.append(t.ravel())
        acc.update(jnp.asarray(p), jnp.asarray(t))
    p = np.concatenate(preds)
    t = np.concatenate(trues)
    m = acc.compute()
    tp = np.sum((p == 1) & (t == 1)); fp = np.sum((p == 1) & (t == 0))
    fn = np.sum((p == 0) & (t == 1)); tn = np.sum((p == 0) & (t == 0))
    np.testing.assert_allclose(m["MSE"], np.mean((p - t) ** 2), rtol=1e-6)
    np.testing.assert_allclose(m["Accuracy"], np.mean(p == t), rtol=1e-6)
    prec, rec = tp / (tp + fp), tp / (tp + fn)
    np.testing.assert_allclose(m["Precision_Flood"], prec, rtol=1e-6)
    np.testing.assert_allclose(m["Recall_Flood"], rec, rtol=1e-6)
    np.testing.assert_allclose(m["F1_Flood"], 2 * prec * rec / (prec + rec), rtol=1e-6)
    # inverted masks
    pi, ti = 1 - p, 1 - t
    tpn = np.sum((pi == 1) & (ti == 1)); fpn = np.sum((pi == 1) & (ti == 0)); fnn = np.sum((pi == 0) & (ti == 1))
    np.testing.assert_allclose(m["Precision_No_Flood"], tpn / (tpn + fpn), rtol=1e-6)
    np.testing.assert_allclose(m["Recall_No_Flood"], tpn / (tpn + fnn), rtol=1e-6)
    np.testing.assert_allclose(m["IoU_Flood"], tp / (tp + fp + fn), rtol=1e-6)


def _synthetic_lpips_weights(rng):
    w = {}
    chans = [3, 64, 192, 384, 256]
    outs = [64, 192, 384, 256, 256]
    ks = [11, 5, 3, 3, 3]
    for i in range(5):
        w[f"conv{i}_w"] = rng.normal(0, 0.05, (ks[i], ks[i], chans[i], outs[i])).astype(np.float32)
        w[f"conv{i}_b"] = np.zeros(outs[i], np.float32)
        w[f"lin{i}_w"] = rng.random((1, 1, outs[i], 1)).astype(np.float32)
    return w


def test_lpips_contract(rng):
    metric = LPIPS(_synthetic_lpips_weights(rng))
    x = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    d_same = np.asarray(metric(x, x))
    d_diff = np.asarray(metric(x, y))
    assert d_same.shape == (2,)
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    assert (d_diff > 0).all()


def test_lpips_math_matches_torch_replication(rng):
    """Cross-framework golden: our LPIPS vs a raw-torch replication of the
    lpips-package/torchmetrics formula (scaling layer, AlexNet feature
    taps, channel unit-normalization, squared diff, non-negative 1x1
    heads, spatial mean, sum) with IDENTICAL synthetic weights.  With the
    pretrained npz dropped in, value parity follows from this math parity
    (the real weights can't ship from an offline build host — see
    eval/lpips.py docstring)."""
    import torch
    import torch.nn.functional as F

    w = _synthetic_lpips_weights(rng)
    metric = LPIPS(w)
    x = rng.random((2, 33, 47, 3), dtype=np.float32) * 2 - 1
    y = rng.random((2, 33, 47, 3), dtype=np.float32) * 2 - 1

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    cfg = [(11, 4, 2, False), (5, 1, 2, True), (3, 1, 1, True),
           (3, 1, 1, False), (3, 1, 1, False)]

    def feats_t(img):
        t = (torch.from_numpy(img).permute(0, 3, 1, 2) - shift) / scale
        taps = []
        for i, (_, stride, pad, pool) in enumerate(cfg):
            if pool:
                t = F.max_pool2d(t, 3, 2)
            wt = torch.from_numpy(w[f"conv{i}_w"]).permute(3, 2, 0, 1)
            t = F.relu(F.conv2d(t, wt, torch.from_numpy(w[f"conv{i}_b"]),
                                stride=stride, padding=pad))
            taps.append(t)
        return taps

    total = torch.zeros(2)
    for i, (fp, ft) in enumerate(zip(feats_t(x), feats_t(y))):
        fp = fp / torch.sqrt((fp * fp).sum(1, keepdim=True) + 1e-10)
        ft = ft / torch.sqrt((ft * ft).sum(1, keepdim=True) + 1e-10)
        d = (fp - ft) ** 2
        lin = torch.from_numpy(w[f"lin{i}_w"]).permute(3, 2, 0, 1).clamp(min=0)
        total = total + F.conv2d(d, lin).mean(dim=(1, 2, 3))

    ours = np.asarray(metric(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(ours, total.numpy(), rtol=2e-4, atol=2e-5)


def test_lpips_fallback_is_deterministic_and_live(monkeypatch):
    """The random-feature fallback is OPT-IN (ADVICE r2: fallback values
    share the trained-LPIPS CSV schema, so the default with no weights is
    NaN — never silently substituted numbers).  With
    FLOODGAN_LPIPS_FALLBACK=1 the seed-47 metric is identical on every
    machine."""
    from floodgan_tpu.eval import lpips as L

    monkeypatch.delenv("FLOODGAN_LPIPS_WEIGHTS", raising=False)
    monkeypatch.setattr(L, "_asset_path", lambda: "/nonexistent/lpips.npz")
    monkeypatch.setattr(L, "_warned", True)

    monkeypatch.setenv("FLOODGAN_LPIPS_FALLBACK", "1")
    metric = L.load_lpips()
    assert metric is not None
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32) * 2 - 1)
    y = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32) * 2 - 1)
    d1 = np.asarray(metric(x, y))
    d2 = np.asarray(L.LPIPS(L.fallback_weights())(x, y))
    np.testing.assert_array_equal(d1, d2)
    assert np.isfinite(d1).all() and (d1 > 0).all()
    np.testing.assert_allclose(np.asarray(metric(x, x)), 0.0, atol=1e-6)

    monkeypatch.delenv("FLOODGAN_LPIPS_FALLBACK")
    assert L.load_lpips() is None  # NaN column is the no-weights default


def test_per_image_confusion_counts_match_batch(rng):
    """The fused eval step's (B, 4) per-image counts sum to the batch
    counts, and add_counts accepts both forms identically."""
    from floodgan_tpu.eval.metrics import (
        MaskMetricsAccumulator,
        _confusion_counts,
        _confusion_counts_per_image,
    )

    pred = (rng.random((4, 16, 16, 1)) > 0.5).astype(np.float32)
    true = (rng.random((4, 16, 16, 1)) > 0.5).astype(np.float32)
    per_image = np.asarray(_confusion_counts_per_image(pred, true))
    batch = np.asarray(_confusion_counts(pred, true))
    np.testing.assert_array_equal(per_image.sum(axis=0), batch)
    assert per_image.shape == (4, 4)

    a, b, c = MaskMetricsAccumulator(), MaskMetricsAccumulator(), MaskMetricsAccumulator()
    a.update(pred, true)
    b.add_counts(per_image)
    for row in per_image:
        c.add_counts(row)
    np.testing.assert_array_equal(a.counts, b.counts)
    np.testing.assert_array_equal(a.counts, c.counts)


def test_fused_eval_variants_agree(rng):
    """fn(...) == fn.with_true_mask(..., fn.true_mask(...)) and the
    lru-cached factory returns the same compiled closure for the same
    trainer (bound methods of one object hash equal)."""
    import jax
    import jax.numpy as jnp

    from floodgan_tpu.eval.metrics import make_eval_batch_metrics
    from floodgan_tpu.train.seg import SegTrainer

    seg = SegTrainer()
    params = seg.init(jax.random.key(1), jnp.zeros((1, 16, 16, 3))).params
    fn = make_eval_batch_metrics(seg._predict_mask)
    assert make_eval_batch_metrics(seg._predict_mask) is fn

    out = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
    imgm_a, counts_a = jax.device_get(fn(params, out, y, with_ms_ssim=False))
    tm = fn.true_mask(params, y)
    imgm_b, counts_b = jax.device_get(
        fn.with_true_mask(params, out, y, tm, with_ms_ssim=False)
    )
    np.testing.assert_array_equal(counts_a, counts_b)
    for k in imgm_a:
        np.testing.assert_array_equal(imgm_a[k], imgm_b[k])
    # true_mask is the trainer's own predict_mask on the denormalized y
    from floodgan_tpu.data.transforms import denormalize

    np.testing.assert_array_equal(
        np.asarray(tm), np.asarray(seg.predict_mask(params, denormalize(y)))
    )
