"""LPIPS (AlexNet variant) in JAX, matching torchmetrics'
``LearnedPerceptualImagePatchSimilarity`` (reference models/model.py:370).

The metric needs pretrained AlexNet features and learned linear heads,
which cannot be downloaded in an offline environment, so weights load from
an ``.npz`` produced by ``floodgan_tpu/utils/export_lpips.py`` on any
machine with the ``lpips`` package (or torchmetrics) installed.  Set
``FLOODGAN_LPIPS_WEIGHTS`` or pass ``weights_path``.  When absent, the
LPIPS column reports NaN (schema preserved) — trained-LPIPS numbers are
never silently substituted.  Setting ``FLOODGAN_LPIPS_FALLBACK=1`` opts in
to deterministic seed-47 random features (see ``fallback_weights``), which
are reproducible but NOT comparable to torchmetrics' trained LPIPS.

Computation (lpips.LPIPS(net='alex'), the torchmetrics default):
  scale inputs by the fixed shift/scale stats; run AlexNet conv features;
  tap after each of the 5 relus; unit-normalize channels; squared diff;
  1x1 non-negative linear head per tap; spatial mean; sum over taps.

The reference feeds [0,1]-clamped images with torchmetrics'
``normalize=False`` (which *expects* [-1,1]) — an off-spec but consistent
usage we reproduce verbatim for parity (model.py:397-405).
"""

from __future__ import annotations

import functools
import os
import warnings
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from floodgan_tpu import ops

_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)

# AlexNet feature config: (out_ch, kernel, stride, pad, maxpool_before)
_ALEX = [
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
]


def _max_pool_3_2(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


class LPIPS:
    """Callable LPIPS metric; weights are a dict of numpy arrays:
    conv{i}_w (HWIO), conv{i}_b, lin{i}_w (1,1,C,1) for i in 0..4."""

    def __init__(self, weights: Dict[str, np.ndarray]):
        self.weights = {k: jnp.asarray(v) for k, v in weights.items()}

    @functools.partial(jax.jit, static_argnums=0)
    def __call__(self, pred: jax.Array, target: jax.Array) -> jax.Array:
        """Per-image LPIPS distance, NHWC inputs in [-1, 1] nominally.

        Runs under matmul precision "highest": TPU convs otherwise
        truncate operands to bf16 on the MXU, which breaks parity with
        the f32 torch reference this metric is golden-tested against
        (same class of error that corrupted MS-SSIM's deep scales —
        see eval/metrics._gaussian_filter_valid).  Metric cost is
        negligible next to the generator forwards it scores."""
        with jax.default_matmul_precision("highest"):
            return self._distance(pred, target)

    def _distance(self, pred: jax.Array, target: jax.Array) -> jax.Array:

        def feats(x):
            x = (x - _SHIFT) / _SCALE
            taps = []
            for i, (_, _, stride, pad, pool_before) in enumerate(_ALEX):
                if pool_before:
                    x = _max_pool_3_2(x)
                x = ops.conv2d(
                    x,
                    self.weights[f"conv{i}_w"],
                    self.weights[f"conv{i}_b"],
                    stride=stride,
                    padding=pad,
                )
                x = jnp.maximum(x, 0.0)
                taps.append(x)
            return taps

        total = None
        for i, (fp, ft) in enumerate(zip(feats(pred), feats(target))):
            fp = fp * jax.lax.rsqrt(jnp.sum(fp * fp, axis=-1, keepdims=True) + 1e-10)
            ft = ft * jax.lax.rsqrt(jnp.sum(ft * ft, axis=-1, keepdims=True) + 1e-10)
            d = jnp.square(fp - ft)
            lin = jnp.maximum(self.weights[f"lin{i}_w"], 0.0)
            v = jnp.mean(
                jax.lax.conv_general_dilated(
                    d, lin, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
                ),
                axis=(1, 2, 3),
            )
            total = v if total is None else total + v
        return total


_warned = False


def fallback_weights(seed: int = 47) -> Dict[str, np.ndarray]:
    """Deterministic random-feature LPIPS weights (no download needed).

    The LPIPS paper (Zhang et al. 2018, §5) reports that *untrained*
    conv features with unit linear heads already correlate strongly with
    human perceptual judgements; this generates exactly that — He-normal
    AlexNet-shaped conv stacks and uniform 1/C non-negative heads — from
    a fixed seed, so every machine computes the identical metric with no
    weight artifact.  Values are NOT comparable to torchmetrics' trained
    LPIPS (reference models/model.py:370); provide a real npz (see
    ``utils/export_lpips.py``) for exact parity.  The fallback is a valid
    full-reference perceptual distance: 0 iff identical, symmetric, and
    monotone in feature-space distortion.
    """
    rng = np.random.default_rng(seed)
    out: Dict[str, np.ndarray] = {}
    cin = 3
    for i, (cout, k, _, _, _) in enumerate(_ALEX):
        fan_in = cin * k * k
        out[f"conv{i}_w"] = rng.normal(
            0.0, np.sqrt(2.0 / fan_in), size=(k, k, cin, cout)
        ).astype(np.float32)
        out[f"conv{i}_b"] = np.zeros((cout,), dtype=np.float32)
        out[f"lin{i}_w"] = np.full((1, 1, cout, 1), 1.0 / cout, dtype=np.float32)
        cin = cout
    return out


def _asset_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets",
        "lpips_alex.npz",
    )


def load_lpips(weights_path: Optional[str] = None) -> Optional[LPIPS]:
    """Load LPIPS weights.  Search order: explicit ``weights_path`` →
    $FLOODGAN_LPIPS_WEIGHTS → the repo asset ``floodgan_tpu/assets/
    lpips_alex.npz`` → a one-time auto-export via the ``lpips`` package if
    it is importable on this machine (written to the asset path for next
    time).  Returns None (with a one-time warning) when none work; the
    evaluators then report NaN in the LPIPS column, schema preserved."""
    global _warned
    if weights_path and not os.path.isfile(weights_path):
        # An explicit path is a promise — falling through to other weights
        # would silently score with something the user did not ask for.
        raise FileNotFoundError(f"LPIPS weights file not found: {weights_path}")
    candidates = [
        weights_path,
        os.environ.get("FLOODGAN_LPIPS_WEIGHTS"),
        _asset_path(),
    ]
    for path in candidates:
        if path and os.path.isfile(path):
            try:
                return LPIPS(dict(np.load(path)))
            except Exception as e:
                if path == weights_path:
                    raise  # an explicit path must not be silently skipped
                # e.g. an npz truncated by an interrupted export: skip it
                # (and say so) instead of crashing every future eval
                warnings.warn(f"skipping unreadable LPIPS weights {path}: {e}")
    try:  # networked dev machine with `pip install lpips`: convert once
        from floodgan_tpu.utils.export_lpips import export

        os.makedirs(os.path.dirname(_asset_path()), exist_ok=True)
        # atomic: a crash mid-export must not leave a half-written npz
        # that every later load finds via isfile (same tmp+replace pattern
        # as ckpt/checkpoint.py)
        tmp = _asset_path() + ".tmp.npz"
        export(tmp)
        os.replace(tmp, _asset_path())
        return LPIPS(dict(np.load(_asset_path())))
    except Exception:
        pass
    if os.environ.get("FLOODGAN_LPIPS_FALLBACK") == "1":
        # Opt-in only: fallback values share the trained-LPIPS CSV schema,
        # so defaulting to them would let downstream consumers mistake
        # random-feature numbers for the reference metric (ADVICE r2).
        if not _warned:
            warnings.warn(
                "FLOODGAN_LPIPS_FALLBACK=1: using the deterministic "
                "random-feature LPIPS fallback (seed 47).  Values are "
                "reproducible but NOT numerically comparable to "
                "torchmetrics' trained LPIPS — export the real npz via "
                "floodgan_tpu/utils/export_lpips.py for exact parity."
            )
            _warned = True
        return LPIPS(fallback_weights())
    if not _warned:
        warnings.warn(
            "Pretrained LPIPS weights not found (FLOODGAN_LPIPS_WEIGHTS, "
            f"repo asset {_asset_path()}, `lpips` auto-export all "
            "unavailable); the LPIPS column is NaN.  Run "
            "floodgan_tpu/utils/export_lpips.py on a networked machine and "
            "commit the npz, or set FLOODGAN_LPIPS_FALLBACK=1 for a "
            "deterministic random-feature stand-in (not comparable to the "
            "trained metric)."
        )
        _warned = True
    return None
