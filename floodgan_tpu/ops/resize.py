"""Bicubic+antialias image resize with torch/PIL semantics, as matmuls.

The reference resizes with torchvision
``Resize(size, antialias=True, interpolation=BICUBIC)`` (reference
models/utils.py:41-43), which lowers to the PIL-style separable filter with
the a=-0.5 cubic kernel.  A separable resample is exactly two dense
matrix multiplications — ideal for the TPU MXU — so we precompute the
(out, in) interpolation matrices in numpy at trace time (shapes are static
under jit) and contract on device.  This replaces the reference's per-item
CPU resize, its dominant input-pipeline cost (SURVEY.md §7).

Golden-tested against ``torch.nn.functional.interpolate(..., mode='bicubic',
antialias=True)`` in tests/test_ops_vs_torch.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _cubic(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Cubic convolution kernel.  a=-0.5 is the PIL kernel that torch's
    antialiased bicubic path uses (torch's *non*-antialiased bicubic uses
    a=-0.75; the reference always resizes with antialias=True)."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * (ax3 - 5.0 * ax2 + 8.0 * ax - 4.0), 0.0),
    )
    return w


@functools.lru_cache(maxsize=64)
def _resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) row-stochastic PIL/torch-AA resample matrix."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale  # cubic kernel radius is 2
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        js = np.arange(xmin, xmax)
        w = _cubic((js + 0.5 - center) / filterscale)
        total = w.sum()
        if total != 0.0:
            w = w / total
        mat[i, xmin:xmax] = w
    return mat.astype(np.float32)


def resize_bicubic_antialias(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Resize NHWC ``x`` to (out_h, out_w) with torch bicubic-AA semantics."""
    n, in_h, in_w, c = x.shape
    if (in_h, in_w) == (out_h, out_w):
        return x
    wh = jnp.asarray(_resize_matrix(in_h, out_h))
    ww = jnp.asarray(_resize_matrix(in_w, out_w))
    # (N,H,W,C) --wh--> (N,OH,W,C) --ww--> (N,OH,OW,C): two MXU contractions.
    y = jnp.einsum("oh,nhwc->nowc", wh, x, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("pw,nowc->nopc", ww, y, precision=jax.lax.Precision.HIGHEST)
    return y


def shorter_edge_size(h: int, w: int, size: int) -> Tuple[int, int]:
    """torchvision Resize(int) semantics: shorter edge -> size, keep aspect."""
    if h <= w:
        return size, max(1, int(round(size * w / h)))
    return max(1, int(round(size * h / w))), size
