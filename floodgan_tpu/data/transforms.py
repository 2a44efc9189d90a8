"""Device-side (jitted, batched) equivalents of the reference transforms.

The reference runs channel slicing / bicubic resize / quadrant crop /
normalisation per item on the CPU inside DataLoader workers (reference
models/utils.py:19-67) — its dominant input-pipeline cost.  Here the host
only decodes TIFFs; everything else runs as one fused XLA program over the
batch on device (SURVEY.md §7 layer 2).  Formulas are the golden spec from
utils.py:30-61, verified in tests/test_data.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from floodgan_tpu.ops.resize import resize_bicubic_antialias, shorter_edge_size


def slice_topography(x: jax.Array, topography: Optional[str]) -> jax.Array:
    """Channel selection on the 9-channel stack, NHWC (reference
    models/utils.py:30-39 / :69-79; channel order contract in §2.5)."""
    if topography == "all":
        return x
    if topography == "dem":
        return x[..., :4]
    if topography == "flow":
        return jnp.concatenate([x[..., :3], x[..., 4:5]], axis=-1)
    if topography == "river":
        return jnp.concatenate([x[..., :3], x[..., 5:6]], axis=-1)
    if topography == "map":
        return jnp.concatenate([x[..., :3], x[..., 6:]], axis=-1)
    if topography is None or topography == "none":
        return x[..., :3]
    raise NotImplementedError(f"unknown topography {topography!r}")


def _quadrant_crop(
    img: jax.Array, crop_index: jax.Array, crop: int
) -> jax.Array:
    """Quadrant crop of one HWC image with a traced crop index (reference
    models/utils.py:45-56): sqrt(crop) x sqrt(crop) grid, floor-divided
    cell sizes, row-major indexing."""
    h, w, _ = img.shape
    nd = int(np.sqrt(crop))
    rows_size, cols_size = h // nd, w // nd
    row = crop_index // nd
    col = crop_index % nd
    return jax.lax.dynamic_slice(
        img,
        (row * rows_size, col * cols_size, 0),
        (rows_size, cols_size, img.shape[2]),
    )


@functools.partial(
    jax.jit,
    static_argnames=("topography", "resize", "crop"),
)
def apply_transformations_batch(
    input_stack: jax.Array,   # (B, H, W, 9) float32
    output_image: jax.Array,  # (B, H, W, 3) float32
    flip: jax.Array,          # (B,) bool — "flipped" dataset versions
    crop_index: jax.Array,    # (B,) int32
    *,
    topography: Optional[str],
    resize: Optional[int],
    crop: Optional[int],
) -> Tuple[jax.Array, jax.Array]:
    """Batched twin of reference utils.apply_transformations plus the
    load-time fliplr (reference models/data.py:63-68): flip -> channel
    slice -> resize -> quadrant crop -> normalise to [-1, 1].

    Inputs may arrive bf16 (FLOODGAN_WIRE_DTYPE=bfloat16 halves the
    host->device transfer of the raw stacks); compute is f32 either way."""
    input_stack = input_stack.astype(jnp.float32)
    output_image = output_image.astype(jnp.float32)
    input_stack = jnp.where(
        flip[:, None, None, None], jnp.flip(input_stack, axis=2), input_stack
    )
    output_image = jnp.where(
        flip[:, None, None, None], jnp.flip(output_image, axis=2), output_image
    )

    input_stack = slice_topography(input_stack, topography)

    if resize:
        oh, ow = shorter_edge_size(input_stack.shape[1], input_stack.shape[2], resize)
        input_stack = resize_bicubic_antialias(input_stack, oh, ow)
        output_image = resize_bicubic_antialias(output_image, oh, ow)

    if crop:
        input_stack = jax.vmap(_quadrant_crop, in_axes=(0, 0, None))(
            input_stack, crop_index, crop
        )
        output_image = jax.vmap(_quadrant_crop, in_axes=(0, 0, None))(
            output_image, crop_index, crop
        )

    # Normalize(mean=0.5, std=0.5) -> [-1, 1] (reference utils.py:58-61).
    return input_stack * 2.0 - 1.0, output_image * 2.0 - 1.0


def denormalize(x: jax.Array) -> jax.Array:
    """[-1,1] -> [0,1] with clamping (reference models/model.py:397-398,
    models/utils.py:15-16)."""
    return jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)
