"""Offline ETL stages 2-3: raster normalisation + 9-channel stack assembly.

Capability twin of the reference's stack builders (reference
pre_processing/data_pre_processing.py:198-205 DEM render, :249-296
river/flow renders, :300-420 stack assembly + cloud-mask application).
Defines and enforces the load-bearing channel-order contract consumed by
the whole runtime (SURVEY.md §2.5):

  0-2 pre-flood RGB (/255), 3 DEM, 4 flow accumulation, 5 river distance,
  6-8 OSM map (/255).
"""

from __future__ import annotations

import os
import numpy as np

from floodgan_tpu.data import tiff

CHANNELS = {
    "rgb": slice(0, 3),
    "dem": 3,
    "flow": 4,
    "river": 5,
    "map": slice(6, 9),
}


def render_dem(dem: np.ndarray, resolution: str = "30m") -> np.ndarray:
    """(x - min)/100 normalisation; 1m DEMs clamp negatives (reference
    data_pre_processing.py:198-205)."""
    dem = dem.astype(np.float32)
    if resolution == "01m":
        dem = np.maximum(dem, 0.0)
    return (dem - dem.min()) / 100.0


def render_river_distance(raster: np.ndarray) -> np.ndarray:
    """/255 normalisation (reference :257-267)."""
    return raster.astype(np.float32) / 255.0


def render_flow_accumulation(raster: np.ndarray) -> np.ndarray:
    """/5.5 normalisation of log-scaled flow accumulation (reference
    :287-296)."""
    return raster.astype(np.float32) / 5.5


def create_input_stack(
    pre_rgb: np.ndarray,     # (H, W, 3) uint8 or float
    dem: np.ndarray,         # (H, W) or (H, W, C) - averaged to 1ch
    flow: np.ndarray,        # (H, W)
    river: np.ndarray,       # (H, W)
    osm: np.ndarray,         # (H, W, 3+) - first 3 channels used
) -> np.ndarray:
    """Assemble the 9-channel float32 input stack (reference :300-420):
    pre-RGB/255 ⊕ DEM(channel-mean) ⊕ flow ⊕ river ⊕ OSM-RGB/255."""
    h, w = pre_rgb.shape[:2]
    rgb = pre_rgb.astype(np.float32)
    if rgb.max() > 1.5:
        rgb = rgb / 255.0
    if dem.ndim == 3:
        dem = dem.mean(axis=2)
    osm_rgb = osm[:, :, :3].astype(np.float32)
    if osm_rgb.max() > 1.5:
        osm_rgb = osm_rgb / 255.0
    for name, arr in (("dem", dem), ("flow", flow), ("river", river)):
        if arr.shape[:2] != (h, w):
            raise ValueError(f"{name} raster shape {arr.shape[:2]} != image {h, w}")
    stack = np.concatenate(
        [
            rgb,
            dem.astype(np.float32)[:, :, None],
            flow.astype(np.float32)[:, :, None],
            river.astype(np.float32)[:, :, None],
            osm_rgb,
        ],
        axis=2,
    )
    return stack.astype(np.float32)


def create_output(post_rgb: np.ndarray) -> np.ndarray:
    """Post-disaster RGB target, /255 float32 (reference :395-404)."""
    out = post_rgb.astype(np.float32)
    if out.max() > 1.5:
        out = out / 255.0
    return out[:, :, :3]


def apply_masks(image: np.ndarray, cloud_mask: np.ndarray) -> np.ndarray:
    """Multiply a (H, W[,1]) 0/1 cloud mask into every channel (reference
    :330-352)."""
    if cloud_mask.ndim == 2:
        cloud_mask = cloud_mask[:, :, None]
    return (image * cloud_mask.astype(image.dtype)).astype(image.dtype)


def write_dataset_pair(
    out_dir: str,
    image_name: str,
    dem_resolution: str,
    input_stack: np.ndarray,
    output_image: np.ndarray,
) -> None:
    """Write dataset_input/{image}_{res}.tif + dataset_output/{image}.tif
    with the runtime loader's expected naming (reference :300-327)."""
    os.makedirs(os.path.join(out_dir, "dataset_input"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "dataset_output"), exist_ok=True)
    tiff.imwrite(
        os.path.join(out_dir, "dataset_input", f"{image_name}_{dem_resolution}.tif"),
        input_stack.astype(np.float32),
    )
    tiff.imwrite(
        os.path.join(out_dir, "dataset_output", f"{image_name}.tif"),
        output_image.astype(np.float32),
    )
