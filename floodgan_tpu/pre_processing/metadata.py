"""Offline ETL stage 1: metadata generation.

Capability twin of the reference's metadata builders (reference
pre_processing/data_pre_processing.py:19-153): geo-extent extraction from
the xBD GeoTIFFs (here via a pure-python GeoTIFF tag reader — no GDAL
dependency), the deterministic 80/10/10 per-disaster split with flipped
training/validation copies, and the masks split.  Not part of the runtime
path — the published Zenodo dataset ships pre-built (SURVEY.md §2.5).
"""

from __future__ import annotations

import os
from typing import List, Optional

import pandas as pd

from floodgan_tpu.data import tiff


def _wkt_polygon(x_min: float, y_min: float, x_max: float, y_max: float) -> str:
    """Valid WKT bbox polygon: a CLOSED ring (first point repeated last)
    wrapped in the double parentheses WKT consumers (shapely, PostGIS,
    ogr) require."""
    return (
        f"POLYGON (({x_min} {y_min}, {x_min} {y_max}, "
        f"{x_max} {y_max}, {x_max} {y_min}, {x_min} {y_min}))"
    )


def create_metadata(image_dir: str, out_csv: str, extend_degrees: float = 0.002) -> pd.DataFrame:
    """Geo-extent table for every pre-disaster GeoTIFF in ``image_dir``:
    bounding box from the GeoTIFF transform plus an extended x_max and a
    WKT polygon (columns per reference data_pre_processing.py:19-77)."""
    rows = []
    for name in sorted(os.listdir(image_dir)):
        if not name.endswith((".tif", ".tiff")):
            continue
        path = os.path.join(image_dir, name)
        # height/width straight from the IFD tags (256/257) — decoding the
        # whole raster for its shape made metadata generation orders of
        # magnitude slower than the single tag read it needs
        info = tiff.read_tags(path)
        w = int(info[256][0]) if isinstance(info[256], (list, tuple)) else int(info[256])
        h = int(info[257][0]) if isinstance(info[257], (list, tuple)) else int(info[257])
        x_min, y_max, px_w, px_h = tiff.geotransform(path)
        x_max = x_min + w * px_w
        y_min = y_max - h * px_h
        image = os.path.splitext(name)[0]
        polygon = _wkt_polygon(x_min, y_min, x_max, y_max)
        rows.append(
            dict(
                image=image,
                disaster=image.split("_")[0],
                x_min=x_min,
                y_min=y_min,
                x_max=x_max,
                y_max=y_max,
                x_max_extended=x_max + extend_degrees,
                polygon=polygon,
            )
        )
    df = pd.DataFrame(rows)
    df.to_csv(out_csv, index=False)
    return df


_COUNTRY = {
    "hurricane-harvey": "usa",
    "hurricane-florence": "usa",
    "midwest-flooding": "usa",
    "nepal-flooding": "india",
}


def create_dataset_split_metadata(
    images: List[str],
    dems: Optional[pd.DataFrame] = None,
    out_csv: Optional[str] = None,
    seed: int = 47,
) -> pd.DataFrame:
    """80/10/10 train/val/test split per disaster (random_state=47), with
    flipped copies of every train and validation row (reference
    data_pre_processing.py:79-124).  ``dems`` optionally maps image ->
    (best_DEM, same_DEM); defaults to 30m/30m."""
    rows = []
    for image in images:
        disaster = image.split("_")[0]
        best, same = "30m", "30m"
        if dems is not None and image in dems.index:
            best, same = dems.loc[image, "best_DEM"], dems.loc[image, "same_DEM"]
        rows.append(
            dict(image=image, best_DEM=best, same_DEM=same, disaster=disaster,
                 country=_COUNTRY.get(disaster, "usa"))
        )
    df = pd.DataFrame(rows)

    parts = []
    for disaster, group in df.groupby("disaster"):
        group = group.sample(frac=1, random_state=seed).reset_index(drop=True)
        n = len(group)
        n_train, n_val = int(n * 0.8), int(n * 0.1)
        group["split"] = "test"
        group.loc[: n_train - 1, "split"] = "train"
        group.loc[n_train : n_train + n_val - 1, "split"] = "validation"
        parts.append(group)
    out = pd.concat(parts, ignore_index=True)
    out["version"] = "original"
    flipped = out[out["split"].isin(["train", "validation"])].copy()
    flipped["version"] = "flipped"
    out = pd.concat([out, flipped], ignore_index=True)
    out = out[["image", "best_DEM", "same_DEM", "version", "split", "disaster", "country"]]
    if out_csv:
        out.to_csv(out_csv, index=False)
    return out


def create_masks_metadata(
    images: List[str], out_csv: Optional[str] = None, seed: int = 47
) -> pd.DataFrame:
    """Masks split metadata: 80/10/10 with flipped train copies (reference
    data_pre_processing.py:126-153).  Image names encode provenance
    (original_* vs generate_{Model}_*)."""
    df = pd.DataFrame({"image": list(images)})
    df["country"] = [
        "india" if "nepal" in img else "usa" for img in df["image"]
    ]
    df = df.sample(frac=1, random_state=seed).reset_index(drop=True)
    n = len(df)
    n_train, n_val = int(n * 0.8), int(n * 0.1)
    df["split"] = "test"
    df.loc[: n_train - 1, "split"] = "train"
    df.loc[n_train : n_train + n_val - 1, "split"] = "validation"
    df["version"] = "original"
    flipped = df[df["split"] == "train"].copy()
    flipped["version"] = "flipped"
    out = pd.concat([df, flipped], ignore_index=True)
    out = out[["image", "split", "version", "country"]]
    if out_csv:
        out.to_csv(out_csv, index=False)
    return out
