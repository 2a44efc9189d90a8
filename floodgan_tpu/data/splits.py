"""Dataset split resolution over the metadata CSVs.

Semantics-equal rebuild of the reference's split logic (reference
models/data.py:83-146 flood, :203-218 masks), including the special
subsets ``harveyflorence`` / ``harveyonflorence`` / ``testing``, the
pinned random_state=47 shuffles, and the xcrop row expansion that turns
each quadrant into a distinct sample.  Returns plain python lists of
sample records consumed by the host loader.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional

import pandas as pd

_COUNTRIES = ("usa", "india")
_DISASTERS = (
    "hurricane-harvey",
    "hurricane-florence",
    "midwest-flooding",
    "nepal-flooding",
)


@dataclasses.dataclass(frozen=True)
class FloodSample:
    file_name: str      # "{image}_{dem}.tif" under dataset_input/
    version: str        # "original" | "flipped"
    crop_index: int     # 0 when crop is None

    @property
    def image_name(self) -> str:
        return self.file_name[:-8]  # strip "_{res}.tif" (reference data.py:61)


def _metadata_csv(name: str, metadata_dir: Optional[str]) -> str:
    # The reference reads "metadata/..." relative to CWD (data.py:87);
    # we allow an explicit directory and fall back to the same behavior.
    base = metadata_dir if metadata_dir is not None else "metadata"
    return os.path.join(base, name)


def _swap_split_for_transfer(df: pd.DataFrame, train_disasters, eval_disaster, flip_train_tests):
    """Shared shape of the two transfer subsets: train on some disasters
    (their test rows flipped and folded into train), validate *and* test on
    another disaster, dropping flipped eval rows."""
    extra = df[df["disaster"].isin(flip_train_tests) & (df["split"] == "test")].copy()
    extra["version"] = "flipped"
    df = pd.concat([df, extra], axis=0)
    df.loc[df["disaster"].isin(train_disasters), "split"] = "train"
    df.loc[df["disaster"] == eval_disaster, "split"] = "validation"
    as_test = df[df["disaster"] == eval_disaster].copy()
    as_test["split"] = "test"
    df = pd.concat([df, as_test], axis=0).reset_index(drop=True)
    drop = df[
        df["split"].isin(["test", "validation"]) & (df["version"] == "flipped")
    ].index
    return df.drop(drop)


def determine_flood_dataset(
    subset: str,
    dem: str,
    crop: Optional[int] = None,
    metadata_dir: Optional[str] = None,
) -> Dict[str, List[FloodSample]]:
    table = pd.read_csv(_metadata_csv("dataset_split.csv", metadata_dir))
    key = subset.lower()

    if key in _COUNTRIES:
        df = table[table["country"] == key].copy()
    elif key in _DISASTERS:
        df = table[table["disaster"] == key].copy()
    elif key == "harveyflorence":
        # Train on Harvey+Florence (tests flipped into train), val/test on
        # midwest-flooding (reference data.py:95-105).
        df = _swap_split_for_transfer(
            table[table["country"] == "usa"].copy(),
            train_disasters=("hurricane-harvey", "hurricane-florence"),
            eval_disaster="midwest-flooding",
            flip_train_tests=("hurricane-harvey", "hurricane-florence"),
        )
    elif key == "harveyonflorence":
        # Train on Harvey, val/test on Florence (reference data.py:106-116).
        df = _swap_split_for_transfer(
            table[table["disaster"].isin(["hurricane-harvey", "hurricane-florence"])].copy(),
            train_disasters=("hurricane-harvey",),
            eval_disaster="hurricane-florence",
            flip_train_tests=("hurricane-harvey",),
        )
    elif key == "testing":
        # 50 deterministic Harvey originals — the smoke-test fixture
        # (reference data.py:117-120).
        df = table[(table["disaster"] == "hurricane-harvey") & (table["version"] == "original")]
        df = df.sample(n=50, random_state=47)
    elif key == "all":
        df = table.copy()
    else:
        raise NotImplementedError("Unrecognised dataset subset name")

    if dem not in ("best", "same"):
        raise NotImplementedError("Unrecognised DEM name - provide 'best' or 'same'")

    df = df.assign(file_name=df["image"] + "_" + df[f"{dem}_DEM"] + ".tif")
    df = df.sample(frac=1, random_state=47)

    n_crops = crop if crop else 1
    out: Dict[str, List[FloodSample]] = {}
    for split_name in ("train", "validation", "test"):
        rows = df[df["split"] == split_name]
        # Reference expands by concatenating whole-split copies per crop
        # index (data.py:131-139): all crop-0 rows, then all crop-1 rows, ...
        out[split_name] = [
            FloodSample(fn, ver, ci)
            for ci in range(n_crops)
            for fn, ver in zip(rows["file_name"], rows["version"])
        ]
    return out


@dataclasses.dataclass(frozen=True)
class MaskSample:
    file_name: str  # same name under masks_input/ and masks_output/
    version: str


def determine_masks_dataset(
    subset: str,
    train_on_all: bool,
    metadata_dir: Optional[str] = None,
):
    table = pd.read_csv(_metadata_csv("masks_metadata.csv", metadata_dir))
    key = subset.lower()
    if key not in _COUNTRIES:
        raise NotImplementedError("Unrecognised dataset subset name")
    df = table[table["country"] == key]

    def to_samples(rows):
        return [MaskSample(fn, ver) for fn, ver in zip(rows["image"], rows["version"])]

    if train_on_all:
        return to_samples(df), None, None
    return tuple(
        to_samples(df[df["split"] == split_name])
        for split_name in ("train", "validation", "test")
    )
