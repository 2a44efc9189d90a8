"""Synthetic on-disk dataset fixture mirroring the 9-channel contract
(SURVEY.md §2.5): tiny float32 TIFF stacks + metadata CSVs shaped exactly
like the reference's metadata/dataset_split.csv and masks_metadata.csv."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from floodgan_tpu.data import tiff


def make_flood_fixture(root, size=32, n_per_disaster=3, seed=7):
    """Create dataset_input/, dataset_output/, metadata/ under ``root``.

    Returns (data_path, metadata_dir).
    """
    rng = np.random.default_rng(seed)
    data_path = str(root)
    meta_dir = os.path.join(data_path, "metadata")
    os.makedirs(os.path.join(data_path, "dataset_input"), exist_ok=True)
    os.makedirs(os.path.join(data_path, "dataset_output"), exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)

    rows = []
    disasters = [
        ("hurricane-harvey", "usa"),
        ("hurricane-florence", "usa"),
        ("midwest-flooding", "usa"),
        ("nepal-flooding", "india"),
    ]
    splits = ["train", "validation", "test"]
    for disaster, country in disasters:
        for i in range(n_per_disaster):
            image = f"{disaster}_{i:08d}"
            best, same = ("01m", "10m") if country == "usa" else ("30m", "30m")
            split = splits[i % len(splits)]
            for version in ("original", "flipped") if split == "train" else ("original",):
                rows.append(
                    dict(image=image, best_DEM=best, same_DEM=same,
                         version=version, split=split, disaster=disaster,
                         country=country)
                )
            stack = rng.random((size, size, 9), dtype=np.float32)
            post = rng.random((size, size, 3), dtype=np.float32)
            for dem in {best, same}:
                tiff.imwrite(
                    os.path.join(data_path, "dataset_input", f"{image}_{dem}.tif"),
                    stack,
                )
            tiff.imwrite(
                os.path.join(data_path, "dataset_output", f"{image}.tif"), post
            )
    pd.DataFrame(rows).to_csv(os.path.join(meta_dir, "dataset_split.csv"), index=False)
    return data_path, meta_dir


def make_masks_fixture(root, size=32, n=6, seed=11):
    rng = np.random.default_rng(seed)
    data_path = str(root)
    meta_dir = os.path.join(data_path, "metadata")
    os.makedirs(os.path.join(data_path, "masks_input"), exist_ok=True)
    os.makedirs(os.path.join(data_path, "masks_output"), exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)

    rows = []
    splits = ["train", "train", "train", "validation", "test", "train"]
    for i in range(n):
        name = f"original_hurricane-harvey_{i:08d}_0.tif"
        rows.append(
            dict(image=name, split=splits[i % len(splits)],
                 version="flipped" if i == 5 else "original", country="usa")
        )
        tiff.imwrite(
            os.path.join(data_path, "masks_input", name),
            rng.random((size, size, 3), dtype=np.float32),
        )
        tiff.imwrite(
            os.path.join(data_path, "masks_output", name),
            (rng.random((size, size), dtype=np.float32) > 0.5).astype(np.float32),
        )
    pd.DataFrame(rows).to_csv(os.path.join(meta_dir, "masks_metadata.csv"), index=False)
    return data_path, meta_dir
