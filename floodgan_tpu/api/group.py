"""Multi-model comparison API — twin of the reference's ``ModelsGroup``
(reference models/group.py:25-280): loads N pretrained generators
side-by-side, computes the shared metric suite with per-disaster grouping
(first 5 inference timings discarded as warmup, ref :198-200), and renders
input | ground-truth | per-model-output comparison grids."""

from __future__ import annotations

import os
import time
from collections import defaultdict
from typing import Dict, List, Optional

import jax
import numpy as np
import pandas as pd

from floodgan_tpu.api import paths as pathlib_
from floodgan_tpu.api.model import Model, to_display_image
from floodgan_tpu.data.pipeline import create_flood_dataset
from floodgan_tpu.data.transforms import denormalize, slice_topography
from floodgan_tpu.eval.metrics import (
    MS_SSIM_MIN_SIDE,
    MaskMetricsAccumulator,
    make_eval_batch_metrics,
)

# Display-name -> topography key for the ablation comparison
# (reference models/group.py:83-94).
_DISPLAY_TOPOGRAPHY = {
    "All": "all",
    "DEM": "dem",
    "Flow accumulation": "flow",
    "Distance to rivers": "river",
    "Map": "map",
    "None": None,
}


class ModelsGroup:
    def __init__(
        self,
        paths: Dict[str, str],
        compare: str,
        dataset_subset: str,
        dataset_dem: str,
        data_path: str,
        resize: Optional[int],
        crop: Optional[int],
        crop_index: int,
        topography: Optional[str],
        metadata_dir: Optional[str] = None,
        lpips_weights: Optional[str] = None,
    ):
        self.paths = paths
        self.compare = compare
        self.dataset_subset = dataset_subset
        self.dataset_dem = dataset_dem
        self.data_path = data_path
        self.resize = resize
        self.crop = crop
        self.crop_index = crop_index
        self.topography = topography
        self.metadata_dir = metadata_dir
        self.lpips_weights = lpips_weights
        self.models: Dict[str, Model] = {}

        for model_name, path in self.paths.items():
            if not os.path.isfile(path):
                raise FileNotFoundError(
                    f"Saved {model_name} model not found. Check the path to the {model_name} model."
                )
            if self.compare == "topography":
                model_topography = _DISPLAY_TOPOGRAPHY[model_name]
            else:
                model_topography = self.topography
            # Architecture comes from the checkpoint itself (self-describing),
            # like the reference infers it from the filename prefix (ref :61).
            self.models[model_name] = Model(
                dataset_subset=self.dataset_subset,
                dataset_dem=self.dataset_dem,
                data_path=self.data_path,
                resize=self.resize,
                crop=self.crop,
                load_pretrained_model=True,
                pretrained_model_path=path,
                training_model=False,
                topography=model_topography,
                verbose=True,
                metadata_dir=metadata_dir,
                lpips_weights=lpips_weights,
            )

        overall_topography = "all" if self.compare == "topography" else self.topography
        self.train_loader, self.val_loader, self.test_loader = create_flood_dataset(
            self.dataset_subset,
            self.dataset_dem,
            self.data_path,
            overall_topography,
            self.resize,
            self.crop,
            metadata_dir=metadata_dir,
        )

    # ------------------------------------------------------------- helpers

    def extract_input_topography(self, input_image) -> Dict[str, jax.Array]:
        """Display-name-keyed channel slicing of the full 9ch stack
        (reference models/group.py:83-94)."""
        return {
            name: slice_topography(input_image, key)
            for name, key in _DISPLAY_TOPOGRAPHY.items()
        }

    def create_path(self, save_type: str, info: str = "") -> str:
        topography = "different" if self.compare == "topography" else self.topography
        return pathlib_.group_artifact_path(
            self.data_path, save_type, self.compare, info, topography,
            self.dataset_subset, self.dataset_dem, self.resize, self.crop,
        )

    # ------------------------------------------------------------- metrics

    def compare_metrics(self, use_test_data: bool, seg_model_path: str):
        """(reference models/group.py:114-221)"""
        from floodgan_tpu.api.segmentation import SegmentationModel

        seg = SegmentationModel(
            data_path=self.data_path,
            pretrained_model_path=seg_model_path,
            train=False,
            metadata_dir=self.metadata_dir,
            skip_data=True,
        )
        lpips = next(iter(self.models.values())).lpips
        eval_batch_metrics = make_eval_batch_metrics(seg.trainer._predict_mask)

        per_image = {
            k: defaultdict(list) for k in ["PSNR", "SSIM", "MS-SSIM", "LPIPS", "Inference"]
        }
        mask_acc = defaultdict(MaskMetricsAccumulator)
        mask_acc_grouped = defaultdict(MaskMetricsAccumulator)
        image_names: List[str] = []

        print("\nCalculating metrics...")
        loader = self.test_loader if use_test_data else self.val_loader
        for batch in loader.epoch_iter(epoch=0):
            x, y = batch["input"], batch["output"]
            for b in range(x.shape[0]):
                image_names.append(batch["names"][b])
            disasters = [n.split("_")[0] for n in batch["names"]]

            topography_inputs = (
                self.extract_input_topography(x) if self.compare == "topography" else None
            )
            # The ground-truth mask is identical for every compared model:
            # run the y-side U-Net once per batch and feed it to each
            # model's fused metric call — N models pay 1 + N seg forwards
            # per batch instead of 2N.
            batch_true_mask = eval_batch_metrics.true_mask(seg.state.params, y)
            # Drain the queue before the first model's timed generate —
            # a pending U-Net forward would otherwise inflate its
            # per-image Inference bracket (reference group.py:155-159
            # times each generator call alone).
            batch_true_mask.block_until_ready()

            for name, model in self.models.items():
                xin = topography_inputs[name] if topography_inputs is not None else x
                start = time.time()
                out, _ = model.generate(xin)
                out.block_until_ready()
                inference_time = time.time() - start

                ms_ok = min(out.shape[1], out.shape[2]) >= MS_SSIM_MIN_SIDE
                # One compiled metric block + one device_get per
                # (model, batch) — see eval/metrics.make_eval_batch_metrics
                # (measured +10% on the single-model eval loop; this loop
                # previously added B extra per-image seg dispatches for
                # the disaster grouping on top).
                imgm, counts = jax.device_get(
                    eval_batch_metrics.with_true_mask(
                        seg.state.params, out, y, batch_true_mask,
                        with_ms_ssim=ms_ok,
                    )
                )
                per_image["PSNR"][name].extend(imgm["PSNR"].tolist())
                per_image["SSIM"][name].extend(imgm["SSIM"].tolist())
                per_image["MS-SSIM"][name].extend(
                    imgm["MS-SSIM"].tolist() if ms_ok else [float("nan")] * out.shape[0]
                )
                if lpips is not None:
                    out01, y01 = denormalize(out), denormalize(y)
                    per_image["LPIPS"][name].extend(np.asarray(lpips(out01, y01)).tolist())
                else:
                    per_image["LPIPS"][name].extend([float("nan")] * out.shape[0])
                # per-image wall time (batch call amortized) — keeps the
                # reference's per-image Inference semantics and the 5-sample
                # warmup discard meaningful at --batch_size > 1.
                per_image["Inference"][name].extend(
                    [inference_time / xin.shape[0]] * xin.shape[0]
                )

                mask_acc[name].add_counts(counts)
                for b, disaster in enumerate(disasters):
                    mask_acc_grouped[f"{name}_{disaster}"].add_counts(counts[b])

        # warmup discard (reference :198-200 drops the first model's first 5)
        for name in self.models:
            per_image["Inference"][name] = per_image["Inference"][name][5:]
            break

        mask_keys = [
            "MSE", "Accuracy", "F1_Flood", "Precision_Flood", "Recall_Flood",
            "F1_No_Flood", "Precision_No_Flood", "Recall_No_Flood",
            "IoU_Flood", "IoU_No_Flood",
        ]
        disaster_names = sorted(set(n.split("_")[0] for n in image_names))

        rows = {}
        mask_results = {name: mask_acc[name].compute() for name in self.models}
        for name in self.models:
            row = {k: float(np.mean(v[name])) for k, v in per_image.items()}
            row.update({k: mask_results[name][k] for k in mask_keys})
            rows[name] = row
        average_metrics = pd.DataFrame(rows).transpose()
        print(average_metrics)
        average_metrics.index.name = "Model"
        average_metrics.to_csv(self.create_path("metric"))

        # per-disaster grouped CSV (reference :211-221)
        grouped_rows = []
        for metric in ["PSNR", "SSIM", "MS-SSIM", "LPIPS"]:
            for name in self.models:
                vals = pd.Series(per_image[metric][name])
                dis = pd.Series([n.split("_")[0] for n in image_names])
                means = vals.groupby(dis).mean()
                grouped_rows.append(
                    {"Metric_Model": f"{metric}_{name}", **{d: means.get(d, np.nan) for d in disaster_names}}
                )
        for name in self.models:
            for metric in mask_keys:
                row = {"Metric_Model": f"{metric}_{name}"}
                for disaster in disaster_names:
                    acc = mask_acc_grouped.get(f"{name}_{disaster}")
                    row[disaster] = acc.compute()[metric] if acc else np.nan
                grouped_rows.append(row)
        grouped = pd.DataFrame(grouped_rows).sort_values(["Metric_Model"])
        grouped.to_csv(self.create_path("metric", info="grouped"), index=False)
        return average_metrics

    # --------------------------------------------------------------- plots

    def compare_output_images(self, image_names: List[str]) -> None:
        """(reference models/group.py:223-280) — grid of
        input | ground truth | each model's output, with optional per-image
        '_index' crop suffixes (ref :236-241)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n_rows = len(image_names)
        n_cols = len(self.models) + 2
        fig, axes = plt.subplots(
            nrows=n_rows, ncols=n_cols,
            figsize=(n_cols * 5, n_rows * 5 + 0.5 * n_rows),
        )
        axes = np.atleast_2d(axes)
        for ax in axes.ravel():
            ax.set_axis_off()

        any_model = next(iter(self.models.values()))
        for i, image_name in enumerate(image_names):
            if len(image_name) > 1 and image_name[-2] == "_":
                final_crop_index = int(image_name[-1])
                image_name = image_name[:-2]
            else:
                final_crop_index = self.crop_index

            # Load via a model whose topography is the full stack so the
            # ablation slicing can be applied per model.
            loader_model = any_model
            if self.compare == "topography":
                loader_model = self.models.get("All", any_model)
            x, y, display_name = loader_model._load_named_image(image_name, final_crop_index)

            topography_inputs = (
                self.extract_input_topography(x) if self.compare == "topography" else None
            )
            axes[i, 0].imshow(to_display_image(x), vmin=0, vmax=1)
            axes[i, 0].set_title(f"Input ({display_name})")
            axes[i, 1].imshow(to_display_image(y), vmin=0, vmax=1)
            axes[i, 1].set_title("Ground truth")
            for j, (name, model) in enumerate(self.models.items(), start=2):
                xin = topography_inputs[name] if topography_inputs is not None else x
                out, _ = model.generate(xin)
                axes[i, j].imshow(to_display_image(out), vmin=0, vmax=1)
                axes[i, j].set_title(name)

        fig.tight_layout()
        info = image_names[0] if len(image_names) == 1 else ""
        images_path = self.create_path(save_type="image", info=info)
        print(f"\nSaving comparison of {self.compare} images to {images_path}")
        fig.savefig(images_path, bbox_inches="tight")
        plt.close(fig)
