"""Flood-segmentation model API — twin of the reference's
``SegmentationModel`` (reference models/segmentation_model.py:19-277):
U-Net trainer/evaluator with BCE loss, pixel-accuracy tracking, metric
suite over pixel-concatenated splits, and mask/loss/sample plotting."""

from __future__ import annotations

import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from floodgan_tpu.api import paths as pathlib_
from floodgan_tpu.ckpt import load_checkpoint, save_checkpoint
from floodgan_tpu.core.config import TrainConfig, lambda_rule
from floodgan_tpu.core.rng import RngStreams
from floodgan_tpu.data.pipeline import create_masks_dataset
from floodgan_tpu.eval.metrics import MaskMetricsAccumulator
from floodgan_tpu.train.seg import SegTrainer
from flax import serialization


class SegmentationModel:
    def __init__(
        self,
        dataset_subset: str = "usa",
        data_path: Optional[str] = None,
        num_epochs: int = 100,
        train_on_all: bool = False,
        save_model_interval: int = 0,
        save_images_interval: int = 0,
        verbose: bool = True,
        pretrained_model_path: Optional[str] = None,
        train: bool = False,
        plot_mask_image: Optional[str] = None,
        use_test_data: bool = False,
        seed: int = 47,
        batch_size: int = 1,
        metadata_dir: Optional[str] = None,
        compute_dtype: str = "float32",
        remat: bool = False,
        train_cfg: TrainConfig = TrainConfig(),
        skip_data: bool = False,
    ):
        if verbose:
            print("\nSetting up the flood segmentation model...")

        self.num_epochs = num_epochs
        self.verbose = verbose
        self.save_model_interval = save_model_interval
        self.save_images_interval = save_images_interval
        self.data_path = data_path
        self.dataset_subset = dataset_subset
        self.train_on_all = train_on_all
        self.train = train
        self.pretrained_model_path = pretrained_model_path
        self.seed = seed
        self.batch_size = batch_size
        self.metadata_dir = metadata_dir
        self.train_cfg = train_cfg
        self.starting_epoch = 1
        self.current_epoch = 1
        self.all_losses: List[float] = []
        self.all_accuracies: List[float] = []
        self.streams = RngStreams(seed)

        self.trainer = SegTrainer(cfg=train_cfg, compute_dtype=compute_dtype, remat=remat)
        # Mask images are uncropped/unresized in the reference pipeline;
        # shapes are data-dependent, so init with a small dummy (conv
        # params are shape-independent in channels-only terms).
        sample = jnp.zeros((1, 32, 32, 3), jnp.float32)
        self.state = self.trainer.init(self.streams.init("segmentation"), sample)

        if self.pretrained_model_path:
            from floodgan_tpu.utils.migrate import maybe_migrate

            # reference torch .pth.tar checkpoints auto-migrate on load
            self.pretrained_model_path = maybe_migrate(
                self.pretrained_model_path, "seg"
            )
            meta, raw = load_checkpoint(self.pretrained_model_path)
            self.current_epoch = meta["current_epoch"]
            self.num_epochs = meta["num_epochs"]
            self.all_losses = list(meta["all_losses"])
            self.all_accuracies = list(meta["all_accuracies"])
            self.state = serialization.from_state_dict(self.state, raw)

        if skip_data:
            self.train_loader = self.val_loader = self.test_loader = None
        else:
            self.train_loader, self.val_loader, self.test_loader = create_masks_dataset(
                dataset_subset=self.dataset_subset,
                path=self.data_path,
                train_on_all=self.train_on_all,
                batch_size=self.batch_size,
                metadata_dir=self.metadata_dir,
            )

    # ------------------------------------------------------------- helpers

    def create_path(self, save_type: str) -> str:
        return pathlib_.seg_artifact_path(
            self.data_path,
            save_type,
            self.current_epoch if self.train else self.current_epoch - 1,
            self.dataset_subset,
        )

    def predict_logits(self, image):
        return self.trainer.predict_logits(self.state.params, image)

    def predict_mask(self, image):
        """sigmoid > 0.5 float mask (reference :244-248)."""
        return self.trainer.predict_mask(self.state.params, image)

    def tensor_to_mask(self, tensor, predicted: bool = True):
        if predicted:
            return (jax.nn.sigmoid(tensor) > 0.5).astype(jnp.float32)
        return (tensor > 0.5).astype(jnp.float32)

    # ------------------------------------------------------------ training

    def train_model(self) -> None:
        """(reference models/segmentation_model.py:250-277)"""
        for epoch in range(self.starting_epoch, self.num_epochs + 1):
            epoch_start_time = time.time()
            step_metrics = []
            lr = jnp.float32(self.train_cfg.seg_lr * lambda_rule(epoch - 1, self.num_epochs))
            for batch in self.train_loader.epoch_iter(epoch):
                self.state, metrics = self.trainer.train_step(
                    self.state, batch["input"], batch["output"], lr
                )
                step_metrics.append(metrics)
            hosts = jax.device_get(step_metrics)
            losses = [float(h["loss"]) for h in hosts]
            accuracies = [float(h["accuracy"]) for h in hosts]
            self.save_results(epoch, losses, accuracies, epoch_start_time)

    def save_results(self, epoch, losses, accuracies, epoch_start_time) -> None:
        """(reference :107-134)"""
        self.current_epoch = epoch
        self.all_losses.append(float(np.mean(losses)))
        self.all_accuracies.append(float(np.mean(accuracies)))

        if self.verbose:
            print(
                f"Epoch {epoch} ({time.time() - epoch_start_time:.2f} seconds) | "
                f"Loss = {self.all_losses[-1]:.2f} | "
                f"Accuracy = {self.all_accuracies[-1]:.2f}"
            )

        if self.save_model_interval != 0 and epoch % self.save_model_interval == 0:
            self.save_checkpoint(epoch)

        if self.save_images_interval != 0 and epoch % self.save_images_interval == 0:
            self.plot_sample_images(num_images=10, use_test_data=False)
            self.plot_loss()

    def save_checkpoint(self, epoch: int) -> str:
        meta = {
            "current_epoch": epoch + 1,
            "num_epochs": self.num_epochs,
            "all_losses": self.all_losses,
            "all_accuracies": self.all_accuracies,
        }
        model_path = self.create_path(save_type="model")
        print(f"Saving flood segmentation model to {model_path}")
        save_checkpoint(model_path, meta, jax.device_get(self.state))
        return model_path

    # ------------------------------------------------------------- metrics

    def calculate_metrics(self, use_test_data: bool = False):
        """(reference :136-177) — metrics over the pixel concatenation of
        the whole split."""
        import functools

        import jax

        from floodgan_tpu.eval.metrics import _confusion_counts_per_image

        loader = self.test_loader if use_test_data else self.val_loader
        acc = MaskMetricsAccumulator()
        print("\nCalculating metrics...")

        # One compiled dispatch + one 4-int fetch per batch (U-Net forward
        # + both thresholds + confusion counts), the same fusion the GAN
        # eval loop measured +10% from (eval/metrics.py).  Threshold
        # bodies are the class's own tensor_to_mask semantics
        # (reference segmentation_model.py:244-248).
        @functools.partial(jax.jit)
        def seg_eval_batch(params, image, true):
            pred = self.trainer._predict_mask(params, image)
            tm = (true > 0.5).astype(pred.dtype)
            return _confusion_counts_per_image(pred, tm)

        for batch in loader.epoch_iter(epoch=0):
            acc.add_counts(
                seg_eval_batch(self.state.params, batch["input"], batch["output"])
            )
        results = acc.compute()
        order = [
            "MSE", "Accuracy", "F1_Flood", "Precision_Flood", "Recall_Flood",
            "F1_No_Flood", "Precision_No_Flood", "Recall_No_Flood",
            "IoU_Flood", "IoU_No_Flood",
        ]
        df = pd.DataFrame([(k, results[k]) for k in order]).set_index(0).transpose()
        print(df)
        df.to_csv(self.create_path("metric"))
        return results

    # --------------------------------------------------------------- plots

    def plot_loss(self) -> None:
        """(reference :179-194)"""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(nrows=1, ncols=1, figsize=(10, 7))
        ax.tick_params(axis="both", which="major", labelsize=14)
        ax.set_xlabel("Epoch", fontsize=14)
        ax.set_ylabel("Loss", fontsize=14)
        ax.set_title("Training loss", fontsize=15)
        ax.plot(range(1, len(self.all_losses) + 1), self.all_losses, c="black", linewidth=2)
        losses_path = self.create_path(save_type="figure")
        print(f"Saving losses figure to {losses_path}")
        fig.savefig(losses_path, bbox_inches="tight")
        plt.close(fig)

    def plot_mask_image(self, path_to_image: str) -> None:
        """(reference :196-207) — arbitrary PNG -> binary mask PNG."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        image_name = path_to_image.split("/")[-1][:-4]
        img = plt.imread(path_to_image)[:, :, :3].astype(np.float32)[None]
        mask = np.asarray(self.predict_mask(jnp.asarray(img)))[0, :, :, 0]
        out = pathlib_.ensure_parent(
            f"{self.data_path}/images/SegmentationMask_{image_name}_{pathlib_.timestamp()}.png"
        )
        print(f"\nSaving segmentation mask for '{image_name}' to {out}")
        plt.imsave(out, mask, vmin=0, vmax=1, cmap="gray")

    def plot_sample_images(self, num_images: int, use_test_data: bool = False) -> None:
        """(reference :209-242)"""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        loader = self.test_loader if use_test_data else self.val_loader
        fig, axes = plt.subplots(nrows=num_images, ncols=3, figsize=(15, num_images * 5))
        axes = np.atleast_2d(axes)
        for ax in axes.ravel():
            ax.set_axis_off()
        plotted = 0
        for batch in loader.epoch_iter(epoch=self.seed):
            for b in range(batch["input"].shape[0]):
                img = np.clip(np.asarray(batch["input"][b]), 0, 1)
                true_mask = np.asarray(
                    self.tensor_to_mask(batch["output"][b:b + 1], predicted=False)
                )[0, :, :, 0]
                pred_mask = np.asarray(self.predict_mask(batch["input"][b:b + 1]))[0, :, :, 0]
                axes[plotted, 0].imshow(img, vmin=0, vmax=1)
                axes[plotted, 1].imshow(true_mask, vmin=0, vmax=1, cmap="gray")
                axes[plotted, 2].imshow(pred_mask, vmin=0, vmax=1, cmap="gray")
                axes[plotted, 0].set_title(f"Input ({batch['names'][b]})")
                axes[plotted, 1].set_title("Ground Truth Mask")
                axes[plotted, 2].set_title("Predicted Mask")
                plotted += 1
                if plotted >= num_images:
                    break
            if plotted >= num_images:
                break
        fig.tight_layout()
        images_path = self.create_path("image")
        print("Saving sample images to", images_path)
        fig.savefig(images_path, bbox_inches="tight")
        plt.close(fig)
