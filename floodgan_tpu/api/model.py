"""The central GAN train/eval object — public-API twin of the reference's
``Model`` class (reference models/model.py:26-758), rebuilt around jitted
train steps, device-side data transforms, and self-describing checkpoints.

Key behavioral contracts preserved:
- self-describing checkpoints: when resuming/evaluating, model name,
  num_epochs, topography and identity-loss flag come from the file
  (ref :52-57);
- per-epoch deterministic data order and RNG (ref :609/:676), fixed
  inference key for stochastic eval (ref :393/:497/:579);
- LambdaLR schedule applied per epoch (ref :123-124, :175-181);
- loss bookkeeping schema (ref :183-205), per-epoch means into
  ``all_losses``, same verbose print format (ref :296-333);
- metadata-encoded artifact filenames (ref :241-258);
- metric suite semantics (ref :363-422).

TPU-native extensions: batch_size > 1, data-parallel execution over a
``data`` mesh (see parallel/mesh.py), bf16 compute policy (bench path).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from floodgan_tpu.api import paths as pathlib_
from floodgan_tpu.ckpt import AsyncCheckpointer, load_checkpoint, save_checkpoint
from floodgan_tpu.core.config import (
    TOPOGRAPHY_CHANNELS,
    TrainConfig,
    lambda_rule,
    model_is_attention,
    model_is_cycle,
    prettify_model_name,
)
from floodgan_tpu.core.rng import RngStreams
from floodgan_tpu.data.pipeline import create_flood_dataset
from floodgan_tpu.data.transforms import denormalize
from floodgan_tpu.eval.lpips import load_lpips
from floodgan_tpu.eval.metrics import MaskMetricsAccumulator
from floodgan_tpu.parallel.mesh import make_mesh, replicate_tree, shard_images
from floodgan_tpu.train.cycle import CycleTrainer
from floodgan_tpu.train.paired import PairedTrainer
from flax import serialization


def _adapt_cycle_buffer_layout(template_state, raw: dict) -> dict:
    """Convert cycle replay-buffer arrays between image and 2x2 phase
    layouts when a checkpoint was written under the other
    FLOODGAN_CYCLE_PHASE_D setting — the buffers hold the same images
    either way, just space-to-depth'd, so checkpoints stay interchangeable.
    Uses the ONE phase-layout implementation (ops.nn_ops) so the stored
    channel convention can never drift from what the phase convs expect."""
    from floodgan_tpu.ops.nn_ops import depth_to_space_phases, space_to_depth_phases

    raw = dict(raw)
    for key in ("pre_buffer", "post_buffer"):
        if key not in raw:
            continue
        want = tuple(getattr(template_state, key).images.shape)
        have = np.asarray(raw[key]["images"])
        if tuple(have.shape) == want:
            continue
        n, a, b, c = have.shape
        if (n, a // 2, b // 2, 4 * c) == want:  # image ckpt -> phase run
            converted = np.asarray(space_to_depth_phases(jnp.asarray(have)))
        elif (n, 2 * a, 2 * b, c // 4) == want:  # phase ckpt -> image run
            converted = np.asarray(
                depth_to_space_phases(jnp.asarray(have), 2 * a, 2 * b, c // 4)
            )
        else:
            raise ValueError(
                f"checkpoint {key} images {have.shape} are incompatible with "
                f"the current buffer layout {want}"
            )
        raw[key] = dict(raw[key], images=converted)
    return raw


def _safe_print(msg: str) -> None:
    """print that survives an orphaned or closed stdout (parent process
    gone mid-preemption, supervisor closed the fd) — losing a log line
    must never cost a checkpoint."""
    try:
        print(msg)
    except (BrokenPipeError, ValueError, OSError):
        pass


def to_display_image(x) -> np.ndarray:
    """NHWC/HWC tensor -> HWC numpy RGB in [0, 1] (reference
    models/utils.py:8-17 ``tensor_to_numpy``)."""
    arr = np.asarray(x)
    if arr.ndim == 4:
        arr = arr[0]
    if arr.ndim == 3:
        arr = arr[:, :, :3]
        arr = np.clip((arr + 1.0) * 0.5, 0.0, 1.0)
    return arr


class Model:
    def __init__(
        self,
        model: str = "pix2pix",
        dataset_subset: str = "all",
        dataset_dem: str = "best",
        data_path: Optional[str] = None,
        num_epochs: int = 1,
        topography: Optional[str] = "all",
        resize: Optional[int] = 256,
        crop: Optional[int] = None,
        save_model_interval: int = 0,
        save_images_interval: int = 0,
        verbose: bool = False,
        load_pretrained_model: bool = False,
        pretrained_model_path: Optional[str] = None,
        add_identity_loss: bool = False,
        training_model: bool = True,
        seed: int = 47,
        # TPU-native extensions:
        batch_size: int = 1,
        num_data_devices: int = 1,
        num_spatial_devices: int = 1,
        metadata_dir: Optional[str] = None,
        lpips_weights: Optional[str] = None,
        compute_dtype: str = "float32",
        remat: bool = False,
        remat_policy: Optional[str] = None,
        async_checkpoint: bool = False,
        train_cfg: TrainConfig = TrainConfig(),
    ):
        if verbose:
            print(f"\nSetting up the {prettify_model_name(model)} model...")

        # -- config, possibly reconstructed from a self-describing ckpt --
        saved_meta = saved_state = None
        if load_pretrained_model:
            from floodgan_tpu.utils.migrate import maybe_migrate

            # reference-format .pth.tar files load directly (auto-migrated
            # once; reference models/model.py:52-57 is the parity surface)
            pretrained_model_path = maybe_migrate(
                pretrained_model_path, "gan", resize=resize, crop=crop
            )
            saved_meta, saved_state = load_checkpoint(pretrained_model_path)
            self.model = saved_meta["model"]
            self.num_epochs = saved_meta["num_epochs"]
            self.topography = saved_meta["topography"]
            self.add_identity_loss = saved_meta["add_identity_loss"]
        else:
            self.model = model.lower()
            self.num_epochs = num_epochs
            self.topography = topography.lower() if isinstance(topography, str) else topography
            if self.topography in ("none", ""):
                self.topography = None
            self.add_identity_loss = add_identity_loss
        self.verbose = verbose
        self.save_model_interval = save_model_interval
        self.save_images_interval = save_images_interval
        self.load_pretrained_model = load_pretrained_model
        self.data_path = data_path
        self.dataset_subset = dataset_subset
        self.dataset_dem = dataset_dem
        self.resize = resize
        self.crop = crop
        self.training_model = training_model
        self.seed = seed
        self.batch_size = batch_size
        self.metadata_dir = metadata_dir
        self.train_cfg = train_cfg
        self.model_is_cycle = model_is_cycle(self.model)
        self.model_is_attention = model_is_attention(self.model)
        self.streams = RngStreams(seed)
        self._lpips_weights = lpips_weights
        self._lpips = None
        self._lpips_loaded = False

        input_channels = TOPOGRAPHY_CHANNELS[self.topography]
        self.input_channels = input_channels

        # -- data (device-side transforms; reference models/data.py:11-44) --
        self.train_loader, self.val_loader, self.test_loader = create_flood_dataset(
            self.dataset_subset,
            self.dataset_dem,
            self.data_path,
            self.topography,
            self.resize,
            self.crop,
            batch_size=self.batch_size,
            metadata_dir=self.metadata_dir,
        )

        # -- trainer + state --
        # remat_policy=None keeps each trainer's measured default
        # ("convs" for cycle, "boundaries" for paired); "full" (replay the
        # whole forward, save nothing) is the big-batch/high-resolution
        # choice — it unlocked 1024² batch 8 on one 16GB chip
        # (12.4 samples/s, 63.5% MFU vs 4.25/21.2% at b4; BENCH_NOTES).
        policy = {} if remat_policy is None else {"remat_policy": remat_policy}
        if self.model_is_cycle:
            self.trainer = CycleTrainer(
                self.model, input_channels, cfg=train_cfg,
                add_identity_loss=self.add_identity_loss,
                compute_dtype=compute_dtype, remat=remat, **policy,
            )
        else:
            self.trainer = PairedTrainer(
                self.model, input_channels, cfg=train_cfg,
                compute_dtype=compute_dtype, remat=remat, **policy,
            )

        h, w = self._image_hw()
        sample_in = jnp.zeros((batch_size, h, w, input_channels), jnp.float32)
        sample_out = jnp.zeros((batch_size, h, w, 3), jnp.float32)
        self.state = self.trainer.init(self.streams.init("model"), sample_in, sample_out)

        if load_pretrained_model:
            self.starting_epoch = saved_meta["starting_epoch"]
            self.all_losses = {k: list(v) for k, v in saved_meta["all_losses"].items()}
            if self.model_is_cycle:
                saved_state = _adapt_cycle_buffer_layout(self.state, saved_state)
            self.state = serialization.from_state_dict(self.state, saved_state)
        else:
            self.starting_epoch = 1
            self.all_losses = self._initialise_loss_storage(overall=True)
        self.current_epoch = self.starting_epoch
        # Non-blocking checkpoint writes (serialize+disk on a worker
        # thread; only the host snapshot happens on the training thread).
        self._async_ckpt = AsyncCheckpointer() if async_checkpoint else None

        # -- (data, spatial) mesh (TPU-native; SURVEY.md §5 comm backend) --
        self.mesh = None
        if num_data_devices > 1 or num_spatial_devices > 1:
            if batch_size % num_data_devices:
                raise ValueError("batch_size must be divisible by num_data_devices")
            if h % num_spatial_devices:
                raise ValueError("image height must be divisible by num_spatial_devices")
            self.mesh = make_mesh(
                num_data_devices * num_spatial_devices, spatial=num_spatial_devices
            )
            self.state = replicate_tree(self.state, self.mesh)
            # a remainder batch cannot shard evenly over the mesh
            self.train_loader.drop_remainder = True

        if self.verbose and self.training_model:
            self.print_training_setup()

    # ------------------------------------------------------------- helpers

    def _image_hw(self):
        """Post-transform image size (static shapes for jit).

        With ``resize`` set this assumes square sources: torchvision's
        ``Resize(int)`` (the reference transform, utils.py:41-43) scales the
        SHORTER edge, which coincides with h = w = resize only for square
        images.  The xBD dataset is all 1024^2, so this holds; assert it so
        a non-square dataset fails loudly instead of silently diverging."""
        ds = next(
            (d for d in (self.train_loader.dataset, self.val_loader.dataset,
                         self.test_loader.dataset) if len(d)),
            None,
        )
        if self.resize:
            if ds is not None:
                raw_in, _, _, _ = ds.read_raw(0)
                if raw_in.shape[0] != raw_in.shape[1]:
                    raise ValueError(
                        f"--resize assumes square source images (shorter-edge "
                        f"Resize semantics); got {raw_in.shape[:2]}"
                    )
            h = w = self.resize
        else:
            if ds is None:
                raise ValueError(
                    "dataset is empty for every split and no --resize was "
                    "given — cannot infer the image size"
                )
            raw_in, _, _, _ = ds.read_raw(0)
            h, w = raw_in.shape[:2]
        if self.crop:
            nd = int(np.sqrt(self.crop))
            h, w = h // nd, w // nd
        return h, w

    def _initialise_loss_storage(self, overall: bool) -> Dict[str, List[float]]:
        """Loss-key schema (reference models/model.py:183-205)."""
        pre = "all_" if overall else ""
        if self.model_is_cycle:
            keys = [
                f"{pre}losses_generator_post",
                f"{pre}losses_generator_pre",
                f"{pre}losses_pre_to_post_cycle",
                f"{pre}losses_post_to_pre_cycle",
                f"{pre}losses_discriminator_pre_real",
                f"{pre}losses_discriminator_post_real",
                f"{pre}losses_discriminator_pre_synthetic",
                f"{pre}losses_discriminator_post_synthetic",
            ]
            if self.add_identity_loss:
                keys += [f"{pre}losses_identity_post", f"{pre}losses_identity_pre"]
        else:
            keys = [
                f"{pre}losses_discriminator_real",
                f"{pre}losses_discriminator_synthetic",
                f"{pre}losses_generator_synthetic",
                f"{pre}l1_losses_generator_synthetic",
            ]
        return {k: [] for k in keys}

    def prettify_model_name(self, model_name: Optional[str] = None) -> str:
        return prettify_model_name(model_name or self.model)

    def create_path(self, save_type: str, info: str = "") -> str:
        identity_tag = f"identity{self.add_identity_loss}" if self.model_is_cycle else ""
        return pathlib_.model_artifact_path(
            self.data_path,
            save_type,
            self.prettify_model_name(),
            info,
            self.current_epoch if self.training_model else self.current_epoch - 1,
            self.topography,
            identity_tag,
            self.dataset_subset,
            self.dataset_dem,
            self.resize,
            self.crop,
        )

    def print_training_setup(self) -> None:
        """(reference models/model.py:260-273)"""
        print(
            f"\n{'Continuing' if self.load_pretrained_model else 'Beginning'} "
            f"training {self.prettify_model_name()}:"
        )
        print(f"{self.num_epochs} epochs")
        print(f"Starting from epoch {self.starting_epoch}")
        print(
            f"{self.topography.title() if self.topography else 'No'} "
            "topographical factors will be input to the model"
        )
        if self.model_is_cycle and self.add_identity_loss:
            print("Using identity mapping loss")
        print(
            f"Dataset: {len(self.train_loader)} batches of {self.batch_size} from "
            f"'{self.dataset_subset}' with '{self.dataset_dem}' DEM"
        )
        print(f"Data resized to {self.resize} pixels with {self.crop} crops, scaled to [-1, 1]")
        print(f"Model saved every {self.save_model_interval} epochs")
        print(f"Sample generator output images saved every {self.save_images_interval} epochs\n")

    def _epoch_lr(self, epoch: int) -> float:
        """torch LambdaLR counter semantics: factor lambda(epoch-1) during
        1-indexed training epoch ``epoch`` (reference model.py:123-124)."""
        return self.train_cfg.gan_lr * lambda_rule(epoch - 1, self.num_epochs)

    def _device_batch(self, batch):
        if self.mesh is not None:
            x, y = shard_images(batch["input"], self.mesh), shard_images(
                batch["output"], self.mesh
            )
        else:
            x, y = batch["input"], batch["output"]
        # Layout prep (e.g. phase-major for the attention phase step) rides
        # the pipeline side of the step boundary — see PairedTrainer.prepare_batch.
        return self.trainer.prepare_batch(x, y)

    # ------------------------------------------------------------ training

    def _train_loop(self) -> None:
        # TPU-pool preemptions arrive as SIGTERM; fold them into the same
        # best-effort-checkpoint path as a ^C.  Handlers only install from
        # the main thread (signal module restriction) — elsewhere skip.
        import signal as _signal

        def _preempted(signum, frame):
            raise KeyboardInterrupt

        old_term, installed = None, False
        try:
            old_term = _signal.signal(_signal.SIGTERM, _preempted)
            installed = True  # old_term may legitimately be None (non-Python handler)
        except ValueError:
            pass
        try:
            self._train_epochs()
            self.wait_for_checkpoints()
        except KeyboardInterrupt:
            # Best-effort recovery point (the reference's only recovery is
            # manual resume from periodic checkpoints, SURVEY.md §5).
            if self.save_model_interval and self.current_epoch >= self.starting_epoch:
                _safe_print("\nInterrupted — saving a resume checkpoint...")
                self.save_checkpoint(self.current_epoch)
                self.wait_for_checkpoints()
            raise
        finally:
            if installed:
                _signal.signal(
                    _signal.SIGTERM,
                    old_term if old_term is not None else _signal.SIG_DFL,
                )

    def _train_epochs(self) -> None:
        for epoch in range(self.starting_epoch, self.num_epochs + 1):
            epoch_start_time = time.time()
            lr = jnp.float32(self._epoch_lr(epoch))
            epoch_key = self.streams.epoch(epoch)

            # Loss scalars stay on device during the epoch (the reference's
            # per-step .item() forces a host sync every step,
            # models/model.py:648-651); one transfer at epoch end.
            step_metrics = []
            for step, batch in enumerate(self.train_loader.epoch_iter(epoch)):
                x, y = self._device_batch(batch)
                step_key = jax.random.fold_in(epoch_key, step)
                self.state, metrics = self.trainer.train_step(self.state, x, y, lr, step_key)
                step_metrics.append(metrics)

            losses = self._initialise_loss_storage(overall=False)
            for host in jax.device_get(step_metrics):
                for k, v in host.items():
                    losses[k].append(float(v))

            self.save_results(epoch=epoch, losses=losses, epoch_start_time=epoch_start_time)

    # Public training entry points (reference train.py:35-38).
    def train_paired(self) -> None:
        self._train_loop()

    def train_cycle(self) -> None:
        self._train_loop()

    # ------------------------------------------------------------- results

    def print_losses(self) -> None:
        """(reference models/model.py:296-319)"""
        L = self.all_losses
        if self.model_is_cycle:
            print(
                (
                    "| "
                    f"Generator post image loss = {L['all_losses_generator_post'][-1]:.2f} | "
                    f"Generator pre image loss = {L['all_losses_generator_pre'][-1]:.2f} | "
                    f"Pre to post cycle loss = {L['all_losses_pre_to_post_cycle'][-1]:.2f} | "
                    f"Post to pre cycle loss = {L['all_losses_post_to_pre_cycle'][-1]:.2f} | "
                    f"Discriminator pre real image loss = {L['all_losses_discriminator_pre_real'][-1]:.2f} | "
                    f"Discriminator post real image loss = {L['all_losses_discriminator_post_real'][-1]:.2f} | "
                    f"Discriminator pre synthetic image loss = {L['all_losses_discriminator_pre_synthetic'][-1]:.2f} | "
                    f"Discriminator post synthetic image loss = {L['all_losses_discriminator_post_synthetic'][-1]:.2f}"
                ),
                end="" if self.add_identity_loss else "\n",
            )
            if self.add_identity_loss:
                print(
                    f" | Identity pre image loss = {L['all_losses_identity_pre'][-1]:.2f} | "
                    f"Identity post image loss = {L['all_losses_identity_post'][-1]:.2f}"
                )
        else:
            print(
                "| "
                f"Discriminator real loss = {L['all_losses_discriminator_real'][-1]:.2f} | "
                f"Discriminator synthetic loss = {L['all_losses_discriminator_synthetic'][-1]:.2f} | "
                f"Generator synthetic loss = {L['all_losses_generator_synthetic'][-1]:.2f} | "
                f"L1 generator loss = {L['all_l1_losses_generator_synthetic'][-1]:.2f}"
            )

    def save_results(self, epoch: int, losses, epoch_start_time: float) -> None:
        """(reference models/model.py:321-361)"""
        self.current_epoch = epoch
        for key in self.all_losses:
            self.all_losses[key].append(float(np.mean(losses[key[4:]])))

        if self.verbose:
            print(f"Epoch {epoch} ({time.time() - epoch_start_time:.2f} seconds) ", end="")
            self.print_losses()

        if self.save_model_interval != 0 and epoch % self.save_model_interval == 0:
            self.save_checkpoint(epoch)

        if self.save_images_interval != 0 and epoch % self.save_images_interval == 0:
            self.plot_sample_images(num_images=5, use_test_data=False)

    def save_checkpoint(self, epoch: int) -> str:
        meta = {
            "model": self.model,
            "starting_epoch": epoch + 1,
            "num_epochs": self.num_epochs,
            "topography": self.topography,
            "all_losses": self.all_losses,
            "add_identity_loss": self.add_identity_loss,
        }
        model_path = self.create_path(save_type="model")
        if jax.process_count() > 1:
            # pod-slice topology: per-process sharded checkpoint directory
            # (each process writes only the shards it owns replica 0 of —
            # no full-state device_get on any process; ckpt/sharded.py)
            from floodgan_tpu.ckpt import save_checkpoint_sharded

            model_path += ".sharded"
            _safe_print(f"Saving {self.prettify_model_name()} model to {model_path}")
            save_checkpoint_sharded(model_path, meta, self.state)
            return model_path
        _safe_print(f"Saving {self.prettify_model_name()} model to {model_path}")
        if self._async_ckpt is not None:
            self._async_ckpt.save(model_path, meta, self.state)
        else:
            save_checkpoint(model_path, meta, jax.device_get(self.state))
        return model_path

    def wait_for_checkpoints(self) -> None:
        """Join any in-flight async checkpoint write (no-op otherwise)."""
        if self._async_ckpt is not None:
            self._async_ckpt.wait()

    # ----------------------------------------------------------- inference

    @property
    def lpips(self):
        if not self._lpips_loaded:
            self._lpips = load_lpips(self._lpips_weights)
            self._lpips_loaded = True
        return self._lpips

    def generate(self, input_stack, direction: str = "ab"):
        """Deterministic stochastic-eval generator forward: dropout active
        under the fixed inference key (reference pins manual_seed(47))."""
        if self.model_is_cycle:
            out, mask = self.trainer.generate(self.state.gen_params, input_stack, direction)
        else:
            out, mask = self.trainer.generate(
                self.state.gen_params, input_stack, self.streams.inference()
            )
        return out, mask

    # ------------------------------------------------------------- metrics

    def calculate_metrics(self, use_test_data: bool = False, seg_model_path: Optional[str] = None):
        """(reference models/model.py:363-422)  Image metrics per image,
        mask metrics over the pixel-concatenated split via the pretrained
        segmentation U-Net."""
        from floodgan_tpu.api.segmentation import SegmentationModel

        seg = SegmentationModel(
            data_path=self.data_path,
            pretrained_model_path=seg_model_path,
            train=False,
            metadata_dir=self.metadata_dir,
            skip_data=True,
        )

        print("\nCalculating metrics...")
        loader = self.test_loader if use_test_data else self.val_loader
        per_image = {k: [] for k in ["PSNR", "SSIM", "MS-SSIM", "LPIPS", "Inference"]}
        masks = MaskMetricsAccumulator()
        # One compiled program for the whole metric block (denormalize +
        # image metrics + both seg-U-Net mask forwards + confusion counts)
        # and ONE small device_get per batch, instead of 4-5 dispatches
        # and 2-3 blocking fetches (the per-batch sync itself is
        # contractual: the generator is timed per call like the
        # reference's per-image brackets, models/model.py:392-396).
        from floodgan_tpu.eval.metrics import (
            MS_SSIM_MIN_SIDE,
            make_eval_batch_metrics,
        )

        eval_batch_metrics = make_eval_batch_metrics(seg.trainer._predict_mask)

        for batch in loader.epoch_iter(epoch=0):
            x, y = batch["input"], batch["output"]
            start = time.time()
            out, _ = self.generate(x)
            out.block_until_ready()
            inference_time = time.time() - start
            # see eval/metrics.MS_SSIM_MIN_SIDE for the bound's derivation
            # (true bound 176, not torchmetrics' documented 160); NaN the
            # column with one warning instead of failing the whole eval.
            ms_ok = min(out.shape[1], out.shape[2]) >= MS_SSIM_MIN_SIDE
            if not ms_ok and not getattr(self, "_ms_ssim_warned", False):
                print(
                    f"WARNING: images are {out.shape[1]}x{out.shape[2]} "
                    f"after resize/crop — MS-SSIM requires >={MS_SSIM_MIN_SIDE}px "
                    "per side (5 dyadic scales x 11-tap kernel); the MS-SSIM "
                    "column will be NaN for this run."
                )
                self._ms_ssim_warned = True
            imgm, counts = jax.device_get(
                eval_batch_metrics(seg.state.params, out, y, with_ms_ssim=ms_ok)
            )
            per_image["PSNR"].extend(imgm["PSNR"].tolist())
            per_image["SSIM"].extend(imgm["SSIM"].tolist())
            per_image["MS-SSIM"].extend(
                imgm["MS-SSIM"].tolist() if ms_ok else [float("nan")] * out.shape[0]
            )
            if self.lpips is not None:
                out01, y01 = denormalize(out), denormalize(y)
                per_image["LPIPS"].extend(np.asarray(self.lpips(out01, y01)).tolist())
            else:
                per_image["LPIPS"].extend([float("nan")] * out.shape[0])
            # Per-IMAGE wall time, as the reference records at its fixed
            # batch 1 (ref models/model.py:392-396,407): amortize the batch
            # call so the Inference column keeps its meaning (and the
            # 5-sample warmup discard in ModelsGroup keeps its scale) when
            # --batch_size > 1.
            per_image["Inference"].extend([inference_time / x.shape[0]] * x.shape[0])
            masks.add_counts(counts)

        results = {k: float(np.mean(v)) for k, v in per_image.items()}
        results.update(masks.compute())
        order = [
            "PSNR", "SSIM", "MS-SSIM", "LPIPS", "MSE", "Accuracy",
            "F1_Flood", "Precision_Flood", "Recall_Flood",
            "F1_No_Flood", "Precision_No_Flood", "Recall_No_Flood",
            "IoU_Flood", "IoU_No_Flood", "Inference",
        ]
        metrics_df = pd.DataFrame([(k, results[k]) for k in order]).set_index(0).transpose()
        print(metrics_df)
        metrics_df.to_csv(self.create_path("metric"))
        return results

    # --------------------------------------------------------------- plots

    def plot_losses(self) -> None:
        """(reference models/model.py:424-473)"""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        if self.model_is_cycle:
            plot_parameters = {
                "all_losses_generator_post": {"colour": "#7BA4A9", "label": "Generator (post)", "linestyle": (0, (3, 1)), "plot": 0},
                "all_losses_generator_pre": {"colour": "#7BA4A9", "label": "Generator (pre)", "linestyle": "solid", "plot": 0},
                "all_losses_pre_to_post_cycle": {"colour": "#7BA4A9", "label": "Pre to post cycle loss", "linestyle": "solid", "plot": 1},
                "all_losses_post_to_pre_cycle": {"colour": "#9F799B", "label": "Post to pre cycle loss", "linestyle": "solid", "plot": 1},
                "all_losses_discriminator_pre_real": {"colour": "#5F2959", "label": "Discriminator (pre, real)", "linestyle": "solid", "plot": 0},
                "all_losses_discriminator_post_real": {"colour": "#5F2959", "label": "Discriminator (post, real)", "linestyle": (0, (3, 1)), "plot": 0},
                "all_losses_discriminator_pre_synthetic": {"colour": "#9F799B", "label": "Discriminator (pre, synthetic)", "linestyle": "solid", "plot": 0},
                "all_losses_discriminator_post_synthetic": {"colour": "#9F799B", "label": "Discriminator (post, synthetic)", "linestyle": (0, (3, 1)), "plot": 0},
            }
            if self.add_identity_loss:
                plot_parameters["all_losses_identity_post"] = {"colour": "black", "label": "Identity (post)", "linestyle": (0, (3, 1)), "plot": 2}
                plot_parameters["all_losses_identity_pre"] = {"colour": "black", "label": "Identity (pre)", "linestyle": "solid", "plot": 2}
        else:
            plot_parameters = {
                "all_losses_discriminator_real": {"colour": "#5F2959", "label": "Discriminator (real)", "linestyle": "solid", "plot": 0},
                "all_losses_discriminator_synthetic": {"colour": "#9F799B", "label": "Discriminator (synthetic)", "linestyle": "solid", "plot": 0},
                "all_losses_generator_synthetic": {"colour": "#7BA4A9", "label": "Generator (synthetic)", "linestyle": "solid", "plot": 0},
                "all_l1_losses_generator_synthetic": {"colour": "black", "label": "L1 loss", "linestyle": "solid", "plot": 1},
            }

        num_plots = 3 if self.add_identity_loss else 2
        fig, axes = plt.subplots(nrows=num_plots, ncols=1, figsize=(10, num_plots * 7))
        for ax in axes.ravel():
            ax.tick_params(axis="both", which="major", labelsize=14)
            ax.set_xlabel("Epoch", fontsize=14)
            ax.set_ylabel("Loss", fontsize=14)
            ax.grid(alpha=0.4)
        for loss in self.all_losses:
            p = plot_parameters[loss]
            axes[p["plot"]].plot(
                range(1, len(self.all_losses[loss]) + 1),
                self.all_losses[loss],
                c=p["colour"], linestyle=p["linestyle"], label=p["label"], linewidth=2,
            )
        axes[0].set_title(f"{self.prettify_model_name()} Discriminator and Generator Losses", fontsize=15)
        axes[1].set_title(f"{self.prettify_model_name()} {'Cycle Losses' if self.model_is_cycle else 'L1 Losses'}", fontsize=15)
        axes[0].legend(fontsize=14)
        if self.model_is_cycle:
            axes[1].legend(fontsize=14)
        if self.add_identity_loss:
            axes[2].set_title(f"{self.prettify_model_name()} Identity Losses", fontsize=15)
            axes[2].legend(fontsize=14)
        fig.tight_layout()
        losses_path = self.create_path(save_type="figure", info="losses")
        print(f"\nSaving losses figure to {losses_path}")
        fig.savefig(losses_path, bbox_inches="tight")
        plt.close(fig)

    def _load_named_image(self, image_name: str, crop_index: int):
        """Load + transform a single named image pair (reference
        models/model.py:481-495)."""
        from floodgan_tpu.data import tiff
        from floodgan_tpu.data.transforms import apply_transformations_batch

        split_csv = pd.read_csv(
            f"{self.metadata_dir or 'metadata'}/dataset_split.csv"
        )
        dem_string = (
            split_csv[split_csv["image"] == image_name][f"{self.dataset_dem}_DEM"].head(1).item()
        )
        inp = np.asarray(
            tiff.imread(f"{self.data_path}/dataset_input/{image_name}_{dem_string}.tif"),
            np.float32,
        )[None]
        out = np.asarray(
            tiff.imread(f"{self.data_path}/dataset_output/{image_name}.tif"), np.float32
        )[None]
        x, y = apply_transformations_batch(
            inp, out,
            np.zeros(1, bool), np.full(1, crop_index, np.int32),
            topography=self.topography, resize=self.resize, crop=self.crop,
        )
        if self.crop:
            image_name = f"{image_name}_{crop_index}"
        return x, y, image_name

    def plot_image(self, image_name, plot_single_image=None, plot_image_set=False, crop_index=0):
        """(reference models/model.py:475-540)"""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        x, y, image_name = self._load_named_image(image_name, crop_index)
        out, attn_mask = self.generate(x)
        generator_output = to_display_image(out)

        if plot_single_image:
            if plot_single_image == "input":
                p = pathlib_.ensure_parent(f"{self.data_path}/images/{image_name}_input.png")
                print(f"\nSaving input image of image '{image_name}' to {p}")
                plt.imsave(p, to_display_image(x), vmin=0, vmax=1)
            elif plot_single_image == "ground truth":
                p = pathlib_.ensure_parent(f"{self.data_path}/images/{image_name}_groundTruth.png")
                print(f"\nSaving ground truth of image '{image_name}' to {p}")
                plt.imsave(p, to_display_image(y), vmin=0, vmax=1)
            elif plot_single_image == "output":
                p = self.create_path(save_type="image", info=image_name)
                print(f"\nSaving generator output of image '{image_name}' to {p}")
                plt.imsave(p, generator_output, vmin=0, vmax=1)
            elif plot_single_image == "attention mask" and self.model_is_attention:
                p = self.create_path(save_type="image", info=f"{image_name}_attentionMask")
                print(f"\nSaving attention mask of image '{image_name}' to {p}")
                plt.imsave(p, np.asarray(attn_mask)[0], vmin=0, vmax=1, cmap="gray_r")
            else:
                raise NotImplementedError(
                    "Type of image must be one of 'input', 'ground truth', 'output', or 'attention mask'"
                )

        if plot_image_set:
            num_cols = 4 if self.model_is_attention else 3
            fig, axes = plt.subplots(nrows=1, ncols=num_cols, figsize=(num_cols * 5, 5))
            for ax in axes.ravel():
                ax.set_axis_off()
            axes[0].imshow(to_display_image(x), vmin=0, vmax=1)
            axes[1].imshow(generator_output, vmin=0, vmax=1)
            axes[num_cols - 1].imshow(to_display_image(y), vmin=0, vmax=1)
            axes[0].set_title(f"Input ({image_name})")
            axes[1].set_title("Generator Output")
            axes[num_cols - 1].set_title("Ground Truth Output")
            if self.model_is_attention:
                axes[2].imshow(np.asarray(attn_mask)[0], cmap="gray_r", vmin=0, vmax=1)
                axes[2].set_title("Attention Mask")
            fig.tight_layout()
            images_path = self.create_path(save_type="image", info=image_name)
            print(f"Saving {image_name} image set to {images_path}")
            fig.savefig(images_path, bbox_inches="tight")
            plt.close(fig)

    def plot_sample_images(self, num_images: int, use_test_data: bool) -> None:
        """(reference models/model.py:542-596) — for cycle models also runs
        the reverse post->pre generator on re-stacked inputs."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        generators = ["pre-to-post"]
        if self.model_is_cycle:
            generators.append("post-to-pre")
        splits = [("training", self.train_loader), ("validation", self.val_loader)]
        if use_test_data:
            splits.append(("test", self.test_loader))

        for generator_label in generators:
            for split, loader in splits:
                num_cols = 4 if self.model_is_attention else 3
                fig, axes = plt.subplots(
                    nrows=num_images, ncols=num_cols,
                    figsize=(num_cols * 5, num_images * 5),
                )
                axes = np.atleast_2d(axes)
                for ax in axes.ravel():
                    ax.set_axis_off()
                plotted = 0
                for batch in loader.epoch_iter(epoch=self.seed):
                    for b in range(batch["input"].shape[0]):
                        x = batch["input"][b:b + 1]
                        y = batch["output"][b:b + 1]
                        name = batch["names"][b]
                        if generator_label == "post-to-pre":
                            cond = x[..., 3:]
                            display_target = x[..., :3]
                            x_in = jnp.concatenate([y, cond], axis=-1)
                            out, mask = self.generate(x_in, direction="ba")
                            display_input = x_in
                        else:
                            out, mask = self.generate(x)
                            display_input, display_target = x, y
                        i = plotted
                        axes[i, 0].imshow(to_display_image(display_input), vmin=0, vmax=1)
                        axes[i, 1].imshow(to_display_image(out), vmin=0, vmax=1)
                        axes[i, num_cols - 1].imshow(to_display_image(display_target), vmin=0, vmax=1)
                        axes[i, 0].set_title(f"Input ({name})")
                        axes[i, 1].set_title("Generator Output")
                        axes[i, num_cols - 1].set_title("Ground Truth Output")
                        if self.model_is_attention:
                            axes[i, 2].imshow(np.asarray(mask)[0], cmap="gray_r")
                            axes[i, 2].set_title("Attention Mask")
                        plotted += 1
                        if plotted >= num_images:
                            break
                    if plotted >= num_images:
                        break
                fig.tight_layout()
                suffix = f"_{generator_label}" if len(generators) > 1 else ""
                images_path = self.create_path(save_type="image", info=f"{split}{suffix}")
                print(f"Saving {split} {generator_label + ' ' if len(generators) > 1 else ''}sample images to {images_path}")
                fig.savefig(images_path, bbox_inches="tight")
                plt.close(fig)
