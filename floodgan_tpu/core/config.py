"""Configuration dataclasses mirroring the reference's argparse surface.

The reference embeds its configuration in ``Model.__init__`` keyword
arguments (reference models/model.py:30-46) and per-entry-point argparse
flags (reference train.py:7-22, evaluate.py:7-26, segment.py:7-19,
compare.py:5-35).  Here the same knobs live in typed dataclasses; the CLI
layer maps flags onto them 1:1.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

# Channel-count contract keyed by topography selection
# (reference models/model.py:78, models/utils.py:58).
# Input stack channel order (load-bearing, defined by the offline ETL,
# reference pre_processing/data_pre_processing.py:370-375):
#   0-2 pre-flood RGB, 3 DEM, 4 flow accumulation, 5 river distance, 6-8 OSM map.
TOPOGRAPHY_CHANNELS = {"all": 9, "map": 6, "dem": 4, "flow": 4, "river": 4, None: 3}

MODEL_NAMES = ("pix2pix", "cyclegan", "attentiongan", "pairedattention")

_PRETTY = {
    "pix2pix": "Pix2Pix",
    "cyclegan": "CycleGAN",
    "attentiongan": "AttentionGAN",
    "pairedattention": "PairedAttention",
}

# Training-strategy capability tables (reference models/model.py:207-229).
_IS_CYCLE = {
    "pix2pix": False,
    "pairedattention": False,
    "cyclegan": True,
    "attentiongan": True,
}
_IS_ATTENTION = {
    "pix2pix": False,
    "pairedattention": True,
    "cyclegan": False,
    "attentiongan": True,
}


def _check_model(model: str) -> str:
    model = model.lower()
    if model not in MODEL_NAMES:
        raise NotImplementedError(
            "Model must be one of: Pix2Pix, CycleGAN, AttentionGAN or PairedAttention"
        )
    return model


def model_is_cycle(model: str) -> bool:
    return _IS_CYCLE[_check_model(model)]


def model_is_attention(model: str) -> bool:
    return _IS_ATTENTION[_check_model(model)]


def prettify_model_name(model: str) -> str:
    return _PRETTY[_check_model(model)]


@dataclasses.dataclass
class ModelConfig:
    """GAN model + dataset configuration (reference models/model.py:30-46).

    A typed VALIDATION surface (model-name/topography checks shared with
    api.Model), not the CLI's transport: cli/train.py passes argparse
    kwargs to api.Model directly, and Model.__init__ additionally accepts
    operational extensions (num_spatial_devices, metadata_dir,
    lpips_weights, remat, async_checkpoint) that are deliberately not
    mirrored here."""

    model: str = "pix2pix"
    dataset_subset: str = "all"
    dataset_dem: str = "best"
    data_path: Optional[str] = None
    num_epochs: int = 1
    topography: Optional[str] = "all"
    resize: Optional[int] = 256
    crop: Optional[int] = None
    save_model_interval: int = 0
    save_images_interval: int = 0
    verbose: bool = False
    load_pretrained_model: bool = False
    pretrained_model_path: Optional[str] = None
    add_identity_loss: bool = False
    training_model: bool = True
    seed: int = 47

    # TPU-native extensions (no reference counterpart):
    batch_size: int = 1          # reference hardcodes 1 (models/data.py:17)
    compute_dtype: str = "float32"  # "bfloat16" for the fast path
    num_data_devices: int = 1    # data-parallel mesh size

    def __post_init__(self) -> None:
        self.model = _check_model(self.model)
        if self.topography is not None:
            self.topography = self.topography.lower()
            if self.topography in ("none", ""):
                self.topography = None
        if self.topography not in TOPOGRAPHY_CHANNELS:
            raise NotImplementedError(
                "topography must be one of 'all', 'dem', 'map', 'flow', 'river' or None"
            )

    @property
    def input_channels(self) -> int:
        return TOPOGRAPHY_CHANNELS[self.topography]

    @property
    def is_cycle(self) -> bool:
        return _IS_CYCLE[self.model]

    @property
    def is_attention(self) -> bool:
        return _IS_ATTENTION[self.model]

    @property
    def pretty_name(self) -> str:
        return _PRETTY[self.model]


@dataclasses.dataclass
class SegmentationConfig:
    """Flood segmentation model configuration
    (reference models/segmentation_model.py:23-35)."""

    dataset_subset: str = "usa"
    data_path: Optional[str] = None
    num_epochs: int = 100
    train_on_all: bool = False
    save_model_interval: int = 0
    save_images_interval: int = 0
    verbose: bool = True
    pretrained_model_path: Optional[str] = None
    train: bool = False
    plot_mask_image: Optional[str] = None
    use_test_data: bool = False
    seed: int = 47

    batch_size: int = 1
    compute_dtype: str = "float32"
    num_data_devices: int = 1


@dataclasses.dataclass
class TrainConfig:
    """Fixed training recipe constants (reference models/model.py:109-124,
    175-181, 631, 643, 703-712; models/segmentation_model.py:65-67)."""

    gan_lr: float = 2e-4
    seg_lr: float = 1e-4
    adam_b1: float = 0.5
    adam_b2: float = 0.999
    l1_weight: float = 100.0        # pix2pix L1 (model.py:643)
    cycle_weight: float = 10.0      # cycle L1 (model.py:710-711)
    identity_weight: float = 5.0    # identity L1 (model.py:703-704)
    disc_weight: float = 0.5        # D loss halving (model.py:631, 730, 737)
    buffer_size: int = 50           # replay buffer (model.py:283)


def lambda_rule(epoch: int, num_epochs: int) -> float:
    """Linear LR decay factor: constant for the first half of training,
    then linearly decaying (reference models/model.py:175-181).

    ``epoch`` follows torch ``LambdaLR`` semantics: the scheduler's internal
    counter, 0 during the first epoch, incremented once per epoch.
    """
    return 1.0 - max(0, epoch + 1 - (num_epochs / 2)) / float((num_epochs / 2) + 1)
