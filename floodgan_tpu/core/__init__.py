from floodgan_tpu.core.config import (
    TOPOGRAPHY_CHANNELS,
    ModelConfig,
    SegmentationConfig,
    TrainConfig,
    model_is_attention,
    model_is_cycle,
    prettify_model_name,
)
from floodgan_tpu.core.rng import RngStreams

__all__ = [
    "TOPOGRAPHY_CHANNELS",
    "ModelConfig",
    "SegmentationConfig",
    "TrainConfig",
    "model_is_attention",
    "model_is_cycle",
    "prettify_model_name",
    "RngStreams",
]
