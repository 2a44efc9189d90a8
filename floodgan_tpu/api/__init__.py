from floodgan_tpu.api.model import Model
from floodgan_tpu.api.segmentation import SegmentationModel
from floodgan_tpu.api.group import ModelsGroup

__all__ = ["Model", "SegmentationModel", "ModelsGroup"]
