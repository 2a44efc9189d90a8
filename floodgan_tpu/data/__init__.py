from floodgan_tpu.data.splits import determine_flood_dataset, determine_masks_dataset
from floodgan_tpu.data.tiff import imread, imwrite
from floodgan_tpu.data.pipeline import create_flood_dataset, create_masks_dataset, FloodDataset, MaskDataset

__all__ = [
    "FloodDataset",
    "MaskDataset",
    "create_flood_dataset",
    "create_masks_dataset",
    "determine_flood_dataset",
    "determine_masks_dataset",
    "imread",
    "imwrite",
]
