from floodgan_tpu.models.registry import (
    build_discriminator,
    build_generator,
    discriminator_is_conditional,
)
from floodgan_tpu.models.pix2pix import Pix2PixGenerator, Pix2PixUNet
from floodgan_tpu.models.cyclegan import CycleGANGenerator
from floodgan_tpu.models.attention import AttentionGenerator
from floodgan_tpu.models.patchgan import PatchGANDiscriminator
from floodgan_tpu.models.unet import UNet

__all__ = [
    "AttentionGenerator",
    "CycleGANGenerator",
    "PatchGANDiscriminator",
    "Pix2PixGenerator",
    "Pix2PixUNet",
    "UNet",
    "build_discriminator",
    "build_generator",
    "discriminator_is_conditional",
]
