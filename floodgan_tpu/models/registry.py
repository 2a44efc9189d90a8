"""Model-name -> architecture dispatch (reference models/model.py:81-94).

The conditional-discriminator property (input = condition stack ⊕ RGB
image, +3 channels) belongs to Pix2Pix and PairedAttention; CycleGAN and
AttentionGAN discriminate the image alone (reference
model_architectures.py:68, :140, :282, :424).
"""

from __future__ import annotations

import flax.linen as nn

from floodgan_tpu.core.config import _check_model
from floodgan_tpu.models.attention import AttentionGenerator
from floodgan_tpu.models.cyclegan import CycleGANGenerator
from floodgan_tpu.models.patchgan import PatchGANDiscriminator
from floodgan_tpu.models.pix2pix import Pix2PixGenerator

_GENERATORS = {
    "pix2pix": Pix2PixGenerator,
    "cyclegan": CycleGANGenerator,
    "attentiongan": AttentionGenerator,
    "pairedattention": AttentionGenerator,
}

_DISC_NORM = {
    "pix2pix": "batch",
    "cyclegan": "instance",
    "attentiongan": "instance",
    "pairedattention": "instance",
}

_DISC_CONDITIONAL = {
    "pix2pix": True,
    "cyclegan": False,
    "attentiongan": False,
    "pairedattention": True,
}


def build_generator(
    model: str,
    input_channels: int,
    dropout_rate: float = 0.5,
    phase_output: bool = False,
    phase_input: bool = False,
) -> nn.Module:
    model = _check_model(model)
    cls = _GENERATORS[model]
    if phase_output or phase_input:
        # checked BEFORE any family early-return: a phase request the
        # family can't honor must raise, never silently hand back an
        # image-space generator
        if cls not in (AttentionGenerator, CycleGANGenerator):
            raise ValueError(
                f"phase generators only exist for the attention/cycle resnet families, not {model}"
            )
    if cls is Pix2PixGenerator:
        return cls(input_channels=input_channels, dropout_rate=dropout_rate)
    if phase_output or phase_input:
        return cls(
            input_channels=input_channels, trunk_unroll=9,
            phase_output=phase_output, phase_input=phase_input,
        )
    # Trunk unroll policy: fully unrolled everywhere.  The rolled
    # (lax.scan) trunk bounds compile time but breaks cross-block fusion —
    # measured on v5e at 512^2 batch 4, the cycle step runs 8.0 samples/s
    # unrolled vs 6.3 rolled (per-block converts, dynamic slices, and
    # while-loop overhead dominate the rolled loop; BENCH_NOTES round 2).
    # Set FLOODGAN_TRUNK_UNROLL=1 to bound compile time on slow-compile
    # environments (e.g. the tunneled dev backend, where the unrolled
    # cycle step takes ~15 min to compile the first time).
    unroll = 9
    return cls(input_channels=input_channels, trunk_unroll=unroll)


def build_discriminator(model: str) -> nn.Module:
    model = _check_model(model)
    return PatchGANDiscriminator(norm=_DISC_NORM[model])


def discriminator_is_conditional(model: str) -> bool:
    return _DISC_CONDITIONAL[_check_model(model)]


def generator_returns_mask(model: str) -> bool:
    """Attention generators return (output, background_mask)."""
    return _GENERATORS[_check_model(model)] is AttentionGenerator
