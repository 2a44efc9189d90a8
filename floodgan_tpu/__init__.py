"""floodgan_tpu — a TPU-native flood-prediction GAN framework.

A ground-up JAX/Flax/XLA/Pallas/pjit rebuild of the capability set of the
Flood-Prediction-GAN reference stack (see SURVEY.md): four conditional-GAN
families (Pix2Pix, CycleGAN, AttentionGAN, PairedAttention), a U-Net flood
segmentation model, a fused device-side data pipeline over 9-channel
geo-stacks, a full image/mask metric suite, self-describing checkpoints,
and data-parallel training over a TPU device mesh.

Layout
------
core/      config dataclasses, RNG streams, precision policy
ops/       torch-semantics numerical primitives + Pallas TPU kernels
models/    the 10 network architectures (Flax linen, NHWC)
data/      metadata split resolution, TIFF codec, host loader, device transforms
train/     jitted train steps (paired / cycle / segmentation), optimizers
eval/      metric suite (PSNR/SSIM/MS-SSIM/LPIPS/mask metrics), plots
ckpt/      self-describing orbax checkpoints
parallel/  mesh construction + sharding for multi-chip training
cli/       argparse entry points mirroring the reference CLI surface
"""

__version__ = "0.1.0"
