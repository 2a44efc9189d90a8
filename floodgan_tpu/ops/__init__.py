from floodgan_tpu.ops.nn_ops import (
    batch_norm,
    conv2d,
    conv_transpose2d,
    dropout,
    instance_norm,
    instance_norm_act,
    leaky_relu,
    max_pool2d,
    reflect_conv2d,
    reflect_pad2d,
)
from floodgan_tpu.ops.resize import resize_bicubic_antialias

__all__ = [
    "batch_norm",
    "conv2d",
    "conv_transpose2d",
    "dropout",
    "instance_norm",
    "instance_norm_act",
    "leaky_relu",
    "max_pool2d",
    "reflect_conv2d",
    "reflect_pad2d",
    "resize_bicubic_antialias",
]
