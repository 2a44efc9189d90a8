from floodgan_tpu.train.losses import bce_with_logits, l1_loss, lsgan_mse
from floodgan_tpu.train.optim import adam_tx, apply_adam
from floodgan_tpu.train.paired import PairedTrainer
from floodgan_tpu.train.cycle import CycleTrainer
from floodgan_tpu.train.seg import SegTrainer

__all__ = [
    "PairedTrainer",
    "CycleTrainer",
    "SegTrainer",
    "adam_tx",
    "apply_adam",
    "bce_with_logits",
    "l1_loss",
    "lsgan_mse",
]
