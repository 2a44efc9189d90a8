from floodgan_tpu.ckpt.checkpoint import (
    AsyncCheckpointer,
    load_checkpoint,
    restore_state,
    save_checkpoint,
)

__all__ = ["AsyncCheckpointer", "load_checkpoint", "restore_state", "save_checkpoint"]
