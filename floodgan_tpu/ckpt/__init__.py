from floodgan_tpu.ckpt.checkpoint import (
    AsyncCheckpointer,
    load_checkpoint,
    restore_state,
    save_checkpoint,
)
from floodgan_tpu.ckpt.sharded import (
    load_checkpoint_sharded,
    save_checkpoint_sharded,
)

__all__ = [
    "AsyncCheckpointer",
    "load_checkpoint",
    "load_checkpoint_sharded",
    "restore_state",
    "save_checkpoint",
    "save_checkpoint_sharded",
]
