"""Self-describing single-file checkpoints.

Logical schema mirrors the reference's torch.save dict (reference
models/model.py:335-358 save, :52-57/:127-148 load;
models/segmentation_model.py:121-130): a metadata header (model name,
topography, num_epochs, identity-loss flag, starting_epoch, full loss
history) plus the parameter/optimizer/buffer state tree.  Like the
reference's checkpoints, files are *self-describing*: evaluate/compare
reconstruct the architecture from the file, not from flags.

Wire format: one msgpack file — ``meta`` as a JSON string, ``state`` as a
flax-serialized state dict (optimizer namedtuples lowered via
``to_state_dict``; restore binds against a freshly built template with
``from_state_dict``).  Works for any pytree the trainers produce.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import msgpack  # vendored dependency of flax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, meta: Dict[str, Any], state: Any) -> None:
    state_dict = serialization.to_state_dict(state)
    payload = {
        "meta": json.dumps(meta),
        "state": serialization.msgpack_serialize(_to_numpy(state_dict)),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(msgpack.packb(payload))
    os.replace(tmp, path)  # atomic: a crash mid-write never corrupts path


class AsyncCheckpointer:
    """Non-blocking checkpoint writes for the training loop.

    ``save`` snapshots the state to host (the only step that must happen
    before the next train step mutates donated buffers) and hands the
    serialize+write to a single worker thread — training continues while
    the file lands.  One in-flight write at a time (a second save joins
    the first); ``wait`` drains before process exit.
    """

    def __init__(self):
        import concurrent.futures as cf

        self._pool = cf.ThreadPoolExecutor(max_workers=1)
        self._pending = None

    def save(self, path: str, meta: Dict[str, Any], state: Any) -> None:
        import copy

        import jax

        self.wait()  # serialize writes; surfaces a prior failure here
        host_state = jax.device_get(state)
        # Snapshot meta on the caller thread too: it aliases live training
        # bookkeeping (all_losses lists the loop keeps appending to), and a
        # worker-thread json.dumps would serialize whatever they hold by
        # the time the write happens.
        meta = copy.deepcopy(meta)
        self._pending = self._pool.submit(save_checkpoint, path, meta, host_state)

    def wait(self) -> None:
        if self._pending is not None:
            self._pending.result()
            self._pending = None


def load_checkpoint(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns (meta, raw_state_dict).  Bind the raw state onto a template
    with ``flax.serialization.from_state_dict(template, raw)``."""
    with open(path, "rb") as f:
        payload = msgpack.unpackb(f.read())
    meta = json.loads(payload["meta"])
    state = serialization.msgpack_restore(payload["state"])
    return meta, state


def restore_state(template: Any, raw_state: Dict[str, Any]) -> Any:
    return serialization.from_state_dict(template, raw_state)


def _to_numpy(tree: Any) -> Any:
    if isinstance(tree, dict):
        return {k: _to_numpy(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_to_numpy(v) for v in tree)
    if hasattr(tree, "__array__"):
        return np.asarray(tree)
    return tree
