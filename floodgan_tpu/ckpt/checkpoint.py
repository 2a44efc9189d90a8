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
    with open(path, "wb") as f:
        f.write(msgpack.packb(payload))


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
