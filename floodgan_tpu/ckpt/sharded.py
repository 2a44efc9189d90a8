"""Per-process sharded checkpoints for multi-host (pod-slice) meshes.

The single-file format (ckpt/checkpoint.py) device_gets the full state on
every process — fine on one host, wasteful and contended on a pod slice
where every process would write an identical replicated file.  This module
writes a checkpoint DIRECTORY instead:

    ckpt_dir/
      meta.json          — header (process 0): meta + leaf manifest
                           (path, global shape, dtype)
      shards_p{i}.msgpack — the byte payload process i is responsible for

Responsibility rule: for every leaf and every addressable shard, the
process writes the shard iff ``shard.replica_id == 0`` — exactly one
process writes each distinct piece of data, whatever mix of replicated
and sharded leaves the state tree holds (replicated leaves are written
once, by whichever process holds replica 0; data/spatial-sharded leaves
are written piecewise by their owners).  The reference has no distributed
story (SURVEY.md §5, single device); this is the TPU-native design the
single-file schema extends to — the logical schema (meta header + state
tree) is unchanged, so ``meta.json`` carries the same self-describing
fields as the single-file format.

Restore is collective: every process reads the manifest, loads only the
shard files, and assembles global ``jax.Array``s with
``make_array_from_single_device_arrays`` against the target sharding —
no full-state host copy on any process when the state is sharded.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import msgpack
import numpy as np

SEP = "/"


def _flatten_with_paths(tree: Any, prefix: str = "") -> Dict[str, Any]:
    """state-dict flattening with '/'-joined string paths (msgpack-stable)."""
    from flax import serialization

    sd = serialization.to_state_dict(tree)
    out: Dict[str, Any] = {}

    def rec(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{path}{SEP}{k}" if path else str(k))
        else:
            out[path] = node

    rec(sd, prefix)
    return out


def _unflatten(flat: Dict[str, Any]) -> Dict[str, Any]:
    root: Dict[str, Any] = {}
    for path, value in flat.items():
        keys = path.split(SEP)
        node = root
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value
    return root


def _index_to_spec(index, shape) -> list:
    """A shard's global slice tuple as [[start, stop], ...] (JSON-able)."""
    spec = []
    for sl, dim in zip(index, shape):
        start = 0 if sl.start is None else int(sl.start)
        stop = dim if sl.stop is None else int(sl.stop)
        spec.append([start, stop])
    return spec


def save_checkpoint_sharded(
    ckpt_dir: str, meta: Dict[str, Any], state: Any
) -> None:
    """Write this process's shard file (and, on process 0, the manifest).

    Collective: every process must call it with the same tree.  Atomic per
    file (tmp + os.replace), same crash-safety contract as the single-file
    path."""
    process_index = jax.process_index()
    os.makedirs(ckpt_dir, exist_ok=True)
    flat = _flatten_with_paths(state)

    my_shards: Dict[str, list] = {}
    manifest: Dict[str, Dict[str, Any]] = {}
    for path, leaf in flat.items():
        if isinstance(leaf, jax.Array) and hasattr(leaf, "addressable_shards"):
            manifest[path] = {
                "shape": list(leaf.shape),
                "dtype": str(leaf.dtype),
            }
            entries = []
            for shard in leaf.addressable_shards:
                if shard.replica_id != 0:
                    continue
                entries.append(
                    {
                        "index": _index_to_spec(shard.index, leaf.shape),
                        "data": np.ascontiguousarray(shard.data).tobytes(),
                    }
                )
            if entries:
                my_shards[path] = entries
        else:
            # host scalars / numpy leaves: tiny, process 0 owns them
            arr = np.asarray(leaf)
            manifest[path] = {
                "shape": list(arr.shape),
                "dtype": str(arr.dtype),
                "host": True,
            }
            if process_index == 0:
                my_shards[path] = [
                    {
                        "index": _index_to_spec(
                            tuple(slice(0, d) for d in arr.shape), arr.shape
                        ),
                        "data": arr.tobytes(),
                    }
                ]

    shard_path = os.path.join(ckpt_dir, f"shards_p{process_index}.msgpack")
    tmp = shard_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(msgpack.packb(my_shards))
    os.replace(tmp, shard_path)

    if process_index == 0:
        meta_path = os.path.join(ckpt_dir, "meta.json")
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "meta": meta,
                    "manifest": manifest,
                    "process_count": jax.process_count(),
                },
                f,
            )
        os.replace(tmp, meta_path)


def load_checkpoint_sharded(
    ckpt_dir: str, template: Any, shardings: Any = None
) -> Tuple[Dict[str, Any], Any]:
    """Assemble (meta, state) from a sharded checkpoint directory.

    ``template`` supplies the tree structure (a freshly built state);
    ``shardings`` (same tree structure, or None) the target shardings —
    when None, leaves are restored as host numpy onto the template via
    ``from_state_dict`` (single-process convenience path).  Process count
    at restore may differ from save: shard files are addressed by leaf
    path, not by process."""
    from flax import serialization

    with open(os.path.join(ckpt_dir, "meta.json")) as f:
        header = json.load(f)
    manifest = header["manifest"]

    # read every shard file present (restore topology may differ)
    pieces: Dict[str, list] = {}
    for fname in sorted(os.listdir(ckpt_dir)):
        if not (fname.startswith("shards_p") and fname.endswith(".msgpack")):
            continue
        with open(os.path.join(ckpt_dir, fname), "rb") as f:
            for path, entries in msgpack.unpackb(f.read()).items():
                pieces.setdefault(path, []).extend(entries)

    flat: Dict[str, Any] = {}
    for path, info in manifest.items():
        shape = tuple(info["shape"])
        dtype = np.dtype(info["dtype"])
        out = np.empty(shape, dtype)
        for entry in pieces.get(path, []):
            idx = tuple(slice(a, b) for a, b in entry["index"])
            block = np.frombuffer(entry["data"], dtype).reshape(
                tuple(b - a for a, b in entry["index"])
            )
            out[idx] = block
        flat[path] = out

    raw = _unflatten(flat)
    state = serialization.from_state_dict(template, raw)
    if shardings is not None:
        # make_array_from_callback touches only this process's addressable
        # shards, so the same call works single-process and on a
        # multi-process (jax.distributed) CPU/TPU topology.
        def put(leaf, s):
            arr = np.asarray(leaf)
            return jax.make_array_from_callback(arr.shape, s, lambda idx: arr[idx])

        state = jax.tree_util.tree_map(put, state, shardings)
    return header["meta"], state
