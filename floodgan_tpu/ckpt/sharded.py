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

Restore is collective: every process reads the manifest plus the shard
files and assembles global ``jax.Array``s with
``make_array_from_callback`` against the target sharding; the callback
materializes only the REQUESTED region from the stored pieces, so no
process ever holds a full-state host copy when the state is sharded.
Coverage is validated exactly (missing or duplicated shard files raise
instead of restoring uninitialized memory), and stale ``shards_p*``
files from a previous larger topology are filtered by the recorded
process count (and cleaned by the next save).
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
        # Remove stale shard files from a previous, LARGER topology saved
        # into the same directory — load reads every shards_p* present,
        # and stale pieces applied over fresh ones would silently mix old
        # parameter bytes into the restore.  Only indices >= the current
        # process count are stale (no live process writes them), so this
        # cannot race the other processes' writes.
        n = jax.process_count()
        for fname in os.listdir(ckpt_dir):
            if fname.startswith("shards_p") and fname.endswith(".msgpack"):
                try:
                    i = int(fname[len("shards_p") : -len(".msgpack")])
                except ValueError:
                    continue
                if i >= n:
                    os.remove(os.path.join(ckpt_dir, fname))


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
    saved_procs = header.get("process_count")

    # Read the shard files the save actually wrote (restore topology may
    # differ — files are addressed by leaf path, not by process).  Filter
    # by the recorded process count so stale shards_p{i} files from an
    # earlier, larger topology in a reused directory are never applied.
    pieces: Dict[str, list] = {}
    for fname in sorted(os.listdir(ckpt_dir)):
        if not (fname.startswith("shards_p") and fname.endswith(".msgpack")):
            continue
        try:
            i = int(fname[len("shards_p") : -len(".msgpack")])
        except ValueError:
            continue
        if saved_procs is not None and i >= saved_procs:
            continue
        with open(os.path.join(ckpt_dir, fname), "rb") as f:
            for path, entries in msgpack.unpackb(f.read()).items():
                pieces.setdefault(path, []).extend(entries)

    # Coverage validation: the writer's replica-0 ownership makes pieces
    # disjoint, so the element counts must sum EXACTLY to each leaf's
    # size.  A missing shard file (partial copy, crashed save) or a
    # duplicated piece otherwise restores silently corrupt values — the
    # np.empty regions below are uninitialized memory.
    for path, info in manifest.items():
        total = int(np.prod(info["shape"], dtype=np.int64)) if info["shape"] else 1
        got = sum(
            int(np.prod([b - a for a, b in entry["index"]], dtype=np.int64))
            if entry["index"]
            else 1
            for entry in pieces.get(path, [])
        )
        if got != total:
            raise ValueError(
                f"sharded checkpoint {ckpt_dir} does not exactly cover leaf "
                f"'{path}': {got}/{total} elements present — shard files are "
                "missing (partial copy / crashed save) or duplicated"
            )

    def assemble(path: str, starts, stops, dtype):
        """Materialize one requested region of a leaf from its pieces —
        per-slice, so the sharded restore path never allocates the full
        global leaf on any host (the module's stated design goal)."""
        out = np.empty([b - a for a, b in zip(starts, stops)], dtype)
        for entry in pieces.get(path, []):
            e = entry["index"]
            inter = [
                (max(ea, ra), min(eb, rb))
                for (ea, eb), ra, rb in zip(e, starts, stops)
            ]
            if any(a >= b for a, b in inter):
                continue
            block = np.frombuffer(entry["data"], dtype).reshape(
                [b - a for a, b in e]
            )
            src = tuple(
                slice(a - ea, b - ea) for (a, b), (ea, _eb) in zip(inter, e)
            )
            dst = tuple(
                slice(a - ra, b - ra) for (a, b), ra in zip(inter, starts)
            )
            out[dst] = block[src]
        return out

    if shardings is None:
        # single-process convenience path: full host assembly onto the
        # template via from_state_dict
        flat: Dict[str, Any] = {}
        for path, info in manifest.items():
            shape = tuple(info["shape"])
            dtype = np.dtype(info["dtype"])
            flat[path] = assemble(path, (0,) * len(shape), shape, dtype).reshape(shape)
        return header["meta"], serialization.from_state_dict(template, _unflatten(flat))

    # Sharded path: every leaf becomes a jax.Array via
    # make_array_from_callback, and the callback assembles ONLY the
    # requested region — restore peak host memory is this process's
    # addressable shards, not the full state.
    flat_shardings = _flatten_with_paths(shardings)
    flat = {}
    for path, info in manifest.items():
        shape = tuple(info["shape"])
        dtype = np.dtype(info["dtype"])
        s = flat_shardings[path]

        def cb(idx, _p=path, _shape=shape, _dt=dtype):
            starts = [0 if sl.start is None else int(sl.start) for sl in idx]
            stops = [
                _shape[d] if sl.stop is None else int(sl.stop)
                for d, sl in enumerate(idx)
            ]
            return assemble(_p, starts, stops, _dt)

        flat[path] = jax.make_array_from_callback(shape, s, cb)
    state = serialization.from_state_dict(template, _unflatten(flat))
    return header["meta"], state
