"""Sharded (per-process) checkpoint save/restore — ckpt/sharded.py.

Single-process tests run on the 8-virtual-device mesh (replica-0
ownership, sharded + replicated leaves, round-trip equality).  The
2-process jax.distributed test lives in test_multihost_2proc.py (slow
tier)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from floodgan_tpu.ckpt import load_checkpoint_sharded, save_checkpoint_sharded
from floodgan_tpu.parallel.mesh import make_mesh


def _state(mesh):
    """A mixed tree: replicated params, data-sharded buffer, host scalar."""
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data", "spatial"))
    return {
        "params": {
            "w": jax.device_put(jnp.arange(12.0).reshape(3, 4), rep),
            "b": jax.device_put(jnp.ones((4,)), rep),
        },
        "buffer": jax.device_put(
            jnp.arange(4 * 2 * 5, dtype=jnp.float32).reshape(4, 2, 5), shard
        ),
        "step": np.int64(7),
    }


def test_sharded_round_trip(tmp_path):
    mesh = make_mesh(8, spatial=2)
    state = _state(mesh)
    meta = {"model": "pairedattention", "epoch": 3}
    save_checkpoint_sharded(str(tmp_path / "ck"), meta, state)

    # exactly one shard file (single process) + manifest
    files = sorted(os.listdir(tmp_path / "ck"))
    assert files == ["meta.json", "shards_p0.msgpack"]

    template = jax.tree_util.tree_map(np.zeros_like, jax.device_get(state))
    meta2, restored = load_checkpoint_sharded(str(tmp_path / "ck"), template)
    assert meta2 == meta
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state)),
        jax.tree_util.tree_leaves(restored),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_restore_with_shardings(tmp_path):
    mesh = make_mesh(8, spatial=2)
    state = _state(mesh)
    save_checkpoint_sharded(str(tmp_path / "ck"), {"epoch": 1}, state)

    template = jax.tree_util.tree_map(np.zeros_like, jax.device_get(state))
    shardings = {
        "params": {
            "w": NamedSharding(mesh, P()),
            "b": NamedSharding(mesh, P()),
        },
        "buffer": NamedSharding(mesh, P("data", "spatial")),
        "step": NamedSharding(mesh, P()),
    }
    _, restored = load_checkpoint_sharded(str(tmp_path / "ck"), template, shardings)
    assert restored["buffer"].sharding.spec == P("data", "spatial")
    np.testing.assert_array_equal(
        np.asarray(restored["buffer"]), np.asarray(jax.device_get(state["buffer"]))
    )


def test_replica_zero_writes_each_datum_once(tmp_path):
    """A replicated leaf on an 8-device mesh has 8 addressable copies but
    only ONE replica-0 shard — the file must contain the datum exactly
    once (no 8x write amplification)."""
    import msgpack

    mesh = make_mesh(8, spatial=2)
    state = {"w": jax.device_put(jnp.ones((16, 16)), NamedSharding(mesh, P()))}
    save_checkpoint_sharded(str(tmp_path / "ck"), {}, state)
    with open(tmp_path / "ck" / "shards_p0.msgpack", "rb") as f:
        shards = msgpack.unpackb(f.read())
    assert len(shards["w"]) == 1
    assert len(shards["w"][0]["data"]) == 16 * 16 * 4


def test_trainer_state_round_trip(tmp_path):
    """The real PairedTrainer state (params + 2 Adam opts) survives a
    sharded round trip bit-for-bit."""
    from floodgan_tpu.train.paired import PairedTrainer

    mesh = make_mesh(8, spatial=2)
    trainer = PairedTrainer("pairedattention", 3)
    x = jnp.zeros((2, 64, 64, 3))
    y = jnp.zeros((2, 64, 64, 3))
    state = trainer.init(jax.random.key(0), x, y)
    from floodgan_tpu.parallel.mesh import replicate_tree

    state = replicate_tree(state, mesh)
    save_checkpoint_sharded(str(tmp_path / "ck"), {"model": "pix2pix"}, state)

    template = jax.tree_util.tree_map(np.zeros_like, jax.device_get(state))
    _, restored = load_checkpoint_sharded(str(tmp_path / "ck"), template)
    ref_leaves = jax.tree_util.tree_leaves(jax.device_get(state))
    new_leaves = jax.tree_util.tree_leaves(restored)
    assert len(ref_leaves) == len(new_leaves)
    for a, b in zip(ref_leaves, new_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_missing_shard_file_raises(tmp_path):
    """Restore must REFUSE a directory whose shard files don't exactly
    cover every leaf (partial copy / crashed save) — np.empty regions
    would otherwise bind uninitialized memory as parameters."""
    mesh = make_mesh(8, spatial=2)
    state = _state(mesh)
    d = os.fspath(tmp_path / "ck")
    save_checkpoint_sharded(d, {"epoch": 1}, state)
    # simulate a partial copy: drop one shard file that holds real data
    victims = [f for f in os.listdir(d) if f.startswith("shards_p")]
    assert victims
    os.remove(os.path.join(d, sorted(victims)[0]))
    with pytest.raises(ValueError, match="cover"):
        load_checkpoint_sharded(d, state)


def test_stale_shards_from_larger_topology_ignored_and_cleaned(tmp_path):
    """A reused checkpoint dir with shards_p{i} files beyond the recorded
    process count must ignore them on load; a fresh save cleans them."""
    mesh = make_mesh(8, spatial=2)
    state = _state(mesh)
    d = os.fspath(tmp_path / "ck")
    save_checkpoint_sharded(d, {"epoch": 1}, state)
    # plant a stale file from a fictitious larger topology with garbage
    # that would corrupt 'params/w' if applied
    import msgpack

    garbage = {
        "params/w": [
            {
                "index": [[0, 3], [0, 4]],
                "data": np.full((3, 4), -99.0, np.float32).tobytes(),
            }
        ]
    }
    stale = os.path.join(d, "shards_p7.msgpack")
    with open(stale, "wb") as f:
        f.write(msgpack.packb(garbage))
    meta, restored = load_checkpoint_sharded(d, state)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.arange(12.0).reshape(3, 4)
    )
    # a fresh save into the same dir removes the stale file
    save_checkpoint_sharded(d, {"epoch": 2}, state)
    assert not os.path.exists(stale)


def test_sharded_restore_assembles_requested_regions(tmp_path):
    """The sharded restore path materializes leaves through per-region
    callbacks; values must match the saved state exactly for sharded AND
    replicated leaves."""
    mesh = make_mesh(8, spatial=2)
    state = _state(mesh)
    d = os.fspath(tmp_path / "ck")
    save_checkpoint_sharded(d, {"epoch": 1}, state)
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data", "spatial"))
    shardings = {
        "params": {"w": rep, "b": rep},
        "buffer": shard,
        "step": rep,
    }
    meta, restored = load_checkpoint_sharded(d, state, shardings)
    assert meta["epoch"] == 1
    np.testing.assert_array_equal(
        np.asarray(restored["buffer"]),
        np.arange(4 * 2 * 5, dtype=np.float32).reshape(4, 2, 5),
    )
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.arange(12.0).reshape(3, 4)
    )
