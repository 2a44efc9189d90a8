"""Real 2-process jax.distributed coverage (slow tier).

Round-2 verdict: the multi-host loader was only ever exercised
single-process with simulated process indices.  This spawns TWO actual
``jax.distributed`` CPU processes (2 local devices each → one global
4-device (data=2, spatial=2) mesh), drives ``MultiHostBatchLoader``
stripes through a jitted global reduction, and round-trips a sharded
checkpoint (ckpt/sharded.py) across the process boundary.

Each child prints one line per check; the parent asserts both children
agree (the global sums must be identical on every process — they are
computed from globally-sharded arrays via XLA collectives)."""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import os, sys
sys.path.insert(0, os.environ["_FG_REPO"])
sys.path.insert(0, os.path.join(os.environ["_FG_REPO"], "tests"))

import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["_FG_COORD"],
    num_processes=2,
    process_id=int(os.environ["_FG_PID"]),
)
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()
assert len(jax.local_devices()) == 2

from fixtures import make_flood_fixture
from floodgan_tpu.data.pipeline import FloodDataset
from floodgan_tpu.parallel.mesh import make_mesh
from floodgan_tpu.parallel.multihost import MultiHostBatchLoader

fixture_root = os.environ["_FG_FIXTURE"]
# the parent created the fixture before spawning; both children read it
data_path = fixture_root
meta_dir = os.path.join(fixture_root, "metadata")
ds = FloodDataset("usa", "same", "train", data_path, "all", None, None,
                  metadata_dir=meta_dir)

mesh = make_mesh(4, spatial=2)
loader = MultiHostBatchLoader(ds, mesh, batch_size=4)

import functools

@functools.partial(jax.jit, out_shardings=NamedSharding(mesh, P()))
def global_sum(x):
    return jnp.sum(x.astype(jnp.float64))

sums = []
names = []
for batch in loader.epoch_iter(epoch=3):
    x = batch["input"]
    assert x.shape[0] == 4, x.shape
    assert x.sharding.spec == P("data", "spatial", None, None), x.sharding
    sums.append(float(global_sum(x)))
    names.append(",".join(batch["names"]))  # local stripe names
print("SUMS", " ".join(f"{s:.6f}" for s in sums), flush=True)
print("NBATCH", len(sums), flush=True)

# ---- sharded checkpoint round trip across the process boundary ----
from floodgan_tpu.ckpt import load_checkpoint_sharded, save_checkpoint_sharded

rep = NamedSharding(mesh, P())
shard = NamedSharding(mesh, P("data",))
def mk(leaf, s):
    return jax.make_array_from_callback(leaf.shape, s, lambda idx: leaf[idx])
state = {
    "w": mk(np.arange(24.0, dtype=np.float32).reshape(4, 6), rep),
    "buf": mk(np.arange(8.0, dtype=np.float32).reshape(2, 4), shard),
}
ck = os.path.join(fixture_root, "ck")
save_checkpoint_sharded(ck, {"epoch": 5}, state)
# barrier so both shard files exist before anyone reads
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("ckpt_written")

template = {"w": np.zeros((4, 6), np.float32), "buf": np.zeros((2, 4), np.float32)}
meta, restored = load_checkpoint_sharded(
    ck, template, {"w": rep, "buf": shard}
)
assert meta == {"epoch": 5}
got_w = float(global_sum(restored["w"]))
got_buf = float(global_sum(restored["buf"]))
assert got_w == float(np.arange(24.0).sum()), got_w
assert got_buf == float(np.arange(8.0).sum()), got_buf
print("CKPT_OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_loader_and_sharded_ckpt(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_flood_fixture

    fixture_root = tmp_path / "fx"
    data_path, meta_dir = make_flood_fixture(fixture_root, size=32)
    # the child derives paths from the root — pin the fixture layout
    assert data_path == str(fixture_root) and meta_dir.endswith("metadata")

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=(
                env.get("XLA_FLAGS", "")
                + " --xla_force_host_platform_device_count=2"
            ).strip(),
            _FG_REPO=repo,
            _FG_COORD=f"localhost:{port}",
            _FG_PID=str(pid),
            _FG_FIXTURE=str(fixture_root),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _CHILD],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )

    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"child failed:\n{out}\n{err}"
        outs.append(out)

    def line(out, tag):
        return next(l for l in out.splitlines() if l.startswith(tag))

    # Global sums computed via collectives must agree exactly across
    # processes, and both processes saw the same number of global batches.
    assert line(outs[0], "SUMS") == line(outs[1], "SUMS")
    assert line(outs[0], "NBATCH") == line(outs[1], "NBATCH")
    assert int(line(outs[0], "NBATCH").split()[1]) > 0
    for out in outs:
        assert "CKPT_OK" in out
