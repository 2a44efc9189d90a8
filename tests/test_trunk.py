"""Rolled ResNet trunk: scan output == unrolled per-block blocks, and the
roll/unroll parameter conversions are exact inverses."""

import numpy as np

import jax
import jax.numpy as jnp

from floodgan_tpu.models.cyclegan import ResnetBlock
from floodgan_tpu.models.trunk import ResnetTrunk, roll_resnet_params, unroll_resnet_params


def test_trunk_matches_unrolled_blocks(rng):
    nb, d = 4, 32
    trunk = ResnetTrunk(dim=d, num_blocks=nb)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, d), dtype=np.float32))
    params = trunk.init({"params": jax.random.key(0)}, x)["params"]
    out_scan = trunk.apply({"params": params}, x)

    per_block = unroll_resnet_params({"trunk": params})
    block = ResnetBlock(d)
    h = x
    for i in range(nb):
        h = block.apply({"params": per_block[f"res{i}"]}, h)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(h), atol=1e-5)


def test_roll_unroll_roundtrip(rng):
    tree = {
        f"res{i}": {
            conv: {
                "weight": rng.standard_normal((3, 3, 8, 8), dtype=np.float32),
                "bias": rng.standard_normal(8, dtype=np.float32),
            }
            for conv in ("conv1", "conv2")
        }
        for i in range(3)
    }
    tree["other"] = {"weight": rng.standard_normal(4, dtype=np.float32)}
    rolled = roll_resnet_params(dict(tree), num_blocks=3)
    assert "trunk" in rolled and "res0" not in rolled
    assert rolled["trunk"]["conv1_weight"].shape == (3, 3, 3, 8, 8)
    back = unroll_resnet_params(rolled)
    for i in range(3):
        for conv in ("conv1", "conv2"):
            for leaf in ("weight", "bias"):
                np.testing.assert_array_equal(
                    np.asarray(back[f"res{i}"][conv][leaf]), tree[f"res{i}"][conv][leaf]
                )
    assert "other" in back


def test_trunk_gradients_flow(rng):
    trunk = ResnetTrunk(dim=16, num_blocks=3)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16), dtype=np.float32))
    params = trunk.init({"params": jax.random.key(0)}, x)["params"]

    def loss(p):
        return jnp.sum(jnp.square(trunk.apply({"params": p}, x)))

    grads = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert float(jnp.abs(leaf).max()) > 0.0
