"""Rematerialisation must not change training numerics — remat=True and
remat=False produce identical step losses for both strategies."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from floodgan_tpu.train.cycle import CycleTrainer
from floodgan_tpu.train.paired import PairedTrainer


def _losses(trainer, x, y, key):
    state = trainer.init(jax.random.key(5), x, y)
    state, m1 = trainer.train_step(state, x, y, jnp.float32(2e-4), key)
    state, m2 = trainer.train_step(state, x, y, jnp.float32(2e-4), key)
    return {k: float(v) for k, v in {**{f"s1_{k}": v for k, v in m1.items()}, **m2}.items()}


@pytest.mark.slow
def test_paired_remat_equivalence(rng):
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 9), dtype=np.float32) * 0.5)
    y = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32) * 0.5)
    key = jax.random.key(1)
    a = _losses(PairedTrainer("pairedattention", 9, remat=False), x, y, key)
    b = _losses(PairedTrainer("pairedattention", 9, remat=True), x, y, key)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-6, err_msg=k)


@pytest.mark.slow
def test_paired_remat_full_replay_equivalence(rng):
    """remat_policy='full' (save only region inputs — the smaller-memory
    choice when the segment-boundary saves themselves bind, e.g. 1024²
    batch 8) is the same math as the segmented default."""
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 9), dtype=np.float32) * 0.5)
    y = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32) * 0.5)
    key = jax.random.key(1)
    a = _losses(PairedTrainer("pairedattention", 9, remat=True), x, y, key)
    b = _losses(
        PairedTrainer("pairedattention", 9, remat=True, remat_policy="full"),
        x, y, key,
    )
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-6, err_msg=k)


def test_paired_remat_policy_validated():
    with pytest.raises(ValueError):
        PairedTrainer("pairedattention", 9, remat=True, remat_policy="typo")


def test_cycle_remat_policy_validated():
    from floodgan_tpu.train.cycle import CycleTrainer

    with pytest.raises(ValueError):
        CycleTrainer("cyclegan", 9, remat=True, remat_policy="typo")


def test_seg_remat_equivalence(rng):
    from floodgan_tpu.train.seg import SegTrainer

    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32) * 0.5)
    m = jnp.asarray((rng.random((2, 32, 32, 1)) > 0.5).astype(np.float32))
    lr = jnp.float32(1e-4)

    def losses(trainer):
        state = trainer.init(jax.random.key(5), x)
        state, m1 = trainer.train_step(state, x, m, lr)
        state, m2 = trainer.train_step(state, x, m, lr)
        return {**{f"s1_{k}": float(v) for k, v in m1.items()},
                **{k: float(v) for k, v in m2.items()}}

    a = losses(SegTrainer())
    b = losses(SegTrainer(remat=True))
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-6, err_msg=k)


@pytest.mark.slow
def test_cycle_remat_equivalence(rng):
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 9), dtype=np.float32) * 0.5)
    y = jnp.asarray(rng.standard_normal((1, 32, 32, 3), dtype=np.float32) * 0.5)
    key = jax.random.key(2)
    a = _losses(CycleTrainer("cyclegan", 9, remat=False), x, y, key)
    b = _losses(CycleTrainer("cyclegan", 9, remat=True), x, y, key)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-6, err_msg=k)
