"""Small utilities: profiling helpers, feature flags, RNG streams, config."""

import os

import numpy as np
import pytest

import jax

from floodgan_tpu.core.config import (
    ModelConfig,
    TrainConfig,
    lambda_rule,
    model_is_attention,
    model_is_cycle,
    prettify_model_name,
)
from floodgan_tpu.core.flags import use_pallas
from floodgan_tpu.core.rng import RngStreams
from floodgan_tpu.utils.profiling import StepTimer


def test_lambda_rule_schedule():
    # constant for the first half, linear decay after (reference
    # models/model.py:175-181); epoch arg is the 0-based scheduler counter.
    n = 200
    assert lambda_rule(0, n) == 1.0
    assert lambda_rule(99, n) == 1.0
    assert lambda_rule(100, n) < 1.0
    np.testing.assert_allclose(lambda_rule(199, n), 1.0 - 100 / 101.0)
    # the reference's formula never quite reaches zero
    assert 0.0 < lambda_rule(199, n) < 0.02


def test_model_config_validation():
    cfg = ModelConfig(model="Pix2Pix", topography="ALL")
    assert cfg.model == "pix2pix" and cfg.topography == "all"
    assert cfg.input_channels == 9
    assert ModelConfig(topography=None).input_channels == 3
    assert ModelConfig(topography="none").topography is None
    with pytest.raises(NotImplementedError):
        ModelConfig(model="stylegan")
    with pytest.raises(NotImplementedError):
        ModelConfig(topography="bathymetry")


def test_capability_tables():
    assert model_is_cycle("CycleGAN") and model_is_cycle("attentiongan")
    assert not model_is_cycle("pix2pix") and not model_is_cycle("PairedAttention")
    assert model_is_attention("pairedattention") and not model_is_attention("pix2pix")
    assert prettify_model_name("cyclegan") == "CycleGAN"


def test_rng_streams_deterministic():
    a, b = RngStreams(47), RngStreams(47)
    assert jax.random.key_data(a.init("model")).tolist() == jax.random.key_data(b.init("model")).tolist()
    assert jax.random.key_data(a.epoch(3)).tolist() == jax.random.key_data(b.epoch(3)).tolist()
    assert jax.random.key_data(a.inference()).tolist() == jax.random.key_data(b.inference()).tolist()
    c = RngStreams(48)
    assert jax.random.key_data(a.init("model")).tolist() != jax.random.key_data(c.init("model")).tolist()
    # epoch stream matches torch.manual_seed(epoch) semantics: seed-independent
    assert jax.random.key_data(a.epoch(5)).tolist() == jax.random.key_data(c.epoch(5)).tolist()


def test_use_pallas_env_override(monkeypatch):
    monkeypatch.setenv("FLOODGAN_PALLAS", "1")
    assert use_pallas()
    monkeypatch.setenv("FLOODGAN_PALLAS", "0")
    assert not use_pallas()
    monkeypatch.setenv("FLOODGAN_PALLAS", "in")
    assert use_pallas("in") and not use_pallas("compose")
    monkeypatch.setenv("FLOODGAN_PALLAS", "in,compose")
    assert use_pallas("in") and use_pallas("compose")
    monkeypatch.setenv("FLOODGAN_PALLAS", "inn")  # typo must not enable ALL
    with pytest.raises(ValueError, match="unknown kernel"):
        use_pallas("in")
    monkeypatch.delenv("FLOODGAN_PALLAS")
    assert use_pallas() is False  # default off (XLA fusion wins, BENCH_NOTES)


def test_step_compiler_options_env(monkeypatch):
    from floodgan_tpu.core.flags import step_compiler_options

    # CPU backend (the test platform): no TPU options by default.
    monkeypatch.delenv("FLOODGAN_XLA_OPTIONS", raising=False)
    assert step_compiler_options() == {}
    # Explicit disable spellings.
    for off in ("off", "0", "none", "", "False"):
        monkeypatch.setenv("FLOODGAN_XLA_OPTIONS", off)
        assert step_compiler_options() == {}
    # Verbatim pass-through of a custom list (backend-independent).
    monkeypatch.setenv(
        "FLOODGAN_XLA_OPTIONS",
        "xla_tpu_scoped_vmem_limit_kib=49152,xla_foo=bar",
    )
    assert step_compiler_options() == {
        "xla_tpu_scoped_vmem_limit_kib": "49152",
        "xla_foo": "bar",
    }


def test_step_timer_warmup_discard():
    t = StepTimer(warmup=2)
    for v in [1.0, 1.0, 0.1, 0.1]:
        t.samples.append(v)
    np.testing.assert_allclose(t.mean, 0.1)
    np.testing.assert_allclose(t.steps_per_sec, 10.0)


def test_async_checkpointer_roundtrip(tmp_path):
    """Async save produces a file identical in content to the sync path,
    wait() drains, and a crash mid-write never corrupts the target
    (atomic tmp+rename)."""
    import jax.numpy as jnp

    from floodgan_tpu.ckpt import AsyncCheckpointer, load_checkpoint, save_checkpoint

    state = {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.ones((4,))}
    meta = {"model": "pix2pix", "starting_epoch": 3}

    sync_path = str(tmp_path / "sync.ckpt")
    save_checkpoint(sync_path, meta, state)

    ck = AsyncCheckpointer()
    async_path = str(tmp_path / "async.ckpt")
    ck.save(async_path, meta, state)
    ck.wait()

    m1, s1 = load_checkpoint(sync_path)
    m2, s2 = load_checkpoint(async_path)
    assert m1 == m2
    np.testing.assert_array_equal(s1["w"], s2["w"])
    np.testing.assert_array_equal(s1["b"], s2["b"])
    # second save reuses the worker; wait is idempotent
    ck.save(async_path, meta, state)
    ck.wait()
    ck.wait()
