"""Flag-matrix smoke tests (round-5 VERDICT item 5): every retained
opt-in lowering flag, enabled ON TOP OF the default step composition,
must reproduce the default step's losses.

Each flag's own golden test pins its op in isolation; what this matrix
pins is the *composition* — the round-4 `concat_channels_phases`
shadowing bug (commit 0638851) was introduced by an opt-in side path and
broke a DEFAULT-path combination (FLOODGAN_CYCLE_PHASE + topography)
that no per-flag test exercised.  Trainers are constructed inside each
case so both construction-time flags (FLOODGAN_CYCLE_PHASE,
FLOODGAN_PHASE_STEM) and trace-time op flags (P2P_SPLIT, MXU_STATS, ...)
take effect.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from floodgan_tpu.train.cycle import CycleTrainer
from floodgan_tpu.train.paired import PairedTrainer

pytestmark = pytest.mark.slow


def _paired_losses(rng_seed=3, size=128):
    """One PairedAttention step at a phase-eligible size (>=128 activates
    the real phasefold/phase-head paths, not the small-size fallbacks)."""
    rng = np.random.default_rng(rng_seed)
    x = jnp.asarray(rng.standard_normal((1, size, size, 9), dtype=np.float32) * 0.3)
    y = jnp.asarray(rng.standard_normal((1, size, size, 3), dtype=np.float32) * 0.3)
    t = PairedTrainer("pairedattention", 9, dropout_rate=0.0)
    s = t.init(jax.random.key(0), x, y)
    xp, yp = t.prepare_batch(x, y)
    _, m = t.train_step(s, xp, yp, jnp.float32(2e-4), jax.random.key(7))
    return {k: float(v) for k, v in m.items()}


def _cycle_losses(rng_seed=5, size=32):
    """One CycleGAN step with topography (9ch) + identity — the
    composition the round-4 shadowing bug broke under CYCLE_PHASE."""
    rng = np.random.default_rng(rng_seed)
    x = jnp.asarray(rng.standard_normal((1, size, size, 9), dtype=np.float32) * 0.5)
    y = jnp.asarray(rng.standard_normal((1, size, size, 3), dtype=np.float32) * 0.5)
    t = CycleTrainer("cyclegan", 9, add_identity_loss=True)
    s = t.init(jax.random.key(1), x, y)
    xp, yp = t.prepare_batch(x, y)
    _, m = t.train_step(s, xp, yp, jnp.float32(2e-4), jax.random.key(2))
    return {k: float(v) for k, v in m.items()}


@pytest.fixture(scope="module")
def paired_control():
    return _paired_losses()


@pytest.fixture(scope="module")
def cycle_control():
    return _cycle_losses()


def _compare(control, got, label):
    assert set(got) == set(control)
    for k in control:
        np.testing.assert_allclose(
            got[k], control[k], rtol=2e-3, atol=1e-4, err_msg=f"{label}: {k}"
        )


PAIRED_VARIANTS = [
    {"FLOODGAN_P2P_SPLIT": "1"},
    {"FLOODGAN_FLAT_COMPOSE": "1"},
    {"FLOODGAN_MERGED_DECONV1": "1"},
    {"FLOODGAN_MXU_STATS": "all"},
    {"FLOODGAN_SUBPIXEL_CONVT": "1"},
    {"FLOODGAN_PHASEFOLD_S2": "1"},
    {"FLOODGAN_PHASE_OUT_SPLIT": "1"},
    {"FLOODGAN_PHASEFOLD": "0"},
    {"FLOODGAN_PHASE_HEAD": "0"},
    {"FLOODGAN_CUSTOM_VJP": "0"},
]


@pytest.mark.parametrize(
    "env", PAIRED_VARIANTS, ids=["+".join(f"{k}={v}" for k, v in e.items()) for e in PAIRED_VARIANTS]
)
def test_paired_flag_matrix(env, paired_control, monkeypatch):
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    _compare(paired_control, _paired_losses(), str(env))


CYCLE_VARIANTS = [
    {"FLOODGAN_CYCLE_PHASE": "1"},
    {"FLOODGAN_CYCLE_PHASE": "1", "FLOODGAN_P2P_SPLIT": "1"},
    {"FLOODGAN_CYCLE_PHASE": "1", "FLOODGAN_SUBPIXEL_CONVT": "1"},
    {"FLOODGAN_CYCLE_PHASE": "1", "FLOODGAN_MXU_STATS": "all"},
    {"FLOODGAN_CYCLE_PHASE": "1", "FLOODGAN_PHASEFOLD": "0"},
    {"FLOODGAN_CYCLE_PHASE_D": "1"},
]


@pytest.mark.parametrize(
    "env", CYCLE_VARIANTS, ids=["+".join(f"{k}={v}" for k, v in e.items()) for e in CYCLE_VARIANTS]
)
def test_cycle_flag_matrix(env, cycle_control, monkeypatch):
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    _compare(cycle_control, _cycle_losses(), str(env))
