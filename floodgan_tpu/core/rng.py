"""Named RNG key streams replacing the reference's manual_seed discipline.

The reference pins randomness with ``torch.manual_seed`` at three points
(reference models/model.py:80 init, :609/:676 per-epoch, :393/:497/:579
before every inference-time generator call — the latter because dropout and
batch-stat normalisation stay active at eval).  We reproduce the *semantics*
(deterministic init / per-epoch data order / deterministic stochastic
inference) with named jax.random key streams; bit-level torch RNG parity is
impossible across frameworks and is not attempted.
"""

from __future__ import annotations

import jax


class RngStreams:
    """Derives per-purpose keys from a single integer seed.

    Streams:
      init       — parameter initialisation (one key per network)
      epoch(e)   — data order + train-time dropout for epoch e
      inference  — the fixed seed-47-style key used before every
                   inference-time generator call (stochastic eval parity)
    """

    def __init__(self, seed: int = 47):
        self.seed = int(seed)
        self._root = jax.random.key(self.seed)

    def init(self, name: str) -> jax.Array:
        return jax.random.fold_in(jax.random.fold_in(self._root, 0), _h(name))

    def epoch(self, epoch: int) -> jax.Array:
        # Mirrors torch.manual_seed(epoch): keyed by the epoch number alone
        # so resume-from-checkpoint reproduces the same per-epoch stream.
        return jax.random.fold_in(jax.random.key(0), epoch)

    def inference(self) -> jax.Array:
        # Mirrors torch.manual_seed(47) before eval-time generator calls:
        # always the same key, independent of position in the run.
        return jax.random.key(47)


def _h(name: str) -> int:
    # Stable small hash for stream names (python's hash() is salted).
    acc = 0
    for ch in name.encode():
        acc = (acc * 131 + ch) % (2**31 - 1)
    return acc
