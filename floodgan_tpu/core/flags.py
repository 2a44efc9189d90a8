"""Runtime feature flags.

``use_pallas()`` controls whether the models route their fusion-bound ops
(instance norm chains, the attention composition head) through the Pallas
TPU kernels in ops/pallas_kernels.py.  Default: on when the default JAX
backend is a TPU-class platform, off on CPU (where the jnp paths are what
XLA compiles best and unit tests pin numerics).  Override with
FLOODGAN_PALLAS=0/1.
"""

from __future__ import annotations

import os

import jax

# Real TPU runtimes only: the axon dev tunnel's remote-compile path stalls
# on pallas_call lowering (observed: single-kernel compiles exceeding 10
# minutes and wedging the device grant), so it is opt-in there via
# FLOODGAN_PALLAS=1.
_TPU_PLATFORMS = ("tpu",)


def use_pallas() -> bool:
    env = os.environ.get("FLOODGAN_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False", "")
    try:
        return jax.default_backend() in _TPU_PLATFORMS
    except Exception:
        return False
