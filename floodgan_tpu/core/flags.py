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


def use_pallas(which: str = "") -> bool:
    """Whether to route ``which`` ("in" | "compose" | "" = any) through the
    Pallas kernels.  FLOODGAN_PALLAS accepts 0/1 or a comma list of kernel
    names ("in", "compose") for per-kernel selection.

    Default: OFF everywhere.  Measured on a real v5e chip (BENCH_NOTES.md
    round 2): the full 512^2 train step runs 37.0 samples/s with XLA's own
    fusion vs 22.4 with the Pallas kernels enabled — XLA fuses the IN
    chains and the compose head into the surrounding convolutions, which
    the standalone kernels (extra HBM round trips at the call boundaries)
    cannot beat.  The kernels stay available for exotic shapes/backends via
    this flag and remain golden-tested.
    """
    env = os.environ.get("FLOODGAN_PALLAS")
    if env is None:
        return False
    if env.lower() in ("0", "false", "off", "no", ""):
        return False
    names = {s.strip().lower() for s in env.split(",")}
    if names & {"in", "compose"}:
        return (which or "in") in names or not which
    # Any other non-empty value ("1", "yes", "on", "2", ...) means ALL
    # kernels — generic truthiness, so old commands keep their meaning.
    return True


def norm_arith_bf16() -> bool:
    """Whether the normalisation normalize/activation chains run in the
    activation dtype under the bf16 policy (statistics are always f32).
    Measured ≥ the f32 chain on v5e (BENCH_NOTES round 2);
    FLOODGAN_NORM_BF16=0 forces the f32 chain."""
    return os.environ.get("FLOODGAN_NORM_BF16", "1").lower() not in (
        "0", "false", "off", "no", "",
    )
