"""Optimizer: torch-Adam-exact updates with an explicit per-step LR.

torch.optim.Adam computes  p -= lr * m_hat / (sqrt(v_hat) + eps); optax's
``scale_by_adam`` produces exactly m_hat / (sqrt(v_hat) + eps) (eps outside
the sqrt, eps_root=0), so scaling by -lr reproduces torch bit-for-bit in
f32.  The LR is a *traced argument* of the train step rather than baked
into the optimizer, so the reference's per-epoch LambdaLR schedule
(reference models/model.py:123-124, 175-181) becomes a host-side scalar —
no retrace, no optimizer-state surgery.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import optax


def adam_tx(b1: float = 0.5, b2: float = 0.999, eps: float = 1e-8) -> optax.GradientTransformation:
    return optax.scale_by_adam(b1=b1, b2=b2, eps=eps, eps_root=0.0)


def apply_adam(
    tx: optax.GradientTransformation,
    params: Any,
    opt_state: Any,
    grads: Any,
    lr: jax.Array,
) -> Tuple[Any, Any]:
    updates, new_opt_state = tx.update(grads, opt_state, params)
    updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
    return optax.apply_updates(params, updates), new_opt_state
