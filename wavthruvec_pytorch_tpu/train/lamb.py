"""LAMB with torch_optimizer semantics.

The reference optimizes with ``torch_optimizer.Lamb`` at lr 0.1,
betas (0.9, 0.98), eps 1e-9, weight_decay 1e-6 (text2vec/train.py:23,
252-256; hparams.py:72-76).  That implementation differs from
``optax.lamb`` in two ways that change the update:

1. **Per-tensor weight-norm clamp at 10** — the trust-ratio numerator is
   ``clamp(||p||, 0, 10)`` (``clamp_value=10`` default); optax has no clamp,
   so every tensor with ``||p|| > 10`` steps ``||p||/10``x larger there.
2. **No Adam bias correction** — torch_optimizer's ``debias`` defaults to
   False (``optax.lamb`` always debiases).  Because the trust ratio
   normalizes the update per tensor, uniform debias scaling mostly cancels;
   the residual difference comes through the eps placement relative to the
   (un)corrected second moment.

Same as both: eps added after the sqrt, weight decay folded into the Adam
step *before* the trust ratio, per-tensor trust ratio ``||p|| / ||update||``
with a fallback of 1 when either norm is zero.

``reference_lamb`` reproduces the torch_optimizer update exactly (verified
numerically in tests/test_lamb_parity.py against an oracle transcription of
its published algorithm).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class ReferenceLambState(NamedTuple):
    count: jnp.ndarray
    mu: Any  # first moment
    nu: Any  # second moment


def reference_lamb(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.0,
    clamp_value: float = 10.0,
    debias: bool = False,
) -> optax.GradientTransformation:
    """LAMB exactly as torch_optimizer.Lamb computes it (defaults mirror the
    torch package; the reference passes lr/betas/eps/wd from hparams)."""

    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return ReferenceLambState(
            count=jnp.zeros((), jnp.int32),
            mu=zeros,
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("reference_lamb requires params")
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * (g * g), state.nu, updates
        )
        # branch-free so every hyperparam may be a tracer (this transform is
        # used under optax.inject_hyperparams inside jit)
        t = count.astype(jnp.float32)
        bias_correction = jnp.where(
            jnp.asarray(debias, bool),
            jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t),
            1.0,
        )
        step_size = learning_rate * bias_correction

        def leaf_update(m, v, p):
            adam_step = m / (jnp.sqrt(v) + eps)
            adam_step = adam_step + weight_decay * p
            weight_norm = jnp.clip(
                jnp.linalg.norm(p.astype(jnp.float32)), 0.0, clamp_value
            )
            adam_norm = jnp.linalg.norm(adam_step.astype(jnp.float32))
            trust_ratio = jnp.where(
                (weight_norm == 0.0) | (adam_norm == 0.0),
                1.0,
                weight_norm / adam_norm,
            )
            return (-step_size * trust_ratio * adam_step).astype(p.dtype)

        new_updates = jax.tree_util.tree_map(leaf_update, mu, nu, params)
        return new_updates, ReferenceLambState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
