"""reference_lamb vs the torch_optimizer.Lamb update rule.

``torch_optimizer`` is not installed in this image, so the oracle below is a
direct numpy transcription of its published Lamb.step() algorithm
(jettify/pytorch-optimizer ``lamb.py``; the reference imports it at
text2vec/train.py:23) — the same category-(b) oracle approach as
``mas_width1_numpy`` for the numba MAS kernel.  Key semantics under test:

* moments updated as Adam but used WITHOUT bias correction (debias=False);
* adam_step = mu / (sqrt(nu) + eps), plus weight_decay * p (pre-trust-ratio);
* trust_ratio = clamp(||p||, 0, 10) / ||adam_step||, 1 when either norm is 0;
* p -= lr * trust_ratio * adam_step, all per tensor.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from wavthruvec_pytorch_tpu.config import Text2VecConfig
from wavthruvec_pytorch_tpu.train.lamb import reference_lamb
from wavthruvec_pytorch_tpu.train.text2vec_train import make_optimizer

HP = dict(lr=0.1, b1=0.9, b2=0.98, eps=1e-9, wd=1e-6)  # text2vec/hparams.py:72-76


def _oracle_steps(params, grads_per_step, lr, b1, b2, eps, wd, clamp_value=10.0):
    params = {k: v.copy() for k, v in params.items()}
    mu = {k: np.zeros_like(v) for k, v in params.items()}
    nu = {k: np.zeros_like(v) for k, v in params.items()}
    for grads in grads_per_step:
        for k in params:
            g = grads[k]
            mu[k] = b1 * mu[k] + (1 - b1) * g
            nu[k] = b2 * nu[k] + (1 - b2) * g * g
            adam_step = mu[k] / (np.sqrt(nu[k]) + eps)
            if wd != 0.0:
                adam_step = adam_step + wd * params[k]
            weight_norm = min(float(np.linalg.norm(params[k])), clamp_value)
            adam_norm = float(np.linalg.norm(adam_step))
            trust = 1.0 if (weight_norm == 0.0 or adam_norm == 0.0) else weight_norm / adam_norm
            params[k] = params[k] - lr * trust * adam_step
    return params


def _toy_tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "dense_kernel": rng.standard_normal((8, 5)).astype(np.float32),
        "dense_bias": rng.standard_normal((5,)).astype(np.float32) * 0.1,
        "big_weight": (rng.standard_normal((40, 40)) * 3.0).astype(np.float32),  # ||p|| > 10 -> exercises the clamp
        "zeros": np.zeros((4,), np.float32),  # trust-ratio fallback
    }


def test_reference_lamb_matches_torch_optimizer_oracle():
    params0 = _toy_tree()
    rng = np.random.default_rng(42)
    grads_per_step = [
        {k: rng.standard_normal(v.shape).astype(np.float32) * 0.5 for k, v in params0.items()}
        for _ in range(3)
    ]

    expected = _oracle_steps(
        params0, grads_per_step, HP["lr"], HP["b1"], HP["b2"], HP["eps"], HP["wd"]
    )

    tx = reference_lamb(
        learning_rate=HP["lr"], b1=HP["b1"], b2=HP["b2"], eps=HP["eps"],
        weight_decay=HP["wd"],
    )
    params = {k: jnp.asarray(v) for k, v in params0.items()}
    state = tx.init(params)
    for grads in grads_per_step:
        updates, state = tx.update(
            {k: jnp.asarray(v) for k, v in grads.items()}, state, params
        )
        params = optax.apply_updates(params, updates)

    for k in params0:
        np.testing.assert_allclose(
            np.asarray(params[k]), expected[k], rtol=1e-6, atol=1e-6, err_msg=k
        )


def test_reference_lamb_differs_from_optax_lamb():
    """Documents WHY optax.lamb was replaced: torch_optimizer clamps the
    trust-ratio numerator at ||p|| <= 10; optax does not, so any tensor with
    norm > 10 (most conv kernels here) takes a larger step under optax.
    (The debias difference largely cancels through the trust ratio.)"""
    params0 = {"w": np.full((40,), 2.0, np.float32)}  # ||p|| = 12.65 > 10
    grads = {"w": np.full((40,), 0.3, np.float32)}

    ours = reference_lamb(HP["lr"], HP["b1"], HP["b2"], HP["eps"], HP["wd"])
    s = ours.init({"w": jnp.asarray(params0["w"])})
    u, _ = ours.update({"w": jnp.asarray(grads["w"])}, s, {"w": jnp.asarray(params0["w"])})

    ox = optax.lamb(HP["lr"], b1=HP["b1"], b2=HP["b2"], eps=HP["eps"], weight_decay=HP["wd"])
    so = ox.init({"w": jnp.asarray(params0["w"])})
    uo, _ = ox.update({"w": jnp.asarray(grads["w"])}, so, {"w": jnp.asarray(params0["w"])})

    # same direction, magnitude larger by ||p||/10 under optax (no clamp)
    ratio = float(np.mean(np.asarray(uo["w"]) / np.asarray(u["w"])))
    np.testing.assert_allclose(ratio, np.linalg.norm(params0["w"]) / 10.0, rtol=1e-3)


def test_make_optimizer_uses_reference_lamb_and_injects_lr():
    cfg = Text2VecConfig()
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    assert "learning_rate" in state.hyperparams
    # frozen-lr mode: overwrite lr on the state (reference train.py:378-380)
    state.hyperparams["learning_rate"] = jnp.asarray(1e-3, jnp.float32)
    u, _ = tx.update({"w": jnp.full((3,), 0.1)}, state, params)
    # |update| scales with the injected lr (trust ratio is scale-free here)
    assert float(jnp.max(jnp.abs(u["w"]))) < 0.01
