"""Text2Vec training: jitted train step under pjit data parallelism.

Reference loop: text2vec/train.py:199-455.  Semantics preserved:

* loss = WVF MSE + postnet MSE + duration MSE + 1.0 * binarization KL
  (train.py:339-346);
* LAMB, lr 0.1, betas (0.9, 0.98), eps 1e-9, wd 1e-6 with the warmup schedule
  *disabled* (ScheduledOptim.step_and_update_lr just steps — optimizer.py:19-21);
* gradients clipped to global-norm 1.0 only every 10th iteration
  (train.py:373-375);
* MAS binarization always on (train.py:302-321).

TPU-native: the whole step (forward incl. on-device MAS, losses, backward,
LAMB update) is one jitted function; batch arrays are sharded over the
``data`` mesh axis, parameters replicated — XLA inserts the gradient
all-reduce (the DDP replacement).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import FrozenDict

from wavthruvec_pytorch_tpu.config import MeshConfig, Text2VecConfig
from wavthruvec_pytorch_tpu.models.losses import (
    attention_binarization_loss,
    dnn_loss,
)
from wavthruvec_pytorch_tpu.models.text2vec import Text2Vec
from wavthruvec_pytorch_tpu.train.lamb import reference_lamb


# fixed order of the packed per-step scalar vector (metrics["scalars"]):
# the loop accumulates these [5] device buffers and fetches them in ONE
# stacked [K, 5] transfer every K steps — on a tunneled chip each separate
# float(metrics[k]) is a full D2H round trip, and 5-per-step round trips
# are what inflated the long-bucket production loop to ~2.5 s/step
# (BENCH_NOTES.md "Long-bucket production loop").
SCALAR_KEYS = ("total_loss", "WVF_loss", "WVF_postnet_loss",
               "duration_loss", "attn_binarization_loss")


class T2VTrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(cfg: Text2VecConfig) -> optax.GradientTransformation:
    """LAMB exactly as configured (text2vec/hparams.py:72-76); the reference's
    warmup scale is disabled (optimizer.py:19-21) so the lr is constant.
    Hyperparams are injected so the frozen-lr mode (train.py:378-380) can
    overwrite the lr on the optimizer state.

    Uses :func:`reference_lamb` — torch_optimizer.Lamb semantics (no Adam
    debias, per-tensor weight-norm clamp 10) — not ``optax.lamb``, whose
    bias correction and missing clamp change the update (train/lamb.py)."""
    return optax.inject_hyperparams(reference_lamb)(
        learning_rate=cfg.learning_rate,
        b1=cfg.beta1,
        b2=cfg.beta2,
        eps=cfg.epsilon,
        weight_decay=cfg.weight_decay,
    )


def set_learning_rate(state: "T2VTrainState", lr: float) -> "T2VTrainState":
    """Frozen-lr mode (reference: optimizer.py:29-35, train.py:378-380)."""
    state.opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state


def noam_warmup_schedule(init_lr: float, n_warmup_steps: int):
    """The reference's (disabled) warmup-decay schedule — ScheduledOptim
    ``_get_lr_scale`` = min(step^-0.5, step * warmup^-1.5) * init_lr
    (text2vec/optimizer.py:34-45).  Available for callers who re-enable it;
    the default optimizer keeps the reference's constant lr."""

    def schedule(step):
        step = jnp.maximum(step.astype(jnp.float32), 1.0)
        scale = jnp.minimum(
            jax.lax.rsqrt(step), step * (n_warmup_steps ** -1.5)
        )
        return init_lr * scale

    return schedule


def init_state(
    cfg: Text2VecConfig, rng: jax.Array, sample_batch: Dict[str, jnp.ndarray]
) -> Tuple[Text2Vec, T2VTrainState]:
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    model = Text2Vec(cfg, dtype=dtype)
    p_rng, d_rng = jax.random.split(rng)
    variables = model.init(
        {"params": p_rng, "dropout": d_rng},
        sample_batch["text"],
        sample_batch["src_pos"],
        sample_batch["feat_target"],
        sample_batch["input_lengths"],
        sample_batch["output_lengths"],
        sample_batch["feat_pos"],
        attn_prior=sample_batch["attn_prior"],
        deterministic=True,
        train_bn=False,
    )
    tx = make_optimizer(cfg)
    state = T2VTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=tx.init(variables["params"]),
    )
    return model, state


def train_step(
    model: Text2Vec,
    tx: optax.GradientTransformation,
    cfg: Text2VecConfig,
    with_viz: bool,
    state: T2VTrainState,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
) -> Tuple[T2VTrainState, Dict[str, jnp.ndarray]]:
    """One full training iteration (forward + MAS + losses + LAMB update).

    ``with_viz`` additionally returns the first item's soft/hard attention
    maps for TB images (reference train.py:410-422); the loop only reads
    them every ``log_step`` iterations, so it dispatches the lean variant
    (fewer program outputs) on all other steps."""

    def loss_fn(params):
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["text"],
            batch["src_pos"],
            batch["feat_target"],
            batch["input_lengths"],
            batch["output_lengths"],
            batch["feat_pos"],
            attn_prior=batch["attn_prior"],
            binarize_attention=True,
            deterministic=False,
            train_bn=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        wvf_loss, postnet_loss, duration_loss = dnn_loss(
            outputs["feat_output"],
            outputs["feat_postnet_output"],
            batch["feat_target"],
            outputs["duration_predictor_output"],
            outputs["duration"],
        )
        bin_loss = attention_binarization_loss(
            outputs["attn"], outputs["attn_soft"]
        )
        total = (
            wvf_loss
            + postnet_loss
            + duration_loss
            + cfg.binarization_loss_weight * bin_loss
        )
        metrics = {
            "total_loss": total,
            "WVF_loss": wvf_loss,
            "WVF_postnet_loss": postnet_loss,
            "duration_loss": duration_loss,
            "attn_binarization_loss": bin_loss,
        }
        # one [5] f32 buffer holding every scalar in SCALAR_KEYS order, so
        # the loop can batch K steps of scalars into a single D2H transfer
        metrics["scalars"] = jnp.stack(
            [metrics[k].astype(jnp.float32) for k in SCALAR_KEYS])
        return total, (metrics, mutated["batch_stats"], outputs)

    (_, (metrics, new_batch_stats, outputs)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)

    # reference clips only every 10th iteration (train.py:373-375);
    # iteration starts at 1 there, step here starts at 0 -> (step+1) % 10.
    def clip(g):
        clipped, _ = optax.clip_by_global_norm(cfg.grad_clip_thresh).update(g, optax.EmptyState())
        return clipped

    grads = jax.lax.cond(
        (state.step + 1) % cfg.grad_clip_every == 0,
        clip,
        lambda g: g,
        grads,
    )

    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = T2VTrainState(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_batch_stats,
        opt_state=new_opt_state,
    )
    if not with_viz:
        return new_state, metrics
    # attn maps for TB logging (train.py:410-422); first item only
    viz = {
        "attn_soft_0": outputs["attn_soft"][0],
        "attn_hard_0": outputs["attn"][0],
    }
    return new_state, {**metrics, **viz}


def make_train_step(
    model: Text2Vec,
    cfg: Text2VecConfig,
    mesh=None,
    mesh_cfg: MeshConfig = MeshConfig(),
    with_viz: bool = True,
):
    """Build the jitted (optionally mesh-sharded) train step.

    With a mesh, batch arrays are sharded on their leading axis over the
    ``data`` axis and the state is replicated; XLA emits the psum all-reduce
    for the gradients (the NCCL/DDP replacement, SURVEY.md §2.4).
    """
    tx = make_optimizer(cfg)
    step_fn = functools.partial(train_step, model, tx, cfg, with_viz)

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,)), tx

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(mesh_cfg.data_axis))

    batch_shardings = {
        "text": data,
        "src_pos": data,
        "feat_target": data,
        "input_lengths": data,
        "output_lengths": data,
        "feat_pos": data,
        "attn_prior": data,
    }
    jitted = jax.jit(
        step_fn,
        in_shardings=(repl, batch_shardings, repl),
        donate_argnums=(0,),
    )
    return jitted, tx


# ---------------------------------------------------------------------------
# Host-side batch preparation (bucketed, static shapes)
# ---------------------------------------------------------------------------

def pad_to_bucket(value: int, buckets) -> int:
    for b in buckets:
        if value <= b:
            return b
    return buckets[-1]


def make_padded_batch(
    items,
    cfg: Text2VecConfig,
    text_pad: Optional[int] = None,
    frame_pad: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Pad a list of {text_enc, feat_gt_target, attn_prior} host items into
    one fixed-shape batch (replaces reprocess_tensor, text2vec/dataset.py:118-197).
    """
    B = len(items)
    in_lens = np.array([len(it["text_enc"]) for it in items], np.int32)
    out_lens = np.array([it["feat_gt_target"].shape[0] for it in items], np.int32)
    N = text_pad or pad_to_bucket(int(in_lens.max()), cfg.text_buckets)
    T = frame_pad or pad_to_bucket(int(out_lens.max()), cfg.frame_buckets)

    text = np.zeros((B, N), np.int32)
    src_pos = np.zeros((B, N), np.int32)
    feat = np.zeros((B, T, cfg.n_feat_dim), np.float32)
    feat_pos = np.zeros((B, T), np.int32)
    prior = np.zeros((B, T, N), np.float32)
    audiopaths = []
    for i, it in enumerate(items):
        n, t = in_lens[i], out_lens[i]
        text[i, :n] = it["text_enc"]
        src_pos[i, :n] = np.arange(1, n + 1)
        feat[i, :t] = it["feat_gt_target"]
        feat_pos[i, :t] = np.arange(1, t + 1)
        if it.get("attn_prior") is not None:
            prior[i, :t, :n] = it["attn_prior"]
        audiopaths.append(it.get("audiopath", ""))
    return {
        "text": text,
        "src_pos": src_pos,
        "feat_target": feat,
        "input_lengths": in_lens,
        "output_lengths": out_lens,
        "feat_pos": feat_pos,
        "attn_prior": prior,
        "audiopaths": audiopaths,
    }
