"""Text2Vec training losses (reference: text2vec/loss.py:7-54)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def dnn_loss(
    feat_output: jnp.ndarray,
    feat_postnet: jnp.ndarray,
    feat_target: jnp.ndarray,
    duration_predicted: Optional[jnp.ndarray] = None,
    duration_predictor_target: Optional[jnp.ndarray] = None,
):
    """MSE(feat, target) + MSE(postnet, target) [+ MSE(dur, dur_target)].

    The reference averages over *all* padded elements (nn.MSELoss default,
    loss.py:40-47) — outputs are zero-masked and targets zero-padded, so we
    keep the same plain means for parity.
    """
    wvf_loss = jnp.mean((feat_output - feat_target) ** 2)
    wvf_postnet_loss = jnp.mean((feat_postnet - feat_target) ** 2)
    if duration_predicted is None:
        return wvf_loss, wvf_postnet_loss
    duration_loss = jnp.mean(
        (duration_predicted - duration_predictor_target.astype(jnp.float32)) ** 2
    )
    return wvf_loss, wvf_postnet_loss, duration_loss


def attention_binarization_loss(
    hard_attention: jnp.ndarray, soft_attention: jnp.ndarray, eps: float = 1e-12
) -> jnp.ndarray:
    """-sum(log soft[hard == 1]) / sum(hard) (reference: loss.py:11-15).

    ``eps`` guards log(0) when the soft posterior underflows — the reference
    would emit -inf there; the clamp only changes already-diverged cases.
    """
    mask = hard_attention == 1
    log_sum = jnp.sum(
        jnp.where(mask, jnp.log(jnp.clip(soft_attention, eps, None)), 0.0)
    )
    return -log_sum / jnp.maximum(jnp.sum(hard_attention), 1.0)
