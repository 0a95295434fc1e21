"""RAD-TTS ConvAttention: Gaussian-isotropic soft alignment text<->frames.

Reference: text2vec/module.py:420-545.  The reference materializes the full
[B, C, T1, T2] difference tensor ``(q[:,:,:,None] - k[:,:,None])**2`` — a
memory peak of B*C*T1*T2 floats.  Here the squared distance is expanded to
``|q|^2 + |k|^2 - 2 q.k`` so the dominant term is a single [T1,C]x[C,T2]
batched matmul on the MXU and the peak is just [B, T1, T2].

Semantics preserved: hardcoded temperature 0.0005 (module.py:522),
log_softmax over the text dim + log(prior + 1e-8) (module.py:535), -inf key
mask then softmax over text (module.py:539-544).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from wavthruvec_pytorch_tpu.models.layers import Conv1d, PartialConv1d
from wavthruvec_pytorch_tpu.ops.masking import get_mask_from_lengths

_MASK_VALUE = -1e9


class ConvAttention(nn.Module):
    n_feat_channels: int = 1024  # query (wav2vec frame) channels
    n_text_channels: int = 448  # key (encoder output) channels
    # the reference constructs ConvAttention with two positional args only
    # (model.py:219-222), so n_att_channels keeps its ctor default 80
    # (module.py:456-457)
    n_att_channels: int = 80
    temperature: float = 0.0005  # module.py:522 overrides the ctor arg
    # partial-padding convs, the reference ConvNorm's selectable (default-off)
    # mode (module.py:423,433-434)
    use_partial_padding: bool = False

    @nn.compact
    def __call__(
        self,
        queries: jnp.ndarray,  # [B, T1, n_feat_channels] (frames)
        keys: jnp.ndarray,  # [B, T2, n_text_channels] (text)
        key_lens: Optional[jnp.ndarray] = None,  # [B] valid text lengths
        attn_prior: Optional[jnp.ndarray] = None,  # [B, T1, T2]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (attn [B, T1, T2] softmax over T2, attn_logprob [B, T1, T2])."""
        conv_cls = PartialConv1d if self.use_partial_padding else Conv1d
        # key_proj: Conv k3 (C->2C, relu-gain) -> ReLU -> Conv k1 (2C->attn)
        k = conv_cls(
            self.n_text_channels * 2,
            kernel_size=3,
            padding=1,
            w_init_gain="relu",
            name="key_conv1",
        )(keys)
        k = nn.relu(k)
        k = conv_cls(
            self.n_att_channels, kernel_size=1, w_init_gain="linear", name="key_conv2"
        )(k)

        # query_proj: k3 (C->2C, relu) -> ReLU -> k1 -> ReLU -> k1
        q = conv_cls(
            self.n_feat_channels * 2,
            kernel_size=3,
            padding=1,
            w_init_gain="relu",
            name="query_conv1",
        )(queries)
        q = nn.relu(q)
        q = conv_cls(
            self.n_feat_channels, kernel_size=1, w_init_gain="linear", name="query_conv2"
        )(q)
        q = nn.relu(q)
        q = conv_cls(
            self.n_att_channels, kernel_size=1, w_init_gain="linear", name="query_conv3"
        )(q)

        # -temp * sum_c (q - k)^2 == -temp * (|q|^2 + |k|^2 - 2 q.k)
        q = q.astype(jnp.float32)
        k = k.astype(jnp.float32)
        q_sq = jnp.sum(q * q, axis=-1)[:, :, None]  # [B, T1, 1]
        k_sq = jnp.sum(k * k, axis=-1)[:, None, :]  # [B, 1, T2]
        qk = jnp.einsum("btc,bsc->bts", q, k, preferred_element_type=jnp.float32)
        attn = -self.temperature * (q_sq + k_sq - 2.0 * qk)  # [B, T1, T2]

        if attn_prior is not None:
            attn = jax.nn.log_softmax(attn, axis=2) + jnp.log(attn_prior + 1e-8)

        attn_logprob = attn

        if key_lens is not None:
            key_mask = get_mask_from_lengths(key_lens, keys.shape[1])  # [B, T2]
            attn = jnp.where(key_mask[:, None, :], attn, _MASK_VALUE)

        attn = jax.nn.softmax(attn, axis=2)
        return attn, attn_logprob
