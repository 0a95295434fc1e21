"""Mask construction from lengths / position tensors.

TPU-native replacements for the reference's boolean-mask helpers
(text2vec/utils.py:10-123, text2vec/model.py:19-68).  All masks are built
from broadcasted iota so they trace to pure XLA ops with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def get_mask_from_lengths(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] lengths -> [B, max_len] bool mask, True at valid positions.

    Reference: text2vec/utils.py get_mask_from_lengths / model.py:19-30.
    ``max_len`` must be static under jit (use padded bucket length).
    """
    ids = lax.broadcasted_iota(jnp.int32, (1, max_len), 1)
    return ids < lengths[:, None].astype(jnp.int32)


def get_non_pad_mask(seq: jnp.ndarray, pad: int = 0) -> jnp.ndarray:
    """[B, T] id tensor -> [B, T, 1] float mask, 1.0 at non-pad positions.

    Reference: text2vec/model.py:32-34.
    """
    assert seq.ndim == 2
    return (seq != pad).astype(jnp.float32)[..., None]


def get_attn_key_pad_mask(seq_k: jnp.ndarray, seq_q: jnp.ndarray, pad: int = 0) -> jnp.ndarray:
    """Key-padding mask for self attention: [B, len_q, len_k] bool, True at PAD keys.

    Reference: text2vec/model.py:59-68.
    """
    len_q = seq_q.shape[1]
    padding_mask = (seq_k == pad)[:, None, :]
    return jnp.broadcast_to(padding_mask, (seq_k.shape[0], len_q, seq_k.shape[1]))


def positions_from_lengths(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """1-based position ids, 0 beyond length: [B, max_len] int32.

    Mirrors the host-side ``src_pos``/``feat_pos`` construction in the
    reference collate (text2vec/dataset.py:130-148) as a device op.
    """
    ids = lax.broadcasted_iota(jnp.int32, (1, max_len), 1) + 1
    valid = ids <= lengths[:, None].astype(jnp.int32)
    return jnp.where(valid, ids, 0)
