"""Auxiliary reference modules: Prenet and PostNet.

These are defined (but never instantiated) in the reference —
``Prenet``/``PreNet`` at text2vec/module.py:263-284 and
text2vec/subLayer.py:177-204, and the Tacotron-2-style ``PostNet`` at
text2vec/subLayer.py:240-302.  They are provided here so the component
inventory is complete: a user porting a fork of the reference that *does*
wire them up (the usual Tacotron prenet/postnet experiments) finds
drop-in equivalents with importable parameter trees.

Layout note: everything operates on feature-last ``[B, T, C]`` tensors —
the reference PostNet's internal ``transpose(1, 2)`` pair
(subLayer.py:293,301) is layout plumbing its Conv1d needs and has no
TPU-side equivalent.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from wavthruvec_pytorch_tpu.models.layers import BatchNorm, Conv1d, Linear


class Prenet(nn.Module):
    """fc -> relu -> dropout -> fc -> relu -> dropout.

    Reference: text2vec/module.py:263-284 (``Prenet``, p fixed at 0.5) and
    text2vec/subLayer.py:177-204 (``PreNet``, p configurable) — identical
    apart from the dropout probability, so one module covers both.  The
    reference applies dropout in train mode only (plain ``nn.Dropout``);
    pass ``deterministic=False`` with a ``"dropout"`` rng to match training.
    """

    hidden_size: int
    output_size: int
    p: float = 0.5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = Linear(self.hidden_size, w_init_gain="linear", dtype=self.dtype,
                   name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.p, deterministic=deterministic)(x)
        x = Linear(self.output_size, w_init_gain="linear", dtype=self.dtype,
                   name="fc2")(x)
        x = nn.relu(x)
        return nn.Dropout(self.p, deterministic=deterministic)(x)


class PostNet(nn.Module):
    """Five k=5 convolutions with BatchNorm: tanh on all but the last,
    dropout 0.5 after every layer (reference: text2vec/subLayer.py:240-302).

    Matches the reference exactly, including its quirks: dropout is applied
    to the LAST layer too (subLayer.py:299), and ``F.dropout`` there runs in
    train mode only.  Conv weights are xavier_uniform with tanh gain for all
    but the final (linear-gain) conv, via ``ConvNorm``'s ``w_init_gain``
    (subLayer.py:206-238).
    """

    n_mel_channels: int = 80
    postnet_embedding_dim: int = 512
    postnet_kernel_size: int = 5
    postnet_n_convolutions: int = 5
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 deterministic: Optional[bool] = None) -> jnp.ndarray:
        """x: [B, T, n_mel_channels] -> [B, T, n_mel_channels]."""
        if deterministic is None:
            deterministic = not train
        pad = (self.postnet_kernel_size - 1) // 2
        n = self.postnet_n_convolutions
        for i in range(n):
            last = i == n - 1
            out_ch = self.n_mel_channels if last else self.postnet_embedding_dim
            x = Conv1d(
                out_ch,
                kernel_size=self.postnet_kernel_size,
                padding=pad,
                w_init_gain="linear" if last else "tanh",
                dtype=self.dtype,
                name=f"convolutions_{i}_conv",
            )(x)
            x = BatchNorm(
                use_running_average=not train,
                axis_name=self.axis_name,
                name=f"convolutions_{i}_bn",
            )(x)
            if not last:
                x = jnp.tanh(x)
            x = nn.Dropout(0.5, deterministic=deterministic)(x)
        return x
