"""CBHG postnet: conv bank -> maxpool -> projections -> highway -> biGRU.

Reference: text2vec/module.py:287-364.  The K=8 conv bank keeps the
reference's per-k BatchNormConv1d (conv pad k//2, no bias, relu, BN) with the
[:T] slice for even kernels; maxpool(k=2, s=1, pad=1) is a reduce_window with
-inf padding; the biGRU is a pair of lax.scans (layers.BiGRU).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from wavthruvec_pytorch_tpu.models.layers import (
    BatchNorm,
    BiGRU,
    Conv1d,
    Highway,
    TorchLinear,
)


class BatchNormConv1d(nn.Module):
    """conv(bias=False, xavier) -> optional activation -> BN
    (reference: text2vec/module.py:159-176)."""

    out_dim: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    activation: Optional[str] = None
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = Conv1d(
            self.out_dim,
            kernel_size=self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            use_bias=False,
            w_init_gain="linear",
            dtype=self.dtype,
            name="conv1d",
        )(x)
        if self.activation == "relu":
            x = nn.relu(x)
        return BatchNorm(
            use_running_average=not train, axis_name=self.axis_name, name="bn"
        )(x)


def _maxpool_k2_s1_pad1(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool1d(2, stride=1, padding=1) over [B, T, C], then [:T]."""
    out = lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, 2, 1),
        window_strides=(1, 1, 1),
        padding=((0, 0), (1, 1), (0, 0)),
    )
    return out[:, : x.shape[1]]


class CBHG(nn.Module):
    in_dim: int
    K: int = 8
    projections: Sequence[int] = (256, 1024)
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    gru_impl: str = "scan"  # "pallas": VMEM-resident forward recurrence

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        T = inputs.shape[1]
        x = inputs

        # conv bank, kernel sizes 1..K, each sliced back to T
        bank = [
            BatchNormConv1d(
                self.in_dim,
                kernel_size=k,
                padding=k // 2,
                activation="relu",
                axis_name=self.axis_name,
                dtype=self.dtype,
                name=f"conv1d_banks_{k - 1}",
            )(x, train)[:, :T]
            for k in range(1, self.K + 1)
        ]
        x = jnp.concatenate(bank, axis=-1)  # [B, T, K*in_dim]
        x = _maxpool_k2_s1_pad1(x)

        activations = ["relu"] * (len(self.projections) - 1) + [None]
        for i, (out_size, act) in enumerate(zip(self.projections, activations)):
            x = BatchNormConv1d(
                out_size,
                kernel_size=3,
                padding=1,
                activation=act,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name=f"conv1d_projections_{i}",
            )(x, train)

        if x.shape[-1] != self.in_dim:
            x = TorchLinear(self.in_dim, use_bias=False, name="pre_highway")(x)

        x = x + inputs
        for i in range(4):
            x = Highway(self.in_dim, name=f"highways_{i}")(x)

        return BiGRU(self.in_dim, impl=self.gru_impl, name="gru")(x)  # [B, T, 2*in_dim]
