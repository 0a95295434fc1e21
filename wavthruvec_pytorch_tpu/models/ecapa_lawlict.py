"""Alternative ECAPA-TDNN variant ("lawlict" implementation).

Reference: text2vec/ecapa_tdnn_lawlict.py:17-162 — dead code in the reference
(model.py imports the TaoRuijie variant) but part of its surface; ported for
inventory parity (SURVEY.md §2.1 T14).  Differences vs models/ecapa.py:
conv->relu->bn ordering, SE via Linears on mean-pooled stats, residuals
accumulated outside the blocks, attentive-stats pooling without the
global-context concat.

Layout: [B, T, C] feature-last.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from wavthruvec_pytorch_tpu.models.layers import BatchNorm, Conv1d, TorchLinear


class Conv1dReluBn(nn.Module):
    out_channels: int
    kernel_size: int = 1
    padding: int = 0
    dilation: int = 1
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv1d(
            self.out_channels,
            kernel_size=self.kernel_size,
            padding=self.padding,
            dilation=self.dilation,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.relu(x)
        return BatchNorm(
            use_running_average=not train, axis_name=self.axis_name, name="bn"
        )(x)


class Res2Conv1dReluBn(nn.Module):
    channels: int
    kernel_size: int = 1
    padding: int = 0
    dilation: int = 1
    scale: int = 4
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.channels % self.scale == 0
        width = self.channels // self.scale
        nums = self.scale if self.scale == 1 else self.scale - 1
        spx = jnp.split(x, self.scale, axis=-1)
        outs = []
        sp = None
        for i in range(nums):
            sp = spx[i] if i == 0 else sp + spx[i]
            sp = Conv1d(
                width,
                kernel_size=self.kernel_size,
                padding=self.padding,
                dilation=self.dilation,
                use_bias=False,
                dtype=self.dtype,
                name=f"convs_{i}",
            )(sp)
            sp = BatchNorm(
                use_running_average=not train,
                axis_name=self.axis_name,
                name=f"bns_{i}",
            )(nn.relu(sp))
            outs.append(sp)
        if self.scale != 1:
            outs.append(spx[nums])
        return jnp.concatenate(outs, axis=-1)


class SEConnect(nn.Module):
    channels: int
    s: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        out = jnp.mean(x, axis=1)  # mean over time
        out = nn.relu(TorchLinear(self.channels // self.s, name="linear1")(out))
        out = nn.sigmoid(TorchLinear(self.channels, name="linear2")(out))
        return x * out[:, None, :]


class SERes2Block(nn.Module):
    channels: int
    kernel_size: int
    padding: int
    dilation: int
    scale: int
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv1dReluBn(self.channels, axis_name=self.axis_name,
                         dtype=self.dtype, name="pre")(x, train)
        x = Res2Conv1dReluBn(
            self.channels, self.kernel_size, self.padding, self.dilation,
            self.scale, axis_name=self.axis_name, dtype=self.dtype, name="res2",
        )(x, train)
        x = Conv1dReluBn(self.channels, axis_name=self.axis_name,
                         dtype=self.dtype, name="post")(x, train)
        return SEConnect(self.channels, dtype=self.dtype, name="se")(x)


class AttentiveStatsPool(nn.Module):
    bottleneck_dim: int = 128
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        alpha = jnp.tanh(Conv1d(self.bottleneck_dim, kernel_size=1,
                                dtype=self.dtype, name="linear1")(x))
        alpha = nn.softmax(
            Conv1d(x.shape[-1], kernel_size=1, dtype=self.dtype,
                   name="linear2")(alpha),
            axis=1,
        )
        mean = jnp.sum(alpha * x, axis=1)
        residuals = jnp.sum(alpha * x**2, axis=1) - mean**2
        std = jnp.sqrt(jnp.clip(residuals, 1e-9, None))
        return jnp.concatenate([mean, std], axis=-1)


class ECAPA_TDNN_Lawlict(nn.Module):
    in_channels: int = 80
    channels: int = 512
    embd_dim: int = 192
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """[B, T, in_channels] -> [B, embd_dim]."""
        out1 = Conv1dReluBn(self.channels, kernel_size=5, padding=2,
                            axis_name=self.axis_name, dtype=self.dtype,
                            name="layer1")(x, train)
        out2 = SERes2Block(self.channels, 3, 2, 2, 8, self.axis_name,
                           self.dtype, name="layer2")(out1, train) + out1
        out3 = SERes2Block(self.channels, 3, 3, 3, 8, self.axis_name,
                           self.dtype, name="layer3")(out1 + out2, train) + out1 + out2
        out4 = (SERes2Block(self.channels, 3, 4, 4, 8, self.axis_name,
                            self.dtype, name="layer4")(out1 + out2 + out3, train)
                + out1 + out2 + out3)

        out = jnp.concatenate([out2, out3, out4], axis=-1)
        out = nn.relu(Conv1d(1536, kernel_size=1, dtype=self.dtype, name="conv")(out))
        out = AttentiveStatsPool(128, dtype=self.dtype, name="pooling")(out)
        out = BatchNorm(use_running_average=not train,
                        axis_name=self.axis_name, name="bn1")(out)
        out = TorchLinear(self.embd_dim, name="linear")(out)
        return BatchNorm(use_running_average=not train,
                         axis_name=self.axis_name, name="bn2")(out)
