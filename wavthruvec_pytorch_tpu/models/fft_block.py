"""Feed-Forward Transformer (FFT) block: multi-head self-attention + conv FFN.

Reference: text2vec/subLayer.py:34-174.  The reference materializes per-head
batches with permute/view + bmm; here attention is a pair of einsums XLA
fuses onto the MXU.  Semantics preserved:

* q/k/v projections N(0, sqrt(2/(d_model+d_k))) (subLayer.py:70-75);
* scaled dot-product with 1/sqrt(d_k), key-pad mask -> -inf, softmax over
  keys, attention dropout 0.1 (subLayer.py:43-55);
* output proj xavier_normal, dropout, LayerNorm(x + residual);
* FFN = Conv1d(k=9, pad=4) -> ReLU -> Conv1d(k=1) -> dropout ->
  LayerNorm(x + residual) (subLayer.py:121-146);
* non-pad mask multiplied in after each sublayer (subLayer.py:166-174).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from wavthruvec_pytorch_tpu.models.layers import (
    Conv1d,
    LayerNorm,
    normal_init,
    torch_default_bias_init,
)

_MASK_VALUE = -1e9


def xavier_normal(gain: float = 1.0):
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[-2], shape[-1]
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, dtype)

    return init


class MultiHeadAttention(nn.Module):
    n_head: int
    d_model: int
    d_k: int
    d_v: int
    dropout: float = 0.1
    use_flash: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, T, _ = x.shape
        residual = x
        qkv_std = math.sqrt(2.0 / (self.d_model + self.d_k))

        def proj(name, d_out):
            return nn.Dense(
                self.n_head * d_out,
                kernel_init=normal_init(qkv_std),
                bias_init=torch_default_bias_init(self.d_model),
                dtype=self.dtype,
                name=name,
            )(x).reshape(B, T, self.n_head, d_out)

        q = proj("w_qs", self.d_k)
        k = proj("w_ks", self.d_k)
        v = proj("w_vs", self.d_v)

        # Flash (blockwise, O(T) memory) path for long frame buckets: the
        # Pallas TPU kernel streams K/V tiles so the T x T score matrix is
        # never materialized.  Semantics vs the dense path: identical masked
        # softmax via segment ids (pads segment 0, real tokens 1 — pad-query
        # rows differ but are zeroed by the FFT block's non-pad mask, like
        # the reference's post-sublayer masking); attention-prob dropout is
        # NOT applied inside the kernel (output-proj dropout still is).
        # A non-deterministic (training) forward with dropout > 0 therefore
        # CANNOT run with flash enabled — it would silently drop the
        # reference's attention-prob dropout (subLayer.py:43-55) on flash
        # buckets while keeping it on dense ones.  Hard error instead:
        if self.use_flash and not deterministic and self.dropout > 0:
            raise ValueError(
                "flash_attention=True cannot apply attention-prob dropout "
                f"(dropout={self.dropout}) in a non-deterministic forward; "
                "train with dropout=0.0 (documented deviation) or disable "
                "flash_attention for training. This raises even when this "
                "particular shape/platform would fall back to the dense "
                "path (which CAN apply dropout): allowing it would make the "
                "training math silently differ between flash-eligible and "
                "fallback buckets of the same run."
            )
        if (
            self.use_flash
            and self.d_v == self.d_k
            and T % 128 == 0
            and T >= 256
            and jax.devices()[0].platform == "tpu"
        ):
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds,
                flash_attention,
            )

            if mask is not None:
                seg = (~mask[:, 0, :]).astype(jnp.int32)  # 1 real, 0 pad
            else:
                seg = jnp.ones((B, T), jnp.int32)
            # kernel wants head_dim <= 128 or a multiple of 128; zero-pad is
            # exact (padded q.k terms are 0; padded v dims slice away).
            # Inputs keep their compute dtype: the kernel accumulates scores
            # and outputs in f32 regardless (preferred_element_type inside),
            # so bf16 q/k/v get the same f32-accumulated semantics as the
            # dense path's einsums at 2x the MXU rate; the only delta is the
            # attention probs being rounded to bf16 before the p@v matmul.
            d_pad = 0 if self.d_k <= 128 else (-self.d_k) % 128

            def hpad(x):
                x = x.transpose(0, 2, 1, 3)
                if d_pad:
                    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, d_pad)))
                return x

            out = flash_attention(
                hpad(q), hpad(k), hpad(v),
                segment_ids=SegmentIds(q=seg, kv=seg),
                sm_scale=1.0 / math.sqrt(self.d_k),
            )[..., : self.d_v]
            out = out.transpose(0, 2, 1, 3).reshape(B, T, self.n_head * self.d_v)
            attn = jnp.zeros((B, self.n_head, 0, 0), jnp.float32)  # not materialized
        else:
            out, attn = None, None
        if out is None:
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) / math.sqrt(self.d_k)
            if mask is not None:
                scores = jnp.where(mask[:, None, :, :], _MASK_VALUE, scores)
            attn = jax.nn.softmax(scores, axis=-1)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            out = jnp.einsum(
                "bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32
            ).reshape(B, T, self.n_head * self.d_v)

        out = nn.Dense(
            self.d_model,
            kernel_init=xavier_normal(),
            bias_init=torch_default_bias_init(self.n_head * self.d_v),
            dtype=self.dtype,
            name="fc",
        )(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = LayerNorm(dtype=self.dtype)(out + residual)
        return out, attn


class PositionwiseFeedForward(nn.Module):
    d_in: int
    d_hid: int
    kernel: Tuple[int, int] = (9, 1)
    padding: Tuple[int, int] = (4, 0)
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        residual = x
        out = Conv1d(
            self.d_hid,
            kernel_size=self.kernel[0],
            padding=self.padding[0],
            dtype=self.dtype,
            name="w_1",
        )(x)
        out = nn.relu(out)
        out = Conv1d(
            self.d_in,
            kernel_size=self.kernel[1],
            padding=self.padding[1],
            dtype=self.dtype,
            name="w_2",
        )(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return LayerNorm(dtype=self.dtype)(out + residual)


class FFTBlock(nn.Module):
    d_model: int
    d_inner: int
    n_head: int
    d_k: int
    d_v: int
    fft_conv1d_kernel: Tuple[int, int] = (9, 1)
    fft_conv1d_padding: Tuple[int, int] = (4, 0)
    dropout: float = 0.1
    use_flash: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        non_pad_mask: Optional[jnp.ndarray] = None,
        slf_attn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        out, attn = MultiHeadAttention(
            self.n_head,
            self.d_model,
            self.d_k,
            self.d_v,
            dropout=self.dropout,
            use_flash=self.use_flash,
            dtype=self.dtype,
            name="slf_attn",
        )(x, mask=slf_attn_mask, deterministic=deterministic)
        if non_pad_mask is not None:
            out = out * non_pad_mask
        out = PositionwiseFeedForward(
            self.d_model,
            self.d_inner,
            kernel=self.fft_conv1d_kernel,
            padding=self.fft_conv1d_padding,
            dropout=self.dropout,
            dtype=self.dtype,
            name="pos_ffn",
        )(out, deterministic=deterministic)
        if non_pad_mask is not None:
            out = out * non_pad_mask
        return out, attn
