"""Vec2Wav: HiFi-GAN-style generator with Conditional BatchNorm speaker/noise
conditioning, plus Multi-Period / Multi-Scale discriminators and GAN losses.

Reference: vec2wav/models.py (Generator 77-156, MPD 159-215, MSD 218-275,
losses 278-309) and vec2wav/modules.py (ConditionalBatchNorm1d 5-30).

Reference quirks intentionally preserved:
* ``resblock = ResBlock1 if h.resblock == '1' else ResBlock2`` with the int
  ``1`` in hparams means **ResBlock2** runs, consuming only the first two
  dilations (1, 3) of each [1,3,5] entry (models.py:84 + hparams.py:30);
* the final activation before conv_post is leaky_relu with torch's default
  slope 0.01, not 0.1 (models.py:143);
* conv_pre keeps torch-default init (only ups/resblocks/conv_post get the
  N(0, 0.01) ``init_weights``, models.py:101-102, utils.py:11-14).

Layout: waveforms [B, T, 1]; features [B, T, C] (feature-last).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from wavthruvec_pytorch_tpu.config import Vec2WavConfig
from wavthruvec_pytorch_tpu.models.layers import (
    BatchNorm,
    SpectralNormConv1d,
    SpectralNormDense,
    TorchLinear,
    WNConv1d,
    WNConv2d,
    WNConvTranspose1d,
    normal_init,
)

LRELU_SLOPE = 0.1


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    # reference: vec2wav/utils.py get_padding
    return int((kernel_size * dilation - dilation) / 2)


class ConditionalBatchNorm(nn.Module):
    """BN(affine=False) + spectral-norm Linear(z -> 2C) producing per-sample
    gamma/beta (reference: vec2wav/modules.py:5-30; gamma init N(1, 0.02),
    beta init 0)."""

    num_features: int
    z_channels: int = 128
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, z: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        out = BatchNorm(
            use_running_average=not train,
            use_scale=False,
            use_bias=False,
            axis_name=self.axis_name,
            name="batch_norm",
        )(x)
        gb = SpectralNormDense(
            self.num_features * 2,
            update_stats=train,
            kernel_init=normal_init(0.02, mean=1.0),
            bias_init=nn.initializers.zeros,
            name="layer",
        )(z)
        gamma, beta = jnp.split(gb, 2, axis=-1)
        return gamma[:, None, :] * out + beta[:, None, :]


class ResBlock1(nn.Module):
    """3x (lrelu -> dilated conv -> lrelu -> conv) residual (models.py:13-50)."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3, 5)
    folded: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilation[:3]):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = WNConv1d(
                self.channels,
                kernel_size=self.kernel_size,
                dilation=d,
                padding=get_padding(self.kernel_size, d),
                w_std=0.01,
                folded=self.folded,
                dtype=self.dtype,
                name=f"convs1_{i}",
            )(xt)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            xt = WNConv1d(
                self.channels,
                kernel_size=self.kernel_size,
                dilation=1,
                padding=get_padding(self.kernel_size, 1),
                w_std=0.01,
                folded=self.folded,
                dtype=self.dtype,
                name=f"convs2_{i}",
            )(xt)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    """2x (lrelu -> dilated conv) residual (models.py:53-70).

    ``fused=True`` (inference fast path) runs each lrelu->conv->residual unit
    as one Pallas kernel (ops/fused_resblock.py) when shapes allow — same
    math, fewer HBM round trips."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3)
    folded: bool = False
    fused: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilation[:2]):
            conv = WNConv1d(
                self.channels,
                kernel_size=self.kernel_size,
                dilation=d,
                padding=get_padding(self.kernel_size, d),
                w_std=0.01,
                folded=self.folded,
                fuse_lrelu_residual=self.fused,
                lrelu_slope=LRELU_SLOPE,
                dtype=self.dtype,
                name=f"convs_{i}",
            )
            if self.fused:
                x = conv(x)  # lrelu + conv + residual fused inside
            else:
                xt = nn.leaky_relu(x, LRELU_SLOPE)
                x = conv(xt) + x
        return x


class Generator(nn.Module):
    """wav2vec latents [B, T, 1024] + spk_emb [B, 192] + noise [B, 192]
    -> waveform [B, 320*T, 1] (reference: models.py:77-147)."""

    cfg: Vec2WavConfig
    folded: bool = False  # inference export with pre-folded weight norm
    fused: bool = False  # fused Pallas lrelu+conv+residual units (inference)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        spk_emb: jnp.ndarray,
        noise: jnp.ndarray,
        train: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        num_kernels = len(cfg.resblock_kernel_sizes)
        spk_noise = jnp.concatenate([spk_emb, noise], axis=-1)  # [B, 384]

        x = WNConv1d(
            cfg.upsample_initial_channel,
            kernel_size=7,
            padding=3,
            w_std=None,  # conv_pre keeps torch-default init
            folded=self.folded,
            dtype=self.dtype,
            name="conv_pre",
        )(x)

        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            x = WNConvTranspose1d(
                ch,
                kernel_size=k,
                stride=u,
                padding=(k - u) // 2,
                w_std=0.01,
                folded=self.folded,
                dtype=self.dtype,
                name=f"ups_{i}",
            )(x)
            z = TorchLinear(128, name=f"fcs_{i}")(spk_noise)
            x = ConditionalBatchNorm(ch, name=f"cbns_{i}")(x, z, train=train)
            xs = None
            for j, (rk, rd) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
            ):
                block_cls = ResBlock1 if cfg.use_resblock1 else ResBlock2
                kwargs = {}
                if not cfg.use_resblock1:
                    kwargs["fused"] = self.fused
                out = block_cls(
                    ch,
                    kernel_size=rk,
                    dilation=rd,
                    folded=self.folded,
                    dtype=self.dtype,
                    name=f"resblocks_{i * num_kernels + j}",
                    **kwargs,
                )(x)
                xs = out if xs is None else xs + out
            x = xs / num_kernels

        x = nn.leaky_relu(x)  # default slope 0.01 (models.py:143)
        x = WNConv1d(
            1, kernel_size=7, padding=3, w_std=0.01, folded=self.folded,
            dtype=self.dtype, name="conv_post",
        )(x)
        return jnp.tanh(x)


# ---------------------------------------------------------------------------
# Discriminators
# ---------------------------------------------------------------------------

class DiscriminatorP(nn.Module):
    """Per-period 2-D conv discriminator (reference: models.py:159-192)."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        # x: [B, T, 1] -> pad (reflect) to multiple of period -> [B, T/p, p, 1]
        B, T, C = x.shape
        if T % self.period != 0:
            n_pad = self.period - (T % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            T = T + n_pad
        x = x.reshape(B, T // self.period, self.period, C)

        fmap = []
        channels = [32, 128, 512, 1024]
        for i, ch in enumerate(channels):
            x = WNConv2d(
                ch,
                kernel_size=(self.kernel_size, 1),
                strides=(self.stride, 1),
                padding=(get_padding(5, 1), 0),
                dtype=self.dtype,
                name=f"convs_{i}",
            )(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = WNConv2d(
            1024,
            kernel_size=(self.kernel_size, 1),
            strides=(1, 1),
            padding=(2, 0),
            dtype=self.dtype,
            name="convs_4",
        )(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = WNConv2d(
            1, kernel_size=(3, 1), strides=(1, 1), padding=(1, 0),
            dtype=self.dtype, name="conv_post",
        )(x)
        fmap.append(x)
        return x.reshape(B, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """Periods (13, 17, 19) (reference: models.py:195-215, hparams.py:47).

    ``pair_batched=True`` runs each period discriminator ONCE on
    ``concat([y, y_hat])`` instead of twice sequentially — numerically
    identical (convs are batch-independent) but halves the dispatch count
    of the narrow conv chain, which is utilization-bound at batch 2.
    """

    cfg: Vec2WavConfig
    dtype: Optional[jnp.dtype] = None
    pair_batched: bool = False

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        B = y.shape[0]
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i, p in enumerate(self.cfg.periods):
            d = DiscriminatorP(p, dtype=self.dtype, name=f"discriminators_{i}")
            if self.pair_batched:
                o, fmap = d(jnp.concatenate([y, y_hat], axis=0))
                y_d_r, y_d_g = o[:B], o[B:]
                fmap_r = [m[:B] for m in fmap]
                fmap_g = [m[B:] for m in fmap]
            else:
                y_d_r, fmap_r = d(y)
                y_d_g, fmap_g = d(y_hat)
            y_d_rs.append(y_d_r)
            fmap_rs.append(fmap_r)
            y_d_gs.append(y_d_g)
            fmap_gs.append(fmap_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


def _avg_pool_4_2_pad2(x: jnp.ndarray) -> jnp.ndarray:
    """torch AvgPool1d(4, 2, padding=2), count_include_pad=True, over [B,T,C]."""
    out = lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(1, 4, 1),
        window_strides=(1, 2, 1),
        padding=((0, 0), (2, 2), (0, 0)),
    )
    return out / 4.0


class DiscriminatorS(nn.Module):
    """Single-scale grouped-conv discriminator (reference: models.py:218-243).

    ``tiled_conv=True`` routes the grouped layers through the MXU-packed
    repack (ops/tiled_conv.py) — identical math, measured multi-x faster
    fwd+bwd on chip (the G=16 layers run at ~1 TFLOP/s under the plain
    grouped lowering).
    """

    use_spectral_norm: bool = False
    update_spectral: bool = True
    tiled_conv: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        specs = [
            # (features, kernel, stride, groups, padding)
            (128, 15, 1, 1, 7),
            (128, 41, 2, 4, 20),
            (256, 41, 2, 16, 20),
            (512, 41, 4, 16, 20),
            (1024, 41, 4, 16, 20),
            (1024, 41, 1, 16, 20),
            (1024, 5, 1, 1, 2),
        ]
        impl = "mxu_tiled" if self.tiled_conv else None
        fmap = []
        for i, (f, k, s, g, p) in enumerate(specs):
            if self.use_spectral_norm:
                x = SpectralNormConv1d(
                    f, kernel_size=k, stride=s, groups=g, padding=p,
                    update_stats=self.update_spectral, dtype=self.dtype,
                    conv_impl=impl, name=f"convs_{i}",
                )(x)
            else:
                x = WNConv1d(
                    f, kernel_size=k, stride=s, groups=g, padding=p,
                    dtype=self.dtype, conv_impl=impl, name=f"convs_{i}",
                )(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        if self.use_spectral_norm:
            x = SpectralNormConv1d(
                1, kernel_size=3, stride=1, padding=1,
                update_stats=self.update_spectral, dtype=self.dtype,
                name="conv_post",
            )(x)
        else:
            x = WNConv1d(
                1, kernel_size=3, stride=1, padding=1, dtype=self.dtype,
                name="conv_post",
            )(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class MultiScaleDiscriminator(nn.Module):
    """3 scales, first spectral-normed, AvgPool(4,2,2) between scales
    (reference: models.py:246-275).

    ``pair_batched=True``: one concat-batched pass per scale instead of two
    (see MultiPeriodDiscriminator).  With spectral-norm updates on, the
    power-iteration vector then advances once per step instead of twice —
    the reference updates it per forward call (torch spectral_norm hook);
    documented in PARITY.md, numerically identical when updates are off.
    """

    update_spectral: bool = True
    tiled_conv: bool = False
    dtype: Optional[jnp.dtype] = None
    pair_batched: bool = False

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        B = y.shape[0]
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i in range(3):
            if i != 0:
                y = _avg_pool_4_2_pad2(y)
                y_hat = _avg_pool_4_2_pad2(y_hat)
            d = DiscriminatorS(
                use_spectral_norm=(i == 0),
                update_spectral=self.update_spectral,
                tiled_conv=self.tiled_conv,
                dtype=self.dtype,
                name=f"discriminators_{i}",
            )
            if self.pair_batched:
                o, fmap = d(jnp.concatenate([y, y_hat], axis=0))
                y_d_r, y_d_g = o[:B], o[B:]
                fmap_r = [m[:B] for m in fmap]
                fmap_g = [m[B:] for m in fmap]
            else:
                y_d_r, fmap_r = d(y)
                y_d_g, fmap_g = d(y_hat)
            y_d_rs.append(y_d_r)
            fmap_rs.append(fmap_r)
            y_d_gs.append(y_d_g)
            fmap_gs.append(fmap_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# ---------------------------------------------------------------------------
# GAN losses (reference: vec2wav/models.py:278-309)
# ---------------------------------------------------------------------------

def feature_loss(fmap_r, fmap_g) -> jnp.ndarray:
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2.0


def discriminator_loss(disc_real_outputs, disc_generated_outputs):
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        r_loss = jnp.mean((1.0 - dr) ** 2)
        g_loss = jnp.mean(dg**2)
        loss += r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs):
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1.0 - dg) ** 2)
        gen_losses.append(l)
        loss += l
    return loss, gen_losses


def fold_weight_norm(params):
    """Inference export: pre-fold every weight-norm (v, g) pair so the folded
    Generator (``Generator(cfg, folded=True)``) uses v directly as the kernel
    — the TPU analog of the reference's ``remove_weight_norm``
    (vec2wav/models.py:149-156).

    Works on any params subtree: wherever a dict holds both 'v' and 'g', v is
    replaced by the normalized kernel (the norm reduces over exactly the axes
    where g has size 1) and g by the folded kernel's norms.
    """
    import numpy as np

    def fold(node):
        if isinstance(node, dict):
            if "v" in node and "g" in node:
                v = np.asarray(node["v"])
                g = np.asarray(node["g"])
                axes = tuple(d for d in range(v.ndim) if g.shape[d] == 1)
                norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True) + 1e-32)
                kernel = g * v / norm
                new = dict(node)
                new["v"] = kernel
                new["g"] = np.sqrt(
                    np.sum(kernel * kernel, axis=axes, keepdims=True) + 1e-32
                )
                return new
            return {k: fold(x) for k, x in node.items()}
        return node

    return fold(params if isinstance(params, dict) else dict(params))
