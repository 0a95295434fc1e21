"""SpeechBrain-architecture ECAPA-TDNN (``spkrec-ecapa-voxceleb``).

The reference conditions Vec2Wav on speaker embeddings produced by the
*pretrained SpeechBrain* classifier (vec2wav/pre_spk_emb.py:12,30:
``EncoderClassifier.from_hparams("speechbrain/spkrec-ecapa-voxceleb")`` →
``encode_batch``), NOT by the TaoRuijie ECAPA copy that ships in the repo
(vec2wav/ecapa_tdnn.py is dead code there).  SpeechBrain's ECAPA is a
different architecture: TDNN blocks with reflect-padded convs, SE-Res2Net
blocks whose *first* channel chunk passes through unconvolved, a multi-layer
feature-aggregation (MFA) over the concatenated block outputs, attentive
statistics pooling with global context at eps=1e-12, and a 192-d linear head
— preceded by a 80-mel Fbank frontend (hamming 25 ms / 10 ms, constant-pad
STFT, triangular filters, amplitude-to-dB with top_db=80) and per-sentence
mean normalization.

This module implements that full pipeline natively (feature-last [B, T, C]
layout, conv-as-matmul STFT) so SpeechBrain checkpoints can be imported via
``checkpoint.import_speechbrain_ecapa`` and embeddings matching the
reference's ``spk_emb/{spk}.pth`` values can be produced on TPU.

Fixed-architecture constants below mirror the published voxceleb config:
channels (1024,1024,1024,1024,3072), kernels (5,3,3,3,1), dilations
(1,2,3,4,1), res2net scale 8, se 128, attention 128, global context on.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax

from wavthruvec_pytorch_tpu.models.layers import BatchNorm, Conv1d


# ---------------------------------------------------------------------------
# Fbank frontend (speechbrain.lobes.features.Fbank with n_mels=80 defaults)
# ---------------------------------------------------------------------------


def _sb_mel_filterbank(
    sample_rate: int = 16000,
    n_fft: int = 400,
    n_mels: int = 80,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
) -> np.ndarray:
    """SpeechBrain ``Filterbank`` triangular filters: mel-spaced centers,
    symmetric triangles of width ``band[i] = hz[i+1] - hz[i]`` on *both*
    sides (unlike librosa's asymmetric triangles)."""
    if f_max is None:
        f_max = sample_rate / 2

    def to_mel(hz):
        return 2595.0 * np.log10(1.0 + np.asarray(hz, dtype=np.float64) / 700.0)

    def to_hz(mel):
        return 700.0 * (10.0 ** (np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)

    all_freqs = np.linspace(0, sample_rate // 2, n_fft // 2 + 1)
    mel = np.linspace(to_mel(f_min), to_mel(f_max), n_mels + 2)
    hz = to_hz(mel)
    band = (hz[1:] - hz[:-1])[:-1]  # [n_mels]
    f_central = hz[1:-1]  # [n_mels]
    slope = (all_freqs[:, None] - f_central[None, :]) / band[None, :]
    fbank = np.clip(np.minimum(slope + 1.0, -slope + 1.0), 0.0, None)
    return fbank.astype(np.float32)  # [n_freq, n_mels]


def sb_fbank(
    wav: jnp.ndarray,
    sample_rate: int = 16000,
    n_fft: int = 400,
    win_length: int = 400,
    hop_length: int = 160,
    n_mels: int = 80,
    amin: float = 1e-10,
    top_db: float = 80.0,
) -> jnp.ndarray:
    """[B, L] waveform -> [B, frames, n_mels] log-mel, matching the
    SpeechBrain pipeline: center=True *constant*-padded STFT with a periodic
    hamming window, power spectrum (re²+im²), triangular mel filters,
    ``10·log10(clamp(x, amin))`` clipped below at ``global_max − top_db``
    (the reference clips against the max over the whole batch tensor)."""
    pad = n_fft // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="constant")
    n_freq = n_fft // 2 + 1
    t = lax.broadcasted_iota(jnp.float32, (n_freq, n_fft), 1)
    k = lax.broadcasted_iota(jnp.float32, (n_freq, n_fft), 0)
    ang = 2.0 * jnp.pi * k * t / n_fft
    # periodic hamming over the full n_fft (win_length == n_fft here)
    pos = lax.broadcasted_iota(jnp.float32, (1, n_fft), 1)
    off = (n_fft - win_length) // 2
    in_win = jnp.logical_and(pos >= off, pos < off + win_length)
    hamming = 0.54 - 0.46 * jnp.cos(2.0 * jnp.pi * (pos - off) / win_length)
    win = jnp.where(in_win, hamming, 0.0)
    kernel = jnp.concatenate([jnp.cos(ang) * win, -jnp.sin(ang) * win], axis=0)[
        :, None, :
    ]
    spec = lax.conv_general_dilated(
        x[:, None, :],
        kernel,
        window_strides=(hop_length,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    power = spec[:, :n_freq] ** 2 + spec[:, n_freq:] ** 2  # [B, F, T]
    fb = jnp.asarray(_sb_mel_filterbank(sample_rate, n_fft, n_mels))
    mel = jnp.einsum("fm,bft->btm", fb, power)
    x_db = 10.0 * jnp.log10(jnp.clip(mel, amin, None))
    x_db = jnp.maximum(x_db, jnp.max(x_db) - top_db)
    return x_db


def sentence_norm(feats: jnp.ndarray) -> jnp.ndarray:
    """``InputNormalization(norm_type="sentence", std_norm=False)``:
    per-utterance, per-feature mean subtraction over time."""
    return feats - jnp.mean(feats, axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# Blocks (speechbrain.lobes.models.ECAPA_TDNN)
# ---------------------------------------------------------------------------


class SBConv1d(nn.Module):
    """SpeechBrain Conv1d: 'same' output length via explicit **reflect**
    padding of ``dilation·(kernel−1)/2`` per side (odd kernels only here)."""

    features: int
    kernel_size: int
    dilation: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.kernel_size > 1:
            p = self.dilation * (self.kernel_size - 1) // 2
            x = jnp.pad(x, ((0, 0), (p, p), (0, 0)), mode="reflect")
        return Conv1d(
            self.features,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            padding=0,
            dtype=self.dtype,
            name="conv",
        )(x)


class SBTDNNBlock(nn.Module):
    """conv -> ReLU -> BatchNorm."""

    features: int
    kernel_size: int
    dilation: int = 1
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = SBConv1d(
            self.features, self.kernel_size, self.dilation, dtype=self.dtype, name="conv"
        )(x)
        x = nn.relu(x)
        return BatchNorm(
            use_running_average=not train, axis_name=self.axis_name, name="norm"
        )(x)


class SBRes2NetBlock(nn.Module):
    """Channel-chunked multi-scale block: chunk 0 passes through; chunk i≥1
    goes through TDNNBlock i−1, with a running-sum input for i≥2."""

    features: int
    scale: int
    kernel_size: int
    dilation: int
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = self.features // self.scale
        chunks = jnp.split(x, self.scale, axis=-1)
        y = []
        y_i = None
        for i, x_i in enumerate(chunks):
            if i == 0:
                y_i = x_i
            else:
                inp = x_i if i == 1 else x_i + y_i
                y_i = SBTDNNBlock(
                    hidden,
                    self.kernel_size,
                    self.dilation,
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                    name=f"blocks_{i - 1}",
                )(inp, train)
            y.append(y_i)
        return jnp.concatenate(y, axis=-1)


class SBSEBlock(nn.Module):
    """Squeeze-excitation: time-mean -> conv1 -> ReLU -> conv2 -> sigmoid."""

    se_channels: int
    out_channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x, axis=1, keepdims=True)
        s = SBConv1d(self.se_channels, 1, dtype=self.dtype, name="conv1")(s)
        s = nn.relu(s)
        s = SBConv1d(self.out_channels, 1, dtype=self.dtype, name="conv2")(s)
        s = nn.sigmoid(s)
        return s * x


class SBSERes2NetBlock(nn.Module):
    features: int
    res2net_scale: int
    se_channels: int
    kernel_size: int
    dilation: int
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x  # in==out channels in the voxceleb config -> no shortcut
        x = SBTDNNBlock(
            self.features, 1, 1, axis_name=self.axis_name, dtype=self.dtype, name="tdnn1"
        )(x, train)
        x = SBRes2NetBlock(
            self.features,
            self.res2net_scale,
            self.kernel_size,
            self.dilation,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="res2net_block",
        )(x, train)
        x = SBTDNNBlock(
            self.features, 1, 1, axis_name=self.axis_name, dtype=self.dtype, name="tdnn2"
        )(x, train)
        x = SBSEBlock(
            self.se_channels, self.features, dtype=self.dtype, name="se_block"
        )(x)
        return x + residual


class SBAttentiveStatsPooling(nn.Module):
    """Attentive statistics pooling with global context (eps=1e-12)."""

    channels: int
    attention_channels: int = 128
    eps: float = 1e-12
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        T = x.shape[1]

        def stats(x, w):
            mean = jnp.sum(w * x, axis=1)
            var = jnp.sum(w * (x - mean[:, None, :]) ** 2, axis=1)
            std = jnp.sqrt(jnp.clip(var, self.eps, None))
            return mean, std

        uniform = jnp.full((1, T, 1), 1.0 / T, dtype=x.dtype)
        mean, std = stats(x, uniform)
        attn = jnp.concatenate(
            [x, jnp.broadcast_to(mean[:, None, :], x.shape),
             jnp.broadcast_to(std[:, None, :], x.shape)],
            axis=-1,
        )
        attn = SBTDNNBlock(
            self.attention_channels, 1, 1, axis_name=self.axis_name,
            dtype=self.dtype, name="tdnn",
        )(attn, train)
        attn = jnp.tanh(attn)
        attn = SBConv1d(self.channels, 1, dtype=self.dtype, name="conv")(attn)
        attn = nn.softmax(attn, axis=1)  # over time
        mean, std = stats(x, attn)
        return jnp.concatenate([mean, std], axis=-1)[:, None, :]  # [B, 1, 2C]


class ECAPA_TDNN_SB(nn.Module):
    """SpeechBrain ECAPA-TDNN embedding model: [B, T, n_mels] -> [B, emb]."""

    channels: Sequence[int] = (1024, 1024, 1024, 1024, 3072)
    kernel_sizes: Sequence[int] = (5, 3, 3, 3, 1)
    dilations: Sequence[int] = (1, 2, 3, 4, 1)
    attention_channels: int = 128
    res2net_scale: int = 8
    se_channels: int = 128
    lin_neurons: int = 192
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        xl = []
        x = SBTDNNBlock(
            self.channels[0], self.kernel_sizes[0], self.dilations[0],
            axis_name=self.axis_name, dtype=self.dtype, name="blocks_0",
        )(x, train)
        xl.append(x)
        for i in range(1, len(self.channels) - 1):
            x = SBSERes2NetBlock(
                self.channels[i],
                self.res2net_scale,
                self.se_channels,
                self.kernel_sizes[i],
                self.dilations[i],
                axis_name=self.axis_name,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, train)
            xl.append(x)
        # multi-layer feature aggregation over the SE-Res2Net outputs only
        x = jnp.concatenate(xl[1:], axis=-1)
        x = SBTDNNBlock(
            self.channels[-1], self.kernel_sizes[-1], self.dilations[-1],
            axis_name=self.axis_name, dtype=self.dtype, name="mfa",
        )(x, train)
        x = SBAttentiveStatsPooling(
            self.channels[-1], self.attention_channels,
            axis_name=self.axis_name, dtype=self.dtype, name="asp",
        )(x, train)
        x = BatchNorm(
            use_running_average=not train, axis_name=self.axis_name, name="asp_bn"
        )(x)
        x = SBConv1d(self.lin_neurons, 1, dtype=self.dtype, name="fc")(x)
        return x[:, 0, :]  # [B, lin_neurons]


def sb_encode(variables, model: ECAPA_TDNN_SB, wav: jnp.ndarray) -> jnp.ndarray:
    """Full ``EncoderClassifier.encode_batch`` pipeline on a [B, L] waveform:
    Fbank -> sentence mean-norm -> embedding model (eval mode)."""
    feats = sentence_norm(sb_fbank(wav))
    return model.apply(variables, feats, train=False)
