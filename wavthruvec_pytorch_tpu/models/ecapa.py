"""ECAPA-TDNN speaker encoder (Res2Net + SE + attentive stat pooling).

Reference: text2vec/ecapa_tdnn_TaoRuijie.py:11-206 (byte-identical copy at
vec2wav/ecapa_tdnn.py — here there is ONE module shared by both stages, with
the ``input_wav`` switch selecting the raw-wav fbank frontend the vocoder
stage would use vs. the wav2vec-feature input Text2Vec uses).

Layout is [B, T, C] (feature-last).  BatchNorm statistics can be synced over
the data-parallel mesh axis via ``axis_name``.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from wavthruvec_pytorch_tpu.models.layers import BatchNorm, Conv1d, TorchLinear


class SEModule(nn.Module):
    """Squeeze-excitation over time (reference: ecapa_tdnn_TaoRuijie.py:11-25)."""

    channels: int
    bottleneck: int = 128
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x, axis=1, keepdims=True)  # AdaptiveAvgPool1d(1)
        s = Conv1d(self.bottleneck, kernel_size=1, dtype=self.dtype)(s)
        s = nn.relu(s)
        s = Conv1d(self.channels, kernel_size=1, dtype=self.dtype)(s)
        s = nn.sigmoid(s)
        return x * s


class Bottle2neck(nn.Module):
    """Res2Net block, scale 8 (reference: ecapa_tdnn_TaoRuijie.py:28-77)."""

    planes: int
    kernel_size: int
    dilation: int
    scale: int = 8
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        width = int(math.floor(self.planes / self.scale))
        nums = self.scale - 1
        num_pad = math.floor(self.kernel_size / 2) * self.dilation

        residual = x
        out = Conv1d(width * self.scale, kernel_size=1, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(out)
        out = BatchNorm(
            use_running_average=not train, axis_name=self.axis_name, name="bn1"
        )(out)

        spx = jnp.split(out, self.scale, axis=-1)
        outs = []
        sp = None
        for i in range(nums):
            sp = spx[i] if i == 0 else sp + spx[i]
            sp = Conv1d(
                width,
                kernel_size=self.kernel_size,
                dilation=self.dilation,
                padding=num_pad,
                dtype=self.dtype,
                name=f"convs_{i}",
            )(sp)
            sp = nn.relu(sp)
            sp = BatchNorm(
                use_running_average=not train,
                axis_name=self.axis_name,
                name=f"bns_{i}",
            )(sp)
            outs.append(sp)
        outs.append(spx[nums])
        out = jnp.concatenate(outs, axis=-1)

        out = Conv1d(self.planes, kernel_size=1, dtype=self.dtype, name="conv3")(out)
        out = nn.relu(out)
        out = BatchNorm(
            use_running_average=not train, axis_name=self.axis_name, name="bn3"
        )(out)
        out = SEModule(self.planes, dtype=self.dtype, name="se")(out)
        return out + residual


def _pre_emphasis(wav: jnp.ndarray, coef: float = 0.97) -> jnp.ndarray:
    """y[t] = x[t] - coef * x[t-1] with reflect pad of 1 on the left
    (reference: ecapa_tdnn_TaoRuijie.py:80-92)."""
    padded = jnp.pad(wav, ((0, 0), (1, 0)), mode="reflect")
    return padded[:, 1:] - coef * padded[:, :-1]


def _htk_mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    """torchaudio-default mel filterbank (htk scale, no norm)."""
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)

    all_freqs = np.linspace(0, sr // 2, n_fft // 2 + 1)
    m_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.T.astype(np.float32)  # [n_mels, n_freq]


def wav_to_fbank(
    wav: jnp.ndarray,
    sample_rate: int = 16000,
    n_fft: int = 512,
    win_length: int = 400,
    hop_length: int = 160,
    f_min: float = 20.0,
    f_max: float = 7600.0,
    n_mels: int = 80,
) -> jnp.ndarray:
    """Raw-wav fbank frontend for the vocoder-stage ECAPA input
    (reference: ecapa_tdnn_TaoRuijie.py:138-142, torchaudio MelSpectrogram:
    hamming window, power=2, center=True reflect, htk mel, no norm) followed
    by +1e-6, log, per-utterance mean normalization (lines 174-176).

    wav: [B, L] -> [B, frames, n_mels]
    """
    x = _pre_emphasis(wav)
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    # windowed DFT basis built in-graph from iota (baked literals bloat HLO)
    n_freq = n_fft // 2 + 1
    t = lax.broadcasted_iota(jnp.float32, (n_freq, n_fft), 1)
    k = lax.broadcasted_iota(jnp.float32, (n_freq, n_fft), 0)
    ang = 2.0 * jnp.pi * k * t / n_fft
    off = (n_fft - win_length) // 2
    pos = lax.broadcasted_iota(jnp.float32, (1, n_fft), 1)
    in_win = jnp.logical_and(pos >= off, pos < off + win_length)
    hamming = 0.54 - 0.46 * jnp.cos(2.0 * jnp.pi * (pos - off) / win_length)
    win = jnp.where(in_win, hamming, 0.0)
    kernel = jnp.concatenate(
        [jnp.cos(ang) * win, -jnp.sin(ang) * win], axis=0
    )[:, None, :]
    spec = lax.conv_general_dilated(
        x[:, None, :],
        kernel,
        window_strides=(hop_length,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    power = spec[:, :n_freq] ** 2 + spec[:, n_freq:] ** 2  # [B, F, T]
    fb = jnp.asarray(_htk_mel_filterbank(sample_rate, n_fft, n_mels, f_min, f_max))
    mel = jnp.einsum("mf,bft->btm", fb, power)
    mel = jnp.log(mel + 1e-6)
    mel = mel - jnp.mean(mel, axis=1, keepdims=True)
    return mel


def fbank_aug(
    rng: jnp.ndarray,
    x: jnp.ndarray,
    freq_mask_width=(0, 8),
    time_mask_width=(0, 10),
) -> jnp.ndarray:
    """SpecAugment on fbank features [B, T, n_mels] (reference FbankAug,
    ecapa_tdnn_TaoRuijie.py:95-129): per item, one contiguous zero band along
    time then one along frequency, widths drawn uniformly from the given
    half-open ranges and positions from ``[0, max(1, D - max_len))``."""

    def mask_axis(key, x, axis, width_range):
        D = x.shape[axis]
        B = x.shape[0]
        k_len, k_pos = jax.random.split(key)
        mask_len = jax.random.randint(k_len, (B, 1), width_range[0], width_range[1])
        high = jnp.maximum(1, D - jnp.max(mask_len))
        mask_pos = jax.random.randint(k_pos, (B, 1), 0, high)
        idx = jnp.arange(D)[None, :]
        band = (mask_pos <= idx) & (idx < mask_pos + mask_len)  # [B, D]
        shape = [1] * x.ndim
        shape[0] = B
        shape[axis] = D
        return jnp.where(band.reshape(shape), 0.0, x)

    r_time, r_freq = jax.random.split(rng)
    x = mask_axis(r_time, x, axis=1, width_range=time_mask_width)  # time
    x = mask_axis(r_freq, x, axis=2, width_range=freq_mask_width)  # mel
    return x


class ECAPA_TDNN(nn.Module):
    """Full ECAPA-TDNN -> 192-d speaker embedding.

    Reference: ecapa_tdnn_TaoRuijie.py:132-206.  Input: [B, T, n_feat_dim]
    wav2vec feats (``input_wav=False``) or [B, L] raw wav (``input_wav=True``).
    With ``aug=True`` on the wav path, SpecAugment masks are applied to the
    fbank (needs an ``rngs={"specaug": key}`` at apply time).
    """

    C: int = 1024
    n_feat_dim: int = 1024
    n_speaker_dim: int = 192
    input_wav: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, aug: bool = False) -> jnp.ndarray:
        if self.input_wav:
            x = lax.stop_gradient(wav_to_fbank(x))  # torch.no_grad frontend
            if aug:
                x = fbank_aug(self.make_rng("specaug"), x)

        x = Conv1d(self.C, kernel_size=5, padding=2, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = BatchNorm(use_running_average=not train, axis_name=self.axis_name, name="bn1")(x)

        x1 = Bottle2neck(self.C, 3, 2, axis_name=self.axis_name, dtype=self.dtype, name="layer1")(x, train)
        x2 = Bottle2neck(self.C, 3, 3, axis_name=self.axis_name, dtype=self.dtype, name="layer2")(x + x1, train)
        x3 = Bottle2neck(self.C, 3, 4, axis_name=self.axis_name, dtype=self.dtype, name="layer3")(x + x1 + x2, train)

        x = Conv1d(1536, kernel_size=1, dtype=self.dtype, name="layer4")(
            jnp.concatenate([x1, x2, x3], axis=-1)
        )
        x = nn.relu(x)

        t = x.shape[1]
        mean = jnp.mean(x, axis=1, keepdims=True)
        # torch.var is unbiased (correction=1) — ecapa_tdnn_TaoRuijie.py:195
        var = jnp.var(x, axis=1, keepdims=True) * (t / max(t - 1, 1))
        std = jnp.sqrt(jnp.clip(var, 1e-4, None))
        global_x = jnp.concatenate(
            [
                x,
                jnp.broadcast_to(mean, x.shape),
                jnp.broadcast_to(std, x.shape),
            ],
            axis=-1,
        )  # [B, T, 4608]

        w = Conv1d(256, kernel_size=1, dtype=self.dtype, name="att_conv1")(global_x)
        w = nn.relu(w)
        w = BatchNorm(use_running_average=not train, axis_name=self.axis_name, name="att_bn")(w)
        w = jnp.tanh(w)
        w = Conv1d(1536, kernel_size=1, dtype=self.dtype, name="att_conv2")(w)
        w = nn.softmax(w, axis=1)  # softmax over time (dim=2 in [B,C,T])

        mu = jnp.sum(x * w, axis=1)
        sg = jnp.sqrt(jnp.clip(jnp.sum((x**2) * w, axis=1) - mu**2, 1e-4, None))
        x = jnp.concatenate([mu, sg], axis=-1)  # [B, 3072]

        x = BatchNorm(use_running_average=not train, axis_name=self.axis_name, name="bn5")(x)
        x = TorchLinear(self.n_speaker_dim, dtype=self.dtype, name="fc6")(x)
        x = BatchNorm(use_running_average=not train, axis_name=self.axis_name, name="bn6")(x)
        return x
