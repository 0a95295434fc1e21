"""Parity tests for the SpeechBrain-architecture ECAPA speaker encoder.

The reference conditions Vec2Wav on embeddings from the *pretrained*
SpeechBrain ``spkrec-ecapa-voxceleb`` model (vec2wav/pre_spk_emb.py:12,30).
SpeechBrain itself is not installed in this image (zero egress), so the
oracle below is an independent torch reimplementation of the published
SpeechBrain ECAPA-TDNN architecture (speechbrain.lobes.models.ECAPA_TDNN
and the Fbank/InputNormalization frontend), with state-dict key names
matching the real checkpoint layout.  This proves the importer mapping and
the forward math agree between the torch architecture and the Flax module;
validating against actual pretrained weights requires the downloadable
``embedding_model.ckpt`` (documented limitation, see PARITY.md).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from wavthruvec_pytorch_tpu.checkpoint import (
    assert_tree_shapes_match,
    import_speechbrain_ecapa,
)
from wavthruvec_pytorch_tpu.models.ecapa_speechbrain import (
    ECAPA_TDNN_SB,
    sb_encode,
    sb_fbank,
    sentence_norm,
)

# ---------------------------------------------------------------------------
# torch oracle of the published SpeechBrain architecture (key-compatible)
# ---------------------------------------------------------------------------


class SBConv(tnn.Module):
    """speechbrain.nnet.CNN.Conv1d: 'same' length via reflect padding."""

    def __init__(self, in_ch, out_ch, k, dilation=1):
        super().__init__()
        self.conv = tnn.Conv1d(in_ch, out_ch, k, dilation=dilation)
        self.k, self.dilation = k, dilation

    def forward(self, x):  # [B, C, T]
        if self.k > 1:
            p = self.dilation * (self.k - 1) // 2
            x = F.pad(x, (p, p), mode="reflect")
        return self.conv(x)


class SBBN(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.norm = tnn.BatchNorm1d(ch)

    def forward(self, x):
        return self.norm(x)


class TDNNBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, k, dilation=1):
        super().__init__()
        self.conv = SBConv(in_ch, out_ch, k, dilation)
        self.activation = tnn.ReLU()
        self.norm = SBBN(out_ch)

    def forward(self, x):
        return self.norm(self.activation(self.conv(x)))


class Res2NetBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, scale, k, dilation):
        super().__init__()
        hidden = out_ch // scale
        self.blocks = tnn.ModuleList(
            [TDNNBlock(hidden, hidden, k, dilation) for _ in range(scale - 1)]
        )
        self.scale = scale

    def forward(self, x):
        y = []
        for i, x_i in enumerate(torch.chunk(x, self.scale, dim=1)):
            if i == 0:
                y_i = x_i
            elif i == 1:
                y_i = self.blocks[i - 1](x_i)
            else:
                y_i = self.blocks[i - 1](x_i + y_i)
            y.append(y_i)
        return torch.cat(y, dim=1)


class SEBlock(tnn.Module):
    def __init__(self, in_ch, se_ch, out_ch):
        super().__init__()
        self.conv1 = SBConv(in_ch, se_ch, 1)
        self.conv2 = SBConv(se_ch, out_ch, 1)

    def forward(self, x):
        s = x.mean(dim=2, keepdim=True)
        s = torch.sigmoid(self.conv2(torch.relu(self.conv1(s))))
        return s * x


class SERes2NetBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, scale, se_ch, k, dilation):
        super().__init__()
        self.tdnn1 = TDNNBlock(in_ch, out_ch, 1)
        self.res2net_block = Res2NetBlock(out_ch, out_ch, scale, k, dilation)
        self.tdnn2 = TDNNBlock(out_ch, out_ch, 1)
        self.se_block = SEBlock(out_ch, se_ch, out_ch)

    def forward(self, x):
        residual = x
        x = self.tdnn1(x)
        x = self.res2net_block(x)
        x = self.tdnn2(x)
        x = self.se_block(x)
        return x + residual


class ASP(tnn.Module):
    def __init__(self, channels, attention_channels):
        super().__init__()
        self.eps = 1e-12
        self.tdnn = TDNNBlock(channels * 3, attention_channels, 1)
        self.conv = SBConv(attention_channels, channels, 1)

    def forward(self, x):  # [B, C, T]
        T = x.shape[-1]

        def stats(x, m):
            mean = (m * x).sum(dim=2)
            std = torch.sqrt(
                ((m * (x - mean.unsqueeze(2)) ** 2).sum(dim=2)).clamp(self.eps)
            )
            return mean, std

        uniform = torch.full((1, 1, T), 1.0 / T)
        mean, std = stats(x, uniform)
        attn = torch.cat(
            [x, mean.unsqueeze(2).expand(-1, -1, T), std.unsqueeze(2).expand(-1, -1, T)],
            dim=1,
        )
        attn = self.conv(torch.tanh(self.tdnn(attn)))
        attn = torch.softmax(attn, dim=2)
        mean, std = stats(x, attn)
        return torch.cat([mean, std], dim=1).unsqueeze(2)  # [B, 2C, 1]


class TorchSBECAPA(tnn.Module):
    def __init__(
        self,
        input_size=80,
        channels=(64, 64, 64, 64, 192),
        kernel_sizes=(5, 3, 3, 3, 1),
        dilations=(1, 2, 3, 4, 1),
        attention_channels=16,
        res2net_scale=8,
        se_channels=16,
        lin_neurons=24,
    ):
        super().__init__()
        self.blocks = tnn.ModuleList(
            [TDNNBlock(input_size, channels[0], kernel_sizes[0], dilations[0])]
        )
        for i in range(1, len(channels) - 1):
            self.blocks.append(
                SERes2NetBlock(
                    channels[i - 1], channels[i], res2net_scale, se_channels,
                    kernel_sizes[i], dilations[i],
                )
            )
        self.mfa = TDNNBlock(channels[-1], channels[-1], kernel_sizes[-1], dilations[-1])
        self.asp = ASP(channels[-1], attention_channels)
        self.asp_bn = SBBN(channels[-1] * 2)
        self.fc = SBConv(channels[-1] * 2, lin_neurons, 1)

    def forward(self, x):  # [B, T, F]
        x = x.transpose(1, 2)
        xl = []
        for layer in self.blocks:
            x = layer(x)
            xl.append(x)
        x = torch.cat(xl[1:], dim=1)
        x = self.mfa(x)
        x = self.asp(x)
        x = self.asp_bn(x)
        x = self.fc(x)
        return x.transpose(1, 2)  # [B, 1, lin_neurons]


SMALL = dict(
    channels=(64, 64, 64, 64, 192),
    kernel_sizes=(5, 3, 3, 3, 1),
    dilations=(1, 2, 3, 4, 1),
    attention_channels=16,
    res2net_scale=8,
    se_channels=16,
    lin_neurons=24,
)


def _randomize_bn_stats(model, gen):
    """Non-trivial running stats so eval-mode BN parity is meaningful."""
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm1d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=gen) * 0.3)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen) + 0.5)
                m.weight.copy_(torch.randn(m.weight.shape, generator=gen) * 0.1 + 1.0)
                m.bias.copy_(torch.randn(m.bias.shape, generator=gen) * 0.1)


@pytest.mark.slow
def test_sb_ecapa_embedding_parity():
    gen = torch.Generator().manual_seed(0)
    oracle = TorchSBECAPA(input_size=20, **SMALL).eval()
    _randomize_bn_stats(oracle, gen)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    model = ECAPA_TDNN_SB(**SMALL)
    variables = import_speechbrain_ecapa(sd)

    x = np.random.default_rng(1).standard_normal((3, 37, 20)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()[:, 0, :]
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    assert_tree_shapes_match(variables, jax.tree.map(np.asarray, init), "sb_ecapa")
    out = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_sb_fbank_parity():
    """Fbank frontend vs a torch.stft oracle of the SpeechBrain pipeline
    (constant-pad center STFT, periodic hamming, power spectrum, triangular
    mel filters, 10·log10 with amin=1e-10 / top_db=80)."""
    rng = np.random.default_rng(2)
    wav = (rng.standard_normal((2, 7200)) * 0.1).astype(np.float32)

    n_fft, hop = 400, 160
    t_wav = torch.from_numpy(wav)
    window = torch.hamming_window(n_fft, periodic=True)
    spec = torch.stft(
        t_wav, n_fft, hop_length=hop, win_length=n_fft, window=window,
        center=True, pad_mode="constant", normalized=False, onesided=True,
        return_complex=True,
    )
    power = spec.real**2 + spec.imag**2  # [B, F, T]

    from wavthruvec_pytorch_tpu.models.ecapa_speechbrain import _sb_mel_filterbank

    fb = torch.from_numpy(_sb_mel_filterbank(16000, n_fft, 80))
    mel = torch.einsum("fm,bft->btm", fb, power)
    x_db = 10.0 * torch.log10(torch.clamp(mel, min=1e-10))
    ref = torch.maximum(x_db, x_db.max() - 80.0).numpy()

    out = np.asarray(sb_fbank(jnp.asarray(wav)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-4)


@pytest.mark.slow
def test_sb_encode_end_to_end():
    """Full encode_batch pipeline: wav -> fbank -> sentence norm -> embed,
    Flax vs the torch oracle chain."""
    gen = torch.Generator().manual_seed(3)
    oracle = TorchSBECAPA(input_size=80, **SMALL).eval()
    _randomize_bn_stats(oracle, gen)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    model = ECAPA_TDNN_SB(**SMALL)
    variables = import_speechbrain_ecapa(sd)

    rng = np.random.default_rng(4)
    wav = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)

    feats = sb_fbank(jnp.asarray(wav))
    feats_t = torch.from_numpy(np.asarray(feats))
    feats_t = feats_t - feats_t.mean(dim=1, keepdim=True)
    with torch.no_grad():
        ref = oracle(feats_t).numpy()[:, 0, :]

    out = np.asarray(sb_encode(variables, model, jnp.asarray(wav)))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


def test_import_prefix_stripping():
    oracle = TorchSBECAPA(input_size=20, **SMALL)
    sd = {
        "embedding_model." + k: v.detach().numpy()
        for k, v in oracle.state_dict().items()
    }
    variables = import_speechbrain_ecapa(sd)
    assert "blocks_0" in variables["params"]
