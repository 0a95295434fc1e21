"""Unit tests for the core ops: MAS, length regulator, masks, positional
encodings, mel/STFT (vs torch), beta-binomial prior (vs scipy)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from wavthruvec_pytorch_tpu.ops import (
    durations_to_alignment,
    expand_by_durations,
    get_attn_key_pad_mask,
    get_mask_from_lengths,
    get_non_pad_mask,
    mas_width1,
    mas_width1_batched,
    mas_width1_numpy,
    positions_from_lengths,
    sinusoid_encoding_table,
)
from wavthruvec_pytorch_tpu.ops.stft import (
    hann_window,
    mel_filterbank,
    mel_spectrogram,
    stft_magnitude,
)

# sub-minute smoke tier for inner-loop development (README Usage)
pytestmark = pytest.mark.smoke


# ---------------------------------------------------------------------------
# MAS
# ---------------------------------------------------------------------------

def _random_attn(T, N, seed):
    rng = np.random.default_rng(seed)
    a = rng.random((T, N)) + 1e-3
    a = a / a.sum(axis=1, keepdims=True)
    return a.astype(np.float32)


@pytest.mark.parametrize("T,N,seed", [(20, 5, 0), (50, 13, 1), (7, 7, 2), (300, 40, 3)])
def test_mas_matches_reference_oracle(T, N, seed):
    attn = _random_attn(T, N, seed)
    expected = mas_width1_numpy(attn)
    got = np.asarray(mas_width1(jnp.asarray(attn)))
    np.testing.assert_array_equal(got, expected)


def test_mas_batched_variable_lengths():
    B, T, N = 4, 60, 16
    rng = np.random.default_rng(42)
    out_lens = np.array([60, 37, 55, 12])
    in_lens = np.array([16, 9, 3, 5])
    attn = np.zeros((B, T, N), dtype=np.float32)
    expected = np.zeros_like(attn)
    for b in range(B):
        sub = _random_attn(out_lens[b], in_lens[b], seed=b)
        attn[b, : out_lens[b], : in_lens[b]] = sub
        expected[b, : out_lens[b], : in_lens[b]] = mas_width1_numpy(sub)
    got = np.asarray(
        mas_width1_batched(jnp.asarray(attn), jnp.asarray(in_lens), jnp.asarray(out_lens))
    )
    np.testing.assert_array_equal(got, expected)
    del rng


def test_mas_each_frame_one_token():
    attn = _random_attn(100, 24, 7)
    opt = np.asarray(mas_width1(jnp.asarray(attn)))
    # every frame maps to exactly one token; path is monotonic
    assert (opt.sum(axis=1) == 1).all()
    path = opt.argmax(axis=1)
    assert path[0] == 0 and path[-1] == 23
    assert ((np.diff(path) == 0) | (np.diff(path) == 1)).all()


# ---------------------------------------------------------------------------
# Length regulator
# ---------------------------------------------------------------------------

def _create_alignment_reference(durations, max_frames):
    """Host oracle replicating text2vec/module.py:45-53 semantics."""
    N, L = durations.shape
    base = np.zeros((N, max_frames, L), dtype=np.float32)
    for i in range(N):
        count = 0
        for j in range(L):
            for k in range(durations[i][j]):
                base[i][count + k][j] = 1
            count = count + durations[i][j]
    return base


def test_durations_to_alignment_matches_reference():
    durations = np.array([[1, 4, 0, 2], [6, 3, 1, 0]], dtype=np.int32)
    max_frames = 12
    expected = _create_alignment_reference(durations, max_frames)
    got, total = durations_to_alignment(jnp.asarray(durations), max_frames)
    np.testing.assert_array_equal(np.asarray(got), expected)
    np.testing.assert_array_equal(np.asarray(total), durations.sum(axis=1))


def test_expand_by_durations_equals_alignment_matmul():
    rng = np.random.default_rng(0)
    B, N, C = 3, 7, 5
    durations = rng.integers(0, 5, size=(B, N)).astype(np.int32)
    x = rng.standard_normal((B, N, C)).astype(np.float32)
    max_frames = int(durations.sum(axis=1).max()) + 3
    align, _ = durations_to_alignment(jnp.asarray(durations), max_frames)
    expected = np.einsum("btn,bnc->btc", np.asarray(align), x)
    got, total = expand_by_durations(jnp.asarray(x), jnp.asarray(durations), max_frames)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(total), durations.sum(axis=1))


# ---------------------------------------------------------------------------
# Masks & positions
# ---------------------------------------------------------------------------

def test_masks():
    lengths = jnp.array([3, 5, 1])
    m = get_mask_from_lengths(lengths, 5)
    assert m.shape == (3, 5)
    np.testing.assert_array_equal(
        np.asarray(m),
        [[1, 1, 1, 0, 0], [1, 1, 1, 1, 1], [1, 0, 0, 0, 0]],
    )
    seq = jnp.array([[4, 7, 0], [2, 0, 0]])
    np.testing.assert_array_equal(
        np.asarray(get_non_pad_mask(seq))[..., 0], [[1, 1, 0], [1, 0, 0]]
    )
    km = get_attn_key_pad_mask(seq, seq)
    assert km.shape == (2, 3, 3)
    assert bool(km[0, 0, 2]) and not bool(km[0, 0, 0])
    pos = positions_from_lengths(jnp.array([2, 3]), 4)
    np.testing.assert_array_equal(np.asarray(pos), [[1, 2, 0, 0], [1, 2, 3, 0]])


def test_sinusoid_table_matches_reference_formula():
    n_position, d_hid = 10, 8
    table = sinusoid_encoding_table(n_position, d_hid, padding_idx=0)
    # reference formula (text2vec/model.py:37-56)
    expected = np.array(
        [
            [pos / np.power(10000, 2 * (j // 2) / d_hid) for j in range(d_hid)]
            for pos in range(n_position)
        ]
    )
    expected[:, 0::2] = np.sin(expected[:, 0::2])
    expected[:, 1::2] = np.cos(expected[:, 1::2])
    expected[0] = 0.0
    np.testing.assert_allclose(table, expected.astype(np.float32), atol=1e-6)


# ---------------------------------------------------------------------------
# STFT / mel vs torch
# ---------------------------------------------------------------------------

def test_hann_window_matches_torch():
    np.testing.assert_allclose(
        hann_window(1024), torch.hann_window(1024).numpy(), atol=1e-6
    )


def test_stft_magnitude_matches_torch():
    rng = np.random.default_rng(0)
    y = rng.standard_normal((2, 4096)).astype(np.float32) * 0.3
    n_fft, hop, win = 1024, 256, 1024
    got = np.asarray(stft_magnitude(jnp.asarray(y), n_fft, hop, win, center=False))
    spec_t = torch.stft(
        torch.from_numpy(y),
        n_fft,
        hop_length=hop,
        win_length=win,
        window=torch.hann_window(win),
        center=False,
        onesided=True,
        return_complex=True,
    )
    expected = torch.sqrt(spec_t.real**2 + spec_t.imag**2 + 1e-9).numpy()
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=2e-3)


def test_mel_spectrogram_matches_torch_reference_pipeline():
    """End-to-end vs the reference mel op (vec2wav/dataset.py:53-77) built
    from torch.stft + our filterbank (librosa absent; filterbank itself is
    checked for slaney-property invariants below)."""
    rng = np.random.default_rng(1)
    y = (rng.standard_normal((1, 8192)).astype(np.float32) * 0.2).clip(-1, 1)
    n_fft, hop, win, sr, n_mels = 1024, 256, 1024, 16000, 80

    got = np.asarray(
        mel_spectrogram(jnp.asarray(y), n_fft, n_mels, sr, hop, win, 0.0, 8000.0)
    )

    yt = torch.from_numpy(y)
    pad = int((n_fft - hop) / 2)
    yt = torch.nn.functional.pad(yt.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        yt, n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=False, onesided=True,
        return_complex=True,
    )
    mag = torch.sqrt(spec.real**2 + spec.imag**2 + 1e-9)
    basis = torch.from_numpy(mel_filterbank(sr, n_fft, n_mels, 0.0, 8000.0))
    mel = torch.matmul(basis, mag)
    expected = torch.log(torch.clamp(mel, min=1e-5)).numpy()
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=5e-3)


def test_mel_filterbank_slaney_properties():
    fb = mel_filterbank(16000, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # each filter is a normalized triangle: nonzero support, unimodal
    assert (fb.sum(axis=1) > 0).all()
    # slaney norm: 2/(f_hi-f_lo) peak scaling means low filters have larger
    # peaks than high filters
    assert fb.max(axis=1)[0] > fb.max(axis=1)[-1]


def test_mel_filterbank_matches_analytic_slaney():
    """Check the first filter against a hand-derived slaney computation at
    sr=16000, n_fft=1024, n_mels=80, fmax=8000: mel(8000) = 15 +
    27*ln(8)/ln(6.4) ≈ 45.2454 mel; 82 points → step ≈ 0.5518 mel; first
    center f1 = 0.5518*200/3 ≈ 36.79 Hz (linear region); peak value at bin 2
    (31.25 Hz) = enorm * up-slope = (2/(2*36.79)) * (31.25/36.79)."""
    fb = mel_filterbank(16000, 1024, 80, 0.0, 8000.0)
    mel_max = 15.0 + 27.0 * np.log(8.0) / np.log(6.4)
    f1 = (mel_max / 81.0) * 200.0 / 3.0
    expected_peak = (2.0 / (2.0 * f1)) * (31.25 / f1)
    assert fb[0].argmax() == 2
    np.testing.assert_allclose(fb[0].max(), expected_peak, rtol=1e-5)


# ---------------------------------------------------------------------------
# beta-binomial prior vs scipy oracle
# ---------------------------------------------------------------------------

def test_beta_binomial_prior_matches_scipy():
    from scipy.stats import betabinom

    from wavthruvec_pytorch_tpu.data.prior import beta_binomial_prior_distribution

    P, M, s = 24, 296, 1.0
    got = beta_binomial_prior_distribution(P, M, s)
    assert got.shape == (M, P)
    x = np.arange(P)
    for i in (1, 100, 296):
        expected = betabinom(P - 1, s * i, s * (M + 1 - i)).pmf(x)
        np.testing.assert_allclose(got[i - 1], expected, atol=1e-12)
    # rows are distributions
    np.testing.assert_allclose(got.sum(axis=1), 1.0, atol=1e-9)


# ---------------------------------------------------------------------------
# Pallas MAS kernel (interpret mode on CPU; compiled path covered on TPU)
# ---------------------------------------------------------------------------

def test_mas_pallas_matches_oracle_interpret():
    from wavthruvec_pytorch_tpu.ops.mas_pallas import mas_width1_pallas

    B, T, N = 3, 40, 8
    out_lens = np.array([40, 23, 9])
    in_lens = np.array([8, 5, 3])
    attn = np.zeros((B, T, N), np.float32)
    expected = np.zeros_like(attn)
    for b in range(B):
        sub = _random_attn(out_lens[b], in_lens[b], seed=10 + b)
        attn[b, : out_lens[b], : in_lens[b]] = sub
        expected[b, : out_lens[b], : in_lens[b]] = mas_width1_numpy(sub)
    got = np.asarray(
        mas_width1_pallas(
            jnp.asarray(attn), jnp.asarray(in_lens), jnp.asarray(out_lens),
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got, expected)


# ---------------------------------------------------------------------------
# fused ResBlock unit kernel (interpret mode on CPU)
# ---------------------------------------------------------------------------

def test_fused_conv_residual_gate_and_reference():
    """The fused kernel's compiled path is verified element-wise on TPU (see
    BENCH_NOTES.md; Pallas interpret mode cannot discharge its dynamic-size
    halo DMA on CPU).  Here: the support gate and the XLA reference op the
    kernel must match."""
    import jax

    from wavthruvec_pytorch_tpu.ops.fused_resblock import (
        conv_residual_reference,
        fused_supported,
    )

    rng = np.random.default_rng(0)
    B, T, C, k, d = 2, 1024, 128, 7, 3
    x = jnp.asarray(rng.standard_normal((T, C)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, C, C)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(C) * 0.01, jnp.float32)
    y = np.asarray(conv_residual_reference(x, w, b, dilation=d))
    # reference op == lrelu -> torch-padded dilated conv + bias + residual
    import torch

    tconv = torch.nn.Conv1d(C, C, k, dilation=d, padding=(k * d - d) // 2)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(np.asarray(w).transpose(2, 1, 0)))
        tconv.bias.copy_(torch.from_numpy(np.asarray(b)))
        xt = torch.nn.functional.leaky_relu(torch.from_numpy(np.asarray(x)).T[None], 0.1)
        expected = (tconv(xt)[0].T + torch.from_numpy(np.asarray(x))).numpy()
    np.testing.assert_allclose(y, expected, atol=2e-5)

    # gate logic
    pad = (k * d - d) // 2
    assert fused_supported((B, T, C), C, k, 1, 1, pad, d, jnp.float32)
    assert not fused_supported((B, T, 64), 64, k, 1, 1, pad, d, jnp.float32)  # C%128
    assert not fused_supported((B, T + 4, C), C, k, 1, 1, pad, d, jnp.float32)  # T%8
    assert not fused_supported((B, T, C), C, k, 2, 1, pad, d, jnp.float32)  # stride


def test_mxu_tiled_grouped_conv_values_and_grads():
    """ops/tiled_conv.mxu_grouped_conv1d == lax grouped conv (the MSD repack,
    reference shapes vec2wav/models.py:218-243) for values AND both grads,
    across strides/groups incl. non-dividing tile edges."""
    import jax

    from wavthruvec_pytorch_tpu.ops.tiled_conv import (
        mxu_grouped_conv1d,
        reference_grouped_conv1d,
        tiled_conv_supported,
    )

    rng = np.random.default_rng(7)
    for (B, T, G, ci, co, k, s, p) in [
        (2, 203, 4, 32, 32, 41, 2, 20),   # MSD layer-1 shape family
        (2, 101, 16, 8, 16, 41, 2, 20),   # MSD layer-2 (the hot one)
        (1, 57, 16, 16, 32, 41, 4, 20),
        (1, 40, 16, 64, 64, 41, 1, 20),
        (2, 64, 2, 4, 8, 5, 1, 2),
    ]:
        x = jnp.asarray(rng.standard_normal((B, T, G * ci)), jnp.float32)
        w = jnp.asarray(
            rng.standard_normal((k, ci, G * co)) * 0.1, jnp.float32)
        a = mxu_grouped_conv1d(x, w, s, p, G)
        b = reference_grouped_conv1d(x, w, s, p, G)
        assert a.shape == b.shape
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-5)

        def loss_t(x_, w_):
            out = mxu_grouped_conv1d(x_, w_, s, p, G)
            return jnp.sum(out * jnp.cos(out))

        def loss_r(x_, w_):
            out = reference_grouped_conv1d(x_, w_, s, p, G)
            return jnp.sum(out * jnp.cos(out))

        gx_t, gw_t = jax.grad(loss_t, argnums=(0, 1))(x, w)
        gx_r, gw_r = jax.grad(loss_r, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(
            np.asarray(gx_t), np.asarray(gx_r), atol=5e-4, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(gw_t), np.asarray(gw_r), atol=5e-3, rtol=1e-4)

    # gate: dense / dilated / wide-per-group / short-input layers stay on lax
    assert tiled_conv_supported(41, 2, 1, 16, 256)
    assert tiled_conv_supported(41, 2, 1, 16, 256, t_in=80000)
    assert not tiled_conv_supported(41, 2, 1, 16, 256, t_in=8000)  # short T
    assert not tiled_conv_supported(41, 2, 1, 1, 128)     # dense
    assert not tiled_conv_supported(41, 2, 2, 16, 256)    # dilated
    assert not tiled_conv_supported(41, 2, 1, 2, 512)     # co/G = 256
