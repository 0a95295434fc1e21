"""PartialConv1d parity vs the reference (text2vec/module.py:366-418) and
FbankAug/SpecAugment semantics (ecapa_tdnn_TaoRuijie.py:95-129)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ref_loader import load_ref_module

from wavthruvec_pytorch_tpu.models.layers import PartialConv1d


@pytest.fixture(scope="module")
def ref_module():
    return load_ref_module("text2vec", "module", "ref_t2v_module")


def _make_pair(ref_module, k, dilation, bias, seed):
    torch.manual_seed(seed)
    pad = dilation * (k - 1) // 2
    ref = ref_module.PartialConv1d(
        6, 10, kernel_size=k, padding=pad, dilation=dilation, bias=bias
    )
    ours = PartialConv1d(
        10, kernel_size=k, padding=pad, dilation=dilation, use_bias=bias
    )
    params = {
        "Conv_0": {
            "kernel": ref.weight.detach().numpy().transpose(2, 1, 0),
        }
    }
    if bias:
        params["Conv_0"]["bias"] = ref.bias.detach().numpy()
    return ref, ours, {"params": params}


@pytest.mark.parametrize("k,dilation,bias", [(3, 1, True), (5, 2, True), (3, 1, False)])
def test_partial_conv1d_parity_no_mask(ref_module, k, dilation, bias):
    """mask_in=None: the border-reweighting partial-PADDING mode the
    reference ConvAttention would use."""
    ref, ours, variables = _make_pair(ref_module, k, dilation, bias, seed=k)
    rng = np.random.default_rng(k)
    x = rng.standard_normal((2, 6, 24)).astype(np.float32)  # [B, C, T]

    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()

    y = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 2, 1), y_ref, atol=1e-5
    )


def test_partial_conv1d_parity_with_mask(ref_module):
    """Explicit validity mask: masked samples excluded and renormalized."""
    ref, ours, variables = _make_pair(ref_module, 3, 1, True, seed=11)
    rng = np.random.default_rng(11)
    B, C, T = 2, 6, 20
    x = rng.standard_normal((B, C, T)).astype(np.float32)
    lens = np.array([20, 13])
    mask = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)

    with torch.no_grad():
        # reference mask_in is [B, 1, T] broadcast over channels
        y_ref = ref(torch.from_numpy(x), torch.from_numpy(mask[:, None, :])).numpy()

    y = ours.apply(
        variables,
        jnp.asarray(x.transpose(0, 2, 1)),
        mask_in=jnp.asarray(mask),
    )
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 2, 1), y_ref, atol=1e-5
    )


def test_conv_attention_partial_padding_runs():
    """ConvAttention(use_partial_padding=True) keeps the same param tree and
    changes only border-adjacent attention values."""
    from wavthruvec_pytorch_tpu.models.conv_attention import ConvAttention

    rng = np.random.default_rng(3)
    B, T1, T2 = 2, 12, 7
    q = rng.standard_normal((B, T1, 32)).astype(np.float32)
    kk = rng.standard_normal((B, T2, 16)).astype(np.float32)

    plain = ConvAttention(n_feat_channels=32, n_text_channels=16)
    partial = ConvAttention(
        n_feat_channels=32, n_text_channels=16, use_partial_padding=True
    )
    v = plain.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(kk))
    a0, _ = plain.apply(v, jnp.asarray(q), jnp.asarray(kk))
    a1, _ = partial.apply(v, jnp.asarray(q), jnp.asarray(kk))  # same tree
    assert a0.shape == a1.shape == (B, T1, T2)
    assert not np.allclose(np.asarray(a0), np.asarray(a1))


def test_fbank_aug_semantics():
    from wavthruvec_pytorch_tpu.models.ecapa import fbank_aug

    B, T, M = 4, 50, 80
    x = jnp.ones((B, T, M))
    y = np.asarray(fbank_aug(jax.random.PRNGKey(0), x))
    assert y.shape == (B, T, M)
    for b in range(B):
        # time band: rows that are fully zero across the UNmasked mel columns
        zero_t = np.flatnonzero(np.all(y[b] == 0.0, axis=1))
        zero_m = np.flatnonzero(np.all(y[b] == 0.0, axis=0))
        # widths within the reference's half-open ranges
        assert len(zero_t) < 10
        assert len(zero_m) < 8
        # contiguity
        if len(zero_t) > 1:
            assert np.all(np.diff(zero_t) == 1)
        if len(zero_m) > 1:
            assert np.all(np.diff(zero_m) == 1)
        # everything outside the two bands is untouched
        keep = np.ones((T, M), bool)
        keep[zero_t, :] = False
        keep[:, zero_m] = False
        assert np.all(y[b][keep] == 1.0)
    # deterministic under a fixed key; different under another
    y2 = np.asarray(fbank_aug(jax.random.PRNGKey(0), x))
    np.testing.assert_array_equal(y, y2)
    y3 = np.asarray(fbank_aug(jax.random.PRNGKey(1), x))
    assert not np.array_equal(y, y3)


def test_ecapa_aug_path_runs():
    from wavthruvec_pytorch_tpu.models.ecapa import ECAPA_TDNN

    m = ECAPA_TDNN(C=64, n_feat_dim=80, input_wav=True)
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4000)), jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0), "specaug": jax.random.PRNGKey(1)}, wav, train=False, aug=True)
    y = m.apply(v, wav, train=False, aug=True, rngs={"specaug": jax.random.PRNGKey(2)})
    assert y.shape == (2, 192)
    y_noaug = m.apply(v, wav, train=False, aug=False)
    assert not np.allclose(np.asarray(y), np.asarray(y_noaug))
