"""Element-wise parity of the FULL Text2Vec model vs the actual reference
torch implementation (text2vec/model.py:194-356), loaded read-only.

Covers what the round-1 suite only verified structurally:
* train branch: encoder (ECAPA spk concat + 4 FFT blocks), ConvAttention,
  MAS binarization (our batched lax.scan vs the reference numba kernel run
  pure-Python), hard-attn length regulation, duration predictor, decoder,
  WVF linear + CBHG postnet residual — all through ``checkpoint.import_text2vec``;
* eval branch: duration-predictor path with host ``create_alignment``
  (module.py:45-106) vs our cumsum/gather expansion, at exact output length;
* ECAPA-TDNN alone, both the wav2vec-feature path (train-mode BN) and the
  raw-wav fbank path (ecapa_tdnn_TaoRuijie.py:169-206 incl. PreEmphasis +
  MelSpectrogram frontend).

For the full-model train branch, BatchNorm runs on RUNNING stats on both
sides (torch BN modules set to eval inside model.train()): with B=2, torch
train-mode BN normalizes over just two samples, so near-tie dimensions
amplify 1e-6 float drift into O(1) output differences — a conditioning
artifact, not a wiring difference (verified: the dedicated ECAPA batch-stats
test below passes at a tolerance matched to that amplification).  All
dropouts are forced to p=0 so the comparison is deterministic.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ref_loader import (
    cpu_binarize_attention,
    cpu_mask_from_lengths,
    load_ref_module,
)

from wavthruvec_pytorch_tpu import checkpoint as ckpt
from wavthruvec_pytorch_tpu.config import Text2VecConfig
from wavthruvec_pytorch_tpu.data.prior import beta_binomial_prior_distribution
from wavthruvec_pytorch_tpu.models.text2vec import Text2Vec


def _zero_dropout(model: torch.nn.Module) -> None:
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0


def _freeze_bn(model: torch.nn.Module) -> None:
    """Put all BatchNorm modules in eval (running-stats) mode while the rest
    of the model stays in train mode (see module docstring)."""
    for m in model.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.eval()


@pytest.fixture(scope="module")
def ref_t2v():
    """Reference Text2Vec at the real hparams (vocab 4285, 448-d path),
    CPU-patched, dropout zeroed, with a positive duration-predictor bias so
    random-init durations are non-degenerate."""
    mod = load_ref_module("text2vec", "model", "ref_t2v_model")
    # CPU-safe replacements for CUDA-only helpers (see ref_loader docstrings)
    mod.get_mask_from_lengths = cpu_mask_from_lengths
    mod.utils.get_mask_from_lengths = cpu_mask_from_lengths

    torch.manual_seed(1234)
    model = mod.Text2Vec()
    model.binarize_attention = types.MethodType(cpu_binarize_attention(mod), model)
    _zero_dropout(model)
    # random-init duration predictor outputs ~0 after the final ReLU, which
    # would make every predicted duration int(0.5)=0; bias it positive so the
    # eval branch expands to a real number of frames
    model.length_regulator.duration_predictor.linear_layer.linear_layer.bias.data.fill_(
        2.0
    )
    return mod, model


def _batch(rng, cfg, in_lens, out_lens):
    B = len(in_lens)
    N, T = max(in_lens), max(out_lens)
    src_seq = np.zeros((B, N), dtype=np.int64)
    src_pos = np.zeros((B, N), dtype=np.int64)
    wvf_pos = np.zeros((B, T), dtype=np.int64)
    wav_feat = np.zeros((B, T, cfg.n_feat_dim), dtype=np.float32)
    prior = np.zeros((B, T, N), dtype=np.float32)
    for b in range(B):
        n, t = in_lens[b], out_lens[b]
        src_seq[b, :n] = rng.integers(4, cfg.vocab_size - 1, size=n)
        src_pos[b, :n] = np.arange(1, n + 1)
        wvf_pos[b, :t] = np.arange(1, t + 1)
        wav_feat[b, :t] = rng.standard_normal((t, cfg.n_feat_dim)) * 0.5
        prior[b, :t, :n] = beta_binomial_prior_distribution(n, t)
    return src_seq, src_pos, wvf_pos, wav_feat, prior


@pytest.mark.slow
def test_text2vec_full_parity_train_branch(ref_t2v):
    mod, ref_model = ref_t2v
    ref_model.train()
    _freeze_bn(ref_model)

    cfg = Text2VecConfig()
    rng = np.random.default_rng(7)
    in_lens = [11, 8]
    out_lens = [42, 36]
    src_seq, src_pos, wvf_pos, wav_feat, prior = _batch(rng, cfg, in_lens, out_lens)
    T = max(out_lens)

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(src_seq),
            torch.from_numpy(src_pos),
            torch.from_numpy(wav_feat),
            torch.tensor(in_lens),
            torch.tensor(out_lens),
            WVF_pos=torch.from_numpy(wvf_pos),
            WVF_max_length=T,
            binarize_attention=True,
            attn_prior=torch.from_numpy(prior),
        )

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables = ckpt.import_text2vec(sd, cfg)

    model = Text2Vec(cfg)
    out = model.apply(
        variables,
        jnp.asarray(src_seq),
        jnp.asarray(src_pos),
        jnp.asarray(wav_feat),
        jnp.asarray(in_lens),
        jnp.asarray(out_lens),
        jnp.asarray(wvf_pos),
        attn_prior=jnp.asarray(prior),
        binarize_attention=True,
        deterministic=True,
        train_bn=False,  # running-stats BN on both sides (see module docstring)
    )

    # soft alignment (ConvAttention + prior + key mask + softmax)
    ref_soft = ref_out["attn_soft"].numpy()[:, 0]  # [B, T, N]
    np.testing.assert_allclose(np.asarray(out["attn_soft"]), ref_soft, atol=2e-5)

    # MAS binarization: our batched lax.scan vs the reference kernel
    ref_hard = ref_out["attn"].numpy()[:, 0]
    np.testing.assert_array_equal(np.asarray(out["attn"]), ref_hard)

    # durations (sum of hard attention over frames) — integer exact
    np.testing.assert_array_equal(
        np.asarray(out["duration"]), ref_out["duration"].numpy()
    )

    np.testing.assert_allclose(
        np.asarray(out["duration_predictor_output"]),
        ref_out["duration_predictor_output"].numpy(),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["feat_output"]),
        ref_out["feat_output"].numpy(),
        atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["feat_postnet_output"]),
        ref_out["feat_postnet_output"].numpy(),
        atol=1e-3,
    )


@pytest.mark.slow
def test_text2vec_full_parity_eval_branch(ref_t2v):
    """Eval branch, B=1 (the reference's DurationPredictor unsqueeze at
    module.py:155 only supports batch-1 eval).  The reference expands to the
    exact total length via the host create_alignment loop; we run our infer
    twice — once to learn total_frames, once at that exact static length —
    so the bidirectional GRU sees identical sequences."""
    mod, ref_model = ref_t2v
    ref_model.eval()

    cfg = Text2VecConfig()
    rng = np.random.default_rng(11)
    n, t_ref = 9, 40
    src_seq, src_pos, _, wav_feat, _ = _batch(rng, cfg, [n], [t_ref])

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(src_seq),
            torch.from_numpy(src_pos),
            torch.from_numpy(wav_feat),
            torch.tensor([n]),
            torch.tensor([t_ref]),
        )
    ref_feat = ref_out["feat_output"].numpy()
    ref_post = ref_out["feat_postnet_output"].numpy()
    total_ref = ref_feat.shape[1]

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables = ckpt.import_text2vec(sd, cfg)
    model = Text2Vec(cfg)

    def infer(max_frames):
        return model.apply(
            variables,
            jnp.asarray(src_seq),
            jnp.asarray(src_pos),
            jnp.asarray(wav_feat),
            max_frames,
            method=Text2Vec.infer,
        )

    probe = infer(max(4 * n * 4, 64))
    total = int(np.asarray(probe["total_frames"])[0])
    assert total == total_ref, (total, total_ref)

    out = infer(total)
    np.testing.assert_allclose(
        np.asarray(out["feat_output"]), ref_feat, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["feat_postnet_output"]), ref_post, atol=1e-3
    )


# ---------------------------------------------------------------------------
# ECAPA-TDNN alone (both input paths)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_ecapa_mod():
    return load_ref_module("text2vec", "ecapa_tdnn_TaoRuijie", "ref_ecapa")


def _import_ecapa_variables(ref_ecapa, cfg_kwargs):
    sd = {f"m.{k}": v.detach().numpy() for k, v in ref_ecapa.state_dict().items()}
    params, stats = {}, {}
    ckpt._import_ecapa(sd, "m", params, stats, "m")
    return {"params": params["m"], "batch_stats": stats["m"]}


@pytest.mark.slow
def test_ecapa_parity_feat_path_train_bn(ref_ecapa_mod):
    """wav2vec-feature input (t2v path, input_wav=False), batch-stats BN.

    The final bn6 normalizes 192 dims over just B samples, so per-dim std is
    tiny where embeddings nearly tie and float drift is amplified ~1/std;
    tolerance is set to that conditioning, with a median check keeping the
    bulk tight."""
    from wavthruvec_pytorch_tpu.models.ecapa import ECAPA_TDNN

    torch.manual_seed(5)
    C, feat = 512, 256
    ref = ref_ecapa_mod.ECAPA_TDNN(C, input_wav=False, n_feat_dim=feat)
    ref.train()

    B, T = 6, 50
    rng = np.random.default_rng(5)
    x = rng.standard_normal((B, T, feat)).astype(np.float32)

    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x).transpose(1, 2)).numpy()

    variables = _import_ecapa_variables(ref, {})
    ours = ECAPA_TDNN(C=C, n_feat_dim=feat, input_wav=False)
    y, _ = ours.apply(
        variables, jnp.asarray(x), train=True, mutable=["batch_stats"]
    )
    y = np.asarray(y)
    np.testing.assert_allclose(y, y_ref, atol=2e-2)
    assert np.median(np.abs(y - y_ref)) < 1e-3


@pytest.mark.slow
def test_ecapa_parity_feat_path_eval_bn(ref_ecapa_mod):
    """Same path with running-stats BN — tight tolerance."""
    from wavthruvec_pytorch_tpu.models.ecapa import ECAPA_TDNN

    torch.manual_seed(9)
    C, feat = 512, 256
    ref = ref_ecapa_mod.ECAPA_TDNN(C, input_wav=False, n_feat_dim=feat)
    ref.eval()

    B, T = 3, 50
    rng = np.random.default_rng(9)
    x = rng.standard_normal((B, T, feat)).astype(np.float32)

    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x).transpose(1, 2)).numpy()

    variables = _import_ecapa_variables(ref, {})
    ours = ECAPA_TDNN(C=C, n_feat_dim=feat, input_wav=False)
    y = ours.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-4)


@pytest.mark.slow
def test_ecapa_parity_wav_fbank_path(ref_ecapa_mod):
    """Raw-wav input (vec2wav path, input_wav=True): PreEmphasis + hamming
    MelSpectrogram (512/400/160, htk mel 20-7600) + log + mean-norm frontend
    (ecapa_tdnn_TaoRuijie.py:169-176) vs our conv-DFT fbank."""
    from wavthruvec_pytorch_tpu.models.ecapa import ECAPA_TDNN

    torch.manual_seed(6)
    C = 512
    ref = ref_ecapa_mod.ECAPA_TDNN(C, input_wav=True, n_feat_dim=80)
    ref.eval()

    B, L = 2, 16000
    rng = np.random.default_rng(6)
    wav = (rng.standard_normal((B, L)) * 0.1).astype(np.float32)

    with torch.no_grad():
        y_ref = ref(torch.from_numpy(wav), aug=False).numpy()

    variables = _import_ecapa_variables(ref, {})
    ours = ECAPA_TDNN(C=C, n_feat_dim=80, input_wav=True)
    y = ours.apply(variables, jnp.asarray(wav), train=False)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-3)


def test_fbank_frontend_matches_torch_pipeline(ref_ecapa_mod):
    """The fbank frontend alone at tighter tolerance (frames x mels)."""
    from wavthruvec_pytorch_tpu.models.ecapa import wav_to_fbank

    torch.manual_seed(8)
    ref = ref_ecapa_mod.ECAPA_TDNN(64, input_wav=True, n_feat_dim=80)
    ref.eval()

    B, L = 2, 8000
    rng = np.random.default_rng(8)
    wav = (rng.standard_normal((B, L)) * 0.1).astype(np.float32)

    with torch.no_grad():
        mel_ref = ref.torchfbank(torch.from_numpy(wav)) + 1e-6
        mel_ref = mel_ref.log()
        mel_ref = (mel_ref - mel_ref.mean(dim=-1, keepdim=True)).numpy()

    mel = np.asarray(wav_to_fbank(jnp.asarray(wav)))  # [B, T, n_mels]
    np.testing.assert_allclose(
        mel.transpose(0, 2, 1), mel_ref, atol=2e-4
    )
