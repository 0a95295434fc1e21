"""Torch-checkpoint importer coverage.

The vec2wav importers are validated end-to-end against the actual reference
modules in test_reference_parity.py.  The Text2Vec model cannot be
constructed from the reference here (its module graph imports numba /
torchaudio, absent in this image), so this test builds a synthetic state
dict with the reference's exact key naming (text2vec/model.py structure) and
checks the importer maps it 1:1 onto our init tree — catching any missing /
extra / mis-shaped entries in the mapping.
"""

import dataclasses

import jax
import numpy as np
import pytest

from tests.test_models import T2V_SMALL, _t2v_batch
from wavthruvec_pytorch_tpu import checkpoint as ckpt
from wavthruvec_pytorch_tpu.models import Text2Vec


def _synthetic_reference_state_dict(cfg):
    """Reference-named random state dict for Text2Vec (model.py:194-356)."""
    rng = np.random.default_rng(0)
    sd = {}

    def add(name, *shape):
        sd[name] = rng.standard_normal(shape).astype(np.float32)

    def add_bn(prefix, c):
        add(f"{prefix}.weight", c)
        add(f"{prefix}.bias", c)
        add(f"{prefix}.running_mean", c)
        sd[f"{prefix}.running_var"] = np.abs(
            rng.standard_normal(c)
        ).astype(np.float32) + 0.5

    d_model = cfg.encoder_output_dim
    add("encoder.src_word_emb.weight", cfg.vocab_size, cfg.encoder_dim)

    # ECAPA (ecapa_tdnn_TaoRuijie.py:132-167)
    C = cfg.spk_channel
    width = C // 8
    e = "encoder.speaker_encoder"
    add(f"{e}.conv1.weight", C, cfg.n_feat_dim, 5)
    add(f"{e}.conv1.bias", C)
    add_bn(f"{e}.bn1", C)
    for li in (1, 2, 3):
        b = f"{e}.layer{li}"
        add(f"{b}.conv1.weight", width * 8, C, 1)
        add(f"{b}.conv1.bias", width * 8)
        add_bn(f"{b}.bn1", width * 8)
        for ci in range(7):
            add(f"{b}.convs.{ci}.weight", width, width, 3)
            add(f"{b}.convs.{ci}.bias", width)
            add_bn(f"{b}.bns.{ci}", width)
        add(f"{b}.conv3.weight", C, width * 8, 1)
        add(f"{b}.conv3.bias", C)
        add_bn(f"{b}.bn3", C)
        add(f"{b}.se.se.1.weight", 128, C, 1)
        add(f"{b}.se.se.1.bias", 128)
        add(f"{b}.se.se.3.weight", C, 128, 1)
        add(f"{b}.se.se.3.bias", C)
    add(f"{e}.layer4.weight", 1536, 3 * C, 1)
    add(f"{e}.layer4.bias", 1536)
    add(f"{e}.attention.0.weight", 256, 4608, 1)
    add(f"{e}.attention.0.bias", 256)
    add_bn(f"{e}.attention.2", 256)
    add(f"{e}.attention.4.weight", 1536, 256, 1)
    add(f"{e}.attention.4.bias", 1536)
    add_bn(f"{e}.bn5", 3072)
    add(f"{e}.fc6.weight", cfg.n_speaker_dim, 3072)
    add(f"{e}.fc6.bias", cfg.n_speaker_dim)
    add_bn(f"{e}.bn6", cfg.n_speaker_dim)

    # FFT stacks (subLayer.py:57-146)
    def add_fft(prefix, n_layers, d_inner):
        d_k = d_model // cfg.encoder_head
        for i in range(n_layers):
            b = f"{prefix}.layer_stack.{i}"
            for name in ("w_qs", "w_ks", "w_vs"):
                add(f"{b}.slf_attn.{name}.weight", cfg.encoder_head * d_k, d_model)
                add(f"{b}.slf_attn.{name}.bias", cfg.encoder_head * d_k)
            add(f"{b}.slf_attn.fc.weight", d_model, cfg.encoder_head * d_k)
            add(f"{b}.slf_attn.fc.bias", d_model)
            add(f"{b}.slf_attn.layer_norm.weight", d_model)
            add(f"{b}.slf_attn.layer_norm.bias", d_model)
            add(f"{b}.pos_ffn.w_1.weight", d_inner, d_model, 9)
            add(f"{b}.pos_ffn.w_1.bias", d_inner)
            add(f"{b}.pos_ffn.w_2.weight", d_model, d_inner, 1)
            add(f"{b}.pos_ffn.w_2.bias", d_model)
            add(f"{b}.pos_ffn.layer_norm.weight", d_model)
            add(f"{b}.pos_ffn.layer_norm.bias", d_model)

    add_fft("encoder", cfg.encoder_n_layer, cfg.encoder_conv1d_filter_size)
    add_fft("decoder", cfg.decoder_n_layer, cfg.decoder_conv1d_filter_size)

    # duration predictor (module.py:110-156)
    dp = "length_regulator.duration_predictor"
    f = cfg.duration_predictor_filter_size
    add(f"{dp}.conv_layer.conv1d_1.conv.weight", f, d_model, 3)
    add(f"{dp}.conv_layer.conv1d_1.conv.bias", f)
    add(f"{dp}.conv_layer.layer_norm_1.weight", f)
    add(f"{dp}.conv_layer.layer_norm_1.bias", f)
    add(f"{dp}.conv_layer.conv1d_2.conv.weight", f, f, 3)
    add(f"{dp}.conv_layer.conv1d_2.conv.bias", f)
    add(f"{dp}.conv_layer.layer_norm_2.weight", f)
    add(f"{dp}.conv_layer.layer_norm_2.bias", f)
    add(f"{dp}.linear_layer.linear_layer.weight", 1, f)
    add(f"{dp}.linear_layer.linear_layer.bias", 1)

    add("WVF_linear.linear_layer.weight", cfg.n_feat_dim, d_model)
    add("WVF_linear.linear_layer.bias", cfg.n_feat_dim)
    add("last_linear.linear_layer.weight", cfg.n_feat_dim, cfg.n_feat_dim * 2)
    add("last_linear.linear_layer.bias", cfg.n_feat_dim)

    # CBHG postnet (module.py:287-364)
    in_dim = cfg.n_feat_dim
    for k in range(8):
        add(f"postnet.conv1d_banks.{k}.conv1d.weight", in_dim, in_dim, k + 1)
        add_bn(f"postnet.conv1d_banks.{k}.bn", in_dim)
    add("postnet.conv1d_projections.0.conv1d.weight", 256, 8 * in_dim, 3)
    add_bn("postnet.conv1d_projections.0.bn", 256)
    add("postnet.conv1d_projections.1.conv1d.weight", in_dim, 256, 3)
    add_bn("postnet.conv1d_projections.1.bn", in_dim)
    for i in range(4):
        add(f"postnet.highways.{i}.H.weight", in_dim, in_dim)
        add(f"postnet.highways.{i}.H.bias", in_dim)
        add(f"postnet.highways.{i}.T.weight", in_dim, in_dim)
        add(f"postnet.highways.{i}.T.bias", in_dim)
    for t in ("", "_reverse"):
        add(f"postnet.gru.weight_ih_l0{t}", 3 * in_dim, in_dim)
        add(f"postnet.gru.weight_hh_l0{t}", 3 * in_dim, in_dim)
        add(f"postnet.gru.bias_ih_l0{t}", 3 * in_dim)
        add(f"postnet.gru.bias_hh_l0{t}", 3 * in_dim)

    # ConvAttention (module.py:455-478)
    n_text = cfg.encoder_dim + cfg.n_speaker_dim
    add("attention.key_proj.0.conv.weight", n_text * 2, n_text, 3)
    add("attention.key_proj.0.conv.bias", n_text * 2)
    add("attention.key_proj.2.conv.weight", 80, n_text * 2, 1)
    add("attention.key_proj.2.conv.bias", 80)
    add("attention.query_proj.0.conv.weight", cfg.n_feat_dim * 2, cfg.n_feat_dim, 3)
    add("attention.query_proj.0.conv.bias", cfg.n_feat_dim * 2)
    add("attention.query_proj.2.conv.weight", cfg.n_feat_dim, cfg.n_feat_dim * 2, 1)
    add("attention.query_proj.2.conv.bias", cfg.n_feat_dim)
    add("attention.query_proj.4.conv.weight", 80, cfg.n_feat_dim, 1)
    add("attention.query_proj.4.conv.bias", 80)
    return sd


@pytest.mark.slow
def test_import_text2vec_covers_full_tree():
    cfg = T2V_SMALL
    sd = _synthetic_reference_state_dict(cfg)
    imported = ckpt.import_text2vec(sd, cfg)

    model = Text2Vec(cfg)
    batch = _t2v_batch(cfg)
    init_vars = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *batch[:6], attn_prior=batch[6], deterministic=True, train_bn=False,
    )
    ckpt.assert_tree_shapes_match(
        imported["params"], init_vars["params"], "text2vec params"
    )
    ckpt.assert_tree_shapes_match(
        imported["batch_stats"], init_vars["batch_stats"], "text2vec batch_stats"
    )
    # imported params run
    out = model.apply(
        {"params": imported["params"], "batch_stats": imported["batch_stats"]},
        *batch[:6], attn_prior=batch[6], deterministic=True, train_bn=False,
    )
    assert np.isfinite(np.asarray(out["feat_postnet_output"])).all()


def test_scan_checkpoint_numeric_order(tmp_path):
    """scan must sort by step number — the reference zero-pads (lexical ==
    numeric there) but t2v checkpoints ('checkpoint_1200') do not."""
    import os

    from wavthruvec_pytorch_tpu.checkpoint import scan_checkpoint

    for n in ("checkpoint_600", "checkpoint_1200", "checkpoint_80"):
        os.makedirs(tmp_path / n)
    assert scan_checkpoint(str(tmp_path), "checkpoint_").endswith("checkpoint_1200")
    assert scan_checkpoint(str(tmp_path), "nope_") is None

    # an interrupted orbax save leaves *.orbax-checkpoint-tmp — auto-resume
    # must never pick it up (restore on it raises), even when newest/only
    os.makedirs(tmp_path / "checkpoint_9999.orbax-checkpoint-tmp")
    assert scan_checkpoint(str(tmp_path), "checkpoint_").endswith("checkpoint_1200")
    os.makedirs(tmp_path / "state_00000300.orbax-checkpoint-tmp")
    assert scan_checkpoint(str(tmp_path), "state_") is None
