"""Torch-format checkpoint EXPORT (the inverse of the importers).

``checkpoint.export_*`` / ``save_reference_*`` write our flax variables back
into the reference's torch checkpoint layouts (text2vec/train.py:426-432
``checkpoint_{step}.pth.tar``; vec2wav/train.py:227-238 ``g_/do_{:08d}``), so
TPU-trained weights can be consumed by reference tooling.  Verified two ways:

* exact roundtrip: export -> import reproduces every leaf bit-for-bit
  (tiny configs, fast);
* strict ``load_state_dict`` into the actual reference torch modules at the
  real model sizes (slow) — proves the emitted key set and tensor shapes are
  exactly what reference code expects.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ref_loader import load_ref_module

from wavthruvec_pytorch_tpu import checkpoint as ckpt
from wavthruvec_pytorch_tpu.config import Text2VecConfig, Vec2WavConfig
from wavthruvec_pytorch_tpu.models import (
    Generator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    Text2Vec,
)


def _tiny_t2v_cfg(**kw):
    return Text2VecConfig(
        n_feat_dim=32, spk_channel=32, n_speaker_dim=16, vocab_size=64,
        max_seq_len=64, encoder_dim=16, encoder_n_layer=2,
        encoder_conv1d_filter_size=32, decoder_dim=16, decoder_n_layer=2,
        decoder_conv1d_filter_size=32, duration_predictor_filter_size=16,
        **kw,
    )


def _tiny_v2w_cfg():
    return Vec2WavConfig(
        n_feat_dim=16, num_wv_feat=16, spk_dim=8, noise_dim=8,
        upsample_initial_channel=32, upsample_rates=(4, 4),
        upsample_kernel_sizes=(8, 8), resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), periods=(2, 3),
        n_fft=64, win_size=64, hop_size=16, num_mels=8,
    )


def _flat(tree):
    return {
        "/".join(str(getattr(k, "key", k)) for k in p): np.asarray(v)
        for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def _assert_trees_equal(a, b, name):
    fa, fb = _flat(a), _flat(b)
    assert set(fa) == set(fb), (
        f"{name}: leaf sets differ: only-left={sorted(set(fa) - set(fb))[:6]} "
        f"only-right={sorted(set(fb) - set(fa))[:6]}"
    )
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=f"{name}:{k}")


def _t2v_tiny_variables(cfg):
    """Train-branch init (the infer branch never builds ConvAttention)."""
    from wavthruvec_pytorch_tpu.train import text2vec_train as t2v_train

    rng = np.random.default_rng(0)
    B, N, T = 2, 6, 12
    items = [
        {
            "text_enc": rng.integers(1, cfg.vocab_size, 2 + i),
            "feat_gt_target": rng.standard_normal((T - i, cfg.n_feat_dim)).astype(np.float32),
            "attn_prior": (rng.random((T - i, 2 + i)) + 0.1).astype(np.float32),
        }
        for i in range(B)
    ]
    batch = t2v_train.make_padded_batch(items, cfg, text_pad=N, frame_pad=T)
    batch.pop("audiopaths")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model, state = t2v_train.init_state(cfg, jax.random.PRNGKey(0), batch)
    return model, {"params": state.params, "batch_stats": state.batch_stats}


def test_t2v_export_import_roundtrip_tiny():
    cfg = _tiny_t2v_cfg()
    _, variables = _t2v_tiny_variables(cfg)
    sd = ckpt.export_text2vec(variables, cfg)
    back = ckpt.import_text2vec(sd, cfg)
    _assert_trees_equal(variables["params"], back["params"], "t2v params")
    _assert_trees_equal(variables["batch_stats"], back["batch_stats"], "t2v stats")


def test_v2w_export_import_roundtrip_tiny():
    cfg = _tiny_v2w_cfg()
    rng = jax.random.PRNGKey(0)
    gen = Generator(cfg)
    gen_vars = gen.init(rng, jnp.zeros((1, 4, cfg.n_feat_dim)),
                        jnp.zeros((1, cfg.spk_dim)), jnp.zeros((1, cfg.noise_dim)),
                        train=False)
    back = ckpt.import_vec2wav_generator(ckpt.export_vec2wav_generator(gen_vars, cfg), cfg)
    for col in ("params", "batch_stats", "spectral"):
        _assert_trees_equal(gen_vars[col], back[col], f"gen {col}")

    y = jnp.zeros((1, 4 * cfg.total_upsample, 1))
    mpd_vars = MultiPeriodDiscriminator(cfg).init(rng, y, y)
    back = ckpt.import_vec2wav_mpd(ckpt.export_vec2wav_mpd(mpd_vars, cfg), cfg)
    _assert_trees_equal(mpd_vars["params"], back["params"], "mpd params")

    msd_vars = MultiScaleDiscriminator().init(rng, y, y)
    back = ckpt.import_vec2wav_msd(ckpt.export_vec2wav_msd(msd_vars))
    _assert_trees_equal(msd_vars["params"], back["params"], "msd params")
    _assert_trees_equal(msd_vars["spectral"], back["spectral"], "msd spectral")


def test_v2w_save_reference_files_and_optimizer_stub(tmp_path):
    """``save_reference_vec2wav`` writes loadable ``g_/do_`` torch files with
    the reference's dict layout; the optimizer stubs enumerate exactly the
    trainable tensors (weight-norm g/v/bias are params; running stats,
    counters and spectral u/v are buffers)."""
    cfg = _tiny_v2w_cfg()
    rng = jax.random.PRNGKey(0)
    gen_vars = Generator(cfg).init(
        rng, jnp.zeros((1, 4, cfg.n_feat_dim)), jnp.zeros((1, cfg.spk_dim)),
        jnp.zeros((1, cfg.noise_dim)), train=False)
    y = jnp.zeros((1, 4 * cfg.total_upsample, 1))
    mpd_vars = MultiPeriodDiscriminator(cfg).init(rng, y, y)
    msd_vars = MultiScaleDiscriminator().init(rng, y, y)

    ckpt.save_reference_vec2wav(str(tmp_path), 120, gen_vars, cfg,
                                mpd_vars=mpd_vars, msd_vars=msd_vars, epoch=3)
    g = torch.load(tmp_path / "g_00000120", map_location="cpu", weights_only=False)
    do = torch.load(tmp_path / "do_00000120", map_location="cpu", weights_only=False)
    assert set(g) == {"generator"}
    assert set(do) == {"mpd", "msd", "optim_g", "optim_d", "steps", "epoch"}
    assert do["steps"] == 120 and do["epoch"] == 3

    # optimizer stub param count == trainable-tensor count of the state dict
    gen_sd = g["generator"]
    n_buffers = sum(
        k.endswith((".running_mean", ".running_var", ".num_batches_tracked",
                    ".weight_u"))
        or (k.endswith(".weight_v") and k[: -len("weight_v")] + "weight_g" not in gen_sd)
        for k in gen_sd
    )
    n_params = len(gen_sd) - n_buffers
    assert do["optim_g"]["param_groups"][0]["params"] == list(range(n_params))
    assert do["optim_g"]["state"] == {}
    assert do["optim_g"]["param_groups"][0]["lr"] == cfg.learning_rate

    # the g_ file feeds back through the importer (the synthesize CLI path)
    sd_np = {k: v.numpy() for k, v in gen_sd.items()}
    back = ckpt.import_vec2wav_generator(sd_np, cfg)
    for col in ("params", "batch_stats", "spectral"):
        _assert_trees_equal(gen_vars[col], back[col], f"g_file {col}")


def test_export_torch_cli_from_orbax(tmp_path):
    """CLI cycle: orbax training checkpoint -> ``export-torch`` ->
    reference-format torch file whose tensors equal the training params."""
    from wavthruvec_pytorch_tpu import cli
    from wavthruvec_pytorch_tpu.config import save_config
    from wavthruvec_pytorch_tpu.train import vec2wav_train as v2w
    from wavthruvec_pytorch_tpu.ops.stft import mel_spectrogram

    cfg = _tiny_v2w_cfg()
    rng = np.random.default_rng(0)
    B, T = 2, 4
    L = T * cfg.total_upsample
    audio = (rng.standard_normal((B, L, 1)) * 0.1).astype(np.float32)
    mel = np.asarray(mel_spectrogram(
        jnp.asarray(audio[..., 0]), cfg.n_fft, cfg.num_mels, cfg.sampling_rate,
        cfg.hop_size, cfg.win_size, cfg.fmin, cfg.fmax_for_loss,
    )).transpose(0, 2, 1)
    batch = {
        "wv_feat": jnp.asarray(rng.standard_normal((B, T, cfg.n_feat_dim)), jnp.float32),
        "spk_emb": jnp.asarray(rng.standard_normal((B, cfg.spk_dim)), jnp.float32),
        "audio": jnp.asarray(audio),
        "mel_loss": jnp.asarray(mel),
    }
    _, state = v2w.init_state(cfg, jax.random.PRNGKey(0), batch)
    cp = tmp_path / "state_00000007"
    ckpt.save_checkpoint(str(cp), state)
    cfg_json = tmp_path / "v2w.json"
    save_config(cfg, str(cfg_json))

    assert cli.main(["export-torch", "--stage", "v2w",
                     "--checkpoint", str(cp), "--config", str(cfg_json)]) == 0
    g = torch.load(tmp_path / "g_00000007", map_location="cpu", weights_only=False)
    direct = ckpt.export_vec2wav_generator(
        {"params": state.gen_params, "batch_stats": state.gen_batch_stats,
         "spectral": state.gen_spectral}, cfg)
    assert set(g["generator"]) == set(direct)
    for k, v in direct.items():
        np.testing.assert_array_equal(g["generator"][k].numpy(), v, err_msg=k)
    assert (tmp_path / "do_00000007").exists()


@pytest.mark.slow
def test_t2v_export_strict_load_into_reference():
    """Full-size export strict-loads into the actual reference Text2Vec:
    no unexpected keys; missing keys are exactly the ECAPA ``torchfbank``
    frontend constants the module recreates at init
    (ecapa_tdnn_TaoRuijie.py:138-143)."""
    mod = load_ref_module("text2vec", "model", "ref_t2v_model_export")
    torch.manual_seed(0)
    ref_model = mod.Text2Vec()

    cfg = Text2VecConfig()
    # full-size variables without a full init: export the reference's own
    # weights through the importer first (proven element-wise elsewhere),
    # then back out
    sd0 = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables = ckpt.import_text2vec(sd0, cfg)
    sd = ckpt.export_text2vec(variables, cfg)

    result = ref_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert result.unexpected_keys == []
    assert all("torchfbank" in k for k in result.missing_keys), result.missing_keys

    # and the values survived the flax roundtrip bit-for-bit
    sd1 = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    for k in sd0:
        if "torchfbank" in k or k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(sd0[k], sd1[k], err_msg=k)


@pytest.mark.slow
def test_v2w_export_strict_load_into_reference():
    """Full-size generator/MPD/MSD exports strict-load into the reference
    torch modules (vec2wav/models.py:77-275) with zero missing/unexpected."""
    models = load_ref_module("vec2wav", "models", "ref_v2w_models_export")
    cfg = Vec2WavConfig()
    torch.manual_seed(0)
    ref_gen = models.Generator(models.hp)
    ref_mpd = models.MultiPeriodDiscriminator(models.hp)
    ref_msd = models.MultiScaleDiscriminator()

    for ref, im, ex in (
        (ref_gen,
         lambda sd: ckpt.import_vec2wav_generator(sd, cfg),
         lambda v: ckpt.export_vec2wav_generator(v, cfg)),
        (ref_mpd,
         lambda sd: ckpt.import_vec2wav_mpd(sd, cfg),
         lambda v: ckpt.export_vec2wav_mpd(v, cfg)),
        (ref_msd,
         lambda sd: ckpt.import_vec2wav_msd(sd),
         lambda v: ckpt.export_vec2wav_msd(v)),
    ):
        sd0 = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        sd = ex(im(sd0))
        ref.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
            strict=True,
        )
        sd1 = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        for k in sd0:
            if k.endswith("num_batches_tracked"):
                continue
            np.testing.assert_array_equal(sd0[k], sd1[k], err_msg=k)
