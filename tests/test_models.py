"""Shape/behavior tests for the model stacks (fixed PRNG golden-shape tests,
SURVEY.md §4 plan item b)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavthruvec_pytorch_tpu.config import Text2VecConfig, Vec2WavConfig
from wavthruvec_pytorch_tpu.models import (
    ECAPA_TDNN,
    Generator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    Text2Vec,
)
from wavthruvec_pytorch_tpu.models.vec2wav import (
    discriminator_loss,
    feature_loss,
    generator_loss,
)

# small config for fast CPU tests
T2V_SMALL = Text2VecConfig(
    n_feat_dim=32,
    spk_channel=32,
    n_speaker_dim=16,
    vocab_size=50,
    max_seq_len=64,
    encoder_dim=24,
    encoder_n_layer=2,
    encoder_conv1d_filter_size=48,
    decoder_dim=24,
    decoder_n_layer=2,
    decoder_conv1d_filter_size=48,
    duration_predictor_filter_size=16,
)

V2W_SMALL = Vec2WavConfig(
    n_feat_dim=24,
    num_wv_feat=24,
    spk_dim=8,
    noise_dim=8,
    upsample_initial_channel=32,
    upsample_rates=(4, 4),
    upsample_kernel_sizes=(8, 8),
    resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 2), (1, 2)),
    periods=(2, 3),
)


def _t2v_batch(cfg, B=2, N=7, T=24, seed=0):
    rng = np.random.default_rng(seed)
    in_lens = np.array([N, N - 3])
    out_lens = np.array([T, T - 10])
    src_seq = np.zeros((B, N), np.int32)
    for b in range(B):
        src_seq[b, : in_lens[b]] = rng.integers(1, cfg.vocab_size, in_lens[b])
    src_pos = np.where(src_seq != 0, np.arange(1, N + 1)[None, :], 0).astype(np.int32)
    wav_feat = rng.standard_normal((B, T, cfg.n_feat_dim)).astype(np.float32)
    for b in range(B):
        wav_feat[b, out_lens[b]:] = 0.0
    feat_pos = np.zeros((B, T), np.int32)
    for b in range(B):
        feat_pos[b, : out_lens[b]] = np.arange(1, out_lens[b] + 1)
    prior = rng.random((B, T, N)).astype(np.float32) + 0.1
    return (
        jnp.asarray(src_seq),
        jnp.asarray(src_pos),
        jnp.asarray(wav_feat),
        jnp.asarray(in_lens),
        jnp.asarray(out_lens),
        jnp.asarray(feat_pos),
        jnp.asarray(prior),
    )


@pytest.fixture(scope="module")
def t2v_setup():
    cfg = T2V_SMALL
    model = Text2Vec(cfg)
    batch = _t2v_batch(cfg)
    src_seq, src_pos, wav_feat, in_lens, out_lens, feat_pos, prior = batch
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        src_seq, src_pos, wav_feat, in_lens, out_lens, feat_pos,
        attn_prior=prior, deterministic=True, train_bn=False,
    )
    return cfg, model, variables, batch


def test_text2vec_train_branch_shapes(t2v_setup):
    cfg, model, variables, batch = t2v_setup
    src_seq, src_pos, wav_feat, in_lens, out_lens, feat_pos, prior = batch
    B, N = src_seq.shape
    T = wav_feat.shape[1]
    out, mutated = model.apply(
        variables,
        src_seq, src_pos, wav_feat, in_lens, out_lens, feat_pos,
        attn_prior=prior, deterministic=False, train_bn=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert out["feat_output"].shape == (B, T, cfg.n_feat_dim)
    assert out["feat_postnet_output"].shape == (B, T, cfg.n_feat_dim)
    assert out["duration_predictor_output"].shape == (B, N)
    assert out["duration"].shape == (B, N)
    assert out["attn"].shape == (B, T, N)
    assert out["attn_soft"].shape == (B, T, N)
    # durations from MAS must sum to the frame count per item
    np.testing.assert_array_equal(
        np.asarray(out["duration"]).sum(axis=1), np.asarray(out_lens)
    )
    # outputs masked beyond lengths
    feat = np.asarray(out["feat_postnet_output"])
    assert np.abs(feat[1, int(out_lens[1]):]).max() == 0.0
    assert "batch_stats" in mutated


def test_text2vec_infer_branch(t2v_setup):
    cfg, model, variables, batch = t2v_setup
    src_seq, src_pos, wav_feat, *_ = batch
    max_frames = 48
    out = model.apply(
        variables,
        src_seq, src_pos, wav_feat, max_frames, 1.0,
        method=Text2Vec.infer,
    )
    B, N = src_seq.shape
    assert out["feat_postnet_output"].shape == (B, max_frames, cfg.n_feat_dim)
    assert out["durations"].shape == (B, N)
    total = np.asarray(out["total_frames"])
    assert (total <= max_frames).all()
    # pad text positions contribute zero duration
    durs = np.asarray(out["durations"])
    assert (durs[np.asarray(src_seq) == 0] == 0).all()
    # frames beyond total are zeroed
    feat = np.asarray(out["feat_postnet_output"])
    for b in range(B):
        if total[b] < max_frames:
            assert np.abs(feat[b, total[b]:]).max() == 0.0


def test_text2vec_infer_precomputed_spk_emb(t2v_setup):
    """Serving fast path: a precomputed speaker embedding must reproduce the
    wav_feat-conditioned inference exactly (ECAPA skipped per call)."""
    cfg, model, variables, batch = t2v_setup
    src_seq, src_pos, wav_feat, *_ = batch
    spk = model.apply(variables, wav_feat, method=Text2Vec.speaker_embedding)
    out_ref = model.apply(
        variables, src_seq, src_pos, wav_feat, 48, 1.0, method=Text2Vec.infer
    )
    out_fast = model.apply(
        variables, src_seq, src_pos, None, 48, 1.0, spk,
        method=Text2Vec.infer,
    )
    np.testing.assert_allclose(
        np.asarray(out_fast["feat_postnet_output"]),
        np.asarray(out_ref["feat_postnet_output"]),
        atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(out_fast["durations"]), np.asarray(out_ref["durations"])
    )


def test_text2vec_infer_alpha_scales_durations(t2v_setup):
    cfg, model, variables, batch = t2v_setup
    src_seq, src_pos, wav_feat, *_ = batch
    out1 = model.apply(variables, src_seq, src_pos, wav_feat, 64, 1.0, method=Text2Vec.infer)
    out2 = model.apply(variables, src_seq, src_pos, wav_feat, 64, 2.0, method=Text2Vec.infer)
    t1 = np.asarray(out1["total_frames"])
    t2 = np.asarray(out2["total_frames"])
    assert (t2 >= t1).all()


def test_ecapa_shapes():
    m = ECAPA_TDNN(C=64, n_feat_dim=32, n_speaker_dim=192)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 50, 32)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(variables, x, train=False)
    assert out.shape == (2, 192)


@pytest.mark.slow
def test_ecapa_wav_input_path():
    m = ECAPA_TDNN(C=64, n_feat_dim=80, n_speaker_dim=192, input_wav=True)
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 8000)), jnp.float32
    ) * 0.1
    variables = m.init(jax.random.PRNGKey(0), wav, train=False)
    out = m.apply(variables, wav, train=False)
    assert out.shape == (2, 192)


@pytest.fixture(scope="module")
def v2w_setup():
    cfg = V2W_SMALL
    gen = Generator(cfg)
    rng = np.random.default_rng(0)
    B, T = 2, 11
    x = jnp.asarray(rng.standard_normal((B, T, cfg.n_feat_dim)), jnp.float32)
    spk = jnp.asarray(rng.standard_normal((B, cfg.spk_dim)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((B, cfg.noise_dim)), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(0), x, spk, noise, train=False)
    return cfg, gen, variables, (x, spk, noise)


def test_generator_upsamples_exactly(v2w_setup):
    cfg, gen, variables, (x, spk, noise) = v2w_setup
    y, mutated = gen.apply(
        variables, x, spk, noise, train=True,
        mutable=["batch_stats", "spectral"],
    )
    assert y.shape == (x.shape[0], x.shape[1] * cfg.total_upsample, 1)
    assert np.abs(np.asarray(y)).max() <= 1.0  # tanh output
    assert "batch_stats" in mutated and "spectral" in mutated


def test_generator_noise_changes_output(v2w_setup):
    cfg, gen, variables, (x, spk, noise) = v2w_setup
    y1 = gen.apply(variables, x, spk, noise, train=False)
    y2 = gen.apply(variables, x, spk, noise + 1.0, train=False)
    assert np.abs(np.asarray(y1) - np.asarray(y2)).max() > 1e-6


def test_discriminators_and_losses(v2w_setup):
    cfg, gen, variables, (x, spk, noise) = v2w_setup
    rng = np.random.default_rng(1)
    B, T = 2, 352  # not a multiple of the periods -> exercises reflect pad
    y = jnp.asarray(rng.standard_normal((B, T, 1)).clip(-1, 1), jnp.float32)
    y_hat = jnp.asarray(rng.standard_normal((B, T, 1)).clip(-1, 1), jnp.float32)

    mpd = MultiPeriodDiscriminator(cfg)
    mpd_vars = mpd.init(jax.random.PRNGKey(0), y, y_hat)
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = mpd.apply(mpd_vars, y, y_hat)
    assert len(y_d_rs) == len(cfg.periods)

    msd = MultiScaleDiscriminator()
    msd_vars = msd.init(jax.random.PRNGKey(1), y, y_hat)
    s_d_rs, s_d_gs, s_fmap_rs, s_fmap_gs = msd.apply(
        msd_vars, y, y_hat, mutable=["spectral"]
    )[0]
    assert len(s_d_rs) == 3

    d_loss, r_losses, g_losses = discriminator_loss(y_d_rs, y_d_gs)
    assert np.isfinite(float(d_loss))
    g_loss, _ = generator_loss(y_d_gs)
    assert np.isfinite(float(g_loss))
    fm = feature_loss(fmap_rs, fmap_gs)
    assert np.isfinite(float(fm))
    # identical inputs -> zero feature loss
    assert float(feature_loss(fmap_rs, fmap_rs)) == 0.0


def test_pair_batched_discriminators_match_sequential(v2w_setup):
    """pair_batched=True (one concat-batched pass per sub-discriminator) must
    reproduce the two-pass outputs exactly: convs are batch-independent."""
    cfg, *_ = v2w_setup
    rng = np.random.default_rng(2)
    B, T = 2, 352
    y = jnp.asarray(rng.standard_normal((B, T, 1)).clip(-1, 1), jnp.float32)
    y_hat = jnp.asarray(rng.standard_normal((B, T, 1)).clip(-1, 1), jnp.float32)

    mpd = MultiPeriodDiscriminator(cfg)
    mpd_pair = MultiPeriodDiscriminator(cfg, pair_batched=True)
    mpd_vars = mpd.init(jax.random.PRNGKey(0), y, y_hat)
    out_seq = mpd.apply(mpd_vars, y, y_hat)
    out_pair = mpd_pair.apply(mpd_vars, y, y_hat)
    for a, b in zip(jax.tree_util.tree_leaves(out_seq),
                    jax.tree_util.tree_leaves(out_pair)):
        # Batched conv may reorder accumulation, so compare at a tolerance
        # relative to each tensor's scale (the un-normalized spectral stack
        # amplifies inputs to ~1e12, making element-wise rtol meaningless).
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, float(np.abs(a).max()))
        assert float(np.abs(a - b).max()) <= 1e-5 * scale

    msd = MultiScaleDiscriminator(update_spectral=False)
    msd_pair = MultiScaleDiscriminator(update_spectral=False, pair_batched=True)
    msd_vars = msd.init(jax.random.PRNGKey(1), y, y_hat)
    out_seq = msd.apply(msd_vars, y, y_hat)
    out_pair = msd_pair.apply(msd_vars, y, y_hat)
    for a, b in zip(jax.tree_util.tree_leaves(out_seq),
                    jax.tree_util.tree_leaves(out_pair)):
        # Batched conv may reorder accumulation, so compare at a tolerance
        # relative to each tensor's scale (the un-normalized spectral stack
        # amplifies inputs to ~1e12, making element-wise rtol meaningless).
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, float(np.abs(a).max()))
        assert float(np.abs(a - b).max()) <= 1e-5 * scale


def test_config_roundtrip(tmp_path):
    from wavthruvec_pytorch_tpu.config import load_config, save_config

    cfg = dataclasses.replace(T2V_SMALL, learning_rate=0.05)
    p = str(tmp_path / "cfg.json")
    save_config(cfg, p)
    cfg2 = load_config(Text2VecConfig, p)
    assert cfg2.learning_rate == 0.05
    assert cfg2.fft_conv1d_kernel == cfg.fft_conv1d_kernel


def test_ecapa_lawlict_shapes():
    """Alternative ECAPA variant (reference shape probe:
    ecapa_tdnn_lawlict.py:156-162: [2, 200, 80] -> [2, 192])."""
    from wavthruvec_pytorch_tpu.models.ecapa_lawlict import ECAPA_TDNN_Lawlict

    m = ECAPA_TDNN_Lawlict(in_channels=80, channels=64, embd_dim=192)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 50, 80)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(variables, x, train=False)
    assert out.shape == (2, 192)


def test_generator_folded_weight_norm_matches():
    """fold_weight_norm export path == normalized path (remove_weight_norm
    analog, vec2wav/models.py:149-156)."""
    from wavthruvec_pytorch_tpu.models.vec2wav import fold_weight_norm

    cfg = V2W_SMALL
    gen = Generator(cfg)
    gen_folded = Generator(cfg, folded=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 7, cfg.n_feat_dim)), jnp.float32)
    spk = jnp.asarray(rng.standard_normal((2, cfg.spk_dim)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((2, cfg.noise_dim)), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(3), x, spk, noise, train=False)
    y_ref = gen.apply(variables, x, spk, noise, train=False)
    folded_vars = dict(variables)
    folded_vars["params"] = fold_weight_norm(variables["params"])
    y_folded = gen_folded.apply(folded_vars, x, spk, noise, train=False)
    np.testing.assert_allclose(np.asarray(y_folded), np.asarray(y_ref), atol=1e-5)


def test_flash_attention_flag_cpu_fallback(t2v_setup):
    """flash_attention=True wires through the FFT stacks; on CPU (or for
    non-conforming shapes) the dense path runs, so outputs are identical.
    On-chip numerical equivalence is checked by tools/flash_check.py."""
    import dataclasses

    cfg, model, variables, batch = t2v_setup
    src_seq, src_pos, wav_feat, *_ = batch
    cfg_f = dataclasses.replace(cfg, flash_attention=True)
    model_f = Text2Vec(cfg_f)
    out = model.apply(variables, src_seq, src_pos, wav_feat, 48, 1.0,
                      method=Text2Vec.infer)
    out_f = model_f.apply(variables, src_seq, src_pos, wav_feat, 48, 1.0,
                          method=Text2Vec.infer)
    np.testing.assert_array_equal(
        np.asarray(out["feat_postnet_output"]),
        np.asarray(out_f["feat_postnet_output"]),
    )


def test_flash_attention_dropout_guard(t2v_setup):
    """flash + attention-prob dropout in a training (non-deterministic)
    forward must hard-error: the Pallas kernel cannot apply the reference's
    attention dropout (subLayer.py:43-55), and silently skipping it on flash
    buckets while keeping it on dense ones would change training math.
    dropout=0 trains fine; deterministic forwards are always fine."""
    import dataclasses

    import pytest

    from wavthruvec_pytorch_tpu.models.fft_block import FFTBlock

    blk = FFTBlock(32, 64, 2, 16, 16, dropout=0.1, use_flash=True)
    x = jnp.zeros((1, 16, 32), jnp.float32)
    variables = blk.init(
        {"params": jax.random.PRNGKey(0)}, x, deterministic=True)
    with pytest.raises(ValueError, match="attention-prob dropout"):
        blk.apply(variables, x, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(1)})

    blk0 = FFTBlock(32, 64, 2, 16, 16, dropout=0.0, use_flash=True)
    vars0 = blk0.init({"params": jax.random.PRNGKey(0)}, x, deterministic=True)
    blk0.apply(vars0, x, deterministic=False,
               rngs={"dropout": jax.random.PRNGKey(1)})  # no error

    # whole-model guard: training branch with flash + default dropout errors
    cfg, model, variables, batch = t2v_setup
    cfg_f = dataclasses.replace(cfg, flash_attention=True)
    model_f = Text2Vec(cfg_f)
    src_seq, src_pos, wav_feat, in_lens, out_lens, WVF_pos, prior = batch
    with pytest.raises(ValueError, match="attention-prob dropout"):
        model_f.apply(
            variables, src_seq, src_pos, wav_feat, in_lens, out_lens,
            WVF_pos, attn_prior=prior, deterministic=False, train_bn=False,
            rngs={"dropout": jax.random.PRNGKey(1)})


def test_msd_tiled_conv_matches_lax(monkeypatch):
    """MSD with tiled_conv=True (MXU-packed grouped convs, ops/tiled_conv.py)
    must reproduce the plain lowering's outputs and parameter grads — same
    params, same math, different schedule.  The length gate (MIN_T_IN,
    measured crossover on chip) is forced open so the tiny test shape
    actually exercises the repack."""
    from wavthruvec_pytorch_tpu.ops import tiled_conv

    monkeypatch.setattr(tiled_conv, "MIN_T_IN", 0)
    rng = np.random.default_rng(5)
    B, T = 2, 352
    y = jnp.asarray(rng.standard_normal((B, T, 1)).clip(-1, 1), jnp.float32)
    y_hat = jnp.asarray(
        rng.standard_normal((B, T, 1)).clip(-1, 1), jnp.float32)

    msd = MultiScaleDiscriminator(update_spectral=False)
    msd_t = MultiScaleDiscriminator(update_spectral=False, tiled_conv=True)
    msd_vars = msd.init(jax.random.PRNGKey(1), y, y_hat)
    out_a = msd.apply(msd_vars, y, y_hat)
    out_b = msd_t.apply(msd_vars, y, y_hat)
    for a, b in zip(jax.tree_util.tree_leaves(out_a),
                    jax.tree_util.tree_leaves(out_b)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, float(np.abs(a).max()))
        assert float(np.abs(a - b).max()) <= 2e-5 * scale

    def d_loss(mod):
        def f(params):
            vs = {**msd_vars, "params": params}
            y_d_rs, y_d_gs, fr, fg = mod.apply(vs, y, y_hat)
            from wavthruvec_pytorch_tpu.models.vec2wav import (
                discriminator_loss,
                feature_loss,
            )

            dl, _, _ = discriminator_loss(y_d_rs, y_d_gs)
            return dl + feature_loss(fr, fg)
        return jax.grad(f)(msd_vars["params"])

    ga, gb = d_loss(msd), d_loss(msd_t)
    flat_a = jax.tree_util.tree_leaves_with_path(ga)
    flat_b = jax.tree_util.tree_leaves(gb)
    for (path, a), b in zip(flat_a, flat_b):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1e-3, float(np.abs(a).max()))
        assert float(np.abs(a - b).max()) <= 5e-5 * scale, path
