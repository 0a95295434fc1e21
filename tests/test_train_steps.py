"""Integration tests: single-step and multi-step training on synthetic data
(loss decreases), plus 8-device CPU-mesh sharded execution (SURVEY.md §4
items c+d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavthruvec_pytorch_tpu.config import MeshConfig
from wavthruvec_pytorch_tpu.parallel import create_mesh, shard_batch
from wavthruvec_pytorch_tpu.train import text2vec_train as t2v
from wavthruvec_pytorch_tpu.train import vec2wav_train as v2w
from tests.test_models import T2V_SMALL, V2W_SMALL


def _t2v_synth_batch(cfg, B=8, N=8, T=24, seed=0):
    rng = np.random.default_rng(seed)
    items = []
    for b in range(B):
        n = int(rng.integers(4, N + 1))
        t = int(rng.integers(12, T + 1))
        items.append(
            {
                "text_enc": rng.integers(1, cfg.vocab_size, n),
                "feat_gt_target": rng.standard_normal((t, cfg.n_feat_dim)).astype(
                    np.float32
                ),
                "attn_prior": (rng.random((t, n)) + 0.05).astype(np.float32),
                "audiopath": f"synth_{b}.npy",
            }
        )
    batch = t2v.make_padded_batch(items, cfg, text_pad=N, frame_pad=T)
    batch.pop("audiopaths")
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.mark.slow
def test_t2v_train_step_loss_decreases():
    # Reference-semantics LAMB (no debias, trust clamp) at the reference
    # lr=0.1 oscillates on this 8-step toy problem; use a gentler lr for the
    # "training reduces loss" sanity check (optimizer math is covered by
    # test_lamb_parity.py).
    import dataclasses

    cfg = dataclasses.replace(T2V_SMALL, learning_rate=0.01)
    batch = _t2v_synth_batch(cfg)
    model, state = t2v.init_state(cfg, jax.random.PRNGKey(0), batch)
    step, _ = t2v.make_train_step(model, cfg)
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(8):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_t2v_lean_step_matches_viz_step():
    """with_viz=False (the loop's non-log-step dispatch) must be the same
    training math — identical metrics and resulting params, just without the
    attn map outputs."""
    cfg = T2V_SMALL
    batch = _t2v_synth_batch(cfg)
    model, state = t2v.init_state(cfg, jax.random.PRNGKey(0), batch)
    state2 = jax.tree_util.tree_map(jnp.copy, state)
    step_viz, _ = t2v.make_train_step(model, cfg)
    step_lean, _ = t2v.make_train_step(model, cfg, with_viz=False)
    rng = jax.random.PRNGKey(1)
    s1, m1 = step_viz(state, batch, rng)
    s2, m2 = step_lean(state2, batch, rng)
    assert "attn_soft_0" in m1 and "attn_soft_0" not in m2
    for tag in ("total_loss", "WVF_loss", "duration_loss"):
        np.testing.assert_allclose(float(m1[tag]), float(m2[tag]), rtol=1e-6)
    leaves1 = jax.tree_util.tree_leaves(s1.params)
    leaves2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_t2v_train_step_sharded_mesh():
    cfg = T2V_SMALL
    mesh = create_mesh()  # 8 virtual CPU devices from conftest
    assert mesh.devices.size == 8
    batch = _t2v_synth_batch(cfg, B=8)
    model, state = t2v.init_state(cfg, jax.random.PRNGKey(0), batch)
    step, _ = t2v.make_train_step(model, cfg, mesh=mesh)
    sharded = shard_batch(batch, mesh)
    state, metrics = step(state, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))


def _v2w_synth_batch(cfg, B=4, T=8, seed=0):
    rng = np.random.default_rng(seed)
    L = T * cfg.total_upsample
    wv_feat = rng.standard_normal((B, T, cfg.n_feat_dim)).astype(np.float32)
    spk = rng.standard_normal((B, cfg.spk_dim)).astype(np.float32)
    audio = (rng.standard_normal((B, L, 1)) * 0.1).astype(np.float32)
    # host-side mel target of the real audio (same op, CPU backend)
    from wavthruvec_pytorch_tpu.ops.stft import mel_spectrogram

    mel = np.asarray(
        mel_spectrogram(
            jnp.asarray(audio[..., 0]),
            cfg.n_fft,
            cfg.num_mels,
            cfg.sampling_rate,
            cfg.hop_size,
            cfg.win_size,
            cfg.fmin,
            cfg.fmax_for_loss,
        )
    ).transpose(0, 2, 1)
    return {
        "wv_feat": jnp.asarray(wv_feat),
        "spk_emb": jnp.asarray(spk),
        "audio": jnp.asarray(audio),
        "mel_loss": jnp.asarray(mel),
    }


V2W_TINY = V2W_SMALL.replace_fields() if hasattr(V2W_SMALL, "replace_fields") else V2W_SMALL


def _tiny_v2w_cfg():
    import dataclasses

    return dataclasses.replace(
        V2W_SMALL,
        n_fft=64,
        win_size=64,
        hop_size=16,
        num_mels=8,
        sampling_rate=16000,
        fmax_for_loss=None,
    )


@pytest.mark.slow
def test_v2w_gan_step_runs_and_learns():
    cfg = _tiny_v2w_cfg()
    batch = _v2w_synth_batch(cfg)
    models, state = v2w.init_state(cfg, jax.random.PRNGKey(0), batch)
    step, _ = v2w.make_train_step(models, cfg)
    rng = jax.random.PRNGKey(1)
    mels = []
    for i in range(6):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        assert np.isfinite(float(metrics["gen_loss_total"]))
        assert np.isfinite(float(metrics["disc_loss_total"]))
        mels.append(float(metrics["mel_loss"]))
    assert mels[-1] < mels[0], mels
    assert int(state.step) == 6


@pytest.mark.slow
def test_v2w_gan_step_sharded_mesh():
    cfg = _tiny_v2w_cfg()
    # 2-device mesh, not all 8: the virtual CPU devices time-share ONE core
    # in CI, and XLA's intra-process collective rendezvous hard-kills the
    # process when inter-device skew exceeds 40 s — with 8 emulated devices
    # running this step serially, the last arriver can blow that deadline.
    # Sharding semantics (psum'd grads, per-device batch shards) are
    # identical on 2 devices.
    mesh = create_mesh(2)
    batch = _v2w_synth_batch(cfg, B=8)
    models, state = v2w.init_state(cfg, jax.random.PRNGKey(0), batch)
    step, _ = v2w.make_train_step(models, cfg, mesh=mesh)
    sharded = shard_batch(batch, mesh)
    state, metrics = step(state, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["gen_loss_total"]))


def test_v2w_gan_step_single():
    """Fast default-run GAN-step coverage (one compile, one step); the
    multi-step learning + sharded variants above are marked slow."""
    cfg = _tiny_v2w_cfg()
    batch = _v2w_synth_batch(cfg, B=2, T=4)
    models, state = v2w.init_state(cfg, jax.random.PRNGKey(0), batch)
    step, _ = v2w.make_train_step(models, cfg)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["gen_loss_total"]))
    assert np.isfinite(float(metrics["disc_loss_total"]))
    assert int(state.step) == 1


def test_v2w_device_mel_target_matches_host_path():
    """``device_mel_target`` computes the mel-loss target in-graph from the
    batch audio.  On uniform-length windows (the supported mode — the
    dataset guard enforces split=True) the step must match the host-mel
    path exactly: same losses, same updated params, because the in-graph op
    is the host op's twin and there is no padding boundary."""
    import dataclasses

    from wavthruvec_pytorch_tpu.data.vocoder_data import (
        mel_spectrogram_np,
        pad_vocoder_batch,
    )

    cfg = _tiny_v2w_cfg()
    rng = np.random.default_rng(5)
    T = 8
    items = []
    for i in range(3):  # uniform window lengths, as the split loader emits
        audio = (rng.standard_normal(T * cfg.total_upsample) * 0.1).astype(np.float32)
        items.append({
            "wv_feat": rng.standard_normal((T, cfg.n_feat_dim)).astype(np.float32),
            "spk_emb": rng.standard_normal(cfg.spk_dim).astype(np.float32),
            "audio": audio,
            "filename": f"u{i}",
        })

    host_items = [
        dict(it, mel_loss=mel_spectrogram_np(
            it["audio"], cfg.n_fft, cfg.num_mels, cfg.sampling_rate,
            cfg.hop_size, cfg.win_size, cfg.fmin, cfg.fmax_for_loss))
        for it in items
    ]
    batch_host = pad_vocoder_batch(host_items, cfg, frame_pad=T)
    batch_dev = pad_vocoder_batch(items, cfg, frame_pad=T)
    assert "mel_frames" in batch_dev and "mel_loss" not in batch_dev
    batch_host.pop("filenames")
    batch_dev.pop("filenames")
    batch_host = {k: jnp.asarray(v) for k, v in batch_host.items()}
    batch_dev = {k: jnp.asarray(v) for k, v in batch_dev.items()}

    cfg_dev = dataclasses.replace(cfg, device_mel_target=True)
    models, state0 = v2w.init_state(cfg, jax.random.PRNGKey(0), batch_host)
    step_host, _ = v2w.make_train_step(models, cfg)
    step_dev, _ = v2w.make_train_step(models, cfg_dev)

    s_host, m_host = step_host(state0, batch_host, jax.random.PRNGKey(1))
    # state0 was donated by the first jitted call; rebuild it identically
    _, state0b = v2w.init_state(cfg, jax.random.PRNGKey(0), batch_host)
    s_dev, m_dev = step_dev(state0b, batch_dev, jax.random.PRNGKey(1))

    for k in m_host:
        assert float(m_host[k]) == pytest.approx(float(m_dev[k]), abs=2e-4), k
    for (pa, va), (pb, vb) in zip(
        jax.tree_util.tree_flatten_with_path(s_host.gen_params)[0],
        jax.tree_util.tree_flatten_with_path(s_dev.gen_params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), atol=1e-5, rtol=1e-4,
            err_msg=str(pa))

    # the guard: full-utterance mode must refuse the device target
    from wavthruvec_pytorch_tpu.data.vocoder_data import VocoderDataset

    with pytest.raises(ValueError, match="split=True"):
        VocoderDataset([], cfg_dev, split=False)


def test_v2w_lr_decay():
    cfg = _tiny_v2w_cfg()
    batch = _v2w_synth_batch(cfg, B=2)
    models, state = v2w.init_state(cfg, jax.random.PRNGKey(0), batch)
    new_opt = v2w.set_learning_rate(state.opt_g_state, cfg.learning_rate * cfg.lr_decay)
    assert float(new_opt.hyperparams["learning_rate"]) == pytest.approx(
        cfg.learning_rate * cfg.lr_decay
    )


def test_t2v_train_step_rbg_dropout_keys():
    """Text2VecConfig.dropout_prng_impl="rbg" routes the per-step dropout
    masks through the TPU-fast RBG generator (hardware RNG);
    the step must run with a typed rbg key and produce finite metrics, and
    a deterministic forward must be impl-independent (masks are the ONLY
    thing the impl touches)."""
    import dataclasses

    cfg = dataclasses.replace(T2V_SMALL, dropout_prng_impl="rbg")
    batch = _t2v_synth_batch(cfg, B=4)
    model, state = t2v.init_state(cfg, jax.random.PRNGKey(0), batch)
    step, _ = t2v.make_train_step(model, cfg)
    key = jax.random.key(1, impl=cfg.dropout_prng_impl)
    key, sub = jax.random.split(key)
    state2, metrics = step(state, batch, sub)
    assert np.isfinite(float(metrics["total_loss"]))

    # deterministic (dropout-off) eval forward is identical across impls:
    # params came from the same threefry init, impl only affects masks
    out = model.apply(
        {"params": state2.params, "batch_stats": state2.batch_stats},
        batch["text"], batch["src_pos"], batch["feat_target"],
        batch["input_lengths"], batch["output_lengths"], batch["feat_pos"],
        attn_prior=batch["attn_prior"], deterministic=True, train_bn=False,
    )
    assert np.isfinite(np.asarray(out["feat_postnet_output"])).all()
