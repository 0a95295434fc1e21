"""GAN step backward ablations (follow-up to gan_profile.py): where do the
~770 ms beyond the forwards go?"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wavthruvec_pytorch_tpu.config import Vec2WavConfig
from wavthruvec_pytorch_tpu.models.vec2wav import (
    discriminator_loss,
    feature_loss,
    generator_loss,
)
from wavthruvec_pytorch_tpu.ops.stft import mel_spectrogram
from wavthruvec_pytorch_tpu.train import vec2wav_train as v2w


def _cache():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _t(fn, iters=8):
    for _ in range(2):
        float(fn(jnp.float32(0.0)))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(jnp.float32(i) * 1e-20))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main(B=2, T=256):
    _cache()
    cfg = Vec2WavConfig()
    rng = np.random.default_rng(0)
    L = T * cfg.total_upsample
    audio = jnp.asarray(rng.standard_normal((B, L, 1)) * 0.1, jnp.float32)
    mel = jnp.transpose(
        mel_spectrogram(audio[..., 0], cfg.n_fft, cfg.num_mels,
                        cfg.sampling_rate, cfg.hop_size, cfg.win_size,
                        cfg.fmin, cfg.fmax_for_loss), (0, 2, 1))
    batch = {
        "wv_feat": jnp.asarray(rng.standard_normal((B, T, cfg.n_feat_dim)), jnp.float32),
        "spk_emb": jnp.asarray(rng.standard_normal((B, cfg.spk_dim)), jnp.float32),
        "audio": audio,
        "mel_loss": mel,
    }
    models, state = v2w.init_state(cfg, jax.random.PRNGKey(0), batch)
    noise = jnp.zeros((B, cfg.noise_dim))
    y_hat0, _ = v2w._gen_forward(models, cfg, state.gen_params,
                                 state.gen_batch_stats, state.gen_spectral,
                                 batch, noise)
    y_hat0 = jax.lax.stop_gradient(y_hat0)

    @jax.jit
    def null(eps):
        return eps * 2.0

    overhead = _t(null)

    def tree_scalar(g):
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g)) * 1e-9

    # (a) generator-only backward (sum(y^2))
    @jax.jit
    def g_bwd(gp, eps):
        def loss(p):
            y, _ = v2w._gen_forward(models, cfg, p, state.gen_batch_stats,
                                    state.gen_spectral, batch, noise + eps)
            return jnp.mean(y * y)
        return tree_scalar(jax.grad(loss)(gp))

    # (b) D-step backward (discriminators only, detached y_hat)
    @jax.jit
    def d_bwd(dp, eps):
        def loss(p):
            r_f, g_f, _, _ = models.mpd.apply({"params": p["mpd"]},
                                              batch["audio"] + eps, y_hat0)
            (r_s, g_s, _, _), _ = models.msd.apply(
                {"params": p["msd"], "spectral": state.msd_spectral},
                batch["audio"] + eps, y_hat0, mutable=["spectral"])
            lf, _, _ = discriminator_loss(r_f, g_f)
            ls, _, _ = discriminator_loss(r_s, g_s)
            return lf + ls
        return tree_scalar(jax.grad(loss)(dp))

    # (c) mel-only G backward (G fwd + mel + L1, no discriminators)
    @jax.jit
    def gmel_bwd(gp, eps):
        def loss(p):
            y, _ = v2w._gen_forward(models, cfg, p, state.gen_batch_stats,
                                    state.gen_spectral, batch, noise + eps)
            m = mel_spectrogram(y[..., 0], cfg.n_fft, cfg.num_mels,
                                cfg.sampling_rate, cfg.hop_size, cfg.win_size,
                                cfg.fmin, cfg.fmax_for_loss)
            m = jnp.transpose(m, (0, 2, 1))
            return jnp.mean(jnp.abs(batch["mel_loss"][:, : m.shape[1]] - m)) * 45.0
        return tree_scalar(jax.grad(loss)(gp))

    # (d) full G-step backward (adv + FM + mel through both discriminators)
    @jax.jit
    def gfull_bwd(gp, eps):
        def loss(p):
            y, _ = v2w._gen_forward(models, cfg, p, state.gen_batch_stats,
                                    state.gen_spectral, batch, noise + eps)
            m = mel_spectrogram(y[..., 0], cfg.n_fft, cfg.num_mels,
                                cfg.sampling_rate, cfg.hop_size, cfg.win_size,
                                cfg.fmin, cfg.fmax_for_loss)
            m = jnp.transpose(m, (0, 2, 1))
            lmel = jnp.mean(jnp.abs(batch["mel_loss"][:, : m.shape[1]] - m)) * 45.0
            r_f, g_f, fr_f, fg_f = models.mpd.apply(
                {"params": state.disc_params["mpd"]}, batch["audio"], y)
            (r_s, g_s, fr_s, fg_s), _ = models.msd.apply(
                {"params": state.disc_params["msd"], "spectral": state.msd_spectral},
                batch["audio"], y, mutable=["spectral"])
            lg_f, _ = generator_loss(g_f)
            lg_s, _ = generator_loss(g_s)
            return lmel + lg_f + lg_s + feature_loss(fr_f, fg_f) + feature_loss(fr_s, fg_s)
        return tree_scalar(jax.grad(loss)(gp))

    print(json.dumps({"overhead_ms": round(overhead * 1e3, 2)}), flush=True)
    for name, fn in (
        ("g_only_bwd_ms", lambda e: g_bwd(state.gen_params, e)),
        ("d_step_bwd_ms", lambda e: d_bwd(state.disc_params, e)),
        ("g_mel_bwd_ms", lambda e: gmel_bwd(state.gen_params, e)),
        ("g_full_bwd_ms", lambda e: gfull_bwd(state.gen_params, e)),
    ):
        for attempt in range(3):  # tunnel compile can drop mid-transfer
            try:
                v = round((_t(fn) - overhead) * 1e3, 1)
                print(json.dumps({name: v}), flush=True)
                break
            except Exception as e:
                print(json.dumps({name: f"retry {attempt}: {type(e).__name__}"}),
                      flush=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=2)
    ap.add_argument("--T", type=int, default=256)
    a = ap.parse_args()
    main(a.B, a.T)
