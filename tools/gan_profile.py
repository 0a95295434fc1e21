"""Ablation timing of the Vec2Wav GAN step at the reference shape (B2, 256
frames): which component dominates the 0.8 s step?  Each piece is jitted
separately with a scalar output (scalar-fetch methodology)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wavthruvec_pytorch_tpu.config import Vec2WavConfig
from wavthruvec_pytorch_tpu.ops.stft import mel_spectrogram
from wavthruvec_pytorch_tpu.train import vec2wav_train as v2w


def _cache():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _t(fn, iters=10):
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

    @jax.jit
    def null(eps):
        return eps * 2.0

    overhead = _t(null)

    @jax.jit
    def g_fwd(gp, eps):
        y, _ = v2w._gen_forward(models, cfg, gp, state.gen_batch_stats,
                                state.gen_spectral, batch, noise + eps)
        return jnp.sum(y[:, ::4096, 0])

    @jax.jit
    def mel_fwd(eps):
        m = mel_spectrogram(batch["audio"][..., 0] + eps, cfg.n_fft,
                            cfg.num_mels, cfg.sampling_rate, cfg.hop_size,
                            cfg.win_size, cfg.fmin, cfg.fmax_for_loss)
        return jnp.sum(m[:, ::16, ::16])

    @jax.jit
    def mpd_fwd(dp, eps):
        r, g, _, _ = models.mpd.apply({"params": dp["mpd"]},
                                      batch["audio"] + eps, batch["audio"])
        return sum(jnp.sum(x[:, ::64]) for x in r)

    @jax.jit
    def msd_fwd(dp, eps):
        (r, g, _, _), _ = models.msd.apply(
            {"params": dp["msd"], "spectral": state.msd_spectral},
            batch["audio"] + eps, batch["audio"], mutable=["spectral"])
        return sum(jnp.sum(x[:, ::64]) for x in r)

    res = {
        "overhead_ms": round(overhead * 1e3, 2),
        "g_forward_ms": round((_t(lambda e: g_fwd(state.gen_params, e)) - overhead) * 1e3, 2),
        "mel_ms": round((_t(mel_fwd) - overhead) * 1e3, 2),
        "mpd_fwd_ms": round((_t(lambda e: mpd_fwd(state.disc_params, e)) - overhead) * 1e3, 2),
        "msd_fwd_ms": round((_t(lambda e: msd_fwd(state.disc_params, e)) - overhead) * 1e3, 2),
    }
    print(json.dumps(res), flush=True)

    # full-step reference number at the same shapes
    step, _ = v2w.make_train_step(models, cfg)
    keys = [jax.random.PRNGKey(i) for i in range(16)]
    holder = {"s": state}
    holder["s"], m = step(holder["s"], batch, keys[0])
    float(m["gen_loss_total"])

    def once(i):
        holder["s"], m = step(holder["s"], batch, keys[i % 16])
        float(m["gen_loss_total"])

    ts = []
    for i in range(8):
        t0 = time.perf_counter(); once(i); ts.append(time.perf_counter() - t0)
    print(json.dumps({"full_step_ms": round(float(np.median(ts[2:])) * 1e3, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
