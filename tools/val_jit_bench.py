"""Vocoder validation: eager per-op vs jitted per-item (round 5).

Quantifies the win of train/vec2wav_loop.make_val_fn on the real chip:
one full-size Generator validation item (~8 s of audio), the OLD eager
per-op path vs the jitted single-program path (compile excluded — the
val set is fixed, so each length compiles once per training run).

    python tools/val_jit_bench.py [--frames 400] [--items 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cache():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=400)
    ap.add_argument("--items", type=int, default=3)
    a = ap.parse_args()
    _cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from wavthruvec_pytorch_tpu.config import Vec2WavConfig
    from wavthruvec_pytorch_tpu.models import Generator
    from wavthruvec_pytorch_tpu.ops.stft import mel_spectrogram
    from wavthruvec_pytorch_tpu.train import vec2wav_loop

    cfg = Vec2WavConfig()
    gen = Generator(cfg)
    rng = jax.random.PRNGKey(0)
    feat = jax.random.normal(rng, (1, a.frames, cfg.n_feat_dim)) * 0.1
    spk = jax.random.normal(rng, (1, cfg.spk_dim))
    noise = jax.random.normal(rng, (1, cfg.noise_dim))
    variables = jax.jit(
        lambda: gen.init(rng, feat[:, :8], spk, noise, train=False))()
    n_mel_frames = a.frames * cfg.total_upsample // cfg.hop_size
    y_mel = jax.random.normal(rng, (1, n_mel_frames, cfg.num_mels))

    class _M:  # models shim for make_val_fn
        pass

    models = _M()
    models.gen = gen
    val_fn = vec2wav_loop.make_val_fn(models, cfg)

    def eager_item():
        y_hat = gen.apply(variables, feat, spk, noise, train=False)
        y_hat_mel = mel_spectrogram(
            y_hat[..., 0], cfg.n_fft, cfg.num_mels, cfg.sampling_rate,
            cfg.hop_size, cfg.win_size, cfg.fmin, cfg.fmax_for_loss,
        ).transpose(0, 2, 1)
        m = min(y_mel.shape[1], y_hat_mel.shape[1])
        return float(jnp.mean(jnp.abs(y_mel[:, :m] - y_hat_mel[:, :m])))

    def jit_item():
        err, _, _ = val_fn(variables, feat, spk, noise, y_mel)
        return float(err)

    out = {"frames": a.frames,
           "audio_s": round(a.frames * cfg.total_upsample / cfg.sampling_rate, 1)}
    # warm the jitted program (compile excluded: one-time per length)
    t0 = time.perf_counter()
    e_jit_warm = jit_item()
    out["jit_compile_s"] = round(time.perf_counter() - t0, 1)
    for name, fn in (("jit", jit_item), ("eager", eager_item)):
        ts = []
        for _ in range(a.items):
            t0 = time.perf_counter()
            err = fn()
            ts.append(time.perf_counter() - t0)
        out[f"{name}_s_per_item"] = round(float(np.median(ts)), 3)
        out[f"{name}_err"] = round(err, 5)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
