"""Windowed-B128 GAN step: current wall, chained + synchronous, f32/bf16.

Round-3 VERDICT ask #4 evidence: where is the windowed step today, under
the same chained-dispatch methodology the t2v accounting uses?
"""
import dataclasses
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
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), file=sys.stderr, flush=True)


def run(B, T, dtype, chain=20, reps=5):
    cfg = dataclasses.replace(Vec2WavConfig(), compute_dtype=dtype)
    rng = np.random.default_rng(0)
    L = T * cfg.total_upsample
    audio = (rng.standard_normal((B, L, 1)) * 0.1).astype(np.float32)
    mel = np.asarray(
        mel_spectrogram(jnp.asarray(audio[..., 0]), cfg.n_fft, cfg.num_mels,
                        cfg.sampling_rate, cfg.hop_size, cfg.win_size,
                        cfg.fmin, cfg.fmax_for_loss)).transpose(0, 2, 1)
    batch = {
        "wv_feat": jnp.asarray(rng.standard_normal((B, T, cfg.n_feat_dim)), jnp.float32),
        "spk_emb": jnp.asarray(rng.standard_normal((B, cfg.spk_dim)), jnp.float32),
        "audio": jnp.asarray(audio),
        "mel_loss": jnp.asarray(mel),
    }
    models, state = v2w.init_state(cfg, jax.random.PRNGKey(0), batch)
    step, _ = v2w.make_train_step(models, cfg)
    keys = [jax.random.PRNGKey(i) for i in range(64)]
    state, m = step(state, batch, keys[0])
    float(m["gen_loss_total"])

    # chained: dispatch `chain` steps, fetch once at the end
    chained = []
    for r in range(reps):
        t0 = time.perf_counter()
        for i in range(chain):
            state, m = step(state, batch, keys[(r * chain + i) % 64])
        float(m["gen_loss_total"])
        chained.append((time.perf_counter() - t0) / chain)
    # synchronous: fetch every step (old bench_v2w pattern)
    sync = []
    for r in range(3):
        t0 = time.perf_counter()
        for i in range(chain):
            state, m = step(state, batch, keys[i % 64])
            float(m["gen_loss_total"])
        sync.append((time.perf_counter() - t0) / chain)
    return {
        "B": B, "T": T, "dtype": dtype,
        "chained_ms": round(float(np.median(chained)) * 1e3, 1),
        "chained_all": [round(x * 1e3, 1) for x in chained],
        "sync_ms": round(float(np.median(sync)) * 1e3, 1),
        "audio_s_per_s": round(B * L / cfg.sampling_rate / float(np.median(chained)), 1),
    }


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default=None,
                    help="run one cell (default: f32 then bf16)")
    ap.add_argument("--B", type=int, default=128)
    ap.add_argument("--T", type=int, default=25)
    a = ap.parse_args()
    _cache()
    for dt in ([a.dtype] if a.dtype else ["float32", "bfloat16"]):
        print(json.dumps(run(a.B, a.T, dt)), flush=True)
