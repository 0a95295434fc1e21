"""Full GAN train-step time with msd_tiled_conv on vs off (TPU).

    python tools/gan_step_tiled_bench.py --B 2 --T 500            # full-utt
    python tools/gan_step_tiled_bench.py --B 128 --T 25 [--bf16]  # windowed
"""

import argparse
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
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # acquisition mark for hang-aware supervisors (see memory/tpu quirks)
    print("devices:", jax.devices(), file=sys.stderr, flush=True)


def run(cfg, B, T):
    rng = np.random.default_rng(0)
    L = T * cfg.total_upsample
    audio = jnp.asarray(rng.standard_normal((B, L, 1)) * 0.1, jnp.float32)
    mel = jnp.transpose(
        mel_spectrogram(audio[..., 0], cfg.n_fft, cfg.num_mels,
                        cfg.sampling_rate, cfg.hop_size, cfg.win_size,
                        cfg.fmin, cfg.fmax_for_loss), (0, 2, 1))
    batch = {
        "wv_feat": jnp.asarray(
            rng.standard_normal((B, T, cfg.n_feat_dim)), jnp.float32),
        "spk_emb": jnp.asarray(
            rng.standard_normal((B, cfg.spk_dim)), jnp.float32),
        "audio": audio,
        "mel_loss": mel,
    }
    models, state = v2w.init_state(cfg, jax.random.PRNGKey(0), batch)
    step, _ = v2w.make_train_step(models, cfg)
    keys = [jax.random.PRNGKey(i) for i in range(16)]
    holder = {"s": state}
    for i in range(2):
        holder["s"], m = step(holder["s"], batch, keys[i])
        float(m["gen_loss_total"])
    ts = []
    for i in range(12):
        t0 = time.perf_counter()
        holder["s"], m = step(holder["s"], batch, keys[i % 16])
        float(m["gen_loss_total"])
        ts.append(time.perf_counter() - t0)
    return round(float(np.median(ts[2:])) * 1e3, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=2)
    ap.add_argument("--T", type=int, default=500)
    ap.add_argument("--bf16", action="store_true")
    a = ap.parse_args()
    _cache()
    for tiled in (False, True):
        cfg = dataclasses.replace(
            Vec2WavConfig(), msd_tiled_conv=tiled,
            compute_dtype="bfloat16" if a.bf16 else "float32")
        ms = run(cfg, a.B, a.T)
        print(json.dumps({"msd_tiled_conv": tiled, "B": a.B, "T": a.T,
                          "bf16": a.bf16, "full_step_ms": ms}), flush=True)


if __name__ == "__main__":
    main()
