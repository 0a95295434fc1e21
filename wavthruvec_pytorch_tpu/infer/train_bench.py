"""Training-step benchmark on one TPU chip (BASELINE.md configs 4 & 5):
Text2Vec step (MAS + beta-binomial prior path) and Vec2Wav GAN step.

    python -m wavthruvec_pytorch_tpu.infer.train_bench [--stage t2v|v2w|both]

Timing uses the scalar-fetch methodology (see bench.py; block_until_ready is
a no-op on this runtime).  States/batches are explicit jit args.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _cache():
    import jax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # force + mark device acquisition so supervising wrappers can tell an
    # acquisition hang (~50% of fresh axon launches) from a slow compile
    print("devices:", jax.devices(), file=sys.stderr, flush=True)


def _timeit(run_once, iters=10):
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        run_once(i)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts[2:]))


def bench_t2v(B=16, N=64, T=1024, dtype="float32", remat=False, flash=False,
              dropout=None, prng="threefry2x32"):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from wavthruvec_pytorch_tpu.config import Text2VecConfig
    from wavthruvec_pytorch_tpu.train import text2vec_train as t2v

    cfg = dataclasses.replace(
        Text2VecConfig(), compute_dtype=dtype, remat=remat,
        flash_attention=flash, dropout_prng_impl=prng,
    )
    if dropout is not None:
        cfg = dataclasses.replace(cfg, dropout=dropout)
    rng = np.random.default_rng(0)
    items = []
    for i in range(B):
        n = int(rng.integers(N // 2, N + 1))
        t = int(rng.integers(T // 2, T + 1))
        items.append({
            "text_enc": rng.integers(1, cfg.vocab_size, n),
            "feat_gt_target": rng.standard_normal((t, cfg.n_feat_dim)).astype(np.float32),
            "attn_prior": (rng.random((t, n)) + 0.05).astype(np.float32),
        })
    batch = t2v.make_padded_batch(items, cfg, text_pad=N, frame_pad=T)
    batch.pop("audiopaths")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model, state = t2v.init_state(cfg, jax.random.PRNGKey(0), batch)
    step, _ = t2v.make_train_step(model, cfg)

    # warm/compile; consume state functionally. NOTE: step donates the state.
    keys = [jax.random.key(i, impl=cfg.dropout_prng_impl) for i in range(16)]
    state, m = step(state, batch, keys[0])
    float(m["total_loss"])

    holder = {"state": state}

    def once(i):
        holder["state"], m = step(holder["state"], batch, keys[i % 16])
        float(m["total_loss"])  # forces completion

    dt = _timeit(once)
    mem = {}
    try:  # peak HBM (the flash-vs-dense long-bucket story)
        stats = jax.devices()[0].memory_stats() or {}
        for k in ("peak_bytes_in_use", "bytes_in_use", "bytes_limit"):
            if k in stats:
                mem[k + "_gb"] = round(stats[k] / 2**30, 2)
    except Exception:
        pass
    return {
        "stage": "text2vec_train_step",
        "batch": B, "text_pad": N, "frame_pad": T,
        "dtype": dtype, "remat": remat, "flash": flash,
        "dropout": cfg.dropout, "prng": prng,
        "sec_per_step": round(dt, 4),
        "steps_per_sec": round(1.0 / dt, 3),
        **mem,
    }


def sweep_t2v():
    """t2v training throughput levers: bf16 compute, remat, batch size."""
    out = []
    for B, T, dt, rm in [
        (16, 1024, "float32", False),   # round-1 baseline shape
        (16, 1024, "bfloat16", False),
        (32, 1024, "float32", False),
        (32, 1024, "bfloat16", False),
        (16, 2048, "bfloat16", True),
    ]:
        r = bench_t2v(B=B, T=T, dtype=dt, remat=rm)
        print(json.dumps(r), flush=True)
        out.append(r)
    return out


def bench_v2w(B=2, T=256, dtype="float32"):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from wavthruvec_pytorch_tpu.config import Vec2WavConfig
    from wavthruvec_pytorch_tpu.ops.stft import mel_spectrogram
    from wavthruvec_pytorch_tpu.train import vec2wav_train as v2w

    cfg = dataclasses.replace(Vec2WavConfig(), compute_dtype=dtype)
    rng = np.random.default_rng(0)
    L = T * cfg.total_upsample
    audio = (rng.standard_normal((B, L, 1)) * 0.1).astype(np.float32)
    mel = np.asarray(
        mel_spectrogram(jnp.asarray(audio[..., 0]), cfg.n_fft, cfg.num_mels,
                        cfg.sampling_rate, cfg.hop_size, cfg.win_size,
                        cfg.fmin, cfg.fmax_for_loss)
    ).transpose(0, 2, 1)
    batch = {
        "wv_feat": jnp.asarray(rng.standard_normal((B, T, cfg.n_feat_dim)), jnp.float32),
        "spk_emb": jnp.asarray(rng.standard_normal((B, cfg.spk_dim)), jnp.float32),
        "audio": jnp.asarray(audio),
        "mel_loss": jnp.asarray(mel),
    }
    models, state = v2w.init_state(cfg, jax.random.PRNGKey(0), batch)
    step, _ = v2w.make_train_step(models, cfg)
    keys = [jax.random.PRNGKey(i) for i in range(16)]
    state, m = step(state, batch, keys[0])
    float(m["gen_loss_total"])
    holder = {"state": state}

    def once(i):
        holder["state"], m = step(holder["state"], batch, keys[i % 16])
        float(m["gen_loss_total"])

    dt = _timeit(once)
    audio_sec = B * L / cfg.sampling_rate
    return {
        "stage": "vec2wav_gan_train_step",
        "batch": B, "frames": T, "dtype": dtype,
        "sec_per_step": round(dt, 4),
        "audio_sec_per_sec": round(audio_sec / dt, 2),
    }


def sweep_v2w():
    """GAN-training throughput levers: full-utterance vs feature-space
    windowed mode (8192//320 = 25 frames), batch scaling, bf16."""
    seg_frames = 8192 // 320
    out = []
    for B, T, dt in [
        (2, 256, "float32"),      # reference-shaped default
        (8, 256, "float32"),      # full-utterance, bigger batch
        (8, seg_frames, "float32"),
        (16, seg_frames, "float32"),
        (32, seg_frames, "float32"),
        (64, seg_frames, "float32"),
        (16, seg_frames, "bfloat16"),
        (64, seg_frames, "bfloat16"),
        (8, 256, "bfloat16"),
    ]:
        r = bench_v2w(B, T, dt)
        print(json.dumps(r), flush=True)
        out.append(r)
    return out


def sweep_t2v_flash():
    """Long-bucket (3072-frame) training step, flash vs dense, + peak HBM.

    dropout=0.0 on every row: the flash kernel cannot apply attention-prob
    dropout (hard-erroring guard, models/fft_block.py), so the apples-to-
    apples comparison holds math constant across rows.  NOTE: each config
    is a separate PROCESS-level peak; run rows independently for clean
    memory numbers (this sweep reports in-process peaks, which are upper
    bounds for later rows)."""
    out = []
    for B, T, dt, rm, fl in [
        (16, 3072, "bfloat16", False, False),
        (16, 3072, "bfloat16", False, True),
        (16, 3072, "bfloat16", True, True),
    ]:
        try:
            r = bench_t2v(B=B, T=T, dtype=dt, remat=rm, flash=fl, dropout=0.0)
        except Exception as e:  # OOM is a result, not a failure
            r = {"stage": "text2vec_train_step", "batch": B, "frame_pad": T,
                 "dtype": dt, "remat": rm, "flash": fl,
                 "error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(json.dumps(r), flush=True)
        out.append(r)
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="both",
                   choices=["t2v", "v2w", "both", "v2w-sweep", "t2v-sweep",
                            "t2v-flash"])
    p.add_argument("--B", type=int, default=None)
    p.add_argument("--T", type=int, default=None)
    p.add_argument("--flash", action="store_true")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--dtype", default=None)
    p.add_argument("--dropout0", action="store_true",
                   help="zero attention/ffn dropout (flash rows force this; "
                        "pass it on dense rows for apples-to-apples)")
    p.add_argument("--prng", default="threefry2x32",
                   choices=["threefry2x32", "rbg"],
                   help="dropout-key PRNG impl (Text2VecConfig.dropout_prng_impl)")
    a = p.parse_args()
    _cache()
    if a.stage == "t2v" and (a.B or a.T or a.flash or a.dtype or a.remat
                             or a.dropout0 or a.prng != "threefry2x32"):
        print(json.dumps(bench_t2v(
            B=a.B or 16, T=a.T or 1024, dtype=a.dtype or "float32",
            remat=a.remat, flash=a.flash, prng=a.prng,
            dropout=0.0 if (a.flash or a.dropout0) else None)))
        sys.exit(0)
    if a.stage in ("t2v", "both"):
        print(json.dumps(bench_t2v()))
    if a.stage in ("v2w", "both"):
        print(json.dumps(bench_v2w()))
    if a.stage == "v2w-sweep":
        sweep_v2w()
    if a.stage == "t2v-sweep":
        sweep_t2v()
    if a.stage == "t2v-flash":
        sweep_t2v_flash()
