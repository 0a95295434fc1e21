"""Generator inference variants at the headline-bench shape (B=1, 500
frames -> 10 s audio): baseline vs folded weight-norm vs bf16 vs fused.

Also reports output drift of each variant vs the f32 baseline (max abs and
log-mel L1 — the fidelity currency of the vocoder).

Interpretation caveat measured 2026-08-17: the RANDOM-INIT full-size
generator saturates tanh on 99.9% of samples (mean |y| = 0.9997), and TPU
conv default precision rounds inputs to bf16 — so ANY graph change (incl.
pure algebraic folding, proven exact on CPU at atol 1e-5 and bit-exact on
TPU at the small config) flips signs of near-rail samples and "max_abs
drift" hits 2.0.  mel_l1 across variants (~0.13-0.15 on rail-to-rail
noise audio) is the bf16-rounding floor, not a folding error.  All param
trees must be device-resident before timing (host numpy trees re-upload
~56 MB per call through the axon tunnel: 2.2 s/call artifact).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wavthruvec_pytorch_tpu.config import Vec2WavConfig
from wavthruvec_pytorch_tpu.models import Generator
from wavthruvec_pytorch_tpu.models.vec2wav import fold_weight_norm
from wavthruvec_pytorch_tpu.ops.stft import mel_spectrogram


def _cache():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _t(fn, iters=12):
    for _ in range(3):
        float(fn(jnp.float32(0.0)))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(jnp.float32(i) * 1e-20))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main(B=1, T=500):
    _cache()
    cfg = Vec2WavConfig()
    r = jax.random.PRNGKey(0)
    r1, r2, r3 = jax.random.split(r, 3)
    latents = jax.random.normal(r1, (B, T, cfg.n_feat_dim)) * 0.1
    spk = jax.random.normal(r2, (B, cfg.spk_dim))
    noise = jax.random.normal(r3, (B, cfg.noise_dim))

    base = Generator(cfg)
    variables = jax.jit(
        lambda k: base.init(k, latents, spk, noise, train=False))(r1)
    folded_params = fold_weight_norm(
        jax.tree_util.tree_map(np.asarray, variables["params"]))
    # device-resident trees (host numpy would re-upload per timed call)
    folded_vars = jax.tree_util.tree_map(
        jnp.asarray, dict(variables, params=folded_params))
    # bf16-STORED params: halves weight HBM traffic, not just compute dtype
    folded_vars_bf16 = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.bfloat16)
        if x.dtype == np.float32 else jnp.asarray(x),
        dict(variables, params=folded_params))

    variants = {
        "baseline_f32": (Generator(cfg), variables),
        "folded_f32": (Generator(cfg, folded=True), folded_vars),
        "folded_bf16_stored": (
            Generator(cfg, folded=True, dtype=jnp.bfloat16),
            folded_vars_bf16),
    }

    @jax.jit
    def null(eps):
        return eps * 2.0

    overhead = _t(null)
    res = {"overhead_ms": round(overhead * 1e3, 2)}

    def wav_of(mod, v):
        f = jax.jit(lambda vv, eps: mod.apply(
            vv, latents + eps, spk, noise, train=False))
        return np.asarray(f(v, jnp.float32(0.0)), np.float32)[..., 0]

    ref_wav = wav_of(*variants["baseline_f32"])
    mel_ref = np.asarray(mel_spectrogram(
        jnp.asarray(ref_wav), cfg.n_fft, cfg.num_mels, cfg.sampling_rate,
        cfg.hop_size, cfg.win_size, cfg.fmin, cfg.fmax_for_loss))

    for name, (mod, v) in variants.items():
        f = jax.jit(lambda vv, eps: jnp.sum(
            mod.apply(vv, latents + eps, spk, noise, train=False)[:, ::1024, 0]))
        ms = (_t(lambda e: f(v, e)) - overhead) * 1e3
        wav = wav_of(mod, v)
        mel = np.asarray(mel_spectrogram(
            jnp.asarray(wav), cfg.n_fft, cfg.num_mels, cfg.sampling_rate,
            cfg.hop_size, cfg.win_size, cfg.fmin, cfg.fmax_for_loss))
        res[name] = {
            "ms": round(ms, 2),
            "max_abs_drift": float(np.abs(wav - ref_wav).max()),
            "mel_l1": float(np.abs(mel - mel_ref).mean()),
        }
        print(json.dumps({name: res[name]}), flush=True)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main(B=int(sys.argv[1]) if len(sys.argv) > 1 else 1,
         T=int(sys.argv[2]) if len(sys.argv) > 2 else 500)
