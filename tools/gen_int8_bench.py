"""Weight-only int8 generator experiment for serving density.

The vocoder conv tail is bandwidth-bound (BENCH_NOTES: fused-ResBlock gains
collapse in context; bf16 compute was a wash), so the candidate win is
shrinking WEIGHT HBM traffic: store every conv/dense kernel as int8 with a
per-output-channel scale and dequantize in-graph (XLA fuses the dequant into
the conv's weight read).  Math stays f32 (or bf16) — this is weight
compression, not int8 arithmetic.

Reports time at the headline shape (B=1, 500 frames -> 10 s audio) plus
fidelity drift vs the f32 folded baseline (max abs, log-mel L1).
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


def quantize_tree(params):
    """Split params into (kernels as int8 / rest as f32, per-channel scales).

    Kernels (ndim >= 2, leaf name 'kernel' or 'v') get symmetric
    per-output-channel (last axis) int8; everything else passes through
    unchanged with a dummy scalar scale.
    """

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    q_leaves, s_leaves = [], []
    for path, leaf in flat:
        name = path[-1].key if hasattr(path[-1], "key") else ""
        leaf = np.asarray(leaf)
        if name in ("kernel", "v") and leaf.ndim >= 2:
            axes = tuple(range(leaf.ndim - 1))
            amax = np.abs(leaf).max(axis=axes, keepdims=True)
            scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
            q = np.clip(np.round(leaf / scale), -127, 127).astype(np.int8)
            q_leaves.append(q)
            s_leaves.append(scale)
        else:
            q_leaves.append(leaf.astype(np.float32))
            s_leaves.append(np.float32(0.0))
    return (jax.tree_util.tree_unflatten(treedef, q_leaves),
            jax.tree_util.tree_unflatten(treedef, s_leaves))


def dequantize_tree(qparams, scales, dtype=jnp.float32):
    def deq(q, s):
        if q.dtype == jnp.int8:
            return q.astype(dtype) * s.astype(dtype)
        return q

    return jax.tree_util.tree_map(deq, qparams, scales)


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
    # device-resident (host numpy trees re-upload per timed call)
    folded_vars = jax.tree_util.tree_map(
        jnp.asarray, dict(variables, params=folded_params))
    gen_f = Generator(cfg, folded=True)
    gen_bf = Generator(cfg, folded=True, dtype=jnp.bfloat16)

    qparams, scales = quantize_tree(folded_params)
    qparams = jax.tree_util.tree_map(jnp.asarray, qparams)
    scales = jax.tree_util.tree_map(jnp.asarray, scales)
    extra = {k: v for k, v in folded_vars.items() if k != "params"}

    @jax.jit
    def null(eps):
        return eps * 2.0

    overhead = _t(null)
    res = {"overhead_ms": round(overhead * 1e3, 2)}

    # every jitted fn takes the param trees as ARGUMENTS (closed-over trees
    # would inline as HLO literals and blow the compile-transport cap)
    def apply_f32(v, eps):
        return gen_f.apply(v, latents + eps, spk, noise, train=False)

    def apply_int8(q, s, eps):
        params = dequantize_tree(q, s)
        return gen_f.apply(dict(extra, params=params), latents + eps, spk,
                           noise, train=False)

    def apply_int8_bf16(q, s, eps):
        params = dequantize_tree(q, s, jnp.bfloat16)
        return gen_bf.apply(dict(extra, params=params), latents + eps, spk,
                            noise, train=False).astype(jnp.float32)

    def scalar(wav):
        return jnp.sum(wav[:, ::1024, 0])

    cases = {
        "folded_f32": (jax.jit(apply_f32),
                       jax.jit(lambda v, e: scalar(apply_f32(v, e))),
                       (folded_vars,)),
        "int8_weights_f32_math": (
            jax.jit(apply_int8),
            jax.jit(lambda q, s, e: scalar(apply_int8(q, s, e))),
            (qparams, scales)),
        "int8_weights_bf16_math": (
            jax.jit(apply_int8_bf16),
            jax.jit(lambda q, s, e: scalar(apply_int8_bf16(q, s, e))),
            (qparams, scales)),
    }

    wav_ref = mel_ref = None
    for name, (wav_fn, s_fn, args) in cases.items():
        wav = np.asarray(wav_fn(*args, jnp.float32(0.0)), np.float32)[..., 0]
        mel = np.asarray(mel_spectrogram(
            jnp.asarray(wav), cfg.n_fft, cfg.num_mels, cfg.sampling_rate,
            cfg.hop_size, cfg.win_size, cfg.fmin, cfg.fmax_for_loss))
        ms = (_t(lambda e: s_fn(*args, e)) - overhead) * 1e3
        entry = {"ms": round(ms, 2)}
        if wav_ref is None:
            wav_ref, mel_ref = wav, mel
        else:
            entry["max_abs_drift"] = float(np.abs(wav - wav_ref).max())
            entry["mel_l1"] = float(np.abs(mel - mel_ref).mean())
        res[name] = entry
        print(json.dumps({name: entry}), flush=True)

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main(B=int(sys.argv[1]) if len(sys.argv) > 1 else 1,
         T=int(sys.argv[2]) if len(sys.argv) > 2 else 500)
