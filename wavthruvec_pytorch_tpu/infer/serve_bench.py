"""Serving benchmark: e2e text->wav latency/throughput across batch sizes,
with leg breakdown (speaker-ECAPA / Text2Vec / vocoder) and the cached
speaker-embedding fast path.

    python -m wavthruvec_pytorch_tpu.infer.serve_bench [--batches 1,8,16,32]

Chained-dispatch timing methodology (see bench.py and BENCH_NOTES "Timing
methodology correction"): every timed program returns a scalar, iterations
are folded into a device accumulator and fetched ONCE, and a null-program
chain is subtracted as submit cost — per-call fetch roundtrips drift +-5 ms
on this runtime and would otherwise be charged to the model (they made
sub-10 ms legs read optimistically low).  Params are explicit jit
arguments (closures blow the remote-compile transport cap).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

N_FRAMES = 500  # 10 s of 16 kHz audio at x320


def _cache():
    import jax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _median_time(fn, args_list, warmup=3):
    """Chained per-call time: queue all dispatches (scalars folded into a
    device accumulator), fetch once, divide."""
    for a in args_list[:warmup]:
        s = fn(a)
        float(s + s)  # warm the scalar-accumulate program too
    chain = args_list[warmup:]
    t0 = time.perf_counter()
    acc = None
    for a in chain:
        s = fn(a)
        acc = s if acc is None else acc + s
    float(acc)
    return (time.perf_counter() - t0) / len(chain)


def run(batches, iters=24, gen_precision="f32"):
    import jax
    import jax.numpy as jnp

    from wavthruvec_pytorch_tpu.config import Text2VecConfig, Vec2WavConfig
    from wavthruvec_pytorch_tpu.models import Generator, Text2Vec

    t2v_cfg = Text2VecConfig()
    v2w_cfg = Vec2WavConfig()
    N, REF_T = 32, 128
    t2v = Text2Vec(t2v_cfg)
    gen = Generator(v2w_cfg)
    rng = jax.random.PRNGKey(0)
    r1, r2, r3 = jax.random.split(rng, 3)

    def make_inputs(B):
        src_seq = jnp.concatenate(
            [jax.random.randint(r1, (B, N - 2), 4, t2v_cfg.vocab_size),
             jnp.zeros((B, 2), jnp.int32)], axis=1)
        src_pos = jnp.where(
            src_seq != 0, jnp.arange(1, N + 1, dtype=jnp.int32)[None], 0)
        ref = jax.random.normal(r2, (B, REF_T, t2v_cfg.n_feat_dim)) * 0.1
        spk = jax.random.normal(r3, (B, v2w_cfg.spk_dim))
        noise = jax.random.normal(r3, (B, v2w_cfg.noise_dim))
        return src_seq, src_pos, ref, spk, noise

    src1, pos1, ref1, spk1, noise1 = make_inputs(1)
    t2v_vars = jax.jit(
        lambda k1, k2: t2v.init({"params": k1, "dropout": k2}, src1, pos1,
                                ref1, N_FRAMES, 1.0, method=Text2Vec.infer)
    )(r1, r2)
    gen_vars = jax.jit(
        lambda k: gen.init(k, jnp.zeros((1, N_FRAMES, v2w_cfg.n_feat_dim)),
                           spk1, noise1, train=False)
    )(r3)
    if gen_precision != "f32":
        from wavthruvec_pytorch_tpu.infer.synthesize import make_serving_generator

        gen, gen_vars = make_serving_generator(v2w_cfg, gen_vars, gen_precision)

    @jax.jit
    def null_scalar(eps):
        return eps * 2.0

    eps_list = [jnp.float32(i) * 1e-20 for i in range(iters)]
    overhead = _median_time(null_scalar, eps_list)
    results = {"overhead_ms": round(overhead * 1e3, 3)}

    # --- leg breakdown at batch 1 ---
    @jax.jit
    def spk_scalar(tv, eps):
        e = t2v.apply(tv, ref1 + eps, method=Text2Vec.speaker_embedding)
        return jnp.sum(e)

    @jax.jit
    def t2v_fast_scalar(tv, se, eps):
        out = t2v.apply(tv, src1, pos1, None, N_FRAMES, 1.0, se + eps,
                        method=Text2Vec.infer)
        return jnp.sum(out["feat_postnet_output"][0, ::64, 0])

    @jax.jit
    def t2v_full_scalar(tv, eps):
        out = t2v.apply(tv, src1, pos1, ref1 + eps, N_FRAMES, 1.0,
                        method=Text2Vec.infer)
        return jnp.sum(out["feat_postnet_output"][0, ::64, 0])

    spk_emb1 = jax.jit(
        lambda tv: t2v.apply(tv, ref1, method=Text2Vec.speaker_embedding)
    )(t2v_vars)

    t_spk = max(_median_time(lambda e: spk_scalar(t2v_vars, e), eps_list) - overhead, 0)
    t_t2v_fast = max(
        _median_time(lambda e: t2v_fast_scalar(t2v_vars, spk_emb1, e), eps_list)
        - overhead, 0)
    t_t2v_full = max(
        _median_time(lambda e: t2v_full_scalar(t2v_vars, e), eps_list) - overhead, 0)
    results["legs_b1_ms"] = {
        "speaker_ecapa": round(t_spk * 1e3, 3),
        "t2v_with_cached_spk": round(t_t2v_fast * 1e3, 3),
        "t2v_with_ecapa": round(t_t2v_full * 1e3, 3),
    }
    print(json.dumps({"legs_b1_ms": results["legs_b1_ms"],
                      "overhead_ms": results["overhead_ms"]}), flush=True)

    # --- e2e across batches (cached spk emb fast path + full path) ---
    audio_sec_per_utt = N_FRAMES * v2w_cfg.total_upsample / v2w_cfg.sampling_rate
    table = []
    for B in batches:
        srcB, posB, refB, spkB, noiseB = make_inputs(B)
        spk_embB = jax.jit(
            lambda tv: t2v.apply(tv, refB, method=Text2Vec.speaker_embedding)
        )(t2v_vars)

        @jax.jit
        def e2e_fast(tv, gv, se, eps):
            out = t2v.apply(tv, srcB, posB, None, N_FRAMES, 1.0, se + eps,
                            method=Text2Vec.infer)
            wav = gen.apply(gv, out["feat_postnet_output"], spkB, noiseB + eps,
                            train=False)
            return jnp.sum(wav[:, ::1024, 0])

        @jax.jit
        def e2e_full(tv, gv, eps):
            out = t2v.apply(tv, srcB, posB, refB + eps, N_FRAMES, 1.0,
                            method=Text2Vec.infer)
            wav = gen.apply(gv, out["feat_postnet_output"], spkB, noiseB + eps,
                            train=False)
            return jnp.sum(wav[:, ::1024, 0])

        t_fast = max(
            _median_time(lambda e: e2e_fast(t2v_vars, gen_vars, spk_embB, e),
                         eps_list) - overhead, 1e-9)
        t_full = max(
            _median_time(lambda e: e2e_full(t2v_vars, gen_vars, e), eps_list)
            - overhead, 1e-9)
        row = {
            "batch": B,
            "e2e_ms_cached_spk": round(t_fast * 1e3, 2),
            "e2e_ms_full": round(t_full * 1e3, 2),
            "utt_per_sec_cached": round(B / t_fast, 1),
            "x_realtime_cached": round(B * audio_sec_per_utt / t_fast, 0),
        }
        table.append(row)
        print(json.dumps(row), flush=True)
    results["batches"] = table
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="1,8,16,32")
    p.add_argument("--gen_precision", choices=("f32", "bf16"), default="f32")
    a = p.parse_args()
    _cache()
    run([int(x) for x in a.batches.split(",")], gen_precision=a.gen_precision)
