"""RTF / throughput harness: x-realtime and utterances/sec/chip across batch
sizes (the BASELINE.md metric; the reference's timing loop is commented out
at text2vec/eval.py:131-138 — this is the active version).

    python -m wavthruvec_pytorch_tpu.infer.rtf_bench [--batch-sizes 1 4 8]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run(batch_sizes=(1, 4, 8), n_frames: int = 500, iters: int = 16):
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

    results = []
    for B in batch_sizes:
        r1, r2, r3 = jax.random.split(jax.random.fold_in(rng, B), 3)
        src_seq = jnp.concatenate(
            [jax.random.randint(r1, (B, N - 2), 4, t2v_cfg.vocab_size),
             jnp.zeros((B, 2), jnp.int32)], axis=1)
        src_pos = jnp.where(
            src_seq != 0, jnp.arange(1, N + 1, dtype=jnp.int32)[None], 0
        )
        ref_feat = jax.random.normal(r2, (B, REF_T, t2v_cfg.n_feat_dim)) * 0.1
        t2v_vars = jax.jit(
            lambda k1, k2: t2v.init({"params": k1, "dropout": k2}, src_seq,
                                    src_pos, ref_feat, n_frames, 1.0,
                                    method=Text2Vec.infer)
        )(r1, r2)
        spk = jax.random.normal(r3, (B, v2w_cfg.spk_dim))
        noise = jax.random.normal(r3, (B, v2w_cfg.noise_dim))
        latents0 = jnp.zeros((B, n_frames, v2w_cfg.n_feat_dim))
        gen_vars = jax.jit(
            lambda k: gen.init(k, latents0, spk, noise, train=False)
        )(r3)

        @jax.jit
        def _pipe(tv, gv, eps):
            out = t2v.apply(tv, src_seq, src_pos, ref_feat + eps,
                            n_frames, 1.0, method=Text2Vec.infer)
            wav = gen.apply(gv, out["feat_postnet_output"], spk,
                            noise + eps, train=False)
            return jnp.sum(wav[:, ::1024, 0])

        def pipe_scalar(eps):
            return _pipe(t2v_vars, gen_vars, eps)

        @jax.jit
        def null_scalar(eps):
            return eps * 2.0

        eps_list = [jnp.float32(i) * 1e-20 for i in range(iters)]
        for e in eps_list[:3]:
            float(pipe_scalar(e)), float(null_scalar(e))
        ov, ts = [], []
        for e in eps_list[3:]:
            t0 = time.perf_counter(); float(null_scalar(e)); t1 = time.perf_counter()
            float(pipe_scalar(e)); t2 = time.perf_counter()
            ov.append(t1 - t0)
            ts.append(t2 - t1)
        per_call = max(float(np.median(ts)) - float(np.median(ov)), 1e-9)
        audio_s = B * n_frames * v2w_cfg.total_upsample / v2w_cfg.sampling_rate
        results.append(
            {
                "batch": B,
                "x_realtime": round(audio_s / per_call, 2),
                "utt_per_sec": round(B / per_call, 2),
                "ms_per_batch": round(per_call * 1000, 3),
            }
        )
        print(json.dumps(results[-1]))
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch-sizes", type=int, nargs="+", default=[1, 4, 8])
    p.add_argument("--frames", type=int, default=500)
    a = p.parse_args()
    run(tuple(a.batch_sizes), a.frames)
