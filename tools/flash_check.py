"""On-chip check + benchmark for the flash-attention FFT path.

Runs the full-size Text2Vec eval branch (deterministic) with
flash_attention on/off on identical inputs and params, asserts the outputs
agree, and times both, plus a train-step timing at a long frame bucket.
(The flash path falls back to dense on CPU, so this must run on the TPU.)
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

from wavthruvec_pytorch_tpu.config import Text2VecConfig
from wavthruvec_pytorch_tpu.models import Text2Vec


def _cache():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _median_time(fn, n=12):
    for _ in range(2):
        fn(jnp.float32(0.0))
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        float(fn(jnp.float32(i) * 1e-20))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    _cache()
    assert jax.devices()[0].platform == "tpu", jax.devices()
    B, N, T = 8, 64, 1024
    cfg_dense = Text2VecConfig()
    cfg_flash = dataclasses.replace(cfg_dense, flash_attention=True)

    rng = jax.random.PRNGKey(0)
    r1, r2 = jax.random.split(rng)
    src_seq = jnp.concatenate(
        [jax.random.randint(r1, (B, N - 4), 4, cfg_dense.vocab_size),
         jnp.zeros((B, 4), jnp.int32)], axis=1)
    src_pos = jnp.where(src_seq != 0, jnp.arange(1, N + 1, dtype=jnp.int32)[None], 0)
    ref = jax.random.normal(r2, (B, 128, cfg_dense.n_feat_dim)) * 0.1

    model_d = Text2Vec(cfg_dense)
    model_f = Text2Vec(cfg_flash)
    variables = jax.jit(
        lambda k1, k2: model_d.init(
            {"params": k1, "dropout": k2}, src_seq, src_pos, ref, T, 1.0,
            method=Text2Vec.infer)
    )(r1, r2)

    def make_fn(model):
        @jax.jit
        def fn(v, eps):
            out = model.apply(v, src_seq, src_pos, ref + eps, T, 1.0,
                              method=Text2Vec.infer)
            return out["feat_postnet_output"]

        return fn

    fn_d, fn_f = make_fn(model_d), make_fn(model_f)
    out_d = np.asarray(fn_d(variables, jnp.float32(0.0)))
    out_f = np.asarray(fn_f(variables, jnp.float32(0.0)))
    err = float(np.abs(out_d - out_f).max())
    rel = err / max(float(np.abs(out_d).max()), 1e-9)
    print(json.dumps({"check": "flash_vs_dense_infer", "B": B, "T": T,
                      "max_abs_err": err, "rel": rel}), flush=True)
    assert rel < 5e-3, (err, rel)

    def make_scalar(model):
        @jax.jit
        def g(v, eps):
            out = model.apply(v, src_seq, src_pos, ref + eps, T, 1.0,
                              method=Text2Vec.infer)
            return jnp.sum(out["feat_postnet_output"][:, ::64, 0])

        return g

    s_d, s_f = make_scalar(model_d), make_scalar(model_f)
    t_d = _median_time(lambda e: s_d(variables, e))
    t_f = _median_time(lambda e: s_f(variables, e))
    print(json.dumps({"bench": "t2v_infer_T1024_B8",
                      "dense_ms": round(t_d * 1e3, 2),
                      "flash_ms": round(t_f * 1e3, 2)}), flush=True)

    # train step at the 2048-frame bucket, flash vs dense+remat
    from wavthruvec_pytorch_tpu.infer.train_bench import bench_t2v

    for dt, rm, fl in (("float32", True, False), ("float32", False, True)):
        r = bench_t2v(B=16, T=2048, dtype=dt, remat=rm, flash=fl)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
