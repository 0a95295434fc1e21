"""Where do the batch-1 e2e inference milliseconds go?

Times each leg of the text->wav pipeline standalone at the bench shape
(B=1, N=32 text, 500 latent frames -> 10 s of 16 kHz audio), scalar-fetch
methodology with null-program overhead subtracted (see bench.py notes).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wavthruvec_pytorch_tpu.config import Text2VecConfig, Vec2WavConfig
from wavthruvec_pytorch_tpu.models import Generator, Text2Vec
from wavthruvec_pytorch_tpu.models.cbhg import CBHG
from wavthruvec_pytorch_tpu.models.layers import BiGRU


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


def main(B=1, N=32, T=500):
    _cache()
    t2v_cfg = Text2VecConfig()
    v2w_cfg = Vec2WavConfig()
    t2v = Text2Vec(t2v_cfg)
    gen = Generator(v2w_cfg)
    rng = jax.random.PRNGKey(0)
    r1, r2, r3 = jax.random.split(rng, 3)

    src_seq = jnp.concatenate(
        [jax.random.randint(r1, (B, N - 2), 4, t2v_cfg.vocab_size),
         jnp.zeros((B, 2), jnp.int32)], axis=1)
    src_pos = jnp.where(
        src_seq != 0, jnp.arange(1, N + 1, dtype=jnp.int32)[None], 0)
    ref_feat = jax.random.normal(r2, (B, 128, t2v_cfg.n_feat_dim)) * 0.1
    t2v_vars = jax.jit(
        lambda k1, k2: t2v.init({"params": k1, "dropout": k2}, src_seq,
                                src_pos, ref_feat, T, 1.0,
                                method=Text2Vec.infer))(r1, r2)
    spk = jax.random.normal(r3, (B, v2w_cfg.spk_dim))
    noise = jax.random.normal(r3, (B, v2w_cfg.noise_dim))
    latents = jax.random.normal(r3, (B, T, v2w_cfg.n_feat_dim)) * 0.1
    gen_vars = jax.jit(lambda k: gen.init(k, latents, spk, noise,
                                          train=False))(r3)

    @jax.jit
    def null(eps):
        return eps * 2.0

    overhead = _t(null)
    res = {"overhead_ms": round(overhead * 1e3, 2)}

    @jax.jit
    def _t2v_full(v, eps):
        out = t2v.apply(v, src_seq, src_pos, ref_feat + eps, T, 1.0,
                        method=Text2Vec.infer)
        return jnp.sum(out["feat_postnet_output"][:, ::64, ::64])

    t2v_full = lambda eps: _t2v_full(t2v_vars, eps)

    @jax.jit
    def _spk_emb(v, eps):
        e = t2v.apply(v, ref_feat + eps, method=Text2Vec.speaker_embedding)
        return jnp.sum(e)

    spk_emb = lambda eps: _spk_emb(t2v_vars, eps)

    # infer with precomputed speaker embedding (serving fast path)
    spk_e = t2v.apply(t2v_vars, ref_feat, method=Text2Vec.speaker_embedding)

    @jax.jit
    def _t2v_fast(v, eps):
        out = t2v.apply(v, src_seq, src_pos, None, T, 1.0,
                        spk_e + eps, method=Text2Vec.infer)
        return jnp.sum(out["feat_postnet_output"][:, ::64, ::64])

    t2v_fast = lambda eps: _t2v_fast(t2v_vars, eps)

    @jax.jit
    def _gen_fwd(v, eps):
        wav = gen.apply(v, latents + eps, spk, noise, train=False)
        return jnp.sum(wav[:, ::1024, 0])

    gen_fwd = lambda eps: _gen_fwd(gen_vars, eps)

    # CBHG standalone at the decoder-output shape
    cbhg = CBHG(in_dim=t2v_cfg.n_feat_dim)
    x_cb = jax.random.normal(r2, (B, T, t2v_cfg.n_feat_dim)) * 0.1
    cb_vars = jax.jit(
        lambda k: cbhg.init(k, x_cb, train=False))(r2)

    @jax.jit
    def _cbhg_fwd(v, eps):
        y = cbhg.apply(v, x_cb + eps, train=False)
        return jnp.sum(y[:, ::64, ::64])

    cbhg_fwd = lambda eps: _cbhg_fwd(cb_vars, eps)

    # BiGRU standalone at the CBHG shape (input 1024 -> 2x1024)
    big = BiGRU(hidden=1024)
    x_g = jax.random.normal(r2, (B, T, 1024)) * 0.1
    g_vars = jax.jit(lambda k: big.init(k, x_g))(r2)

    @jax.jit
    def _gru_fwd(v, eps):
        y = big.apply(v, x_g + eps)
        return jnp.sum(y[:, ::64, ::64])

    gru_fwd = lambda eps: _gru_fwd(g_vars, eps)

    for name, fn in [("t2v_full", t2v_full), ("t2v_fastpath", t2v_fast),
                     ("spk_emb_ecapa", spk_emb), ("generator", gen_fwd),
                     ("cbhg", cbhg_fwd), ("bigru", gru_fwd)]:
        res[f"{name}_ms"] = round((_t(fn) - overhead) * 1e3, 2)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
