"""Memory headroom of the flash-attention FFT path at long frame buckets.

For the full Text2Vec train step at T in {2048, 3072}, compiles three
variants — dense, dense+remat (the pre-flash long-bucket recipe), flash
(no remat) — and prints XLA's compiled memory analysis (temp allocation =
activation/workspace HBM) plus live step timings for the flash variant at
T=3072 (the bucket that replaces the reference's 3000 cap when flash is
enabled; 3000 itself is not a multiple of 128 so the kernel falls back).
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
from wavthruvec_pytorch_tpu.train import text2vec_train as t2v


def _cache():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_batch(cfg, B, N, T, seed=0):
    rng = np.random.default_rng(seed)
    batch = t2v.make_padded_batch(
        [
            {
                "text_enc": rng.integers(4, 200, size=N).astype(np.int32),
                "feat_gt_target": rng.standard_normal(
                    (T, cfg.n_feat_dim)).astype(np.float32) * 0.1,
                "attn_prior": np.full((T, N), 1.0 / N, np.float32),
            }
            for _ in range(B)
        ],
        cfg, text_pad=N, frame_pad=T,
    )
    return {k: jnp.asarray(v) for k, v in batch.items() if k != "audiopaths"}


def mem_for(cfg, B, N, T):
    batch = make_batch(cfg, B, N, T)
    model, state = t2v.init_state(cfg, jax.random.PRNGKey(0), batch)
    step, _ = t2v.make_train_step(model, cfg)
    lowered = step.lower(state, batch, jax.random.PRNGKey(1))
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    return {
        "temp_MB": round(ma.temp_size_in_bytes / 2**20),
        "args_MB": round(ma.argument_size_in_bytes / 2**20),
        "output_MB": round(ma.output_size_in_bytes / 2**20),
    }, (step, state, batch)


def main(B=16, N=64):
    _cache()
    assert jax.devices()[0].platform == "tpu", jax.devices()
    base = Text2VecConfig()
    variants = {
        "dense": base,
        "dense_remat": dataclasses.replace(base, remat=True),
        "flash": dataclasses.replace(base, flash_attention=True),
    }
    out = {}
    live = None
    for T in (2048, 3072):
        for name, cfg in variants.items():
            try:
                mem, handles = mem_for(cfg, B, N, T)
                out[f"T{T}_{name}"] = mem
                if T == 3072 and name == "flash":
                    live = handles
            except Exception as e:  # OOM at compile/alloc is a result too
                out[f"T{T}_{name}"] = {"error": type(e).__name__, "msg": str(e)[:120]}
            print(json.dumps({k: v for k, v in out.items()}), flush=True)

    if live is not None:
        step, state, batch = live
        keys = [jax.random.PRNGKey(i) for i in range(8)]
        holder = {"s": state}
        holder["s"], m = step(holder["s"], batch, keys[0])
        loss0 = float(m["total_loss"])
        ts = []
        for i in range(10):
            t0 = time.perf_counter()
            holder["s"], m = step(holder["s"], batch, keys[i % 8])
            loss = float(m["total_loss"])
            ts.append(time.perf_counter() - t0)
        print(json.dumps({
            "flash_T3072_step_ms": round(float(np.median(ts[2:])) * 1e3, 1),
            "loss_first": round(loss0, 4),
            "loss_last": round(loss, 4),
            "finite": bool(np.isfinite(loss)),
        }), flush=True)


if __name__ == "__main__":
    main()
