"""Isolate host-side dispatch cost of the t2v production step: how much of
the chained 149 ms step is marshaling the 1126-leaf train state through the
runtime vs device compute (leaf count printed as ``n_leaves``).

Times, all chained (sequential dependence, one final fetch):
  * state identity: jitted f(state)->state with donation  (pure marshaling)
  * the production step (chained / fetch-each / deferred-fetch variants)

Output protocol: progress lines go to STDERR; stdout carries exactly ONE
JSON object (the final cumulative result) so consumers can json.loads the
whole stdout."""

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


def main(B=16, N=64, T=1024, n=10):
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = Text2VecConfig()
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
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
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "audiopaths"}
    model, state = t2v.init_state(cfg, key, batch)
    res = {"n_leaves": len(jax.tree_util.tree_leaves(state))}

    def chain_state(step_like, state, n=n, fetch=None):
        # warmup (also compiles)
        state, aux = step_like(state)
        _ = float(aux) if fetch is None else fetch(aux)
        t0 = time.perf_counter()
        for _ in range(n):
            state, aux = step_like(state)
        _ = float(aux) if fetch is None else fetch(aux)
        return (time.perf_counter() - t0) / n * 1e3, state

    # 1. identity with donation: marshaling only (device copy is ~free)
    ident = jax.jit(
        lambda s: (s, jnp.float32(0.0) + s.step), donate_argnums=(0,))
    ms, state = chain_state(ident, state)
    res["identity_state_ms"] = round(ms, 1)
    print(json.dumps(res), file=sys.stderr, flush=True)

    # 2. production step
    step, _ = t2v.make_train_step(model, cfg)
    ms, state = chain_state(
        lambda s: step(s, batch, key), state,
        fetch=lambda m: float(m["total_loss"]))
    res["full_step_chained_ms"] = round(ms, 1)
    print(json.dumps(res), file=sys.stderr, flush=True)

    # 3. production step, fetching metrics EVERY call (train_bench style).
    # The step donates its state argument, so every call must rebind.
    state2, m0 = step(state, batch, key)
    float(m0["total_loss"])
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        state2, m = step(state2, batch, jax.random.PRNGKey(i))
        float(m["total_loss"])
        ts.append(time.perf_counter() - t0)
    res["full_step_fetch_each_ms"] = round(float(np.median(ts)) * 1e3, 1)
    print(json.dumps(res), file=sys.stderr, flush=True)

    # 4. the production loop's new pattern: double-buffered emit (fetch
    # step i-1's metrics after dispatching step i)
    state3 = state2
    prev = None
    t0 = time.perf_counter()
    for i in range(n):
        state3, m = step(state3, batch, jax.random.PRNGKey(100 + i))
        if prev is not None:
            float(prev["total_loss"])
        prev = m
    float(prev["total_loss"])
    res["full_step_deferred_fetch_ms"] = round(
        (time.perf_counter() - t0) / n * 1e3, 1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
