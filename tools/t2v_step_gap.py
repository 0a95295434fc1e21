"""Locate the gap between the ablation's proxy fwd+bwd (~141 ms) and the
full Text2Vec train step (~184 ms) at B16/N64/T1024.

The round-2 ablation (tools/t2v_profile.py) timed ``loss_only`` = a SLICE of
the postnet output, which skips the real 4-term loss: the duration-MSE
backward (duration predictor + encoder), the binarization-loss backward
(ConvAttention + encoder via attn_soft), and the masked-MSE reductions.
This tool times, with the chained-dispatch methodology bench.py uses:

  1. proxy-loss fwd+bwd        (the old ablation number)
  2. real-loss fwd+bwd         (exact train-step loss_fn)
  3. real-loss fwd+bwd + clip/LAMB/apply (== full step minus viz)
  4. the production train step (donated state)

so each increment's cost falls out by difference.
"""

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
from wavthruvec_pytorch_tpu.models.losses import (
    attention_binarization_loss,
    dnn_loss,
)


def _cache():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # acquisition mark for hang-aware supervisors (see memory/tpu quirks)
    print("devices:", jax.devices(), file=sys.stderr, flush=True)


def _mark(msg):
    print(f"[gap +{time.perf_counter() - _T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def _chained(fn, n=10, label=""):
    """Median of per-call time over a chain of queued dispatches."""
    for _ in range(2):
        float(fn(jnp.float32(0.0)))
    _mark(f"{label}: compiled/warm")
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for i in range(n):
        acc = fn(acc * 1e-20)
    float(acc)
    return (time.perf_counter() - t0) / n


def main(B=16, N=64, T=1024):
    _cache()
    cfg = Text2VecConfig()
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    batch = t2v.make_padded_batch(
        [
            {
                "text_enc": rng.integers(4, 200, size=N).astype(np.int32),
                "feat_gt_target": rng.standard_normal((T, cfg.n_feat_dim)).astype(np.float32) * 0.1,
                "attn_prior": np.full((T, N), 1.0 / N, np.float32),
            }
            for _ in range(B)
        ],
        cfg, text_pad=N, frame_pad=T,
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "audiopaths"}
    _mark("batch on device; building state")
    model, state = t2v.init_state(cfg, key, batch)
    _mark("state initialized")
    tx = t2v.make_optimizer(cfg)

    def apply_model(params, batch, eps):
        return model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["text"], batch["src_pos"], batch["feat_target"] + eps,
            batch["input_lengths"], batch["output_lengths"], batch["feat_pos"],
            attn_prior=batch["attn_prior"], binarize_attention=True,
            deterministic=False, train_bn=True,
            rngs={"dropout": key}, mutable=["batch_stats"],
        )

    def proxy_loss(params, batch, eps):
        outputs, _ = apply_model(params, batch, eps)
        return jnp.sum(outputs["feat_postnet_output"][:, ::16, :1])

    def real_loss(params, batch, eps):
        outputs, _ = apply_model(params, batch, eps)
        wvf, post, dur = dnn_loss(
            outputs["feat_output"], outputs["feat_postnet_output"],
            batch["feat_target"], outputs["duration_predictor_output"],
            outputs["duration"],
        )
        binl = attention_binarization_loss(outputs["attn"], outputs["attn_soft"])
        return wvf + post + dur + cfg.binarization_loss_weight * binl

    def gsum(loss):
        # params as a jit ARGUMENT, not a closure constant: closures bake the
        # tree into the program payload and the remote-compile tunnel rejects
        # it (HTTP 413) — same lesson as tools/infer_profile.py.
        f = jax.jit(lambda p, b, eps: sum(
            jnp.sum(x[..., :1])
            for x in jax.tree_util.tree_leaves(jax.grad(loss)(p, b, eps))))
        return lambda eps: f(state.params, batch, eps)

    null = jax.jit(lambda e: e * 2.0)
    overhead = _chained(null, label="null")
    res = {"overhead_ms": round(overhead * 1e3, 2)}

    res["proxy_fwd_bwd_ms"] = round((_chained(gsum(proxy_loss), label="proxy") - overhead) * 1e3, 1)
    _mark(json.dumps(res))
    res["real_fwd_bwd_ms"] = round((_chained(gsum(real_loss), label="real") - overhead) * 1e3, 1)
    _mark(json.dumps(res))

    # per-term increments over the proxy: add one real term at a time
    def term_loss(which):
        def loss(params, batch, eps):
            outputs, _ = apply_model(params, batch, eps)
            wvf, post, dur = dnn_loss(
                outputs["feat_output"], outputs["feat_postnet_output"],
                batch["feat_target"], outputs["duration_predictor_output"],
                outputs["duration"],
            )
            if which == "mse":
                return wvf + post
            if which == "dur":
                return dur
            return attention_binarization_loss(outputs["attn"], outputs["attn_soft"])
        return loss

    for w in ("mse", "dur", "bin"):
        res[f"{w}_only_fwd_bwd_ms"] = round((_chained(gsum(term_loss(w)), label=w) - overhead) * 1e3, 1)
        _mark(json.dumps(res))

    # grads -> clip/LAMB/apply, chained on the same params (no donation)
    import optax

    def with_update(p, os_, b, eps):
        grads = jax.grad(real_loss)(p, b, eps)
        updates, _ = tx.update(grads, os_, p)
        newp = optax.apply_updates(p, updates)
        return sum(jnp.sum(x[..., :1]) for x in jax.tree_util.tree_leaves(newp))

    wu = jax.jit(with_update)
    res["real_fwd_bwd_update_ms"] = round(
        (_chained(lambda e: wu(state.params, state.opt_state, batch, e), label="update") - overhead) * 1e3, 1)

    # production step (donated state, returns metrics+viz)
    step, _ = t2v.make_train_step(model, cfg)
    holder = {"s": state}
    holder["s"], m = step(holder["s"], batch, key)
    float(m["total_loss"])
    t0 = time.perf_counter()
    nsteps = 10
    for i in range(nsteps):
        holder["s"], m = step(holder["s"], batch, jax.random.PRNGKey(i))
    float(m["total_loss"])
    res["full_step_ms"] = round((time.perf_counter() - t0) / nsteps * 1e3, 1)
    _mark(json.dumps(res))

    # lean production step (no attn-viz outputs — what the loop dispatches on
    # the 999/1000 non-log iterations)
    step_lean, _ = t2v.make_train_step(model, cfg, with_viz=False)
    holder["s"], m = step_lean(holder["s"], batch, key)
    float(m["total_loss"])
    t0 = time.perf_counter()
    for i in range(nsteps):
        holder["s"], m = step_lean(holder["s"], batch, jax.random.PRNGKey(i))
    float(m["total_loss"])
    res["full_step_noviz_ms"] = round((time.perf_counter() - t0) / nsteps * 1e3, 1)

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
