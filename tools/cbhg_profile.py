"""CBHG-internal ablation at the t2v throughput shape (B16, T1024, C1024):
conv bank vs projections/highway vs biGRU, f32 vs bf16 — is the 69 ms
fwd+bwd legitimate conv-bank FLOPs (then bf16 should ~2x it) or scan
overhead in the GRU (then bf16 won't move it)?"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax.core import FrozenDict

from wavthruvec_pytorch_tpu.models.cbhg import CBHG, BatchNormConv1d
from wavthruvec_pytorch_tpu.models.layers import BiGRU


def _cache():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _t(fn, iters=10):
    for _ in range(2):
        float(fn(jnp.float32(0.0)))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(jnp.float32(i) * 1e-20))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _scalar(tree):
    return sum(jnp.sum(x[..., :1]) for x in jax.tree_util.tree_leaves(tree))


def main(B=16, T=1024, C=1024):
    _cache()
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, C)) * 0.1, jnp.float32)

    @jax.jit
    def null(eps):
        return eps * 2.0

    overhead = _t(null)
    res = {"overhead_ms": round(overhead * 1e3, 2)}

    import flax.linen as nn

    # conv bank only (K=8, the FLOP bulk), f32 vs bf16
    for dt_name, dt in (("f32", None), ("bf16", jnp.bfloat16)):

        class BankM(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                outs = [
                    BatchNormConv1d(C, kernel_size=k, padding=k // 2,
                                    activation="relu", dtype=dt,
                                    name=f"b{k}")(x, train)[:, :T]
                    for k in range(1, 9)
                ]
                return jnp.concatenate(outs, axis=-1)

        m = BankM()
        v = m.init(key, x, train=False)

        def call(vv, eps):
            out, _ = m.apply(
                {"params": vv["params"], "batch_stats": vv.get("batch_stats", FrozenDict())},
                x + eps, train=True, mutable=["batch_stats"])
            return jnp.sum(out[:, ::16, :1].astype(jnp.float32))

        f = jax.jit(call)
        res[f"bank_fwd_{dt_name}_ms"] = round((_t(lambda e: f(v, e)) - overhead) * 1e3, 2)
        g = jax.jit(lambda vv, e: _scalar(jax.grad(lambda a, b: call(a, b))(vv, e)))
        res[f"bank_fwd_bwd_{dt_name}_ms"] = round((_t(lambda e: g(v, e)) - overhead) * 1e3, 2)

    # biGRU only, f32 (and a bf16-cast variant)
    gru = BiGRU(C)
    gv = gru.init(key, x)

    def gru_call(vv, eps):
        return jnp.sum(gru.apply(vv, x + eps)[:, ::16, :1])

    f = jax.jit(gru_call)
    res["gru_fwd_ms"] = round((_t(lambda e: f(gv, e)) - overhead) * 1e3, 2)
    g = jax.jit(lambda vv, e: _scalar(jax.grad(gru_call)(vv, e)))
    res["gru_fwd_bwd_ms"] = round((_t(lambda e: g(gv, e)) - overhead) * 1e3, 2)

    def gru_bf16(vv, eps):
        vb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), vv)
        return jnp.sum(
            gru.apply(vb, (x + eps).astype(jnp.bfloat16))[:, ::16, :1]
            .astype(jnp.float32))

    f = jax.jit(gru_bf16)
    res["gru_fwd_bf16_ms"] = round((_t(lambda e: f(gv, e)) - overhead) * 1e3, 2)
    g = jax.jit(lambda vv, e: _scalar(jax.grad(gru_bf16)(vv, e)))
    res["gru_fwd_bwd_bf16_ms"] = round((_t(lambda e: g(gv, e)) - overhead) * 1e3, 2)

    # full CBHG f32 vs bf16 for reference
    for dt_name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        cb = CBHG(C, K=8, projections=(256, C), dtype=dt)
        cv = cb.init(key, x, train=False)

        def call(vv, eps):
            out, _ = cb.apply(
                {"params": vv["params"], "batch_stats": vv.get("batch_stats", FrozenDict())},
                x + eps, train=True, mutable=["batch_stats"])
            return jnp.sum(out[:, ::16, :1].astype(jnp.float32))

        g = jax.jit(lambda vv, e: _scalar(jax.grad(lambda a, b: call(a, b))(vv, e)))
        res[f"cbhg_fwd_bwd_{dt_name}_ms"] = round((_t(lambda e: g(cv, e)) - overhead) * 1e3, 2)

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
