"""Pallas GRU forward kernel vs the lax.scan forward at CBHG shapes.

Times gru_stacked (scan) vs gru_stacked(..., impl="pallas") — forward and
forward+backward (the backward is the shared custom VJP; with the pallas
forward only the recurrence changes) — at the training shape (B16, T1024,
H1024) and the serving shape (B1, T500, H1024), plus the full BiGRU module.
Scalar-fetch timing, null-program overhead subtracted (bench.py docstring).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wavthruvec_pytorch_tpu.models.layers import BiGRU, gru_stacked


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


def bench_shape(B, T, H, overhead, res):
    r = np.random.default_rng(0)
    D, C = 2, H
    xs = jnp.asarray(r.standard_normal((D, B, T, C)) * 0.3, jnp.float32)
    args = tuple(
        jnp.asarray(a, jnp.float32)
        for a in (
            r.standard_normal((D, C, 3 * H)) * 0.02,
            r.standard_normal((D, H, 3 * H)) * 0.02,
            r.standard_normal((D, 3 * H)) * 0.02,
            r.standard_normal((D, 3 * H)) * 0.02,
        )
    )

    key = f"B{B}_T{T}_H{H}"
    out = {}
    for impl in ("scan", "pallas"):
        fwd = jax.jit(lambda x, e, impl=impl: jnp.sum(
            gru_stacked(x + e, *args, impl)[:, :, ::64, ::64]))
        out[f"{impl}_fwd_ms"] = round((_t(lambda e: fwd(xs, e)) - overhead) * 1e3, 2)

        g = jax.jit(lambda x, e, impl=impl: jnp.sum(jnp.abs(jax.grad(
            lambda xx: jnp.sum(jnp.tanh(gru_stacked(xx + e, *args, impl)))
        )(x)[..., ::64])))
        out[f"{impl}_fwd_bwd_ms"] = round((_t(lambda e: g(xs, e)) - overhead) * 1e3, 2)

    # numerics on-chip
    y0 = gru_stacked(xs, *args, "scan")
    y1 = gru_stacked(xs, *args, "pallas")
    out["max_abs_diff"] = float(jnp.abs(y0 - y1).max())
    out["out_scale"] = float(jnp.abs(y0).max())
    res[key] = out
    print(json.dumps({key: out}), flush=True)


def main():
    _cache()

    @jax.jit
    def null(eps):
        return eps * 2.0

    overhead = _t(null)
    res = {"overhead_ms": round(overhead * 1e3, 2)}
    print(json.dumps({"overhead_ms": res["overhead_ms"]}), flush=True)

    bench_shape(16, 1024, 1024, overhead, res)
    bench_shape(1, 500, 1024, overhead, res)

    # full BiGRU module at the serving shape
    r = np.random.default_rng(1)
    x = jnp.asarray(r.standard_normal((1, 500, 1024)) * 0.3, jnp.float32)
    for impl in ("scan", "pallas"):
        m = BiGRU(hidden=1024, impl=impl)
        v = jax.jit(lambda k: m.init(k, x))(jax.random.PRNGKey(0))
        f = jax.jit(lambda vv, e: jnp.sum(m.apply(vv, x + e)[:, ::64, ::64]))
        ms = round((_t(lambda e: f(v, e)) - overhead) * 1e3, 2)
        res[f"bigru_b1_t500_{impl}_ms"] = ms
        print(json.dumps({f"bigru_b1_t500_{impl}_ms": ms}), flush=True)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
