"""GRU scan-vs-pallas timing with N chained repeats IN ONE program.

Single-dispatch timings of <20 ms legs are unreliable here (the axon
dispatch floor is ~30 ms and drifts by +-5 ms between overhead calibration
and measurement — tools/gru_pallas_bench.py produced self-contradictory
readings, e.g. a scan forward below its FLOP floor).  This bench chains R
data-dependent repeats of the same op inside one jitted program (each
repeat's input is perturbed by the previous output, so nothing can be
hoisted or parallelized) and reports (t(R) - t(1)) / (R - 1): per-repeat
cost with dispatch overhead cancelled by the subtraction.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wavthruvec_pytorch_tpu.models.layers import gru_stacked


def _cache():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _t(fn, iters=8):
    for _ in range(2):
        float(fn(jnp.float32(0.0)))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(jnp.float32(i) * 1e-20))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench_shape(B, T, H, res, repeats=8):
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

        def fwd_once(x):
            return gru_stacked(x, *args, impl)

        def fwd_bwd_once(x):
            y, vjp = jax.vjp(fwd_once, x)
            return vjp(jnp.tanh(y))[0]

        for tag, once in (("fwd", fwd_once), ("fwd_bwd", fwd_bwd_once)):

            def chained(eps, n, once=once):
                x = xs + eps
                acc = jnp.float32(0.0)
                for _ in range(n):
                    y = once(x)
                    s = jnp.sum(y[:, :, ::64, ::64])
                    acc = acc + s
                    x = xs + s * 1e-24  # data dependency: serializes repeats
                return acc

            t1 = _t(jax.jit(lambda e: chained(e, 1)))
            tr = _t(jax.jit(lambda e: chained(e, repeats)))
            out[f"{impl}_{tag}_ms"] = round((tr - t1) / (repeats - 1) * 1e3, 2)
    res[key] = out
    print(json.dumps({key: out}), flush=True)


def main():
    _cache()
    res = {}
    bench_shape(16, 1024, 1024, res)
    bench_shape(1, 500, 1024, res)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
