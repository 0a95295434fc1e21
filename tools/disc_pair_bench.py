"""Does batching (y, y_hat) through the discriminators in ONE pass beat two
sequential passes?  The MSD/MPD cost is ~120 narrow convs at low MXU
utilization (BENCH_NOTES); doubling their batch halves dispatch count.

Run on TPU: python tools/disc_pair_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wavthruvec_pytorch_tpu.config import Vec2WavConfig
from wavthruvec_pytorch_tpu.models.vec2wav import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)


def _cache():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _t(fn, *args, iters=10):
    r = fn(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main(B=2, T=40960):
    _cache()
    cfg = Vec2WavConfig()
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((B, T, 1)) * 0.1, jnp.float32)
    yh = jnp.asarray(rng.standard_normal((B, T, 1)) * 0.1, jnp.float32)

    for name, seq_mod, pair_mod in [
        ("msd",
         MultiScaleDiscriminator(update_spectral=False),
         MultiScaleDiscriminator(update_spectral=False, pair_batched=True)),
        ("mpd",
         MultiPeriodDiscriminator(cfg),
         MultiPeriodDiscriminator(cfg, pair_batched=True)),
    ]:
        variables = seq_mod.init(jax.random.PRNGKey(0), y, y)
        params = variables["params"]
        spectral = variables.get("spectral", None)

        def fwd_of(mod):
            def fwd(p, a, b):
                v = {"params": p}
                if spectral is not None:
                    v["spectral"] = spectral
                return mod.apply(v, a, b)
            return fwd

        def loss_of(fwd):
            def lf(p, a, b):
                y_r, y_g, f_r, f_g = fwd(p, a, b)
                l = sum(jnp.mean((1.0 - r) ** 2) + jnp.mean(g**2)
                        for r, g in zip(y_r, y_g))
                l = l + sum(jnp.mean(jnp.abs(r - g))
                            for fr_, fg_ in zip(f_r, f_g)
                            for r, g in zip(fr_, fg_))
                return l
            return lf

        seq_l = loss_of(fwd_of(seq_mod))
        pair_l = loss_of(fwd_of(pair_mod))

        # numerical check
        a = float(seq_l(params, y, yh))
        b = float(pair_l(params, y, yh))
        assert abs(a - b) < 1e-3 * max(1.0, abs(a)), (a, b)

        f_seq = jax.jit(seq_l)
        f_pair = jax.jit(pair_l)
        g_seq = jax.jit(jax.grad(seq_l))
        g_pair = jax.jit(jax.grad(pair_l))

        print(f"{name}: fwd seq {_t(f_seq, params, y, yh):7.2f} ms"
              f"  pair {_t(f_pair, params, y, yh):7.2f} ms")
        print(f"{name}: grad seq {_t(g_seq, params, y, yh):7.2f} ms"
              f"  pair {_t(g_pair, params, y, yh):7.2f} ms")


if __name__ == "__main__":
    main()
