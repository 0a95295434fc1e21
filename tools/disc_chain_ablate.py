"""In-chain per-layer cost of DiscriminatorS scale 0 (the post-repack
residual): run the conv chain truncated after layer i, fwd+bwd with
FM-style gradient seeding on every intermediate, at the real shape.
Differences between successive depths give per-layer IN-CONTEXT cost —
including weight-norm/spectral reparam, leaky_relu, fmap grads, and any
layout conversions the isolated per-op tool misses.

    python tools/disc_chain_ablate.py --B 4 --T 160000 [--no_tiled]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from wavthruvec_pytorch_tpu.models.layers import (
    SpectralNormConv1d,
    WNConv1d,
)

SPECS = [
    (128, 15, 1, 1, 7),
    (128, 41, 2, 4, 20),
    (256, 41, 2, 16, 20),
    (512, 41, 4, 16, 20),
    (1024, 41, 4, 16, 20),
    (1024, 41, 1, 16, 20),
    (1024, 5, 1, 1, 2),
]


class TruncatedS(nn.Module):
    depth: int
    spectral: bool
    tiled: bool

    @nn.compact
    def __call__(self, x):
        impl = "mxu_tiled" if self.tiled else None
        fmap = []
        for i, (f, k, s, g, p) in enumerate(SPECS[: self.depth]):
            if self.spectral:
                x = SpectralNormConv1d(
                    f, kernel_size=k, stride=s, groups=g, padding=p,
                    update_stats=False, conv_impl=impl, name=f"convs_{i}")(x)
            else:
                x = WNConv1d(f, kernel_size=k, stride=s, groups=g, padding=p,
                             conv_impl=impl, name=f"convs_{i}")(x)
            x = nn.leaky_relu(x, 0.1)
            fmap.append(x)
        return fmap


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=4)
    ap.add_argument("--T", type=int, default=160000)
    ap.add_argument("--no_tiled", action="store_true")
    ap.add_argument("--spectral", action="store_true",
                    help="scale-0 uses spectral norm (default weight norm)")
    a = ap.parse_args()
    _cache()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((a.B, a.T, 1)) * 0.1, jnp.float32)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def null(eps):
        return eps * 2.0

    overhead = _t(null)
    res = {"B": a.B, "T": a.T, "tiled": not a.no_tiled,
           "spectral": a.spectral, "overhead_ms": round(overhead * 1e3, 2)}
    prev = 0.0
    for depth in range(1, len(SPECS) + 1):
        mod = TruncatedS(depth=depth, spectral=a.spectral,
                         tiled=not a.no_tiled)
        variables = mod.init(key, x)

        def fb(v, eps, _mod=mod):
            def loss(p):
                fmap = _mod.apply({**v, "params": p}, x + eps)
                return sum(jnp.sum(jnp.abs(m)) * 1e-9 for m in fmap)
            return sum(jnp.sum(le[..., :1]) for le in
                       jax.tree_util.tree_leaves(
                           jax.grad(loss)(v["params"])))

        f_fn = jax.jit(fb)
        ms = max(_t(lambda e: f_fn(variables, e)) - overhead, 0.0) * 1e3
        res[f"d{depth}_fwd_bwd_ms"] = round(ms, 1)
        res[f"d{depth}_delta_ms"] = round(ms - prev, 1)
        prev = ms
        print(json.dumps(res), file=sys.stderr, flush=True)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
