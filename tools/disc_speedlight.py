"""Discriminator speed-of-light analysis: is the GAN D-step compute-bound?

For each discriminator (MPD per period, MSD per scale) at a given
(batch, samples) shape this measures fwd and fwd+bwd wall time (scalar-fetch
chained methodology) AND computes the analytic conv FLOPs, reporting
achieved TFLOP/s.  If achieved ~ the chip's MXU rate, cross-layer fusion
cannot help (no schedule recovers compute); if far below, the chain is
dispatch/utilization-bound and a fused Pallas kernel is the lever.

Run on TPU:
    python tools/disc_speedlight.py --B 256 --T 8000    # windowed-B128 pair
    python tools/disc_speedlight.py --B 4   --T 160000  # full-utt B2 pair
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wavthruvec_pytorch_tpu.config import Vec2WavConfig
from wavthruvec_pytorch_tpu.models.vec2wav import (
    DiscriminatorP,
    DiscriminatorS,
)


def _cache():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # acquisition mark for hang-aware supervisors (tools/tpu_run.sh)
    print("devices:", jax.devices(), file=sys.stderr, flush=True)


def _t(fn, iters=8):
    for _ in range(2):
        float(fn(jnp.float32(0.0)))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(jnp.float32(i) * 1e-20))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def msd_flops(T: int) -> float:
    """Analytic MAC*2 count of one DiscriminatorS forward at input length T."""
    specs = [  # (out_ch, k, stride, groups, in_ch)
        (128, 15, 1, 1, 1),
        (128, 41, 2, 4, 128),
        (256, 41, 2, 16, 128),
        (512, 41, 4, 16, 256),
        (1024, 41, 4, 16, 512),
        (1024, 41, 1, 16, 1024),
        (1024, 5, 1, 1, 1024),
    ]
    total, t = 0.0, T
    for out_ch, k, s, g, in_ch in specs:
        t = -(-t // s)
        total += t * out_ch * (in_ch // g) * k * 2
    total += t * 1 * 1024 * 3 * 2  # conv_post k=3
    return total


def mpd_flops(T: int, period: int) -> float:
    """Analytic MAC*2 count of one DiscriminatorP forward at input length T."""
    import math

    rows = math.ceil(T / period)
    chans = [(32, 1), (128, 32), (512, 128), (1024, 512)]
    total, r = 0.0, rows
    for out_ch, in_ch in chans:
        r = -(-r // 3)
        total += r * period * out_ch * in_ch * 5 * 2
    total += r * period * 1024 * 1024 * 5 * 2  # convs_4 stride 1
    total += r * period * 1 * 1024 * 3 * 2     # conv_post
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--T", type=int, default=8000)
    ap.add_argument("--dtype", choices=("f32", "bf16"), default="f32")
    ap.add_argument("--tiled", action="store_true",
                    help="MSD grouped convs via ops/tiled_conv repack")
    a = ap.parse_args()
    _cache()

    cfg = Vec2WavConfig()
    dtype = jnp.bfloat16 if a.dtype == "bf16" else None
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((a.B, a.T, 1)) * 0.1, jnp.float32)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def null(eps):
        return eps * 2.0

    overhead = _t(null)
    res = {"B": a.B, "T": a.T, "dtype": a.dtype, "tiled": a.tiled,
           "overhead_ms": round(overhead * 1e3, 2)}
    total_ms = {"fwd": 0.0, "fwd_bwd": 0.0}
    total_fl = {"fwd": 0.0, "fwd_bwd": 0.0}

    cases = [("msd_s0", DiscriminatorS(use_spectral_norm=True,
                                       update_spectral=False, dtype=dtype,
                                       tiled_conv=a.tiled),
              msd_flops(a.T), x)]
    # scales 2,3 see avg-pooled input (reference models.py:265-268)
    from wavthruvec_pytorch_tpu.models.vec2wav import _avg_pool_4_2_pad2

    x2 = _avg_pool_4_2_pad2(x)
    x3 = _avg_pool_4_2_pad2(x2)
    cases.append(("msd_s1", DiscriminatorS(dtype=dtype, tiled_conv=a.tiled),
                  msd_flops(x2.shape[1]), x2))
    cases.append(("msd_s2", DiscriminatorS(dtype=dtype, tiled_conv=a.tiled),
                  msd_flops(x3.shape[1]), x3))
    for i, p in enumerate(cfg.periods):
        cases.append((f"mpd_p{p}", DiscriminatorP(p, dtype=dtype),
                      mpd_flops(a.T, p), x))

    for name, mod, flops, inp in cases:
        variables = mod.init(key, inp)
        flops *= a.B

        def fwd(v, eps, _mod=mod, _inp=inp):
            out, fmap = _mod.apply(v, _inp + eps)
            return jnp.sum(out[:, :1]) + sum(jnp.sum(m[:, :1, ..., :1])
                                             for m in fmap)

        # D-step-like backward: grads w.r.t. the discriminator params
        f_fn = jax.jit(fwd)
        g_fn = jax.jit(lambda v, e: sum(
            jnp.sum(le[..., :1]) for le in jax.tree_util.tree_leaves(
                jax.grad(fwd)(v, e))))
        t_f = max(_t(lambda e: f_fn(variables, e)) - overhead, 1e-9)
        t_fb = max(_t(lambda e: g_fn(variables, e)) - overhead, 1e-9)
        res[f"{name}_fwd_ms"] = round(t_f * 1e3, 1)
        res[f"{name}_fwd_bwd_ms"] = round(t_fb * 1e3, 1)
        res[f"{name}_fwd_tflops"] = round(flops / t_f / 1e12, 1)
        # bwd ~ 2x fwd FLOPs (dx + dW), so fwd+bwd ~ 3x
        res[f"{name}_fwd_bwd_tflops"] = round(3 * flops / t_fb / 1e12, 1)
        total_ms["fwd"] += t_f * 1e3
        total_ms["fwd_bwd"] += t_fb * 1e3
        total_fl["fwd"] += flops
        total_fl["fwd_bwd"] += 3 * flops

    res["total_fwd_ms"] = round(total_ms["fwd"], 1)
    res["total_fwd_bwd_ms"] = round(total_ms["fwd_bwd"], 1)
    res["total_fwd_tflops"] = round(total_fl["fwd"] / (total_ms["fwd"] / 1e3) / 1e12, 1)
    res["total_fwd_bwd_tflops"] = round(
        total_fl["fwd_bwd"] / (total_ms["fwd_bwd"] / 1e3) / 1e12, 1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
