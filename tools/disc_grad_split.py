"""Per-layer dX/dW split of the MSD grouped-conv backward.

disc_speedlight.py showed MSD backwards run at ~8.5 TFLOP/s while the
forwards hit 12.5-40 — the backward has 3-5x headroom.  This tool times,
for each DiscriminatorS conv layer at its in-chain (T, Cin, Cout, k, s, G):

  * fwd:   lax.conv_general_dilated with feature_group_count=G
  * dX:    grad w.r.t. the input only
  * dW:    grad w.r.t. the kernel only
  * alt formulations of whichever direction is slow (taps-as-matmul etc.)

so the Pallas/fusion work targets the measured bottleneck, not a guess.

Run on TPU:  python tools/disc_grad_split.py --B 4 --T 160000 [--dtype bf16]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


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


# MSD scale-0 layer specs: (Cout, k, stride, groups, pad); input length
# halves per scale (AvgPool 4/2), so scale 1/2 reuse these at T/2, T/4.
SPECS = [
    (128, 15, 1, 1, 7, 1),      # last field = Cin
    (128, 41, 2, 4, 20, 128),
    (256, 41, 2, 16, 20, 128),
    (512, 41, 4, 16, 20, 256),
    (1024, 41, 4, 16, 20, 512),
    (1024, 41, 1, 16, 20, 1024),
    (1024, 5, 1, 1, 2, 1024),
]


def conv(x, w, stride, groups, pad):
    return lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(pad, pad)],
        feature_group_count=groups,
        dimension_numbers=("NHC", "HIO", "NHC"),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=4)
    ap.add_argument("--T", type=int, default=160000)
    ap.add_argument("--dtype", choices=("f32", "bf16"), default="f32")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--impl", choices=("lax", "tiled", "both"), default="lax")
    a = ap.parse_args()
    _cache()
    dt = jnp.bfloat16 if a.dtype == "bf16" else jnp.float32

    rng = np.random.default_rng(0)

    @jax.jit
    def null(eps):
        return eps * 2.0

    overhead = _t(null)
    res = {"B": a.B, "T": a.T, "dtype": a.dtype,
           "overhead_ms": round(overhead * 1e3, 2)}
    report = []

    t = a.T
    for li, (cout, k, s, g, pad, cin) in enumerate(SPECS):
        x = jnp.asarray(rng.standard_normal((a.B, t, cin)) * 0.1, dt)
        w = jnp.asarray(rng.standard_normal((k, cin // g, cout)) * 0.01, dt)
        t_out = -(-t // s)  # same-style padded output length
        flops = a.B * t_out * cout * (cin // g) * k * 2

        impls = {"lax": lambda x_, w_: conv(x_, w_, s, g, pad)}
        if a.impl in ("tiled", "both") and g > 1:
            from wavthruvec_pytorch_tpu.ops.tiled_conv import (
                mxu_grouped_conv1d,
            )

            impls["tiled"] = lambda x_, w_: mxu_grouped_conv1d(
                x_, w_, s, pad, g)
        if a.impl == "tiled":
            impls.pop("lax")

        row = {"layer": li, "T": t, "Cin": cin, "Cout": cout, "k": k,
               "s": s, "G": g, "gflops": round(flops / 1e9, 1)}
        for iname, fwd in impls.items():
            pfx = "" if iname == "lax" else f"{iname}_"
            f = jax.jit(lambda x_, w_, e, fwd=fwd: jnp.sum(
                fwd(x_ + e, w_)[:, :1, :1]))
            dx = jax.jit(lambda x_, w_, e, fwd=fwd: jnp.sum(
                jax.grad(lambda xx: jnp.sum(fwd(xx, w_)))(x_ + e)[:, :1, :1]))
            dw = jax.jit(lambda x_, w_, e, fwd=fwd: jnp.sum(
                jax.grad(lambda ww: jnp.sum(fwd(x_ + e, ww)))(w_)[:1, :1, :1]))
            for name, fn in ((pfx + "fwd", f), (pfx + "dx", dx),
                             (pfx + "dw", dw)):
                ms = max(
                    _t(functools.partial(fn, x, w), a.iters) - overhead, 1e-6)
                row[f"{name}_ms"] = round(ms * 1e3, 1)
                row[f"{name}_tflops"] = round(flops / ms / 1e12, 1)
        report.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)
        t = t_out

    res["layers"] = report
    for key in ("fwd_ms", "dx_ms", "dw_ms", "tiled_fwd_ms", "tiled_dx_ms",
                "tiled_dw_ms"):
        vals = [r[key] for r in report if key in r]
        if vals:
            res[f"total_{key}"] = round(sum(vals), 1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
