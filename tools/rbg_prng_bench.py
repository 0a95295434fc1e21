"""A/B the dropout-PRNG impl knob (Text2VecConfig.dropout_prng_impl) at the
throughput shape: threefry2x32 (jax default, counter-based) vs rbg (hardware
RBG, cheaper per-bit on TPU).  The knob landed in round 3 with a correctness
test but no recorded perf numbers (VERDICT r3 weak #3); this records them.
Both rows run in ONE process so they share the tunnel acquisition.

    python tools/rbg_prng_bench.py [--B 16] [--T 1024]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cache():
    import jax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # acquisition mark for hang-aware supervisors (see memory/tpu quirks)
    print("devices:", jax.devices(), file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=16)
    p.add_argument("--T", type=int, default=1024)
    p.add_argument("--reps", type=int, default=3,
                   help="alternating A/B repetitions (drift control)")
    a = p.parse_args()
    _cache()

    from wavthruvec_pytorch_tpu.infer.train_bench import bench_t2v

    rows = []
    for rep in range(a.reps):
        for impl in ("threefry2x32", "rbg"):
            r = bench_t2v(B=a.B, T=a.T, prng=impl)
            r["prng"] = impl
            r["rep"] = rep
            print(json.dumps(r), flush=True)
            rows.append(r)
    for impl in ("threefry2x32", "rbg"):
        best = min(r["sec_per_step"] for r in rows if r["prng"] == impl)
        print(json.dumps({"prng": impl, "best_step_ms": round(best * 1e3, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
