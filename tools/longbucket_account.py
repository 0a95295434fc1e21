"""Closed accounting of the long-bucket production loop's per-step wall.

Round-4 VERDICT ask #1: the B16/N768/T3072 production loop ran ~2.5 s/step
while the chained lean step measures ~0.5 s; the batched metric flush
(round 5) recovered ~0.5 s; this tool attributes the REST as measured
chained A/B differences, every leg a variant:

  v0  step only            (same batch + pre-split keys, the 0.5 s floor)
  v1  + jax.random.split per step        (the loop's RNG pattern)
  v2  + DeviceResidentData.batch gather  (pre-split keys)
  v3  + both                              (the loop's device work)
  v4  v3 + loop machinery (epoch_indices, pend/flush every 20, timer)

Each variant: warm, then reps x chain of N steps with ONE fetch at the end.

    python tools/longbucket_account.py [--chain 10] [--reps 3]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/long_demo_v2_u16"


def _cache():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--flash", action="store_true")
    a = ap.parse_args()
    _cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from wavthruvec_pytorch_tpu.config import Text2VecConfig, load_config
    from wavthruvec_pytorch_tpu.data.dataset import BucketedLoader, load_buffer
    from wavthruvec_pytorch_tpu.data.demo import make_demo_data
    from wavthruvec_pytorch_tpu.data.device_cache import DeviceResidentData
    from wavthruvec_pytorch_tpu.text import TextFrontend
    from wavthruvec_pytorch_tpu.train import text2vec_train as t2v

    if not os.path.exists(os.path.join(ROOT, "text2vec.json")):
        make_demo_data(root=ROOT, n_speakers=2, n_utts=16,
                       frames=(2048, 3600), max_frames=3040, n_chars=800,
                       seed=7)
    cfg = load_config(Text2VecConfig, os.path.join(ROOT, "text2vec.json"))
    cfg = dataclasses.replace(
        cfg, max_seq_len=3072, batch_size=16, batch_expand_size=1,
        text_buckets=(768,), frame_buckets=(3072,),
        compute_dtype="bfloat16", flash_attention=a.flash, dropout=0.0)

    frontend = TextFrontend.from_vocab_file(cfg.vocab_path)
    buf = load_buffer(list(cfg.train_list), cfg, frontend)
    loader = BucketedLoader(buf, cfg, seed=0)
    drd = DeviceResidentData(buf, cfg)
    print(json.dumps({"staged_mb": round(drd.nbytes() / 2**20),
                      "n_items": len(buf), "batches_per_epoch": len(loader)}),
          flush=True)

    idx0 = next(iter(loader.epoch_indices()))
    batch0 = drd.batch(idx0)
    model, state = t2v.init_state(cfg, jax.random.PRNGKey(0), batch0)
    step_fn, _ = t2v.make_train_step(model, cfg, with_viz=False)
    keys = [jax.random.PRNGKey(i) for i in range(64)]
    rngs = {"r": jax.random.key(3, impl=cfg.dropout_prng_impl)}

    state, m = step_fn(state, batch0, keys[0])
    float(m["total_loss"])

    def fetch(m):
        np.asarray(m["scalars"])

    def time_variant(body, warm=1):
        nonlocal state
        for _ in range(warm):
            body(0)
        fetch(last_m[0])  # sync before timing
        times = []
        for r in range(a.reps):
            t0 = time.perf_counter()
            for i in range(a.chain):
                body(r * a.chain + i + 1)
            fetch(last_m[0])
            times.append((time.perf_counter() - t0) / a.chain)
        return round(float(np.median(times)), 4)

    last_m = [m]

    def v0(i):
        nonlocal state
        state, last_m[0] = step_fn(state, batch0, keys[i % 64])

    def v1(i):
        nonlocal state
        rngs["r"], sub = jax.random.split(rngs["r"])
        state, last_m[0] = step_fn(state, batch0, sub)

    def v2(i):
        nonlocal state
        b = drd.batch(idx0)
        state, last_m[0] = step_fn(state, b, keys[i % 64])

    def v3(i):
        nonlocal state
        b = drd.batch(idx0)
        rngs["r"], sub = jax.random.split(rngs["r"])
        state, last_m[0] = step_fn(state, b, sub)

    out = {}
    out["v0_step_only"] = time_variant(v0)
    out["v1_plus_split"] = time_variant(v1)
    out["v2_plus_gather"] = time_variant(v2)
    out["v3_gather_split"] = time_variant(v3)

    # v4: the loop's actual machinery — fresh epoch_indices per epoch,
    # pend list + stacked flush every 20, StepTimer
    from wavthruvec_pytorch_tpu.utils.logging import StepTimer

    stacker = jax.jit(lambda *xs: jnp.stack(xs))
    timer = StepTimer()

    def v4_run():
        nonlocal state
        pend = []
        times = []
        it = 0
        for r in range(a.reps):
            t0 = time.perf_counter()
            done = 0
            while done < a.chain:
                for idx in loader.epoch_indices():
                    b = drd.batch(idx)
                    rngs["r"], sub = jax.random.split(rngs["r"])
                    state, mm = step_fn(state, b, sub)
                    it += 1
                    timer.tick()
                    pend.append(mm["scalars"])
                    if len(pend) >= 20:
                        np.asarray(stacker(*pend))
                        pend.clear()
                    done += 1
                    if done >= a.chain:
                        break
            if pend:
                np.asarray(stacker(*pend))
                pend.clear()
            times.append((time.perf_counter() - t0) / a.chain)
        return round(float(np.median(times)), 4)

    v4_run()  # warm epoch path
    out["v4_loop_machinery"] = v4_run()

    # isolated gather: how long does the windowed batch gather itself take?
    gtimes = []
    for r in range(a.reps):
        t0 = time.perf_counter()
        last = None
        for i in range(a.chain):
            last = drd.batch(idx0)
        jax.block_until_ready(last)
        gtimes.append((time.perf_counter() - t0) / a.chain)
    out["gather_only"] = round(float(np.median(gtimes)), 4)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
