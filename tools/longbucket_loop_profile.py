"""Attribute the long-bucket production loop's per-step wall time.

The fixed flash long-bucket run trains finite but at ~12 s/step, while the
chained lean step is 0.57 s and the 336 MB batch uploads in 0.54 s
(tools/longbucket_diag.py).  This mirrors text2vec_loop's loop body phase
by phase (epoch/collate, jnp.asarray upload, PRNG split, step dispatch,
metrics wait, deferred emit) and prints per-step phase seconds, so the
missing ~10 s gets a name instead of a guess.

    python tools/longbucket_loop_profile.py [--steps 8] [--flash]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/long_demo_v2"  # the diag corpus (24 utts, 1 batch/epoch)


def _cache():
    import jax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # acquisition mark for hang-aware supervisors (tools/tpu_run.sh)
    print("devices:", jax.devices(), file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--flash", action="store_true")
    p.add_argument("--device_data", action="store_true")
    p.add_argument("--batch", type=int, default=16)
    a = p.parse_args()
    _cache()

    import jax
    import jax.numpy as jnp

    from wavthruvec_pytorch_tpu.config import Text2VecConfig, load_config
    from wavthruvec_pytorch_tpu.data.dataset import BucketedLoader, load_buffer
    from wavthruvec_pytorch_tpu.data.demo import make_demo_data
    from wavthruvec_pytorch_tpu.text import TextFrontend
    from wavthruvec_pytorch_tpu.train import text2vec_train as t2v

    if not os.path.exists(os.path.join(ROOT, "text2vec.json")):
        make_demo_data(root=ROOT, n_speakers=2, n_utts=12,
                       frames=(2048, 3600), max_frames=3040, n_chars=800,
                       seed=7)
    cfg = load_config(Text2VecConfig, os.path.join(ROOT, "text2vec.json"))
    cfg = dataclasses.replace(
        cfg, max_seq_len=3072, batch_size=a.batch, batch_expand_size=1,
        text_buckets=(768,), frame_buckets=(3072,),
        compute_dtype="bfloat16", flash_attention=a.flash, dropout=0.0,
    )

    frontend = TextFrontend.from_vocab_file(cfg.vocab_path)
    buf = load_buffer(list(cfg.train_list), cfg, frontend)
    loader = BucketedLoader(buf, cfg, seed=0)
    first = next(loader.epoch())
    first.pop("audiopaths", None)
    first_j = {k: jnp.asarray(v) for k, v in first.items()}
    model, state = t2v.init_state(cfg, jax.random.PRNGKey(0), first_j)
    step_fn, _ = t2v.make_train_step(model, cfg, with_viz=False)
    step_viz, _ = t2v.make_train_step(model, cfg, with_viz=True)

    # warm both programs
    state, m = step_fn(state, first_j, jax.random.PRNGKey(1))
    float(m["total_loss"])
    state, m = step_viz(state, first_j, jax.random.PRNGKey(2))
    float(m["total_loss"])

    device_data = None
    if a.device_data:
        from wavthruvec_pytorch_tpu.data.device_cache import DeviceResidentData

        t0 = time.perf_counter()
        device_data = DeviceResidentData(buf, cfg)
        print(json.dumps({"stage_mb": round(device_data.nbytes() / 2**20),
                          "stage_s": round(time.perf_counter() - t0, 2)}),
              flush=True)

    rng = jax.random.key(3, impl=cfg.dropout_prng_impl)
    pending = None
    for it in range(a.steps):
        ph = {}
        if device_data is not None:
            t0 = time.perf_counter()
            idx = next(iter(loader.epoch_indices()))
            batch = device_data.batch(idx)
            ph["gather_dispatch"] = time.perf_counter() - t0
            t0 = time.perf_counter()
            ph["lens_read"] = -1.0
            _ = int(batch["input_lengths"][0])
            ph["lens_read"] = time.perf_counter() - t0
        else:
            t0 = time.perf_counter()
            batch = next(loader.epoch())          # fresh epoch each step, like
            batch.pop("audiopaths", None)         # the 1-batch/epoch run
            ph["collate"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            jax.block_until_ready(batch)
            ph["upload"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        rng, sub = jax.random.split(rng)
        is_log = (it + 1) % 5 == 0
        state, metrics = (step_viz if is_log else step_fn)(state, batch, sub)
        ph["dispatch"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        if pending is not None:
            # deferred emit pattern: read the PREVIOUS step's scalars
            vals = {k: float(pending[k]) for k in
                    ("total_loss", "WVF_loss", "duration_loss")}
        ph["emit_prev"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        if is_log:
            import numpy as np

            soft = np.asarray(metrics["attn_soft_0"])
            ph["viz_fetch"] = time.perf_counter() - t0
            del soft
        pending = metrics
        print(json.dumps({"it": it, **{k: round(v, 3) for k, v in ph.items()}}),
              flush=True)

    # and the pure chained rate for reference
    t0 = time.perf_counter()
    for i in range(3):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
    float(metrics["total_loss"])
    print(json.dumps({"chained_step_ms":
                      round((time.perf_counter() - t0) / 3 * 1e3, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
