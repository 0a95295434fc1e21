"""H2D upload paths A/B at the long-bucket batch size (336 MB).

tools/longbucket_diag.py measured jax.device_put of the padded batch at
0.54 s (621 MB/s) on an idle fresh device, while the loop-phase profile
(tools/longbucket_loop_profile.py) saw the SAME batch take 6.5-7.4 s per
step through jnp.asarray after warmup.  This isolates: device_put vs
jnp.asarray, fresh vs repeated, idle vs busy device.

    python tools/upload_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    batch = {
        "feat_target": rng.standard_normal((16, 3072, 1024)).astype(np.float32),
        "attn_prior": np.zeros((16, 3072, 768), np.float32),
        "text": np.zeros((16, 768), np.int32),
        "src_pos": np.zeros((16, 768), np.int32),
        "feat_pos": np.zeros((16, 3072), np.int32),
        "input_lengths": np.zeros((16,), np.int32),
        "output_lengths": np.zeros((16,), np.int32),
    }
    nbytes = sum(v.nbytes for v in batch.values())
    print(json.dumps({"mb": round(nbytes / 2**20, 1)}), flush=True)

    def timed(tag, fn, n=4):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
            del out
        print(json.dumps({
            "path": tag,
            "s_each": [round(t, 2) for t in ts],
            "mb_s_best": round(nbytes / 2**20 / min(ts), 1),
        }), flush=True)

    timed("device_put(dict)", lambda: jax.device_put(batch))
    timed("jnp.asarray per leaf",
          lambda: {k: jnp.asarray(v) for k, v in batch.items()})
    timed("device_put per leaf",
          lambda: {k: jax.device_put(v) for k, v in batch.items()})

    # now with a dispatched program in flight: does upload overlap compute?
    x = jax.device_put(batch["feat_target"])

    @jax.jit
    def burn(a):
        for _ in range(24):
            a = jnp.tanh(a @ a[:, :, :1024].transpose(0, 2, 1) @ a)
        return a

    burn(x).block_until_ready()  # compile
    t0 = time.perf_counter()
    y = burn(x)
    print(json.dumps({"burn_alone_s": None}), flush=True)
    timed("device_put while burn in flight",
          lambda: jax.device_put(batch), n=1)
    y.block_until_ready()
    t_total = time.perf_counter() - t0
    t0 = time.perf_counter()
    burn(x).block_until_ready()
    t_burn = time.perf_counter() - t0
    print(json.dumps({"burn_s": round(t_burn, 2),
                      "burn_plus_overlapped_upload_s": round(t_total, 2)}),
          flush=True)


def with_step():
    """Upload speed BEFORE vs AFTER executing the real train step — the
    loop-phase profile saw 6.5-7.4 s uploads only in a process that had run
    the full training program; this isolates that state dependence."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), file=sys.stderr, flush=True)

    from wavthruvec_pytorch_tpu.config import Text2VecConfig, load_config
    from wavthruvec_pytorch_tpu.data.dataset import BucketedLoader, load_buffer
    from wavthruvec_pytorch_tpu.text import TextFrontend
    from wavthruvec_pytorch_tpu.train import text2vec_train as t2v

    root = "/tmp/long_demo_v2"
    cfg = load_config(Text2VecConfig, os.path.join(root, "text2vec.json"))
    cfg = dataclasses.replace(
        cfg, max_seq_len=3072, batch_size=16, batch_expand_size=1,
        text_buckets=(768,), frame_buckets=(3072,),
        compute_dtype="bfloat16", flash_attention=True, dropout=0.0,
    )
    frontend = TextFrontend.from_vocab_file(cfg.vocab_path)
    buf = load_buffer(list(cfg.train_list), cfg, frontend)
    loader = BucketedLoader(buf, cfg, seed=0)

    def fresh_host_batch():
        b = next(loader.epoch())
        b.pop("audiopaths", None)
        return b

    def upload(tag, n=3):
        for i in range(n):
            hb = fresh_host_batch()
            t0 = time.perf_counter()
            db = {k: jax.device_put(v) for k, v in hb.items()}
            jax.block_until_ready(db)
            print(json.dumps({"phase": tag, "i": i,
                              "s": round(time.perf_counter() - t0, 2)}),
                  flush=True)
            del db

    upload("pre_model")
    hb = fresh_host_batch()
    db = {k: jnp.asarray(v) for k, v in hb.items()}
    model, state = t2v.init_state(cfg, jax.random.PRNGKey(0), db)
    upload("post_init")
    step_fn, _ = t2v.make_train_step(model, cfg, with_viz=False)
    state, m = step_fn(state, db, jax.random.PRNGKey(1))
    print(json.dumps({"warm_loss": round(float(m["total_loss"]), 3)}),
          flush=True)
    upload("post_step")
    # tiny-transfer latency post-degradation: if the slow path is a fixed
    # per-transfer cost (not bandwidth), even a [16] int32 index upload pays
    for i in range(5):
        small = np.arange(16, dtype=np.int32) + i
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(small))
        print(json.dumps({"phase": "post_step_small_64B", "i": i,
                          "s": round(time.perf_counter() - t0, 4)}),
              flush=True)
    # and a mid-size 12 MB one
    for i in range(3):
        mid = np.zeros((3, 1024, 1024), np.float32) + i
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(mid))
        print(json.dumps({"phase": "post_step_12MB", "i": i,
                          "s": round(time.perf_counter() - t0, 3)}),
              flush=True)
    # device fully idle (metrics fetched); try once more after gc
    import gc

    gc.collect()
    upload("post_gc")


if __name__ == "__main__":
    if "--with_step" in sys.argv:
        with_step()
    else:
        main()
