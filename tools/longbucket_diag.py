"""Diagnose the long-bucket (N=768 text / T=3072 frame) NaN + slow step.

The flash_longbucket_run production run produced NaN losses from step 1 at
~9 s/step, while the round-2 flash_mem study (same T=3072 frame bucket but
N=64 text bucket, synthetic full-length batch, f32) ran finite at 670 ms.
This tool takes the FIRST REAL padded batch from the same corpus and, for
each (attention path x dtype) cell, reports per-output NaN fractions, the
five loss terms, and a 3-step chained time — localizing which ingredient
(flash kernel, bf16, real padding, the N=768 encoder bucket) breaks.

    python tools/longbucket_diag.py [--cells flash:bf16,dense:bf16,...]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/long_demo_v2"  # n_chars=800 corpus, see flash_longbucket_run.py


def _cache():
    import jax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # acquisition mark for hang-aware supervisors (tools/tpu_run.sh)
    print("devices:", jax.devices(), file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cells", default="flash:bf16,dense:bf16,flash:f32,dense:f32")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--text_bucket", type=int, default=768)
    p.add_argument("--frame_bucket", type=int, default=3072)
    a = p.parse_args()
    _cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from wavthruvec_pytorch_tpu.config import Text2VecConfig, load_config
    from wavthruvec_pytorch_tpu.data.dataset import BucketedLoader, load_buffer
    from wavthruvec_pytorch_tpu.data.demo import make_demo_data
    from wavthruvec_pytorch_tpu.text import TextFrontend
    from wavthruvec_pytorch_tpu.models.losses import (
        attention_binarization_loss,
        dnn_loss,
    )
    from wavthruvec_pytorch_tpu.train import text2vec_train as t2v

    if not os.path.exists(os.path.join(ROOT, "text2vec.json")):
        make_demo_data(root=ROOT, n_speakers=2, n_utts=12,
                       frames=(2048, 3600), max_frames=3040, n_chars=800,
                       seed=7)
    base = load_config(Text2VecConfig, os.path.join(ROOT, "text2vec.json"))

    def cfg_for(flash: bool, dtype: str) -> Text2VecConfig:
        return dataclasses.replace(
            base,
            max_seq_len=3072,
            batch_size=a.batch, batch_expand_size=1,
            text_buckets=(a.text_bucket,), frame_buckets=(a.frame_bucket,),
            compute_dtype={"bf16": "bfloat16", "f32": "float32"}[dtype],
            flash_attention=flash, dropout=0.0,
        )

    # one real padded batch, shared across cells
    cfg0 = cfg_for(False, "f32")
    frontend = TextFrontend.from_vocab_file(cfg0.vocab_path)
    buf = load_buffer(list(cfg0.train_list), cfg0, frontend)
    loader = BucketedLoader(buf, cfg0, seed=0)
    batch = next(loader.epoch())
    host_batch = {k: v for k, v in batch.items() if k != "audiopaths"}
    # H2D bandwidth at this batch size — the production loop re-uploads
    # ~350 MB (feat_target f32 + attn_prior f32) every step; if the axon
    # tunnel moves that slowly, the loop is transfer-bound regardless of
    # device compute, which would explain the 14.5 s/step first run
    nbytes = sum(np.asarray(v).nbytes for v in host_batch.values())
    t0 = time.perf_counter()
    up = {k: jax.device_put(np.asarray(v)) for k, v in host_batch.items()}
    jax.block_until_ready(up)
    dt = time.perf_counter() - t0
    print(json.dumps({"h2d_mb": round(nbytes / 2**20, 1),
                      "h2d_s": round(dt, 2),
                      "h2d_mb_s": round(nbytes / 2**20 / dt, 1)}), flush=True)
    batch = {k: jnp.asarray(v) for k, v in host_batch.items()}
    lens = np.asarray(batch["input_lengths"])
    print(json.dumps({
        "text_lens": [int(x) for x in lens],
        "frame_lens": [int(x) for x in np.asarray(batch["output_lengths"])],
    }), flush=True)

    key = jax.random.PRNGKey(0)
    for cell in a.cells.split(","):
        path, dtype = cell.split(":")
        cfg = cfg_for(path == "flash", dtype)
        t0 = time.perf_counter()
        model, state = t2v.init_state(cfg, key, batch)

        def forward(params, batch):
            outputs, _ = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["text"], batch["src_pos"], batch["feat_target"],
                batch["input_lengths"], batch["output_lengths"],
                batch["feat_pos"], attn_prior=batch["attn_prior"],
                binarize_attention=True, deterministic=False, train_bn=True,
                rngs={"dropout": key}, mutable=["batch_stats"],
            )
            return outputs

        def report(params, batch):
            o = forward(params, batch)
            out = {}
            for k in ("feat_output", "feat_postnet_output",
                      "duration_predictor_output", "duration",
                      "attn", "attn_soft"):
                x = o[k]
                out[k + "_nanfrac"] = jnp.mean(
                    (~jnp.isfinite(x.astype(jnp.float32))).astype(jnp.float32))
            wvf, post, dur = dnn_loss(
                o["feat_output"], o["feat_postnet_output"],
                batch["feat_target"], o["duration_predictor_output"],
                o["duration"])
            out["loss_wvf"] = wvf
            out["loss_post"] = post
            out["loss_dur"] = dur
            out["loss_bin"] = attention_binarization_loss(o["attn"], o["attn_soft"])
            return out

        rep = jax.jit(report)(state.params, batch)
        rep = {k: round(float(v), 5) for k, v in rep.items()}
        rep["cell"] = cell
        rep["compile_plus_first_s"] = round(time.perf_counter() - t0, 1)

        # 3-step chained production-step time (lean, no viz)
        step, _ = t2v.make_train_step(model, cfg, with_viz=False)
        state2, m = step(state, batch, key)
        float(m["total_loss"])
        t0 = time.perf_counter()
        n = 3
        for i in range(n):
            state2, m = step(state2, batch, jax.random.PRNGKey(i))
        rep["step_total_loss"] = round(float(m["total_loss"]), 4)
        rep["step_ms"] = round((time.perf_counter() - t0) / n * 1e3, 1)
        print(json.dumps(rep), flush=True)
        del state2


if __name__ == "__main__":
    main()
