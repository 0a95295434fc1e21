"""Short real training runs on the bundled demo dataset (full-size models).

Runs a few hundred steps of each stage end-to-end through the real training
loops (prefetch, caching, TB logging, checkpointing, validation) and leaves
the TensorBoard event files + a loss-curve summary under
``artifacts/demo_runs/`` for inspection.  AISHELL-3 itself is not mounted in
this image, so the corpus is the synthetic AISHELL-3-shaped demo set — the
point is real-loop dynamics (loss mix decreasing, checkpoints, resume), not
fidelity.

    python tools/demo_train_runs.py [--t2v_steps 300] [--v2w_steps 200]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ART = "artifacts/demo_runs"


def _cache():
    import jax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _summarize_tb(tb_dir: str, out_json: str):
    """Extract scalar curves from TB event files -> json summary."""
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(tb_dir)
    acc.Reload()
    summary = {}
    for tag in acc.Tags().get("scalars", []):
        events = acc.Scalars(tag)
        vals = [e.value for e in events]
        if not vals:
            continue
        k = max(1, len(vals) // 10)
        summary[tag] = {
            "n": len(vals),
            "first10_mean": round(float(sum(vals[:k]) / k), 4),
            "last10_mean": round(float(sum(vals[-k:]) / k), 4),
            "min": round(float(min(vals)), 4),
        }
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=2)
    return summary


def run_t2v(steps: int):
    from wavthruvec_pytorch_tpu.config import Text2VecConfig, load_config
    from wavthruvec_pytorch_tpu.train import text2vec_loop

    cfg = load_config(Text2VecConfig, "data/demo/text2vec.json")
    cfg = dataclasses.replace(
        cfg,
        run_path=f"{ART}/text2vec",
        log_seed="demo",
        epochs=10**6,  # bounded by --max_steps
        text_buckets=(32,),
        frame_buckets=(64,),
        log_step=50,
        save_step=max(50, steps // 2),
        val_step=max(50, steps // 2),
    )
    args = text2vec_loop.parse_args(
        ["--max_steps", str(steps), "--scalar_log_step", "1", "--validate"]
    )
    state = text2vec_loop.main(args, cfg)
    s = _summarize_tb(cfg.tensorboard_logs_path, f"{ART}/text2vec_curves.json")
    print("t2v done at step", int(state.step))
    for tag, v in s.items():
        print(f"  {tag}: {v['first10_mean']} -> {v['last10_mean']}")
    return s


def run_v2w(steps: int):
    from wavthruvec_pytorch_tpu.config import Vec2WavConfig, load_config
    from wavthruvec_pytorch_tpu.train import vec2wav_loop

    cfg = load_config(Vec2WavConfig, "data/demo/vec2wav.json")
    cfg = dataclasses.replace(
        cfg,
        run_path=f"{ART}/vec2wav",
        log_seed="demo",
        frame_buckets=(64,),
        log_step=25,
        save_step=max(50, steps // 2),
        val_step=max(50, steps),
    )
    args = vec2wav_loop.parse_args(
        ["--training_epochs", "1000000", "--max_steps", str(steps),
         "--stdout_interval", "50"]
    )
    state = vec2wav_loop.main(args, cfg)
    s = _summarize_tb(cfg.tensorboard_logs_path, f"{ART}/vec2wav_curves.json")
    print("v2w done at step", int(state.step))
    for tag, v in s.items():
        print(f"  {tag}: {v['first10_mean']} -> {v['last10_mean']}")
    return s


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--t2v_steps", type=int, default=300)
    p.add_argument("--v2w_steps", type=int, default=200)
    p.add_argument("--stage", default="both", choices=["t2v", "v2w", "both"])
    a = p.parse_args()
    _cache()
    os.makedirs(ART, exist_ok=True)
    if a.stage in ("t2v", "both"):
        run_t2v(a.t2v_steps)
    if a.stage in ("v2w", "both"):
        run_v2w(a.v2w_steps)
