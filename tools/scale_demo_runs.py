"""Larger-corpus training validation (round 2).

Generates a bigger structured demo corpus (240+ utterances, 4 speakers),
then runs real training through both loops:

* Text2Vec: batch 8, --validate — with full charset coverage the val losses
  should IMPROVE (generalization to novel char sequences), unlike the
  20-utterance demo where val overfits;
* Vec2Wav: **feature-space windowed mode** (split=True) at batch 16 — the
  high-throughput config from BENCH_NOTES exercised through the real loop
  (dataset windowing, static shapes, caching, prefetch), not just the
  synthetic-batch bench.

Writes curve summaries to artifacts/scale_runs/.
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/big_demo"
ART = "artifacts/scale_runs"


def _cache():
    import jax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--t2v_steps", type=int, default=2000)
    p.add_argument("--v2w_steps", type=int, default=500)
    p.add_argument("--n_speakers", type=int, default=4)
    p.add_argument("--n_utts", type=int, default=60)
    p.add_argument("--stage", default="both", choices=["t2v", "v2w", "both"])
    p.add_argument("--tag", default="scale",
                   help="run-dir log_seed (+ curve-file suffix when not 'scale')")
    a = p.parse_args()
    suffix = "" if a.tag == "scale" else f"_{a.tag}"
    _cache()
    os.makedirs(ART, exist_ok=True)

    from wavthruvec_pytorch_tpu.data.demo import make_demo_data

    if not os.path.exists(f"{ROOT}/enc_train.txt"):
        make_demo_data(ROOT, n_speakers=a.n_speakers, n_utts=a.n_utts, seed=3)
        print("corpus ready:", ROOT)

    from tools.demo_train_runs import _summarize_tb

    if a.stage in ("t2v", "both"):
        from wavthruvec_pytorch_tpu.config import Text2VecConfig, load_config
        from wavthruvec_pytorch_tpu.train import text2vec_loop

        cfg = load_config(Text2VecConfig, f"{ROOT}/text2vec.json")
        cfg = dataclasses.replace(
            cfg,
            run_path=f"{ART}/text2vec",
            log_seed=a.tag,
            epochs=10**6,
            batch_size=8,
            batch_expand_size=2,
            text_buckets=(32,),
            frame_buckets=(64,),
            log_step=200,
            save_step=10**9,  # curves only; checkpoints are GBs
            val_step=max(100, a.t2v_steps // 8),
        )
        args = text2vec_loop.parse_args(
            ["--max_steps", str(a.t2v_steps), "--scalar_log_step", "2", "--validate"]
        )
        state = text2vec_loop.main(args, cfg)
        s = _summarize_tb(cfg.tensorboard_logs_path, f"{ART}/text2vec_curves{suffix}.json")
        print("t2v done at", int(state.step))
        for tag, v in s.items():
            print(f"  {tag}: {v['first10_mean']} -> {v['last10_mean']} (min {v['min']})")

    if a.stage in ("v2w", "both"):
        from wavthruvec_pytorch_tpu.config import Vec2WavConfig, load_config
        from wavthruvec_pytorch_tpu.train import vec2wav_loop

        cfg = load_config(Vec2WavConfig, f"{ROOT}/vec2wav.json")
        cfg = dataclasses.replace(
            cfg,
            run_path=f"{ART}/vec2wav",
            log_seed=a.tag,
            split=True,           # feature-space windowed mode in the real loop
            segment_size=2560,    # 8 latent frames x 320 (short demo utts)
            batch_size=16,
            log_step=100,
            save_step=10**9,
            val_step=10**9,
        )
        args = vec2wav_loop.parse_args(
            ["--training_epochs", "1000000", "--max_steps", str(a.v2w_steps),
             "--stdout_interval", "100"]
        )
        state = vec2wav_loop.main(args, cfg)
        s = _summarize_tb(cfg.tensorboard_logs_path, f"{ART}/vec2wav_curves{suffix}.json")
        print("v2w done at", int(state.step))
        for tag, v in s.items():
            print(f"  {tag}: {v['first10_mean']} -> {v['last10_mean']} (min {v['min']})")


if __name__ == "__main__":
    main()
