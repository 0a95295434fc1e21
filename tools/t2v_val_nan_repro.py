"""Reproduce + capture the intermittent val-NaN seen in the 8x120 demo run.

The 20k-step Text2Vec scale run (tools/scale_demo_runs.py --tag scale8x120)
showed validation losses = NaN at steps 5000 and 10000 but finite at 2500
and 7500, while every train loss stayed finite.  Validation is a pure
function of params (deterministic val set, no dropout), so the NaN is
parameter-dependent.  This tool reruns the IDENTICAL training trajectory
(same config/seed; extra val calls and checkpoints do not touch the loop's
rng) with dense validation + checkpoints so the offending params get saved
the first time a val loss goes non-finite.  Analysis then runs offline on
CPU from the checkpoint (tools/t2v_val_nan_analyze.py).
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/big_demo"
OUT = "/tmp/nan_repro"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max_steps", type=int, default=5100)
    p.add_argument("--val_step", type=int, default=500)
    a = p.parse_args()

    import jax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from wavthruvec_pytorch_tpu.config import Text2VecConfig, load_config
    from wavthruvec_pytorch_tpu.data.demo import make_demo_data
    from wavthruvec_pytorch_tpu.train import text2vec_loop

    if not os.path.exists(f"{ROOT}/enc_train.txt"):
        make_demo_data(ROOT, n_speakers=8, n_utts=120, seed=3)

    cfg = load_config(Text2VecConfig, f"{ROOT}/text2vec.json")
    # MUST mirror tools/scale_demo_runs.py's t2v stage for the same
    # parameter trajectory; only val_step/save_step/log paths differ.
    cfg = dataclasses.replace(
        cfg,
        run_path=OUT,
        log_seed="repro",
        epochs=10**6,
        batch_size=8,
        batch_expand_size=2,
        text_buckets=(32,),
        frame_buckets=(64,),
        log_step=200,
        save_step=a.val_step,
        val_step=a.val_step,
    )
    args = text2vec_loop.parse_args(
        ["--max_steps", str(a.max_steps), "--scalar_log_step", "2", "--validate"]
    )
    state = text2vec_loop.main(args, cfg)
    print("repro run done at", int(state.step),
          "- checkpoints in", cfg.checkpoint_path)


if __name__ == "__main__":
    main()
