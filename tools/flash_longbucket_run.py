"""Real long-bucket (3072-frame) Text2Vec training with flash attention ON,
through the PRODUCTION loop (prefetch, TB logging, checkpointing).

The flash path (Text2VecConfig.flash_attention) is guarded against the
attention-prob-dropout deviation (models/fft_block.py raises when
flash & dropout>0 & non-deterministic), on-chip validated for equivalence
(tools/flash_check.py) and step-timed (train_bench --stage t2v-flash).
What was missing is a REAL training run at the long bucket: this generates
an AISHELL-3-shaped corpus whose utterances extend to ~3,000 latent frames
(the reference's max_seq_len cap, text2vec/hparams.py:24), then trains the
full-size model at frame bucket 3072 / text bucket 448, bf16, dropout 0,
and reports steps/s + loss trajectory + peak HBM.

    python tools/flash_longbucket_run.py [--steps 100] [--batch 16]
        [--no_flash]   # dense A/B at the same shapes
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v2 corpus: n_chars=800 so the encoder position table (vocab_size+1 rows,
# the reference's n_position quirk) covers the ~719-char texts — the v1
# corpus's 123-symbol vocab made every text >123 chars gather NaN position
# rows (jnp.take OOB fill), which is what NaN'd the first recorded run
ROOT = "/tmp/long_demo_v2_u{n_utts}"  # formatted per --n_utts
ART = "artifacts/flash_longbucket"


def _cache():
    import jax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # acquisition mark for hang-aware supervisors (see memory/tpu quirks)
    print("devices:", jax.devices(), file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--no_flash", action="store_true")
    p.add_argument("--n_utts", type=int, default=16,
                   help="per speaker; 16 -> 32 utts = 2 batches/epoch so "
                        "the prefetch thread can overlap the ~350 MB/step "
                        "host collation+upload with device compute")
    a = p.parse_args()
    _cache()

    import jax

    from wavthruvec_pytorch_tpu.config import Text2VecConfig, load_config
    from wavthruvec_pytorch_tpu.data.demo import make_demo_data
    from wavthruvec_pytorch_tpu.train import text2vec_loop

    root = ROOT.format(n_utts=a.n_utts)
    if not os.path.exists(os.path.join(root, "text2vec.json")):
        make_demo_data(root=root, n_speakers=2, n_utts=a.n_utts,
                       frames=(2048, 3600), max_frames=3040, n_chars=800,
                       seed=7)
    tag = "dense" if a.no_flash else "flash"
    # fresh run dir: stale TB events from a previous attempt would pollute
    # the steady_sec_per_step estimate below
    import shutil

    shutil.rmtree(f"{ART}/{tag}", ignore_errors=True)
    cfg = load_config(Text2VecConfig, os.path.join(root, "text2vec.json"))
    cfg = dataclasses.replace(
        cfg,
        # decoder table must cover the 3072-frame bucket (reference caps
        # its data at max_seq_len=3000; this run deliberately exceeds it)
        max_seq_len=3072,
        run_path=f"{ART}/{tag}",
        log_seed="longbucket",
        epochs=10**6,
        batch_size=a.batch,
        batch_expand_size=1,
        # demo texts run to frames[1]//5 - 1 = 719 chars before the frame cap
        # trims them (data/demo.py); 768 covers worst case and is a 128-multiple
        # so the encoder stack is also flash-eligible
        text_buckets=(768,),
        frame_buckets=(3072,),
        compute_dtype="bfloat16",
        flash_attention=not a.no_flash,
        dropout=0.0,  # flash kernel cannot apply attention-prob dropout
        # stage the ~700 MB padded corpus in HBM once: per-step uploads of
        # this 336 MB batch degrade to ~7 s on this host after the first
        # program execution (tools/upload_bench.py --with_step)
        device_resident_data=True,
        # viz images every 100 steps; both step programs AOT-precompile at
        # loop start (--precompile default), so the first viz iteration no
        # longer pays a compile stall
        log_step=100,
        save_step=max(50, a.steps),
        val_step=10**9,
    )
    args = text2vec_loop.parse_args(
        ["--max_steps", str(a.steps), "--scalar_log_step", "1"])
    t0 = time.perf_counter()
    state = text2vec_loop.main(args, cfg)
    wall = time.perf_counter() - t0

    mem = {}
    try:
        stats = jax.devices()[0].memory_stats() or {}
        for k in ("peak_bytes_in_use", "bytes_in_use", "bytes_limit"):
            if k in stats:
                mem[k + "_gb"] = round(stats[k] / 2**30, 2)
    except Exception:
        pass

    # steady-state steps/s from the TB wall-clock of the last half
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(cfg.tensorboard_logs_path)
    acc.Reload()
    out = {"mode": tag, "batch": a.batch, "frame_bucket": 3072,
           "text_bucket": 768, "dtype": "bfloat16", "dropout": 0.0,
           "steps": int(state.step), "wall_s_incl_compile": round(wall, 1),
           **mem}
    for tag_name in acc.Tags().get("scalars", []):
        ev = acc.Scalars(tag_name)
        if len(ev) >= 4:
            if tag_name.startswith("train/"):
                out[tag_name + "_last"] = round(float(ev[-1].value), 4)
            if "total" in tag_name:
                # the loop flushes scalars in batches, so wall_times cluster
                # per flush: group events into flush stamps, then take the
                # MEDIAN inter-flush step rate — robust to the one-time
                # outliers a last-half endpoint estimate folds in (first-use
                # program compiles, the step-100 checkpoint save)
                import numpy as _np

                stamps = []  # (wall_time, last_step) per flush cluster
                for e in ev:
                    if stamps and e.wall_time - stamps[-1][0] < 0.2:
                        stamps[-1] = (e.wall_time, e.step)
                    else:
                        stamps.append((e.wall_time, e.step))
                rates = [
                    (stamps[i + 1][0] - stamps[i][0])
                    / max(stamps[i + 1][1] - stamps[i][1], 1)
                    for i in range(len(stamps) - 1)
                ]
                if rates:
                    out["steady_sec_per_step"] = round(
                        float(_np.median(rates)), 4)
                    out["flush_rate_spread"] = [
                        round(float(_np.percentile(rates, p)), 3)
                        for p in (10, 50, 90)]
    os.makedirs(ART, exist_ok=True)
    with open(f"{ART}/{tag}_summary.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
