"""Multi-chip demo training at real step counts (VERDICT r3 ask #7).

Runs a few hundred steps of BOTH production loops (Text2Vec and windowed
Vec2Wav GAN) on the 8-device virtual CPU mesh AND single-device, same data
order / seeds / configs, then checks the sharded loss trajectories track the
single-device ones.  This upgrades multi-chip evidence from "one step, tiny
shapes" (dryrun) to "training actually progresses sharded" — a path the
reference never exercised (vec2wav/hparams.py:68 world_size=1).

Each leg runs in a subprocess because the XLA host-device count is fixed at
backend init.  Uses the demo corpus's tiny (64-dim) tree so CPU steps are
tractable; the MESH MATH is identical at any width — jit sharding is layout,
not different semantics, so matching trajectories here validate the same
program structure the full-size TPU mesh uses.

    python tools/multichip_demo_runs.py [--t2v_steps 300] [--v2w_steps 200]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/multichip_demo"
ART = "artifacts/multichip_demo"  # --device_resident appends "_drd"


def _summarize_tb_full(tb_dir: str, out_json: str):
    """Full scalar series (not just first/last means) -> json."""
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(tb_dir)
    acc.Reload()
    summary = {}
    for tag in acc.Tags().get("scalars", []):
        events = acc.Scalars(tag)
        if not events:
            continue
        summary[tag] = {
            "steps": [int(e.step) for e in events],
            "values": [round(float(e.value), 6) for e in events],
        }
    with open(out_json, "w") as f:
        json.dump(summary, f)
    return summary


def leg_t2v(steps: int, devices: int, device_resident: bool = False):
    from wavthruvec_pytorch_tpu.config import Text2VecConfig, load_config
    from wavthruvec_pytorch_tpu.train import text2vec_loop

    cfg = load_config(Text2VecConfig, f"{ROOT}/text2vec_tiny.json")
    cfg = dataclasses.replace(
        cfg,
        run_path=f"/tmp/mc_runs/text2vec_{devices}dev"
                 + ("_drd" if device_resident else ""),
        log_seed="mc",
        epochs=10**6,
        batch_size=8,
        batch_expand_size=2,
        text_buckets=(32,),
        frame_buckets=(64,),
        log_step=10**9,
        save_step=10**9,
        val_step=10**9,
        # --device_resident: the SHARDED leg assembles every batch with the
        # on-device gather (batches emitted P("data")) while the 1-device
        # leg keeps the host collate — matching trajectories prove the
        # HBM-resident dataset composes with the mesh path exactly
        device_resident_data=device_resident and devices > 1,
    )
    args = text2vec_loop.parse_args(
        ["--max_steps", str(steps), "--scalar_log_step", "1",
         "--no-prefetch"])
    state = text2vec_loop.main(args, cfg)
    _summarize_tb_full(cfg.tensorboard_logs_path,
                       f"{ART}/t2v_{devices}dev_curves.json")
    print(f"t2v {devices}dev done at step {int(state.step)}")


def leg_v2w(steps: int, devices: int):
    from wavthruvec_pytorch_tpu.config import Vec2WavConfig, load_config
    from wavthruvec_pytorch_tpu.train import vec2wav_loop

    cfg = load_config(Vec2WavConfig, f"{ROOT}/vec2wav_tiny.json")
    cfg = dataclasses.replace(
        cfg,
        run_path=f"/tmp/mc_runs/vec2wav_{devices}dev",
        log_seed="mc",
        split=True,               # feature-space windowed production mode
        segment_size=2560,        # 8 latent frames x 320
        batch_size=8,
        log_step=1,               # v2w scalars are logged every log_step
        save_step=10**9,
        val_step=10**9,
    )
    args = vec2wav_loop.parse_args(
        ["--training_epochs", "1000000", "--max_steps", str(steps),
         "--stdout_interval", "50"])
    state = vec2wav_loop.main(args, cfg)
    _summarize_tb_full(cfg.tensorboard_logs_path,
                       f"{ART}/v2w_{devices}dev_curves.json")
    print(f"v2w {devices}dev done at step {int(state.step)}")


def compare(stage: str, tags):
    """Sharded-vs-single trajectory agreement for the given scalar tags."""
    import numpy as np

    with open(f"{ART}/{stage}_8dev_curves.json") as f:
        a = json.load(f)
    with open(f"{ART}/{stage}_1dev_curves.json") as f:
        b = json.load(f)
    out = {}
    for tag in tags:
        va = np.array(a[tag]["values"], np.float64)
        vb = np.array(b[tag]["values"], np.float64)
        n = min(len(va), len(vb))
        va, vb = va[:n], vb[:n]
        k = max(1, n // 10)
        # smoothed relative gap over the trajectory + endpoint agreement
        sm_a = np.convolve(va, np.ones(k) / k, mode="valid")
        sm_b = np.convolve(vb, np.ones(k) / k, mode="valid")
        denom = np.maximum(np.abs(sm_b), 1e-6)
        out[tag] = {
            "n": int(n),
            "mean_rel_gap_smoothed": round(
                float(np.mean(np.abs(sm_a - sm_b) / denom)), 4),
            "last10_8dev": round(float(va[-k:].mean()), 4),
            "last10_1dev": round(float(vb[-k:].mean()), 4),
            "decreased_8dev": bool(va[-k:].mean() < va[:k].mean()),
            "decreased_1dev": bool(vb[-k:].mean() < vb[:k].mean()),
        }
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--t2v_steps", type=int, default=300)
    p.add_argument("--v2w_steps", type=int, default=200)
    p.add_argument("--leg", default="", help="(internal) t2v|v2w child leg")
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--device_resident", action="store_true",
                   help="t2v only: sharded leg uses the HBM-resident "
                        "dataset (on-device gather, P('data') batches); "
                        "writes to artifacts/multichip_demo_drd")
    a = p.parse_args()

    global ART
    if a.device_resident:
        ART = ART + "_drd"

    if a.leg:
        # child: backend already pinned via env set by the parent
        if a.leg == "t2v":
            leg_t2v(a.t2v_steps, a.devices, device_resident=a.device_resident)
        else:
            leg_v2w(a.v2w_steps, a.devices)
        return

    os.makedirs(ART, exist_ok=True)
    from wavthruvec_pytorch_tpu.data.demo import make_demo_data

    if not os.path.exists(f"{ROOT}/text2vec_tiny.json"):
        make_demo_data(ROOT, n_speakers=2, n_utts=40, frames=(24, 56), seed=5)
        print("corpus ready:", ROOT)

    legs = [("t2v", a.t2v_steps)] if a.device_resident else [
        ("t2v", a.t2v_steps), ("v2w", a.v2w_steps)]
    for leg, steps in legs:
        for devices in (8, 1):
            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={devices}")
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--leg", leg, "--devices", str(devices),
                   "--t2v_steps", str(a.t2v_steps),
                   "--v2w_steps", str(a.v2w_steps)]
            if a.device_resident:
                cmd.append("--device_resident")
            print(f"=== {leg} on {devices} device(s) ===", flush=True)
            subprocess.run(cmd, check=True, env=env, cwd="/root/repo")

    summary = {
        "t2v": compare("t2v", ["train/total_loss", "train/WVF_loss",
                               "train/duration_loss"]),
        "t2v_steps": a.t2v_steps,
        "v2w_steps": a.v2w_steps,
    }
    if a.device_resident:
        summary["mode"] = "t2v 8dev device-resident (P('data') gather) vs 1dev host collate"
    else:
        summary["v2w"] = compare(
            "v2w", ["training/gen_loss_total", "training/mel_spec_error"])
    with open(f"{ART}/summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
