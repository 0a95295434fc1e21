"""Coalescing-window tuning under load: drive the real SynthesisService
(http_serve.py worker, full-size models) with Poisson arrivals and measure
client-perceived latency + achieved throughput per (offered load, window).

The stdin/HTTP transports are bypassed — requests go straight into the
service queue — so what's measured is the coalescing policy + synthesis,
not socket overhead.  Usage:

    python tools/serve_load_bench.py [--rates 50,150,300] [--waits 0,5,20,50]
        [--max_batch 32] [--duration 15]

Prints one JSON line per (rate, wait) cell:
    {"offered_utt_s", "wait_ms", "achieved_utt_s", "p50_ms", "p95_ms",
     "mean_batch", "max_batch_seen", "n"}
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import queue
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FRAMES = 500  # 10 s of audio per utterance, same shape bench.py serves


def _cache():
    import jax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # acquisition mark for hang-aware supervisors (see memory/tpu quirks)
    print("devices:", jax.devices(), file=sys.stderr, flush=True)


def build_synth_store(tmp: str, gen_precision: str = "f32"):
    """Full-size random-init Synthesizer + SpeakerStore (shared with
    tools/stream_ttfa_bench.py)."""
    import jax
    import jax.numpy as jnp

    from wavthruvec_pytorch_tpu.config import Text2VecConfig, Vec2WavConfig
    from wavthruvec_pytorch_tpu.infer.http_serve import SynthesisService
    from wavthruvec_pytorch_tpu.infer.serve import SpeakerStore
    from wavthruvec_pytorch_tpu.infer.synthesize import (
        Synthesizer,
        make_serving_generator,
    )
    from wavthruvec_pytorch_tpu.models import Generator, Text2Vec
    from wavthruvec_pytorch_tpu.text import TextFrontend

    # full-size configs; ONE text bucket so warmup is len(batch_buckets)
    # programs per leg, and frames capped at the serving shape
    t2v_cfg = dataclasses.replace(
        Text2VecConfig(), text_buckets=(32,), frame_buckets=(N_FRAMES,))
    v2w_cfg = Vec2WavConfig()
    syms = "PE " + "abcdefghijklmnopqrstuvwxyz"
    t2v_cfg = dataclasses.replace(t2v_cfg, vocab_size=len(syms))
    frontend = TextFrontend(syms)

    rng = jax.random.PRNGKey(0)
    t2v = Text2Vec(t2v_cfg)
    gen = Generator(v2w_cfg)
    ref = jax.random.normal(rng, (1, 128, t2v_cfg.n_feat_dim)) * 0.1
    t2v_vars = jax.jit(
        lambda: t2v.init(
            {"params": rng, "dropout": rng},
            jnp.ones((1, 8), jnp.int32),
            jnp.arange(1, 9, dtype=jnp.int32)[None],
            ref, 32, 1.0, method=Text2Vec.infer,
        )
    )()
    gen_vars = jax.jit(
        lambda: gen.init(
            rng, jnp.zeros((1, 8, v2w_cfg.n_feat_dim)),
            jnp.zeros((1, v2w_cfg.spk_dim)), jnp.zeros((1, v2w_cfg.noise_dim)),
            train=False,
        )
    )()
    gen, gen_vars = make_serving_generator(v2w_cfg, gen_vars, gen_precision)
    synth = Synthesizer(t2v_cfg, v2w_cfg, t2v_vars, gen_vars, frontend, gen=gen)

    # two speakers with full-size embeddings + reference clips
    spk_dir = os.path.join(tmp, "spk_emb")
    ref_dir = os.path.join(tmp, "refs")
    os.makedirs(spk_dir, exist_ok=True)
    nprng = np.random.default_rng(0)
    for spk in ("SSB0000", "SSB0001"):
        np.save(os.path.join(spk_dir, spk + ".npy"),
                nprng.standard_normal(v2w_cfg.spk_dim).astype(np.float32))
        os.makedirs(os.path.join(ref_dir, spk), exist_ok=True)
        np.save(os.path.join(ref_dir, spk, "clip.npy"),
                (nprng.standard_normal((1, 128, t2v_cfg.n_feat_dim)) * 0.1
                 ).astype(np.float32))
    store = SpeakerStore(synth, spk_dir, ref_dir)
    return synth, store


def build_service(max_batch: int, coalesce_wait_ms: float, tmp: str,
                  gen_precision: str = "f32", alpha: float = 1.0):
    from wavthruvec_pytorch_tpu.infer.http_serve import SynthesisService

    synth, store = build_synth_store(tmp, gen_precision)
    # alpha scales the (random-init, ~0-valued) duration-predictor output:
    # durations = floor((dp + 0.5) * alpha), so alpha~50 yields ~25
    # frames/char -> ~300-500-frame (6-10 s) utterances, i.e. REALISTIC
    # payload sizes through the exact serving path (round-4 grid cells
    # emitted near-zero audio; VERDICT r4 ask #5)
    service = SynthesisService(
        synth, store, alpha=alpha, max_frames=N_FRAMES,
        max_batch=max_batch, coalesce_wait_ms=coalesce_wait_ms)
    return service


def run_cell(service, rate_utt_s: float, duration_s: float, seed: int = 0):
    """Poisson arrivals at ``rate_utt_s`` for ``duration_s``; returns
    latency/batch stats over completed requests."""
    nprng = np.random.default_rng(seed)
    texts = ["abc def ghi", "hello world", "load test utterance"]
    done_q: "queue.Queue" = queue.Queue()
    results = []

    def waiter():
        while True:
            item = done_q.get()
            if item is None:
                return
            t_sub, pending = item
            pending.done.wait(timeout=600)
            results.append(
                ((time.perf_counter() - t_sub) * 1e3, pending.batched,
                 pending.error, pending.n_samples))

    waiters = [threading.Thread(target=waiter, daemon=True) for _ in range(64)]
    for w in waiters:
        w.start()

    t_end = time.perf_counter() + duration_s
    n = 0
    while time.perf_counter() < t_end:
        time.sleep(float(nprng.exponential(1.0 / rate_utt_s)))
        spk = f"SSB{n % 2:04d}"
        pending = service.submit(spk, texts[n % len(texts)])
        done_q.put((time.perf_counter(), pending))
        n += 1
    # drain
    t0 = time.perf_counter()
    while len(results) < n and time.perf_counter() - t0 < 600:
        time.sleep(0.05)
    for _ in waiters:
        done_q.put(None)

    lats = np.array([r[0] for r in results if r[2] is None])
    batches = np.array([r[1] for r in results if r[2] is None])
    samps = np.array([r[3] for r in results if r[2] is None])
    errs = [r for r in results if r[2] is not None]
    span = duration_s + (lats.max() / 1e3 if lats.size else 0.0)
    return {
        "n": int(n),
        "errors": len(errs),
        "achieved_utt_s": round(len(lats) / span, 1),
        "p50_ms": round(float(np.percentile(lats, 50)), 1) if lats.size else None,
        "p95_ms": round(float(np.percentile(lats, 95)), 1) if lats.size else None,
        "mean_batch": round(float(batches.mean()), 2) if batches.size else None,
        "max_batch_seen": int(batches.max()) if batches.size else None,
        # payload evidence: mean emitted audio per utterance (16 kHz)
        "mean_audio_s": round(float(samps.mean()) / 16000.0, 2) if samps.size else None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rates", default="50,150,300")
    ap.add_argument("--waits", default="0,5,20,50")
    ap.add_argument("--max_batch", type=int, default=32)
    ap.add_argument("--duration", type=float, default=15.0)
    ap.add_argument("--gen_precision", choices=("f32", "bf16"), default="f32")
    ap.add_argument("--alpha", type=float, default=1.0,
                    help="duration scale; ~50 gives realistic 6-10 s "
                         "utterances from random-init models")
    a = ap.parse_args()
    _cache()

    rates = [float(x) for x in a.rates.split(",")]
    waits = [float(x) for x in a.waits.split(",")]

    with tempfile.TemporaryDirectory() as tmp:
        # one service per wait setting (worker policy is fixed at init);
        # jit programs are shared process-wide via the Synthesizer caches,
        # but build one synth per service for isolation: warm each fully.
        for wait in waits:
            service = build_service(a.max_batch, wait, tmp,
                                    gen_precision=a.gen_precision,
                                    alpha=a.alpha)
            # progress mark for tpu_run.sh ACQ_MARK: the acquisition hang
            # can strike at the process's first device transfer, AFTER the
            # "devices:" mark (see tools/tpu_run.sh)
            print(f"mark: service built (wait={wait})", file=sys.stderr,
                  flush=True)
            t0 = time.perf_counter()
            service.warmup()
            warm_s = round(time.perf_counter() - t0, 1)
            for rate in rates:
                stats = run_cell(service, rate, a.duration)
                print(json.dumps({
                    "offered_utt_s": rate, "wait_ms": wait,
                    "warmup_s": warm_s, **stats}), flush=True)
            service.close()


if __name__ == "__main__":
    main()
