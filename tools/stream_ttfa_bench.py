"""StreamingVocoder vs whole-utterance serving: time-to-first-audio (TTFA).

Round-4 VERDICT ask #5: the StreamingVocoder was built for low TTFA and
wired into infer/serve.py but never measured.  This drives the REAL
``serve_loop`` (pcm transport) with full-size random-init models at a
duration scale producing realistic 6-10 s utterances, a coalesced batch of
B requests per round, two rounds (round 1 pays the chunk-program compiles;
round 2 is the warm number), in both modes:

* ``stream_chunk=None`` — whole-utterance path: one ``PCM ... latency=``
  line per utterance (latency == batch completion for all of them);
* ``stream_chunk=K`` — chunked path: per-utterance ``PCMEND n latency=
  ttfa=`` lines; within a batch utterances stream sequentially, so later
  items' TTFA includes earlier items' streams (client-perceived truth).

    python tools/stream_ttfa_bench.py [--batch 8] [--alpha 50] [--chunk 100]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEXTS = ["abc def ghi", "hello world again", "load test utterance xyz"]


def _cache():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), file=sys.stderr, flush=True)


def parse(mode: str, raw: bytes, batch: int):
    """Per-round stats from the serve_loop pcm byte stream."""
    if mode == "stream":
        hits = re.findall(
            rb"PCMEND (\d+) latency=([\d.]+)ms ttfa=([\d.]+)ms\n", raw)
        rows = [(int(n), float(l), float(t)) for n, l, t in hits]
    else:
        hits = re.findall(
            rb"PCM (\d+) \d+ latency=([\d.]+)ms batched=(\d+)\n", raw)
        rows = [(int(n), float(l), None) for n, l, _ in hits]
    rounds = [rows[i:i + batch] for i in range(0, len(rows), batch)]
    out = []
    for r, chunk in enumerate(rounds):
        lats = [x[1] for x in chunk]
        ttfas = [x[2] for x in chunk if x[2] is not None]
        out.append({
            "round": r, "n": len(chunk),
            "mean_audio_s": round(
                sum(x[0] for x in chunk) / max(len(chunk), 1) / 16000.0, 2),
            "latency_ms_minmax": [round(min(lats), 1), round(max(lats), 1)]
            if lats else None,
            **({"ttfa_ms_first": round(ttfas[0], 1),
                "ttfa_ms_minmax": [round(min(ttfas), 1), round(max(ttfas), 1)]}
               if ttfas else {}),
        })
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--alpha", type=float, default=50.0)
    ap.add_argument("--chunk", type=int, default=100)
    a = ap.parse_args()
    _cache()

    from serve_load_bench import build_synth_store

    from wavthruvec_pytorch_tpu.infer.serve import serve_loop

    with tempfile.TemporaryDirectory() as tmp:
        synth, store = build_synth_store(tmp)
        lines = []
        for _ in range(2):  # two rounds: cold (compiles) then warm
            for i in range(a.batch):
                lines.append(f"SSB{i % 2:04d}|{TEXTS[i % len(TEXTS)]}")
        lines.append("QUIT")
        stdin_text = "\n".join(lines) + "\n"

        for mode, chunk in (("whole", None), ("stream", a.chunk)):
            out = io.BytesIO()
            t0 = time.perf_counter()
            served = serve_loop(
                synth, store, tmp, alpha=a.alpha, max_frames=500,
                stdin=io.StringIO(stdin_text), stdout=out, do_warmup=True,
                max_batch=a.batch, pcm=True, stream_chunk=chunk)
            for row in parse(mode, out.getvalue(), a.batch):
                print(json.dumps({
                    "mode": mode, "batch": a.batch, "alpha": a.alpha,
                    "chunk_frames": chunk, "served": served,
                    "wall_s": round(time.perf_counter() - t0, 1), **row}),
                    flush=True)


if __name__ == "__main__":
    main()
