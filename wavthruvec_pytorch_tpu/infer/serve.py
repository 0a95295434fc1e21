"""Long-running synthesis server loop (production serving surface).

Reads one request per line from stdin and writes one result line per
request to stdout — a minimal, dependency-free serving protocol that a
process supervisor or socket wrapper can drive:

    <text>                          -> synthesize with the default speaker
    <speaker_id>|<text>             -> synthesize with that speaker

Speakers come from ``--spk_emb_dir`` (``{spk}.npy``/``.pth`` vocoder
embeddings) plus a reference-clip dir for the Text2Vec conditioning; the
Text2Vec speaker embedding is computed ONCE per speaker and cached
(``Synthesizer.speaker_embedding``), so steady-state requests never rerun
ECAPA.  Output wavs land in ``--out_dir`` with the response line
``OK <path> <seconds>``; errors respond ``ERR <message>``.

Latency behavior: jit programs are cached per (text-bucket, frame-bucket)
shape, so the first request of each shape pays the compile and steady-state
requests run at serving latency (reported per request in the OK line).
"""

from __future__ import annotations

import os
import sys
import time
from typing import Dict, Optional

import numpy as np


class SpeakerStore:
    """Lazy per-speaker conditioning: vocoder spk_emb + cached t2v emb."""

    def __init__(self, synth, spk_emb_dir: str, ref_feat_dir: Optional[str]):
        self.synth = synth
        self.spk_emb_dir = spk_emb_dir
        self.ref_feat_dir = ref_feat_dir
        self._voc: Dict[str, np.ndarray] = {}
        self._t2v: Dict[str, np.ndarray] = {}

    def speakers(self):
        return sorted(
            os.path.splitext(f)[0]
            for f in os.listdir(self.spk_emb_dir)
            if f.endswith((".npy", ".pth"))
        )

    def vocoder_emb(self, spk: str) -> np.ndarray:
        if spk not in self._voc:
            from wavthruvec_pytorch_tpu.data.vocoder_data import load_spk_emb

            for ext in (".npy", ".pth"):
                p = os.path.join(self.spk_emb_dir, spk + ext)
                if os.path.exists(p):
                    self._voc[spk] = load_spk_emb(p)
                    break
            else:
                raise KeyError(f"no speaker embedding for {spk!r}")
        return self._voc[spk]

    def t2v_emb(self, spk: str) -> Optional[np.ndarray]:
        """Cached Text2Vec-ECAPA embedding from the speaker's reference clip
        (first .npy under ref_feat_dir/{spk}/); None if unavailable."""
        if self.ref_feat_dir is None:
            return None
        if spk not in self._t2v:
            d = os.path.join(self.ref_feat_dir, spk)
            clips = sorted(f for f in os.listdir(d) if f.endswith(".npy")) if os.path.isdir(d) else []
            if not clips:
                return None
            ref = np.load(os.path.join(d, clips[0])).squeeze()[None]
            self._t2v[spk] = self.synth.speaker_embedding(
                ref.astype(np.float32))  # [1, n_speaker_dim]
        return self._t2v[spk]


def warmup(synth, max_frames: Optional[int] = None, alpha: float = 1.0):
    """Pre-compile the synthesis programs for every configured text bucket
    so the first real request runs at serving latency (compiles are cached
    per shape)."""
    cfg = synth.t2v_cfg
    mf = max_frames or cfg.frame_buckets[-1]
    emb = np.zeros((1, cfg.n_speaker_dim), np.float32)
    spk = np.zeros((1, synth.v2w_cfg.spk_dim), np.float32)
    done = []
    for nb in cfg.text_buckets:
        # one dummy text padded to this bucket (frontend pads via pad_to)
        text = " " * max(1, nb - 2)
        out = synth.text_to_latents(
            [text], None, alpha=alpha, max_frames=mf, t2v_spk_emb=emb
        )
        synth.latents_to_wav(out["feat_postnet_output"], spk)
        done.append(nb)
    return done


def serve_loop(
    synth,
    store: SpeakerStore,
    out_dir: str,
    default_speaker: Optional[str] = None,
    alpha: float = 1.0,
    max_frames: Optional[int] = None,
    stdin=None,
    stdout=None,
    do_warmup: bool = False,
):
    from wavthruvec_pytorch_tpu.infer.synthesize import write_wav

    stdin = stdin if stdin is not None else sys.stdin
    stdout = stdout if stdout is not None else sys.stdout
    if do_warmup:
        buckets = warmup(synth, max_frames=max_frames, alpha=alpha)
        print(f"WARM {buckets}", file=stdout, flush=True)
    os.makedirs(out_dir, exist_ok=True)
    default_speaker = default_speaker or (store.speakers() or [None])[0]
    n = 0
    for line in stdin:
        line = line.strip()
        if not line:
            continue
        if line == "QUIT":
            break
        try:
            spk, text = line.split("|", 1) if "|" in line else (default_speaker, line)
            if spk is None:
                raise ValueError("no speaker available")
            t0 = time.perf_counter()
            t2v_emb = store.t2v_emb(spk)
            wavs, n_samples = synth.synthesize(
                [text],
                None if t2v_emb is not None else np.zeros(
                    (1, 1, synth.t2v_cfg.n_feat_dim), np.float32),
                store.vocoder_emb(spk)[None],
                alpha=alpha,
                max_frames=max_frames,
                t2v_spk_emb=t2v_emb if t2v_emb is not None else None,
            )
            path = os.path.join(out_dir, f"utt_{n:06d}.wav")
            write_wav(path, wavs[0][: int(n_samples[0])])
            dt = time.perf_counter() - t0
            print(f"OK {path} {int(n_samples[0]) / 16000:.2f}s "
                  f"latency={dt * 1e3:.1f}ms", file=stdout, flush=True)
            n += 1
        except Exception as e:  # keep serving
            print(f"ERR {e}", file=stdout, flush=True)
    return n
