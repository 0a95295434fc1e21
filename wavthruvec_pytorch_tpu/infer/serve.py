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

Two production additions beyond the basic loop:

* **Request coalescing** (``max_batch > 1``): requests that are already
  queued on stdin when the server becomes free are synthesized as ONE
  batched call (mixed speakers and text lengths are fine — per-item
  embeddings are stacked and padding is masked).  serve_bench shows batch
  32 reaches ~208 utt/s vs 192 at batch 1, and coalescing amortizes
  dispatch under bursty load without adding latency when idle (a request
  arriving alone still runs immediately).  Responses keep request order.
  Coalesced batches are padded to power-of-two batch buckets so the jit
  program space is fixed and ``--warmup`` can pre-compile ALL of it (at
  most 2x padded compute on odd batch sizes — a latency/compile tradeoff).
* **PCM-over-stdout** (``pcm=True``): instead of writing wav files, raw
  int16 little-endian PCM is written to the (binary) output stream framed
  by text control lines — with ``stream_chunk`` set, audio of each
  utterance is emitted in chunks while later chunks are still being
  computed (StreamingVocoder, exact stitching), for true streaming
  playback through a pipe:

      PCMSTART <sr>\\n
      PCMCHUNK <n_bytes>\\n<bytes>...
      PCMEND <n_samples> latency=<ms> ttfa=<ms>\\n

  (``latency``/``ttfa`` are client-perceived: measured from coalesced-batch
  arrival to the item's last/first audio bytes.)
"""

from __future__ import annotations

import functools
import os
import queue
import sys
import threading
import time
from typing import Dict, List, Optional

import numpy as np


class _LineSource:
    """Blocking first-read / non-blocking drain over any line stream.

    A daemon reader thread decouples the loop from the underlying stream so
    coalescing works on pipes, sockets and StringIO alike (no select())."""

    def __init__(self, stream):
        self._q: "queue.Queue[Optional[str]]" = queue.Queue()
        t = threading.Thread(target=self._read, args=(stream,), daemon=True)
        t.start()

    def _read(self, stream):
        for line in stream:
            self._q.put(line)
        self._q.put(None)  # EOF sentinel

    def take(self, max_n: int, wait_s: float = 0.0) -> List[str]:
        """Block for one line, then drain whatever is already queued (up to
        ``max_n`` total).  Returns [] at EOF.

        ``wait_s`` > 0 is the coalescing window: after the first line
        arrives, keep blocking up to that deadline for more lines instead of
        only draining what is already queued — trading up to ``wait_s`` of
        added first-request latency for larger (cheaper per utterance)
        batches at moderate load.  The window closes early when ``max_n``
        requests are in hand."""
        first = self._q.get()
        if first is None:
            self._q.put(None)
            return []
        lines = [first]
        deadline = time.perf_counter() + wait_s if wait_s > 0 else None
        while len(lines) < max_n:
            try:
                if deadline is None:
                    nxt = self._q.get_nowait()
                else:
                    remaining = deadline - time.perf_counter()
                    if remaining <= 0:
                        break
                    nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)
                break
            lines.append(nxt)
        return lines


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
                # cache the negative result too: steady-state requests must
                # not re-scan the filesystem per call
                self._t2v[spk] = None
            else:
                ref = np.load(os.path.join(d, clips[0])).squeeze()[None]
                self._t2v[spk] = self.synth.speaker_embedding(
                    ref.astype(np.float32))  # [1, n_speaker_dim]
        return self._t2v[spk]

    def t2v_emb_or_fallback(self, spk: str) -> np.ndarray:
        """Like :meth:`t2v_emb` but never None: speakers without a reference
        clip get the embedding of a zero clip — numerically identical to the
        zeros-ref path the per-request fallback used, computed once."""
        emb = self.t2v_emb(spk)
        if emb is not None:
            return emb
        if "\0fallback" not in self._t2v:
            zeros = np.zeros((1, 1, self.synth.t2v_cfg.n_feat_dim), np.float32)
            self._t2v["\0fallback"] = self.synth.speaker_embedding(zeros)
        return self._t2v["\0fallback"]


def _batch_buckets(max_batch: int) -> List[int]:
    """Powers of two up to ``max_batch`` (inclusive): the fixed batch shapes
    coalesced requests are padded to, bounding jit programs to
    len(batch_buckets) x len(text_buckets)."""
    bs, b = [], 1
    while b < max_batch:
        bs.append(b)
        b *= 2
    bs.append(max_batch)
    return sorted(set(bs))


def warmup(synth, max_frames: Optional[int] = None, alpha: float = 1.0,
           max_batch: int = 1):
    """Pre-compile the synthesis programs for every (batch-bucket,
    text-bucket) shape the serve loop can produce, so real requests run at
    serving latency.  Coalesced batches are padded to the same batch buckets
    (powers of two up to ``max_batch``), so this covers them exhaustively;
    compiles land in the persistent cache, making repeat warmups cheap."""
    cfg = synth.t2v_cfg
    mf = max_frames or cfg.frame_buckets[-1]
    done = []
    for B in _batch_buckets(max_batch):
        emb = np.zeros((B, cfg.n_speaker_dim), np.float32)
        spk = np.zeros((B, synth.v2w_cfg.spk_dim), np.float32)
        for nb in cfg.text_buckets:
            # one dummy text padded to this bucket (frontend pads via
            # pad_to); EXACTLY the serving-path programs — keep_device +
            # in-graph int16 PCM — so no real request ever compiles
            # (a warmup/serving program mismatch costs a 20-40 s compile
            # on the first live batch of each shape)
            texts = [" " * max(1, nb - 2)] * B
            out = synth.text_to_latents(
                texts, None, alpha=alpha, max_frames=mf, t2v_spk_emb=emb,
                keep_device=True,
            )
            pcm_dev, _ = synth.latents_to_wav(
                out["feat_postnet_output"], spk, noise=_serve_noise(synth, B),
                with_finite=True, keep_device=True, pcm16=True)
            np.asarray(out["meta"])
            # warm the smallest wav-slice fetch (slice programs per bucket
            # are cheap op-by-op dispatches; first-touch D2H is the part
            # worth paying here)
            np.asarray(pcm_dev[:, :_wav_fetch_len(1, pcm_dev.shape[1])])
            done.append((B, nb))
    return done


@functools.lru_cache(maxsize=16)
def _serve_noise_rows(noise_dim: int, B: int) -> np.ndarray:
    """Deterministic serving noise, cached per (dim, batch): it never
    changes, and regenerating it cost a device dispatch + fetch per batch
    on the serving hot path."""
    import jax

    row = np.asarray(jax.random.normal(
        jax.random.PRNGKey(0), (1, noise_dim)))
    return np.tile(row, (B, 1))


def _serve_noise(synth, B: int) -> np.ndarray:
    """Per-item vocoder noise for serving: every item gets the SAME seed-0
    row, so a request's audio does not depend on its position in a coalesced
    batch (batched == unbatched, deterministic across retries)."""
    return _serve_noise_rows(synth.v2w_cfg.noise_dim, B)


def _wav_fetch_len(max_samples: int, full_len: int) -> int:
    """Bucketed wav-slice length: smallest power-of-two (floor 8192 samples
    = 0.5 s) covering the batch's longest utterance, capped at the padded
    length.  A small fixed ladder keeps the device slice op's jit cache
    tiny while cutting the fetched bytes to roughly the emitted audio."""
    k = 8192
    while k < max_samples and k < full_len:
        k <<= 1
    return min(k, full_len)


def _dispatch_batch(synth, store, reqs, alpha, max_frames, pad_to=None):
    """Dispatch one batched synthesis over parsed (spk, text) requests and
    return a ``finalize()`` closure that performs the D2H fetches and
    returns ([B, K] int16 PCM wavs with K >= every emitted length, [B]
    sample counts, [B] finite-ok bools).  Splitting dispatch from fetch
    lets the service worker double-buffer batches: batch i's ~10 MB PCM
    fetch rides behind batch i+1's device execution instead of
    serializing with it (the fetch is the saturation bottleneck on a
    tunneled chip — BENCH_NOTES "Serving with REAL payloads").
    ``pad_to`` pads the batch (repeating the last request) to a fixed
    bucket size so only warmed-up jit shapes run; padded rows are dropped
    from the result.

    Engineered for a slow host<->device link (BENCH_NOTES "Serving load";
    the tunneled chip moves ~25-40 MB/s): latents never leave the device
    (fetching the [B, 500, 1024] buffers cost ~7 s per batch — 50x the
    synthesis), frame counts + finite masks ride one [2, B] fetch issued
    AFTER the vocoder dispatch, the wav is quantized to int16 PCM in graph
    (the wire format; 4x fewer bytes than f32), and only a bucketed slice
    covering the longest utterance is fetched.

    The finite mask checks the FULL padded latent and wav rows, not just the
    emitted samples: a BN-overflowed checkpoint (BENCH_NOTES "Val-NaN root
    cause") propagates NaN through the duration predictor too, so
    ``total_frames`` can collapse to 0 and an emitted-samples-only check
    would pass on an empty slice."""
    n = len(reqs)
    if pad_to is not None and pad_to > n:
        reqs = list(reqs) + [reqs[-1]] * (pad_to - n)
    texts = [t for _, t in reqs]
    t2v_embs = np.concatenate(
        [store.t2v_emb_or_fallback(s) for s, _ in reqs], axis=0)
    voc_embs = np.stack([store.vocoder_emb(s) for s, _ in reqs], axis=0)
    out = synth.text_to_latents(
        texts, None, alpha=alpha, max_frames=max_frames, t2v_spk_emb=t2v_embs,
        keep_device=True)
    pcm_dev, wav_ok = synth.latents_to_wav(
        out["feat_postnet_output"], voc_embs,
        noise=_serve_noise(synth, len(reqs)), with_finite=True,
        keep_device=True, pcm16=True)

    def finalize():
        # [B]-sized fetches only, after both dispatches are in flight
        meta = np.asarray(out["meta"])
        total = np.clip(meta[0][:n], 0, None)
        n_samples = total * synth.v2w_cfg.total_upsample
        finite_ok = meta[1][:n].astype(bool) & np.asarray(wav_ok)[:n]
        k = _wav_fetch_len(int(n_samples.max(initial=0)), pcm_dev.shape[1])
        pcm = np.asarray(pcm_dev[:, :k])
        return pcm[:n], np.minimum(n_samples, k), finite_ok

    return finalize


def _synthesize_batch(synth, store, reqs, alpha, max_frames, pad_to=None):
    """Dispatch + fetch in one call (the non-pipelined path used by
    ``serve_loop``); see :func:`_dispatch_batch`."""
    return _dispatch_batch(synth, store, reqs, alpha, max_frames,
                           pad_to=pad_to)()


def _to_pcm16(wav: np.ndarray) -> np.ndarray:
    """float [-1, 1] or already-quantized int16 -> int16 little-endian PCM.
    The batched serving path quantizes on device (``pcm16=True``); the
    streaming path still produces float chunks."""
    if wav.dtype == np.int16:
        return wav.astype("<i2", copy=False)
    return (np.clip(wav, -1.0, 1.0) * 32767.0).astype("<i2")


_NONFINITE_MSG = (
    "non-finite audio (eval-mode BN overflow — recalibrate the checkpoint's "
    "BN running stats: cli recalibrate-bn / infer/recalibrate.py)"
)


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
    max_batch: int = 1,
    pcm: bool = False,
    stream_chunk: Optional[int] = None,
    coalesce_wait_ms: float = 0.0,
):
    from wavthruvec_pytorch_tpu.infer.synthesize import write_wav

    stdin = stdin if stdin is not None else sys.stdin
    stdout = stdout if stdout is not None else sys.stdout
    # PCM mode interleaves binary audio with text control lines on one
    # binary stream; wav-file mode keeps plain text lines.
    binout = getattr(stdout, "buffer", stdout) if pcm else None

    def say(line: str):
        if pcm:
            binout.write((line + "\n").encode())
            binout.flush()
        else:
            print(line, file=stdout, flush=True)

    if do_warmup:
        buckets = warmup(synth, max_frames=max_frames, alpha=alpha,
                         max_batch=max(1, max_batch))
        say(f"WARM {buckets}")
    batch_buckets = _batch_buckets(max(1, max_batch))
    if not pcm:
        os.makedirs(out_dir, exist_ok=True)
    default_speaker = default_speaker or (store.speakers() or [None])[0]
    sv = None
    if pcm and stream_chunk:
        from wavthruvec_pytorch_tpu.infer.streaming import StreamingVocoder

        sv = StreamingVocoder(
            synth.gen, synth.gen_variables, synth.v2w_cfg,
            chunk_frames=int(stream_chunk),
        )

    def respond(wav: np.ndarray, n_samp: int, n: int, dt_ms: float, b: int,
                finite_ok: bool = True):
        # finite-output guard: a long-trained checkpoint's eval-mode BN can
        # overflow on an outlier input (BENCH_NOTES "Val-NaN root cause");
        # emit a clean error instead of NaN PCM / a NaN wav file.
        if not finite_ok:
            say(f"ERR {_NONFINITE_MSG}")
            return
        if pcm:
            sr = synth.v2w_cfg.sampling_rate
            pcm16 = _to_pcm16(wav[:n_samp]).tobytes()
            binout.write(f"PCM {n_samp} {sr} latency={dt_ms:.1f}ms batched={b}\n".encode())
            binout.write(pcm16)
            binout.write(b"PCMEND\n")
            binout.flush()
        else:
            sr = synth.v2w_cfg.sampling_rate
            path = os.path.join(out_dir, f"utt_{n:06d}.wav")
            write_wav(path, wav[:n_samp], sample_rate=sr)
            say(f"OK {path} {n_samp / sr:.2f}s latency={dt_ms:.1f}ms batched={b}")

    def respond_stream(latents, spk_emb, total_frames, dt0, b: int):
        """Emit one utterance as PCM chunks (time-to-first-audio path).

        Streams over the full PADDED latent buffer and trims emitted samples
        to the true length — zero-padded latents are not equivalent to a
        sequence edge (streaming.py docstring), and the non-streaming path
        also vocodes the padded buffer then trims, so this matches it
        exactly.

        Reported timings are client-perceived, measured from the arrival of
        the coalesced batch: ``ttfa`` = time to this utterance's first audio
        bytes, ``latency`` = time to its last (in a batch, both include the
        streaming of preceding items — what a caller actually waited)."""
        sr = synth.v2w_cfg.sampling_rate
        up = synth.v2w_cfg.total_upsample
        # total_frames is the UNCAPPED duration sum (ops/length_regulator
        # expand_by_durations); the latent buffer only holds max_frames, so
        # clip like the batched path does (np.minimum(n_samples, k)) —
        # without this a text longer than max_frames crashed the stream
        target = min(int(total_frames), latents.shape[0]) * up
        binout.write(f"PCMSTART {sr} batched={b}\n".encode())
        binout.flush()
        n_samp = 0
        ttfa_ms = None
        for chunk in sv.stream(latents[None], spk_emb[None],
                               _serve_noise(synth, 1)):
            data = np.clip(chunk[0][: max(0, target - n_samp)], -1, 1)
            if not np.isfinite(data).all():
                # generator-side overflow mid-stream: close the frame with an
                # explicit abort instead of emitting NaN PCM (np.clip keeps
                # NaN); the latent-side guard upstream catches the common case
                binout.write(f"PCMABORT {_NONFINITE_MSG}\n".encode())
                binout.flush()
                return
            if data.shape[0]:
                if ttfa_ms is None:
                    ttfa_ms = (time.perf_counter() - dt0) * 1e3
                pcm16 = (data * 32767.0).astype("<i2").tobytes()
                binout.write(f"PCMCHUNK {len(pcm16)}\n".encode())
                binout.write(pcm16)
                binout.flush()
                n_samp += data.shape[0]
            if n_samp >= target:
                break
        dt_ms = (time.perf_counter() - dt0) * 1e3
        assert n_samp == target
        binout.write(
            f"PCMEND {n_samp} latency={dt_ms:.1f}ms ttfa={ttfa_ms:.1f}ms\n".encode())
        binout.flush()

    src = _LineSource(stdin)
    n = 0
    while True:
        lines = src.take(max(1, max_batch), wait_s=coalesce_wait_ms / 1e3)
        if not lines:
            break
        saw_quit = False
        reqs = []  # (index-in-responses, spk, text) for valid requests
        responses: List[Optional[str]] = []
        for line in lines:
            line = line.strip()
            if not line:
                continue
            if line == "QUIT":
                saw_quit = True
                break
            spk, text = line.split("|", 1) if "|" in line else (default_speaker, line)
            if spk is None:
                responses.append("ERR no speaker available")
                continue
            try:
                store.vocoder_emb(spk)  # validate speaker before batching
            except Exception as e:
                responses.append(f"ERR {e}")
                continue
            reqs.append((len(responses), spk, text))
            responses.append(None)

        if reqs:
            t0 = time.perf_counter()
            # pad coalesced batches to a fixed bucket so only warmed-up jit
            # shapes run (padded rows repeat the last request, then dropped)
            bucket = next(b for b in batch_buckets if b >= len(reqs))
            try:
                if sv is not None:
                    # streaming: latents batched, audio chunked per item
                    padded = list(reqs) + [reqs[-1]] * (bucket - len(reqs))
                    out = synth.text_to_latents(
                        [t for _, _, t in padded], None, alpha=alpha,
                        max_frames=max_frames,
                        t2v_spk_emb=np.concatenate(
                            [store.t2v_emb_or_fallback(s) for _, s, _ in padded],
                            axis=0),
                    )
                    for j, (slot, spk, _) in enumerate(reqs):
                        if not np.isfinite(out["feat_postnet_output"][j]).all():
                            responses[slot] = f"ERR {_NONFINITE_MSG}"
                            continue
                        respond_stream(
                            out["feat_postnet_output"][j],
                            store.vocoder_emb(spk),
                            out["total_frames"][j], t0, len(reqs))
                        responses[slot] = ""  # already written
                        n += 1
                else:
                    wavs, n_samples, finite_ok = _synthesize_batch(
                        synth, store, [(s, t) for _, s, t in reqs],
                        alpha, max_frames, pad_to=bucket)
                    dt_ms = (time.perf_counter() - t0) * 1e3
                    for j, (slot, _, _) in enumerate(reqs):
                        respond(wavs[j], int(n_samples[j]), n, dt_ms,
                                len(reqs), finite_ok=bool(finite_ok[j]))
                        responses[slot] = ""
                        n += 1
            except Exception as e:  # keep serving
                for slot, _, _ in reqs:
                    if responses[slot] is None:
                        responses[slot] = f"ERR {e}"

        for r in responses:
            if r:  # ERR lines (successes already wrote their output)
                say(r)
        if saw_quit:
            break
    return n
