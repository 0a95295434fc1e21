"""Serving loop: stdin->wav protocol, speaker store caching, error paths."""

import dataclasses
import io
import os

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_models import T2V_SMALL, V2W_SMALL
from tests.test_synthesize import SYMS
from wavthruvec_pytorch_tpu.infer.serve import SpeakerStore, serve_loop
from wavthruvec_pytorch_tpu.infer.synthesize import Synthesizer
from wavthruvec_pytorch_tpu.models import Generator, Text2Vec
from wavthruvec_pytorch_tpu.text import TextFrontend


def _make_synth():
    t2v_cfg = dataclasses.replace(
        T2V_SMALL, vocab_size=len(SYMS), n_feat_dim=24, spk_channel=24,
        text_buckets=(16,), frame_buckets=(32,),
    )
    v2w_cfg = dataclasses.replace(V2W_SMALL, spk_dim=16, noise_dim=16)
    frontend = TextFrontend(SYMS)
    t2v = Text2Vec(t2v_cfg)
    gen = Generator(v2w_cfg)
    rng = jax.random.PRNGKey(0)
    ref = np.random.default_rng(0).standard_normal((1, 20, 24)).astype(np.float32)
    t2v_vars = t2v.init(
        {"params": rng, "dropout": rng},
        jnp.ones((1, 8), jnp.int32),
        jnp.arange(1, 9, dtype=jnp.int32)[None],
        jnp.asarray(ref), 32, 1.0, method=Text2Vec.infer,
    )
    gen_vars = gen.init(
        rng, jnp.zeros((1, 8, 24)), jnp.zeros((1, 16)), jnp.zeros((1, 16)),
        train=False,
    )
    return Synthesizer(t2v_cfg, v2w_cfg, t2v_vars, gen_vars, frontend)


def test_serve_loop_end_to_end(tmp_path):
    synth = _make_synth()
    rng = np.random.default_rng(1)
    spk_dir = tmp_path / "spk_emb"
    ref_dir = tmp_path / "refs"
    spk_dir.mkdir()
    for spk in ("SSB0001", "SSB0002"):
        np.save(spk_dir / f"{spk}.npy", rng.standard_normal(16).astype(np.float32))
        (ref_dir / spk).mkdir(parents=True)
        np.save(ref_dir / spk / "clip.npy",
                rng.standard_normal((1, 20, 24)).astype(np.float32))

    store = SpeakerStore(synth, str(spk_dir), str(ref_dir))
    assert store.speakers() == ["SSB0001", "SSB0002"]

    stdin = io.StringIO(
        "abc def\n"            # default speaker
        "SSB0002|gfe abc\n"    # explicit speaker
        "NOSUCH|oops\n"        # unknown speaker -> ERR, loop continues
        "abc\n"
        "QUIT\n"
        "after quit\n"         # never processed
    )
    stdout = io.StringIO()
    n = serve_loop(
        synth, store, str(tmp_path / "out"), alpha=4.0, max_frames=32,
        stdin=stdin, stdout=stdout, do_warmup=True,
    )
    lines = stdout.getvalue().strip().splitlines()
    assert n == 3
    assert lines[0].startswith("WARM")  # bucket pre-compile before serving
    assert [l.split()[0] for l in lines[1:]] == ["OK", "OK", "ERR", "OK"]
    wavs = sorted(os.listdir(tmp_path / "out"))
    assert wavs == ["utt_000000.wav", "utt_000001.wav", "utt_000002.wav"]
    # t2v speaker embedding cached per speaker (2 distinct speakers used)
    assert set(store._t2v) == {"SSB0001", "SSB0002"}


def _mk_speakers(tmp_path, synth, n=2):
    rng = np.random.default_rng(1)
    spk_dir = tmp_path / "spk_emb"
    ref_dir = tmp_path / "refs"
    spk_dir.mkdir()
    for i in range(n):
        spk = f"SSB{i:04d}"
        np.save(spk_dir / f"{spk}.npy", rng.standard_normal(16).astype(np.float32))
        (ref_dir / spk).mkdir(parents=True)
        np.save(ref_dir / spk / "clip.npy",
                rng.standard_normal((1, 20, 24)).astype(np.float32))
    return SpeakerStore(synth, str(spk_dir), str(ref_dir))


def test_serve_coalescing_batches_queued_requests(tmp_path):
    """Queued requests are synthesized as one batched call, responses keep
    request order, and outputs equal the unbatched ones (masked padding)."""
    synth = _make_synth()
    store = _mk_speakers(tmp_path, synth)

    calls = []
    orig = synth.text_to_latents

    def counting(texts, *args, **kwargs):
        calls.append(len(texts))
        return orig(texts, *args, **kwargs)

    synth.text_to_latents = counting

    stdin = io.StringIO(
        "SSB0000|abc def\n"
        "SSB0001|gfe abc\n"
        "SSB0000|abc\n"
        "QUIT\n"
    )
    stdout = io.StringIO()
    n = serve_loop(
        synth, store, str(tmp_path / "out"), alpha=4.0, max_frames=32,
        stdin=stdin, stdout=stdout, max_batch=8,
    )
    assert n == 3
    # StringIO queues everything up-front -> all three coalesce into ONE call,
    # padded to the next batch bucket (4) so only warmed-up jit shapes run
    assert calls == [4]
    lines = stdout.getvalue().strip().splitlines()
    assert [l.split()[0] for l in lines] == ["OK", "OK", "OK"]
    assert all("batched=3" in l for l in lines)

    # batched output == unbatched output for the same request
    synth.text_to_latents = orig
    stdin2 = io.StringIO("SSB0001|gfe abc\nQUIT\n")
    out2 = io.StringIO()
    serve_loop(synth, store, str(tmp_path / "out2"), alpha=4.0, max_frames=32,
               stdin=stdin2, stdout=out2, max_batch=1)
    from scipy.io import wavfile

    _, a = wavfile.read(tmp_path / "out" / "utt_000001.wav")
    _, b = wavfile.read(tmp_path / "out2" / "utt_000000.wav")
    np.testing.assert_allclose(a, b, atol=1e-6)


def _parse_pcm(buf: bytes):
    """Parse the PCM framing -> list of (header, np.int16 samples)."""
    out = []
    i = 0
    while i < len(buf):
        j = buf.index(b"\n", i)
        line = buf[i:j].decode()
        i = j + 1
        if line.startswith("PCM "):
            _, n_samp, sr, *rest = line.split()
            n = int(n_samp)
            data = np.frombuffer(buf[i:i + 2 * n], dtype="<i2")
            i += 2 * n
            end = buf.index(b"\n", i)
            assert buf[i:end].decode() == "PCMEND"
            i = end + 1
            out.append((line, data))
        elif line.startswith("PCMSTART"):
            chunks = []
            while True:
                j = buf.index(b"\n", i)
                sub = buf[i:j].decode()
                i = j + 1
                if sub.startswith("PCMCHUNK "):
                    nb = int(sub.split()[1])
                    chunks.append(np.frombuffer(buf[i:i + nb], dtype="<i2"))
                    i += nb
                elif sub.startswith("PCMEND "):
                    n = int(sub.split()[1])
                    data = np.concatenate(chunks) if chunks else np.zeros(0, "<i2")
                    assert data.shape[0] == n
                    out.append((sub, data))
                    break
                else:
                    raise AssertionError(f"unexpected line {sub!r}")
        else:
            out.append((line, None))
    return out


def test_serve_pcm_mode(tmp_path):
    """--pcm emits int16 PCM blocks equal to the wav-file output."""
    synth = _make_synth()
    store = _mk_speakers(tmp_path, synth)
    stdin = io.StringIO("SSB0000|abc def\nSSB0001|gfe\nQUIT\n")
    stdout = io.BytesIO()
    n = serve_loop(synth, store, str(tmp_path / "out"), alpha=4.0,
                   max_frames=32, stdin=stdin, stdout=stdout, pcm=True)
    assert n == 2
    blocks = _parse_pcm(stdout.getvalue())
    pcm_blocks = [(h, d) for h, d in blocks if d is not None]
    assert len(pcm_blocks) == 2
    # equal to the wav-file path output for the same request
    stdin2 = io.StringIO("SSB0000|abc def\nQUIT\n")
    out2 = io.StringIO()
    serve_loop(synth, store, str(tmp_path / "wav"), alpha=4.0, max_frames=32,
               stdin=stdin2, stdout=out2)
    from scipy.io import wavfile

    _, wav = wavfile.read(tmp_path / "wav" / "utt_000000.wav")
    # the batched serving path quantizes to int16 PCM on device, so the
    # wav-file output is int16 and must equal the PCM stream bit-for-bit
    assert wav.dtype == np.int16
    np.testing.assert_array_equal(pcm_blocks[0][1], wav)


def test_serve_pcm_streaming_chunks(tmp_path):
    """--pcm --stream_chunk frames the audio into PCMCHUNKs that concatenate
    to the full utterance (exact stitching via StreamingVocoder)."""
    synth = _make_synth()
    store = _mk_speakers(tmp_path, synth)
    stdin = io.StringIO("SSB0000|abc def\nQUIT\n")
    stdout = io.BytesIO()
    n = serve_loop(synth, store, str(tmp_path / "out"), alpha=4.0,
                   max_frames=32, stdin=stdin, stdout=stdout, pcm=True,
                   stream_chunk=8)
    assert n == 1
    raw = stdout.getvalue()
    assert raw.count(b"PCMCHUNK ") >= 2  # really chunked
    blocks = _parse_pcm(raw)
    header, data = [(h, d) for h, d in blocks if d is not None][0]
    # non-streaming PCM block for the same request must match exactly
    stdin2 = io.StringIO("SSB0000|abc def\nQUIT\n")
    out2 = io.BytesIO()
    serve_loop(synth, store, str(tmp_path / "out2"), alpha=4.0, max_frames=32,
               stdin=stdin2, stdout=out2, pcm=True)
    _, full = [(h, d) for h, d in _parse_pcm(out2.getvalue()) if d is not None][0]
    np.testing.assert_allclose(data, full, atol=1)


def test_serve_stream_clips_overlong_utterance(tmp_path):
    """A text whose duration sum EXCEEDS max_frames must stream the capped
    audio, not crash: total_frames is the uncapped sum
    (ops/length_regulator.expand_by_durations) while the latent buffer
    holds only max_frames — the streaming path clips like the batched path
    does (regression: the assert in respond_stream fired and aborted the
    whole batch to ERR lines)."""
    synth = _make_synth()
    store = _mk_speakers(tmp_path, synth)
    # alpha large enough that durations overflow the 32-frame cap
    stdin = io.StringIO("SSB0000|abc def abcde\nQUIT\n")
    stdout = io.BytesIO()
    n = serve_loop(synth, store, str(tmp_path / "out"), alpha=64.0,
                   max_frames=32, stdin=stdin, stdout=stdout, pcm=True,
                   stream_chunk=8)
    assert n == 1
    raw = stdout.getvalue()
    assert b"ERR" not in raw and b"PCMABORT" not in raw
    blocks = _parse_pcm(raw)
    _, data = [(h, d) for h, d in blocks if d is not None][0]
    up = synth.v2w_cfg.total_upsample
    assert data.shape[0] == 32 * up  # capped at max_frames of audio


def test_line_source_coalescing_window():
    """``take(wait_s=...)`` keeps the window open for lines that arrive
    shortly after the first one, and closes early at max_n."""
    import time as _time

    from wavthruvec_pytorch_tpu.infer.serve import _LineSource

    def trickle():
        yield "a\n"
        _time.sleep(0.05)
        yield "b\n"
        _time.sleep(0.05)
        yield "c\n"
        _time.sleep(1.0)
        yield "d\n"

    src = _LineSource(trickle())
    # window (0.5 s) spans a+b+c (arriving ~0.1 s in) but not d (~1.1 s)
    lines = src.take(8, wait_s=0.5)
    assert lines == ["a\n", "b\n", "c\n"]
    # next take blocks for d as the "first" line
    assert src.take(8, wait_s=0.0) == ["d\n"]
    assert src.take(8) == []  # EOF

    # max_n closes the window early: no 2 s wait for a third line
    src2 = _LineSource(iter(["x\n", "y\n"]))
    _time.sleep(0.05)  # let the reader thread queue both
    t0 = _time.perf_counter()
    assert src2.take(2, wait_s=2.0) == ["x\n", "y\n"]
    assert _time.perf_counter() - t0 < 1.0
