"""HTTP serving front end: routes, wav payloads, coalescing, error paths."""

import json
import threading
import urllib.error
import urllib.request
import wave

import numpy as np
import pytest

from tests.test_serve import _make_synth, _mk_speakers
from wavthruvec_pytorch_tpu.infer.http_serve import (
    SynthesisService,
    make_handler,
    wav_bytes,
)


def test_wav_bytes_roundtrip():
    sig = np.sin(np.linspace(0, 20, 1600)).astype(np.float32) * 0.5
    data = wav_bytes(sig, 16000)
    import io

    with wave.open(io.BytesIO(data)) as w:
        assert w.getframerate() == 16000
        assert w.getnchannels() == 1
        assert w.getnframes() == 1600
        pcm = np.frombuffer(w.readframes(1600), dtype="<i2")
    np.testing.assert_allclose(pcm / 32767.0, sig, atol=1e-4)


@pytest.fixture(scope="module")
def http_server(tmp_path_factory):
    """Tiny-model server on an ephemeral port, shared across tests."""
    from http.server import ThreadingHTTPServer

    tmp_path = tmp_path_factory.mktemp("http")
    synth = _make_synth()
    store = _mk_speakers(tmp_path, synth)
    service = SynthesisService(synth, store, alpha=4.0, max_frames=32,
                               max_batch=4)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base, service, synth
    server.shutdown()
    server.server_close()
    service.close()


def _post(base, payload):
    req = urllib.request.Request(
        f"{base}/synthesize", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    return urllib.request.urlopen(req, timeout=600)


def test_http_health_and_speakers(http_server):
    base, service, _ = http_server
    with urllib.request.urlopen(f"{base}/health", timeout=60) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok" and health["speakers"] == 2
    with urllib.request.urlopen(f"{base}/speakers", timeout=60) as r:
        assert json.loads(r.read()) == ["SSB0000", "SSB0001"]


def test_http_synthesize_returns_wav(http_server):
    base, service, synth = http_server
    with _post(base, {"text": "abc def", "speaker": "SSB0001"}) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        assert float(r.headers["X-Audio-Seconds"]) > 0
        body = r.read()
    import io

    with wave.open(io.BytesIO(body)) as w:
        sr = synth.v2w_cfg.sampling_rate
        assert w.getframerate() == sr
        assert w.getnframes() > 0
        # frame counts are whole latent frames x upsample
        assert w.getnframes() % synth.v2w_cfg.total_upsample == 0


def test_http_errors(http_server):
    base, _, _ = http_server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, {"speaker": "SSB0000"})  # no text
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, {"text": "abc", "speaker": "NOSUCH"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"{base}/nope", timeout=60)
    assert e.value.code == 404


def test_http_concurrent_requests_coalesce(http_server):
    """Parallel clients are served from coalesced batched synthesis calls;
    every response is a valid wav."""
    base, service, synth = http_server

    calls = []
    orig = synth.text_to_latents

    def counting(texts, *args, **kwargs):
        calls.append(len(texts))
        return orig(texts, *args, **kwargs)

    synth.text_to_latents = counting
    try:
        # prime the jit caches so the batched path is fast when racing
        with _post(base, {"text": "abc"}):
            pass
        calls.clear()

        results = [None] * 4

        texts = ["abc def", "gfe abc", "abc", "fed cba"]

        def client(i):
            with _post(base, {"text": texts[i],
                              "speaker": f"SSB{i % 2:04d}"}) as r:
                results[i] = (int(r.headers["X-Batched"]), r.read())

        threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert all(r is not None for r in results)
        # every request served, at least one response saw a coalesced batch
        # OR all were served individually (scheduling-dependent); either way
        # the number of synthesis calls is <= number of requests
        assert sum(b for b, _ in results) >= 4
        assert len(calls) <= 4
        for _, body in results:
            import io

            with wave.open(io.BytesIO(body)) as w:
                assert w.getnframes() > 0
    finally:
        synth.text_to_latents = orig


def test_service_coalescing_window(tmp_path):
    """With ``coalesce_wait_ms`` set, a request arriving shortly after the
    first is folded into the SAME batched synthesis call (batched == 2), not
    served separately."""
    import time

    synth = _make_synth()
    store = _mk_speakers(tmp_path, synth)
    service = SynthesisService(synth, store, alpha=4.0, max_frames=32,
                               max_batch=4, coalesce_wait_ms=2000.0)
    try:
        # prime jit caches outside the timed window
        service.submit("SSB0000", "abc").done.wait(600)

        r1 = service.submit("SSB0000", "abc def")
        time.sleep(0.2)  # well inside the 2 s window
        r2 = service.submit("SSB0001", "gfe")
        assert r1.done.wait(600) and r2.done.wait(600)
        assert r1.error is None and r2.error is None
        assert (r1.batched, r2.batched) == (2, 2)
    finally:
        service.close()
