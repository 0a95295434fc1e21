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
