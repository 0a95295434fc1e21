"""End-to-end Synthesizer pipeline on small configs (CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_models import T2V_SMALL, V2W_SMALL
from wavthruvec_pytorch_tpu.infer.synthesize import Synthesizer
from wavthruvec_pytorch_tpu.models import Generator, Text2Vec
from wavthruvec_pytorch_tpu.text import TextFrontend

SYMS = "PE abcdefg"


@pytest.mark.slow
def test_synthesizer_end_to_end():
    t2v_cfg = dataclasses.replace(
        T2V_SMALL,
        vocab_size=len(SYMS),
        n_feat_dim=24,
        spk_channel=24,
        text_buckets=(8, 16),
        frame_buckets=(32, 64),
    )
    v2w_cfg = dataclasses.replace(
        V2W_SMALL, spk_dim=16, noise_dim=16  # match t2v n_speaker_dim
    )
    assert v2w_cfg.n_feat_dim == t2v_cfg.n_feat_dim
    frontend = TextFrontend(SYMS)

    t2v = Text2Vec(t2v_cfg)
    gen = Generator(v2w_cfg)
    rng = jax.random.PRNGKey(0)
    ref = np.random.default_rng(0).standard_normal((2, 20, t2v_cfg.n_feat_dim)).astype(np.float32)
    t2v_vars = t2v.init(
        {"params": rng, "dropout": rng},
        jnp.ones((2, 8), jnp.int32),
        jnp.tile(jnp.arange(1, 9, dtype=jnp.int32)[None], (2, 1)),
        jnp.asarray(ref), 32, 1.0, method=Text2Vec.infer,
    )
    spk = np.random.default_rng(1).standard_normal((2, v2w_cfg.spk_dim)).astype(np.float32)
    gen_vars = gen.init(
        rng, jnp.zeros((2, 8, v2w_cfg.n_feat_dim)), jnp.asarray(spk),
        jnp.zeros((2, v2w_cfg.noise_dim)), train=False,
    )

    synth = Synthesizer(t2v_cfg, v2w_cfg, t2v_vars, gen_vars, frontend)
    wavs, n_samples = synth.synthesize(
        ["abc defg", "gfedcba"], ref, spk, alpha=1.0, max_frames=32
    )
    assert wavs.shape == (2, 32 * v2w_cfg.total_upsample)
    assert (n_samples <= wavs.shape[1]).all()
    assert np.isfinite(wavs).all()
    assert np.abs(wavs).max() <= 1.0

    # alpha scaling produces longer output
    _, n2 = synth.synthesize(["abc defg", "gfedcba"], ref, spk, alpha=2.0, max_frames=32)
    assert (n2 >= n_samples).all()


@pytest.mark.slow
def test_synthesizer_cached_spk_emb_matches():
    """Precomputed-speaker-embedding serving path reproduces the ref_feats
    path exactly (ECAPA skipped per call)."""
    t2v_cfg = dataclasses.replace(
        T2V_SMALL, vocab_size=len(SYMS), n_feat_dim=24, spk_channel=24,
        text_buckets=(8, 16), frame_buckets=(32,),
    )
    v2w_cfg = dataclasses.replace(V2W_SMALL, spk_dim=16, noise_dim=16)
    frontend = TextFrontend(SYMS)
    t2v = Text2Vec(t2v_cfg)
    gen = Generator(v2w_cfg)
    rng = jax.random.PRNGKey(0)
    ref = np.random.default_rng(0).standard_normal((2, 20, 24)).astype(np.float32)
    t2v_vars = t2v.init(
        {"params": rng, "dropout": rng},
        jnp.ones((2, 8), jnp.int32),
        jnp.tile(jnp.arange(1, 9, dtype=jnp.int32)[None], (2, 1)),
        jnp.asarray(ref), 32, 1.0, method=Text2Vec.infer,
    )
    spk = np.random.default_rng(1).standard_normal((2, v2w_cfg.spk_dim)).astype(np.float32)
    gen_vars = gen.init(
        rng, jnp.zeros((2, 8, v2w_cfg.n_feat_dim)), jnp.asarray(spk),
        jnp.zeros((2, v2w_cfg.noise_dim)), train=False,
    )
    synth = Synthesizer(t2v_cfg, v2w_cfg, t2v_vars, gen_vars, frontend)
    texts = ["abc defg", "gfedcba"]
    lat_ref = synth.text_to_latents(texts, ref, max_frames=32)
    emb = synth.speaker_embedding(ref)
    assert emb.shape == (2, t2v_cfg.n_speaker_dim)
    lat_fast = synth.text_to_latents(texts, None, max_frames=32, t2v_spk_emb=emb)
    np.testing.assert_allclose(
        lat_fast["feat_postnet_output"], lat_ref["feat_postnet_output"], atol=1e-5
    )
