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


def test_make_serving_generator_bf16():
    """bf16 serving mode: folded weight-norm + bf16-stored params produces
    f32 audio tracking the exact f32 generator (tools/gen_variants_bench.py
    is the TPU timing evidence; this is the correctness side)."""
    from wavthruvec_pytorch_tpu.infer.synthesize import make_serving_generator

    v2w_cfg = dataclasses.replace(V2W_SMALL, spk_dim=16, noise_dim=16)
    gen = Generator(v2w_cfg)
    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)
    lat = jnp.asarray(r.standard_normal((2, 16, v2w_cfg.n_feat_dim)), jnp.float32) * 0.1
    spk = jnp.asarray(r.standard_normal((2, v2w_cfg.spk_dim)), jnp.float32)
    noise = jnp.asarray(r.standard_normal((2, v2w_cfg.noise_dim)), jnp.float32)
    gen_vars = gen.init(rng, lat, spk, noise, train=False)

    y_ref = np.asarray(gen.apply(gen_vars, lat, spk, noise, train=False))

    gen_f32, vars_f32 = make_serving_generator(v2w_cfg, gen_vars, "f32")
    y_f32 = np.asarray(gen_f32.apply(vars_f32, lat, spk, noise, train=False))
    np.testing.assert_allclose(y_f32, y_ref, atol=1e-6)

    gen_bf, vars_bf = make_serving_generator(v2w_cfg, gen_vars, "bf16")
    for leaf in jax.tree_util.tree_leaves(vars_bf["params"]):
        assert leaf.dtype == jnp.bfloat16
    y_bf = np.asarray(gen_bf.apply(vars_bf, lat, spk, noise, train=False))
    assert y_bf.dtype == np.float32
    assert np.isfinite(y_bf).all()
    # pre-saturation signals on a tiny random net: bf16 tracks f32 closely
    corr = np.corrcoef(y_bf.ravel(), y_ref.ravel())[0, 1]
    assert corr > 0.99, corr

    with pytest.raises(ValueError):
        make_serving_generator(v2w_cfg, gen_vars, "int8")


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
