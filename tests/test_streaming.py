"""Streaming vocoder: chunked inference must equal the full forward."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_models import V2W_SMALL
from wavthruvec_pytorch_tpu.infer.streaming import (
    StreamingVocoder,
    conservative_context_frames,
)
from wavthruvec_pytorch_tpu.models import Generator


def _setup(cfg):
    gen = Generator(cfg)
    rng = np.random.default_rng(0)
    B, T = 2, 37
    lat = rng.standard_normal((B, T, cfg.n_feat_dim)).astype(np.float32)
    spk = rng.standard_normal((B, cfg.spk_dim)).astype(np.float32)
    noi = rng.standard_normal((B, cfg.noise_dim)).astype(np.float32)
    gv = gen.init(jax.random.PRNGKey(3), jnp.asarray(lat), jnp.asarray(spk),
                  jnp.asarray(noi), train=False)
    full = np.asarray(
        gen.apply(gv, jnp.asarray(lat), jnp.asarray(spk), jnp.asarray(noi),
                  train=False)
    )[..., 0]
    return gen, gv, lat, spk, noi, full


def test_streaming_equals_full_forward():
    cfg = V2W_SMALL
    gen, gv, lat, spk, noi, full = _setup(cfg)
    K = conservative_context_frames(cfg)
    assert K >= 4
    for chunk in (8, 10, 37, 64):
        sv = StreamingVocoder(gen, gv, cfg, chunk_frames=chunk)
        out = sv.vocode(lat, spk, noi)
        assert out.shape == full.shape, (chunk, out.shape, full.shape)
        np.testing.assert_allclose(out, full, atol=2e-5, err_msg=f"chunk={chunk}")


def test_streaming_equals_full_forward_resblock1():
    """ResBlock1 configs have a deeper receptive field (convs1 dilations plus
    three dilation-1 convs2); the context calculation must cover it too."""
    cfg = dataclasses.replace(V2W_SMALL, resblock="1")
    assert cfg.use_resblock1
    gen, gv, lat, spk, noi, full = _setup(cfg)
    assert conservative_context_frames(cfg) > conservative_context_frames(
        V2W_SMALL)
    for chunk in (8, 37):
        sv = StreamingVocoder(gen, gv, cfg, chunk_frames=chunk)
        out = sv.vocode(lat, spk, noi)
        np.testing.assert_allclose(out, full, atol=2e-5, err_msg=f"chunk={chunk}")


def test_streaming_chunk_sizes_and_order():
    cfg = V2W_SMALL
    gen, gv, lat, spk, noi, full = _setup(cfg)
    sv = StreamingVocoder(gen, gv, cfg, chunk_frames=10)
    chunks = list(sv.stream(lat, spk, noi))
    ups = cfg.total_upsample
    assert [c.shape[1] for c in chunks] == [10 * ups, 10 * ups, 10 * ups, 7 * ups]


def test_insufficient_context_actually_differs():
    """Sanity that the test is sensitive: with context 0 the stitched output
    must NOT match the full forward (otherwise the equality test above is
    vacuous)."""
    cfg = V2W_SMALL
    gen, gv, lat, spk, noi, full = _setup(cfg)
    sv = StreamingVocoder(gen, gv, cfg, chunk_frames=8, context_frames=0)
    out = sv.vocode(lat, spk, noi)
    assert np.abs(out - full).max() > 1e-3
