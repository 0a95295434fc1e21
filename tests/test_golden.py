"""Golden numeric-regression fingerprints: fixed-PRNG forward outputs must
stay bit-stable (up to f32 tolerance) across refactors — catches silent
numeric drift in layers/init/semantics (SURVEY.md §4 plan item b).

Golden values computed on CPU with jax 0.9.0 at round 1.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_models import T2V_SMALL, V2W_SMALL, _t2v_batch
from wavthruvec_pytorch_tpu.models import Generator, Text2Vec


def test_text2vec_golden_fingerprint():
    cfg = T2V_SMALL
    model = Text2Vec(cfg)
    b = _t2v_batch(cfg)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *b[:6], attn_prior=b[6], deterministic=True, train_bn=False,
    )
    out = model.apply(v, *b[:6], attn_prior=b[6], deterministic=True, train_bn=False)
    np.testing.assert_allclose(
        float(jnp.sum(out["feat_output"])), 331.05045, rtol=1e-4
    )
    np.testing.assert_allclose(
        float(jnp.sum(out["feat_postnet_output"])), 300.62872, rtol=1e-4
    )
    assert int(jnp.sum(out["duration"])) == 38


def test_generator_golden_fingerprint():
    vc = V2W_SMALL
    gen = Generator(vc)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 7, vc.n_feat_dim)), jnp.float32)
    spk = jnp.asarray(rng.standard_normal((2, vc.spk_dim)), jnp.float32)
    noi = jnp.asarray(rng.standard_normal((2, vc.noise_dim)), jnp.float32)
    gv = gen.init(jax.random.PRNGKey(3), x, spk, noi, train=False)
    y = gen.apply(gv, x, spk, noi, train=False)
    np.testing.assert_allclose(float(jnp.sum(y)), -99.48228, rtol=1e-4)
