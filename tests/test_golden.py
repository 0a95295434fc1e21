"""Golden numeric-regression fingerprints: fixed-PRNG forward outputs must
stay stable across refactors — catches silent numeric drift in
layers/init/semantics (SURVEY.md §4 plan item b).

Fingerprints are stored per (platform, jax major.minor) in
``tests/golden/``: the first run on a new platform/version WRITES the
fingerprint file and passes (regeneration), later runs compare against it.
This avoids the round-1 flaw where values pinned on "CPU, jax 0.9.0"
would spuriously fail on TPU or after a jax upgrade — cross-platform drift
is expected (different accumulation orders); within-platform drift is the
regression being caught.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_models import T2V_SMALL, V2W_SMALL, _t2v_batch
from wavthruvec_pytorch_tpu.models import Generator, Text2Vec

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _golden_path(name: str) -> str:
    platform = jax.devices()[0].platform
    ver = ".".join(jax.__version__.split(".")[:2])
    return os.path.join(GOLDEN_DIR, f"{name}.{platform}.jax{ver}.json")


def _check_or_record(name: str, values: dict, rtol=1e-4):
    """Compare against the stored fingerprint for this platform/version, or
    record it on first run."""
    path = _golden_path(name)
    if os.path.exists(path):
        with open(path) as f:
            stored = json.load(f)
        for k, v in values.items():
            if isinstance(v, int):
                assert stored[k] == v, (name, k, stored[k], v)
            else:
                np.testing.assert_allclose(v, stored[k], rtol=rtol, err_msg=f"{name}/{k}")
    else:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            json.dump(values, f, indent=2)


def test_text2vec_golden_fingerprint():
    cfg = T2V_SMALL
    model = Text2Vec(cfg)
    b = _t2v_batch(cfg)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *b[:6], attn_prior=b[6], deterministic=True, train_bn=False,
    )
    out = model.apply(v, *b[:6], attn_prior=b[6], deterministic=True, train_bn=False)
    _check_or_record(
        "text2vec",
        {
            "feat_sum": float(jnp.sum(out["feat_output"])),
            "postnet_sum": float(jnp.sum(out["feat_postnet_output"])),
            "duration_sum": int(jnp.sum(out["duration"])),
        },
    )


def test_generator_golden_fingerprint():
    vc = V2W_SMALL
    gen = Generator(vc)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 7, vc.n_feat_dim)), jnp.float32)
    spk = jnp.asarray(rng.standard_normal((2, vc.spk_dim)), jnp.float32)
    noi = jnp.asarray(rng.standard_normal((2, vc.noise_dim)), jnp.float32)
    gv = gen.init(jax.random.PRNGKey(3), x, spk, noi, train=False)
    y = gen.apply(gv, x, spk, noi, train=False)
    _check_or_record("generator", {"wav_sum": float(jnp.sum(y))})
