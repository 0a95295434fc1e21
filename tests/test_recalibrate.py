"""BN running-stat recalibration + serving finite-output guards.

Covers the eval-mode BN overflow hole (BENCH_NOTES "Val-NaN root cause"):
a long LAMB-trained checkpoint's running stats can make the production
inference path (``Text2Vec.infer``, same math as the reference's
``model.eval()``, text2vec/eval.py:24) emit non-finite audio.  The serving
front ends must answer with a clean error, and ``infer/recalibrate.py``
must restore finite synthesis by re-estimating the stats from calibration
data — without touching params or train-mode math.
"""

import dataclasses
import io

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_models import T2V_SMALL, V2W_SMALL
from tests.test_synthesize import SYMS
from wavthruvec_pytorch_tpu.infer.recalibrate import (
    recalibrate_generator_bn,
    recalibrate_text2vec_bn,
    text2vec_calibration_batches,
)
from wavthruvec_pytorch_tpu.infer.serve import SpeakerStore, serve_loop
from wavthruvec_pytorch_tpu.infer.synthesize import Synthesizer
from wavthruvec_pytorch_tpu.models import Generator, Text2Vec
from wavthruvec_pytorch_tpu.text import TextFrontend

T2V_CFG = dataclasses.replace(
    T2V_SMALL, vocab_size=len(SYMS), n_feat_dim=24, spk_channel=24,
    text_buckets=(16,), frame_buckets=(32,),
)
V2W_CFG = dataclasses.replace(V2W_SMALL, spk_dim=16, noise_dim=16)


def _init_models():
    frontend = TextFrontend(SYMS)
    t2v = Text2Vec(T2V_CFG)
    gen = Generator(V2W_CFG)
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
    return t2v, t2v_vars, gen, gen_vars, frontend


def _poison_stats(variables):
    """Negative running vars -> rsqrt(var+eps) NaN on the eval path only
    (train-mode BN never reads running stats) — the deliberately
    stat-poisoned checkpoint of VERDICT weak #2's 'done' criterion."""
    poisoned = dict(variables)
    poisoned["batch_stats"] = jax.tree_util.tree_map(
        lambda s: jnp.full_like(s, -1.0), variables["batch_stats"]
    )
    return poisoned


def _calib_batches(frontend, n=2):
    rng = np.random.default_rng(3)
    items = [
        ("abc def", rng.standard_normal((20, 24)).astype(np.float32) * 0.3)
        for _ in range(4 * n)
    ]
    return text2vec_calibration_batches(frontend, T2V_CFG, items, batch_size=4)


def test_poisoned_stats_serve_clean_error(tmp_path):
    """A stat-poisoned checkpoint must yield 'ERR non-finite audio', not a
    NaN wav file; a healthy checkpoint on the same loop serves OK."""
    t2v, t2v_vars, gen, gen_vars, frontend = _init_models()
    synth = Synthesizer(T2V_CFG, V2W_CFG, _poison_stats(t2v_vars), gen_vars,
                        frontend)
    rng = np.random.default_rng(1)
    spk_dir = tmp_path / "spk_emb"
    spk_dir.mkdir()
    np.save(spk_dir / "SSB0001.npy", rng.standard_normal(16).astype(np.float32))

    stdout = io.StringIO()
    n = serve_loop(
        synth, SpeakerStore(synth, str(spk_dir), None), str(tmp_path / "out"),
        alpha=4.0, max_frames=32,
        stdin=io.StringIO("abc def\nQUIT\n"), stdout=stdout,
    )
    lines = stdout.getvalue().strip().splitlines()
    assert n == 0 or lines  # no OK response was written
    assert lines[-1].startswith("ERR non-finite audio")
    assert not (tmp_path / "out" / "utt_000000.wav").exists()


def test_recalibration_restores_finite_synthesis():
    t2v, t2v_vars, gen, gen_vars, frontend = _init_models()
    poisoned = _poison_stats(t2v_vars)
    batches = _calib_batches(frontend)

    def synth_full(variables):
        """Full padded latent + wav buffers (a poisoned checkpoint's NaN
        reaches the duration predictor too, collapsing the emitted-sample
        count to 0 — trimmed outputs would vacuously pass isfinite)."""
        s = Synthesizer(T2V_CFG, V2W_CFG, variables, gen_vars, frontend)
        ref = np.random.default_rng(0).standard_normal((1, 20, 24)).astype(np.float32)
        out = s.text_to_latents(["abc def"], ref, alpha=4.0, max_frames=32)
        wav = s.latents_to_wav(out["feat_postnet_output"],
                               np.zeros((1, 16), np.float32))
        return out["feat_postnet_output"], wav

    lat, _ = synth_full(poisoned)
    assert not np.isfinite(lat).all()

    recal = recalibrate_text2vec_bn(t2v, poisoned, batches, max_frames=32)
    lat, wav = synth_full(recal)
    assert np.isfinite(lat).all() and np.isfinite(wav).all()
    # params untouched: recalibration is reference-math-neutral for training
    chex_equal = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.array_equal(a, b)),
        recal["params"], poisoned["params"]))
    assert chex_equal
    # refreshed stats are sane population moments
    for leaf in jax.tree_util.tree_leaves(recal["batch_stats"]):
        assert np.isfinite(np.asarray(leaf)).all()


def test_recalibration_single_batch_matches_batch_moments():
    """With ONE calibration batch the refreshed stats must equal that batch's
    pure moments (the EMA bookkeeping is fully unwound)."""
    t2v, t2v_vars, _, _, frontend = _init_models()
    batches = _calib_batches(frontend)[:1]
    recal = recalibrate_text2vec_bn(t2v, t2v_vars, batches, max_frames=32)

    # independently recover the same batch's moments via two mutable passes
    # from different starting stats: new = 0.9*old + 0.1*batch
    seq, pos, feat = batches[0]
    args = (jnp.asarray(seq), jnp.asarray(pos), jnp.asarray(feat))

    def mutated(vs):
        _, mut = t2v.apply(vs, *args, 32, 1.0, train_bn=True,
                           method=Text2Vec.infer, mutable=["batch_stats"])
        return mut["batch_stats"]

    zeroed = dict(t2v_vars)
    zeroed["batch_stats"] = jax.tree_util.tree_map(
        jnp.zeros_like, t2v_vars["batch_stats"])
    expect = jax.tree_util.tree_map(lambda s: s / 0.1, mutated(zeroed))
    flat_a = jax.tree_util.tree_leaves(recal["batch_stats"])
    flat_b = jax.tree_util.tree_leaves(expect)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_generator_recalibration():
    """Vec2Wav CBN stats: poisoned -> NaN audio; recalibrated -> finite."""
    _, _, gen, gen_vars, _ = _init_models()
    rng = np.random.default_rng(5)
    lat = rng.standard_normal((2, 8, 24)).astype(np.float32) * 0.3
    spk = rng.standard_normal((2, 16)).astype(np.float32)
    noise = rng.standard_normal((2, 16)).astype(np.float32)

    poisoned = _poison_stats(gen_vars)
    bad = gen.apply(poisoned, lat, spk, noise, train=False)
    assert not np.isfinite(np.asarray(bad)).all()

    recal = recalibrate_generator_bn(gen, poisoned, [(lat, spk, noise)])
    good = gen.apply(recal, lat, spk, noise, train=False)
    assert np.isfinite(np.asarray(good)).all()


def test_generator_recalibration_cli(tmp_path):
    """One command recalibrates a vocoder checkpoint's CBN stats (VERDICT r3
    ask #5): poisoned orbax checkpoint in -> finite-synthesis checkpoint out,
    exercising the reference filelist format incl. a '|' inside the text."""
    from wavthruvec_pytorch_tpu import checkpoint as ckpt
    from wavthruvec_pytorch_tpu import cli
    from wavthruvec_pytorch_tpu.config import save_config

    _, _, gen, gen_vars, _ = _init_models()
    rng = np.random.default_rng(7)

    poisoned = _poison_stats(gen_vars)
    ckpt.save_checkpoint(str(tmp_path / "gen_in"), dict(poisoned))
    save_config(V2W_CFG, str(tmp_path / "v2w.json"))

    feat_root = tmp_path / "feats"
    feat_root.mkdir()
    spk_dir = tmp_path / "spk_emb"
    spk_dir.mkdir()
    lines = []
    for i, spk in enumerate(["SSB0001", "SSB0002"]):
        np.save(spk_dir / f"{spk}.npy",
                rng.standard_normal(16).astype(np.float32))
        for j in range(2):
            name = f"{spk}_{j}.npy"
            np.save(feat_root / name,
                    (rng.standard_normal((10, 24)) * 0.3).astype(np.float32))
            text = "a|b c" if (i, j) == (0, 0) else "abc def"
            lines.append(f"{name}|{text}|{spk}")
    filelist = tmp_path / "list.txt"
    filelist.write_text("\n".join(lines) + "\n")

    rc = cli.main([
        "recalibrate-bn",
        "--generator_checkpoint", str(tmp_path / "gen_in"),
        "--filelist", str(filelist),
        "--feat_root", str(feat_root),
        "--config", str(tmp_path / "v2w.json"),
        "--spk_emb_dir", str(spk_dir),
        "--gen_frames", "8",
        "--batch_size", "2",
        "--out", str(tmp_path / "gen_out"),
    ])
    assert rc == 0

    restored = ckpt.restore_checkpoint(str(tmp_path / "gen_out"),
                                       dict(gen_vars))
    lat = rng.standard_normal((2, 8, 24)).astype(np.float32) * 0.3
    spk = rng.standard_normal((2, 16)).astype(np.float32)
    noise = rng.standard_normal((2, 16)).astype(np.float32)
    bad = gen.apply(poisoned, lat, spk, noise, train=False)
    assert not np.isfinite(np.asarray(bad)).all()
    good = gen.apply(restored, lat, spk, noise, train=False)
    assert np.isfinite(np.asarray(good)).all()
    # params untouched
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.array_equal(a, b)),
        restored["params"], poisoned["params"]))


def test_parse_filelist_errors(tmp_path):
    """Malformed filelist rows fail with the line number, not a bare
    ValueError (ADVICE r3)."""
    import pytest

    from wavthruvec_pytorch_tpu.cli import _parse_filelist

    f = tmp_path / "bad.txt"
    f.write_text("ok.npy|text|spk\nonly_two|fields\n")
    with pytest.raises(ValueError, match="bad.txt:2"):
        _parse_filelist(str(f), 100)
    f2 = tmp_path / "pipe.txt"
    f2.write_text("a.npy|te|xt|spk\n")
    assert _parse_filelist(str(f2), 100) == [("a.npy", "te|xt", "spk")]


def test_http_service_nonfinite_guard(tmp_path):
    """The HTTP worker surfaces non-finite audio as a per-request error."""
    from wavthruvec_pytorch_tpu.infer.http_serve import SynthesisService

    t2v, t2v_vars, gen, gen_vars, frontend = _init_models()
    synth = Synthesizer(T2V_CFG, V2W_CFG, _poison_stats(t2v_vars), gen_vars,
                        frontend)
    rng = np.random.default_rng(1)
    spk_dir = tmp_path / "spk_emb"
    spk_dir.mkdir()
    np.save(spk_dir / "SSB0001.npy", rng.standard_normal(16).astype(np.float32))
    service = SynthesisService(
        synth, SpeakerStore(synth, str(spk_dir), None),
        alpha=4.0, max_frames=32, max_batch=1)
    try:
        pending = service.submit(None, "abc def")
        assert pending.done.wait(120)
        assert pending.error is not None and "non-finite" in pending.error
        assert pending.wav is None
    finally:
        service.close()
