"""Numerical parity vs the actual reference implementation (loaded read-only
from /root/reference at test time — never copied).

The reference vec2wav stack is importable with torch CPU only; its state
dicts are mapped through our checkpoint importer and the forward outputs
compared.  This validates the entire Generator (weight-norm convs, transposed
convs, CBN + spectral norm, ResBlock2 quirk) and both discriminators
end-to-end, plus the Text2Vec FFTBlock.
"""

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from wavthruvec_pytorch_tpu import checkpoint as ckpt
from wavthruvec_pytorch_tpu.config import Text2VecConfig, Vec2WavConfig
from wavthruvec_pytorch_tpu.models import (
    Generator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)

REF = "/root/reference"


def _load_ref_module(subdir: str, name: str, alias: str):
    """Import a reference module under an alias without polluting the generic
    module names ('hparams', 'utils', ...) for the rest of the test session."""
    path = os.path.join(REF, subdir)
    saved = {k: sys.modules.get(k) for k in ("hparams", "utils", "modules", "models")}
    sys.path.insert(0, path)
    cwd = os.getcwd()
    try:
        os.chdir(REF)  # hparams reads ./data/vocab.txt
        for k in ("hparams", "utils", "modules", "models"):
            sys.modules.pop(k, None)
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(path, f"{name}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        # the reference does bare `import hparams` etc. — let those resolve
        # against the inserted path
        spec.loader.exec_module(mod)
        sys.modules[alias] = mod
        return mod
    finally:
        os.chdir(cwd)
        sys.path.remove(path)
        for k, v in saved.items():
            if v is not None:
                sys.modules[k] = v
            else:
                sys.modules.pop(k, None)


@pytest.fixture(scope="module")
def ref_vec2wav():
    models = _load_ref_module("vec2wav", "models", "ref_v2w_models")
    hp = sys.modules["hparams"] if "hparams" in sys.modules else None
    # models.py did `import hparams as hp` during exec; grab it off the module
    return models, models.hp


@pytest.mark.slow
def test_generator_full_parity_vs_reference(ref_vec2wav):
    ref_models, ref_hp = ref_vec2wav
    torch.manual_seed(0)
    ref_gen = ref_models.Generator(ref_hp)
    ref_gen.eval()

    cfg = Vec2WavConfig()
    gen = Generator(cfg)

    B, T = 2, 13
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, cfg.n_feat_dim, T)).astype(np.float32)
    spk = rng.standard_normal((B, cfg.spk_dim)).astype(np.float32)
    noise = rng.standard_normal((B, cfg.noise_dim)).astype(np.float32)

    with torch.no_grad():
        y_ref = ref_gen(
            torch.from_numpy(x), torch.from_numpy(spk), torch.from_numpy(noise)
        ).numpy()

    sd = {k: v.detach().numpy() for k, v in ref_gen.state_dict().items()}
    variables = ckpt.import_vec2wav_generator(sd, cfg)

    # structural check against a fresh init
    init_vars = gen.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, cfg.n_feat_dim)),
        jnp.zeros((1, cfg.spk_dim)),
        jnp.zeros((1, cfg.noise_dim)),
        train=False,
    )
    ckpt.assert_tree_shapes_match(
        variables["params"], init_vars["params"], "generator"
    )

    y = gen.apply(
        {k: v for k, v in variables.items()},
        jnp.asarray(x.transpose(0, 2, 1)),
        jnp.asarray(spk),
        jnp.asarray(noise),
        train=False,
    )
    y = np.asarray(y)[..., 0][:, None, :]  # [B, 1, L] like torch
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=2e-4)


@pytest.mark.slow
def test_mpd_parity_vs_reference(ref_vec2wav):
    ref_models, ref_hp = ref_vec2wav
    torch.manual_seed(1)
    ref_mpd = ref_models.MultiPeriodDiscriminator(ref_hp)
    ref_mpd.eval()

    cfg = Vec2WavConfig()
    mpd = MultiPeriodDiscriminator(cfg)

    B, L = 2, 4160  # not a multiple of 13/17/19 -> exercises reflect pad
    rng = np.random.default_rng(1)
    y = (rng.standard_normal((B, 1, L)) * 0.5).astype(np.float32)
    y_hat = (rng.standard_normal((B, 1, L)) * 0.5).astype(np.float32)

    with torch.no_grad():
        r_rs, r_gs, r_fmap_rs, r_fmap_gs = ref_mpd(
            torch.from_numpy(y), torch.from_numpy(y_hat)
        )

    sd = {k: v.detach().numpy() for k, v in ref_mpd.state_dict().items()}
    variables = ckpt.import_vec2wav_mpd(sd, cfg)
    yj = jnp.asarray(y.transpose(0, 2, 1))
    yhj = jnp.asarray(y_hat.transpose(0, 2, 1))
    g_rs, g_gs, g_fmap_rs, g_fmap_gs = mpd.apply(variables, yj, yhj)

    for i in range(len(cfg.periods)):
        np.testing.assert_allclose(
            np.asarray(g_rs[i]), r_rs[i].numpy(), atol=2e-4
        )
        # compare the last feature map too (transpose NHWC -> NCHW)
        got_f = np.asarray(g_fmap_rs[i][-1]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got_f, r_fmap_rs[i][-1].numpy(), atol=2e-4)


@pytest.mark.slow
def test_msd_parity_vs_reference(ref_vec2wav):
    ref_models, _ = ref_vec2wav
    torch.manual_seed(2)
    ref_msd = ref_models.MultiScaleDiscriminator()
    ref_msd.eval()

    msd = MultiScaleDiscriminator(update_spectral=False)

    B, L = 2, 4096
    rng = np.random.default_rng(2)
    y = (rng.standard_normal((B, 1, L)) * 0.5).astype(np.float32)
    y_hat = (rng.standard_normal((B, 1, L)) * 0.5).astype(np.float32)

    with torch.no_grad():
        r_rs, r_gs, _, _ = ref_msd(torch.from_numpy(y), torch.from_numpy(y_hat))

    sd = {k: v.detach().numpy() for k, v in ref_msd.state_dict().items()}
    variables = ckpt.import_vec2wav_msd(sd)
    yj = jnp.asarray(y.transpose(0, 2, 1))
    yhj = jnp.asarray(y_hat.transpose(0, 2, 1))
    (g_rs, g_gs, _, _), _ = msd.apply(variables, yj, yhj, mutable=["spectral"])

    for i in range(3):
        # untrained spectral-norm scales make raw logits huge; compare rel.
        np.testing.assert_allclose(
            np.asarray(g_rs[i]), r_rs[i].numpy(), rtol=1e-4, atol=3e-4
        )


def test_fft_block_parity_vs_reference():
    """FFTBlock (self-attn + conv FFN) vs text2vec/subLayer.py in eval mode."""
    sub = _load_ref_module("text2vec", "subLayer", "ref_sublayer")
    torch.manual_seed(3)
    d_model, d_inner, n_head = 32, 64, 2
    d_k = d_model // n_head
    ref_block = sub.FFTBlock(d_model, d_inner, n_head, d_k, d_k, dropout=0.1)
    ref_block.eval()

    from wavthruvec_pytorch_tpu.models.fft_block import FFTBlock

    blk = FFTBlock(d_model, d_inner, n_head, d_k, d_k, dropout=0.1)

    B, T = 2, 9
    rng = np.random.default_rng(3)
    x = rng.standard_normal((B, T, d_model)).astype(np.float32)
    lengths = np.array([9, 6])
    ids = np.arange(T)
    non_pad = (ids[None, :] < lengths[:, None]).astype(np.float32)[..., None]
    attn_mask = ~(ids[None, :] < lengths[:, None])
    attn_mask_t = torch.from_numpy(
        np.broadcast_to(attn_mask[:, None, :], (B, T, T)).copy()
    )

    with torch.no_grad():
        y_ref, _ = ref_block(
            torch.from_numpy(x),
            non_pad_mask=torch.from_numpy(non_pad),
            slf_attn_mask=attn_mask_t,
        )
    y_ref = y_ref.numpy()

    # map reference weights into our block
    sd = {k: v.detach().numpy() for k, v in ref_block.state_dict().items()}
    params = {
        "slf_attn": {
            "w_qs": {"kernel": sd["slf_attn.w_qs.weight"].T, "bias": sd["slf_attn.w_qs.bias"]},
            "w_ks": {"kernel": sd["slf_attn.w_ks.weight"].T, "bias": sd["slf_attn.w_ks.bias"]},
            "w_vs": {"kernel": sd["slf_attn.w_vs.weight"].T, "bias": sd["slf_attn.w_vs.bias"]},
            "fc": {"kernel": sd["slf_attn.fc.weight"].T, "bias": sd["slf_attn.fc.bias"]},
            "LayerNorm_0": {"LayerNorm_0": {
                "scale": sd["slf_attn.layer_norm.weight"],
                "bias": sd["slf_attn.layer_norm.bias"],
            }},
        },
        "pos_ffn": {
            "w_1": {"Conv_0": {
                "kernel": sd["pos_ffn.w_1.weight"].transpose(2, 1, 0),
                "bias": sd["pos_ffn.w_1.bias"],
            }},
            "w_2": {"Conv_0": {
                "kernel": sd["pos_ffn.w_2.weight"].transpose(2, 1, 0),
                "bias": sd["pos_ffn.w_2.bias"],
            }},
            "LayerNorm_0": {"LayerNorm_0": {
                "scale": sd["pos_ffn.layer_norm.weight"],
                "bias": sd["pos_ffn.layer_norm.bias"],
            }},
        },
    }
    y, _ = blk.apply(
        {"params": params},
        jnp.asarray(x),
        non_pad_mask=jnp.asarray(non_pad),
        slf_attn_mask=jnp.asarray(np.broadcast_to(attn_mask[:, None, :], (B, T, T))),
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-5)
