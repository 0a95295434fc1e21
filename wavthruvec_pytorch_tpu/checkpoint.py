"""Checkpointing: orbax for native state, plus a torch-pickle importer that
maps reference PyTorch checkpoints onto our flax trees (parity requirement).

Reference formats:
* Text2Vec: ``checkpoint_{iter}.pth.tar`` = {model, optimizer, learning_rate,
  epoch} (text2vec/train.py:426-432);
* Vec2Wav: ``g_{:08d}`` = {generator}, ``do_{:08d}`` = {mpd, msd, optim_g,
  optim_d, steps, epoch} (vec2wav/train.py:227-238), auto-resume scans the
  latest (vec2wav/utils.py:53-58).

The importers translate layouts:
* torch Conv1d weight [out, in, k]      -> flax (k, in, out)
* torch ConvTranspose1d [in, out, k]    -> flax (k, in, out)
* torch Conv2d [out, in, kh, kw]        -> flax (kh, kw, in, out)
* torch Linear [out, in]                -> flax (in, out)
* weight_norm (weight_g, weight_v), spectral_norm (weight_orig, weight_u)
  map onto our (g, v) / (kernel + spectral.u) params.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


# ---------------------------------------------------------------------------
# Orbax-backed native checkpoints
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, state: Any) -> None:
    """Save a pytree (train state) at ``path`` (a directory)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore a pytree saved by ``save_checkpoint``; ``target`` provides
    structure/dtypes (abstract or concrete)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=target)


def scan_checkpoint(cp_dir: str, prefix: str) -> Optional[str]:
    """Latest checkpoint dir matching ``prefix`` (reference:
    vec2wav/utils.py:53-58 scans ``prefix + '????????'``).

    Sorted by STEP NUMBER, not lexically — the reference zero-pads its
    names so lexical order coincides, but t2v checkpoints
    (``checkpoint_1200``) do not."""
    pattern = os.path.join(cp_dir, prefix + "*")
    paths = sorted(glob.glob(pattern), key=checkpoint_step)
    return paths[-1] if paths else None


def checkpoint_step(path: str) -> int:
    m = re.search(r"(\d+)$", os.path.basename(path.rstrip("/")))
    return int(m.group(1)) if m else -1


# ---------------------------------------------------------------------------
# torch-pickle import
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str, key: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint into numpy (CPU); ``key`` selects a sub-dict
    like 'model' / 'generator' / 'mpd'."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if key is not None:
        obj = obj[key]
    out = {}
    for k, v in obj.items():
        out[k] = v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _nested_set(tree: Dict, path: str, value: np.ndarray) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = np.asarray(value)


def _conv_w(w):  # torch Conv1d [out, in, k] -> (k, in, out)
    return np.transpose(w, (2, 1, 0))


def _convT_w(w):  # torch ConvTranspose1d [in, out, k] -> (k, in, out)
    return np.transpose(w, (2, 0, 1))


def _conv2d_w(w):  # torch Conv2d [out, in, kh, kw] -> (kh, kw, in, out)
    return np.transpose(w, (2, 3, 1, 0))


def _lin_w(w):  # torch Linear [out, in] -> (in, out)
    return np.transpose(w)


def _bn(sd, prefix, params, stats, dst, affine=True):
    if affine:
        _nested_set(params, f"{dst}/BatchNorm_0/scale", sd[f"{prefix}.weight"])
        _nested_set(params, f"{dst}/BatchNorm_0/bias", sd[f"{prefix}.bias"])
    _nested_set(stats, f"{dst}/BatchNorm_0/mean", sd[f"{prefix}.running_mean"])
    _nested_set(stats, f"{dst}/BatchNorm_0/var", sd[f"{prefix}.running_var"])


def _wn_conv(sd, prefix, params, dst, transpose=False):
    trans = _convT_w if transpose else _conv_w
    _nested_set(params, f"{dst}/v", trans(sd[f"{prefix}.weight_v"]))
    _nested_set(params, f"{dst}/g", trans(sd[f"{prefix}.weight_g"]))
    if f"{prefix}.bias" in sd:
        _nested_set(params, f"{dst}/bias", sd[f"{prefix}.bias"])


def _wn_conv2d(sd, prefix, params, dst):
    _nested_set(params, f"{dst}/v", _conv2d_w(sd[f"{prefix}.weight_v"]))
    _nested_set(params, f"{dst}/g", _conv2d_w(sd[f"{prefix}.weight_g"]))
    if f"{prefix}.bias" in sd:
        _nested_set(params, f"{dst}/bias", sd[f"{prefix}.bias"])


def _sn_conv(sd, prefix, params, spectral, dst):
    _nested_set(params, f"{dst}/kernel", _conv_w(sd[f"{prefix}.weight_orig"]))
    if f"{prefix}.bias" in sd:
        _nested_set(params, f"{dst}/bias", sd[f"{prefix}.bias"])
    _nested_set(spectral, f"{dst}/u", sd[f"{prefix}.weight_u"])
    _nested_set(spectral, f"{dst}/v", sd[f"{prefix}.weight_v"])


# ---- ECAPA (text2vec/ecapa_tdnn_TaoRuijie.py) ------------------------------

def _import_ecapa(sd, src, params, stats, dst):
    _nested_set(params, f"{dst}/conv1/Conv_0/kernel", _conv_w(sd[f"{src}.conv1.weight"]))
    _nested_set(params, f"{dst}/conv1/Conv_0/bias", sd[f"{src}.conv1.bias"])
    _bn(sd, f"{src}.bn1", params, stats, f"{dst}/bn1")
    for li in (1, 2, 3):
        b = f"{src}.layer{li}"
        d = f"{dst}/layer{li}"
        _nested_set(params, f"{d}/conv1/Conv_0/kernel", _conv_w(sd[f"{b}.conv1.weight"]))
        _nested_set(params, f"{d}/conv1/Conv_0/bias", sd[f"{b}.conv1.bias"])
        _bn(sd, f"{b}.bn1", params, stats, f"{d}/bn1")
        for ci in range(7):  # scale 8 -> nums 7
            _nested_set(
                params, f"{d}/convs_{ci}/Conv_0/kernel", _conv_w(sd[f"{b}.convs.{ci}.weight"])
            )
            _nested_set(params, f"{d}/convs_{ci}/Conv_0/bias", sd[f"{b}.convs.{ci}.bias"])
            _bn(sd, f"{b}.bns.{ci}", params, stats, f"{d}/bns_{ci}")
        _nested_set(params, f"{d}/conv3/Conv_0/kernel", _conv_w(sd[f"{b}.conv3.weight"]))
        _nested_set(params, f"{d}/conv3/Conv_0/bias", sd[f"{b}.conv3.bias"])
        _bn(sd, f"{b}.bn3", params, stats, f"{d}/bn3")
        # SE: se.se.1 (C->128), se.se.3 (128->C)
        _nested_set(params, f"{d}/se/Conv1d_0/Conv_0/kernel", _conv_w(sd[f"{b}.se.se.1.weight"]))
        _nested_set(params, f"{d}/se/Conv1d_0/Conv_0/bias", sd[f"{b}.se.se.1.bias"])
        _nested_set(params, f"{d}/se/Conv1d_1/Conv_0/kernel", _conv_w(sd[f"{b}.se.se.3.weight"]))
        _nested_set(params, f"{d}/se/Conv1d_1/Conv_0/bias", sd[f"{b}.se.se.3.bias"])
    _nested_set(params, f"{dst}/layer4/Conv_0/kernel", _conv_w(sd[f"{src}.layer4.weight"]))
    _nested_set(params, f"{dst}/layer4/Conv_0/bias", sd[f"{src}.layer4.bias"])
    # attention: Sequential[0]=conv, [2]=bn, [4]=conv
    _nested_set(params, f"{dst}/att_conv1/Conv_0/kernel", _conv_w(sd[f"{src}.attention.0.weight"]))
    _nested_set(params, f"{dst}/att_conv1/Conv_0/bias", sd[f"{src}.attention.0.bias"])
    _bn(sd, f"{src}.attention.2", params, stats, f"{dst}/att_bn")
    _nested_set(params, f"{dst}/att_conv2/Conv_0/kernel", _conv_w(sd[f"{src}.attention.4.weight"]))
    _nested_set(params, f"{dst}/att_conv2/Conv_0/bias", sd[f"{src}.attention.4.bias"])
    _bn(sd, f"{src}.bn5", params, stats, f"{dst}/bn5")
    _nested_set(params, f"{dst}/fc6/Dense_0/kernel", _lin_w(sd[f"{src}.fc6.weight"]))
    _nested_set(params, f"{dst}/fc6/Dense_0/bias", sd[f"{src}.fc6.bias"])
    _bn(sd, f"{src}.bn6", params, stats, f"{dst}/bn6")


def _import_fft_stack(sd, src, params, stats, dst, n_layers):
    for i in range(n_layers):
        b = f"{src}.layer_stack.{i}"
        d = f"{dst}/layer_stack_{i}"
        for name in ("w_qs", "w_ks", "w_vs", "fc"):
            _nested_set(params, f"{d}/slf_attn/{name}/kernel", _lin_w(sd[f"{b}.slf_attn.{name}.weight"]))
            _nested_set(params, f"{d}/slf_attn/{name}/bias", sd[f"{b}.slf_attn.{name}.bias"])
        _nested_set(params, f"{d}/slf_attn/LayerNorm_0/LayerNorm_0/scale", sd[f"{b}.slf_attn.layer_norm.weight"])
        _nested_set(params, f"{d}/slf_attn/LayerNorm_0/LayerNorm_0/bias", sd[f"{b}.slf_attn.layer_norm.bias"])
        for w in ("w_1", "w_2"):
            _nested_set(params, f"{d}/pos_ffn/{w}/Conv_0/kernel", _conv_w(sd[f"{b}.pos_ffn.{w}.weight"]))
            _nested_set(params, f"{d}/pos_ffn/{w}/Conv_0/bias", sd[f"{b}.pos_ffn.{w}.bias"])
        _nested_set(params, f"{d}/pos_ffn/LayerNorm_0/LayerNorm_0/scale", sd[f"{b}.pos_ffn.layer_norm.weight"])
        _nested_set(params, f"{d}/pos_ffn/LayerNorm_0/LayerNorm_0/bias", sd[f"{b}.pos_ffn.layer_norm.bias"])


def import_text2vec(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """Map a reference Text2Vec state_dict (text2vec/model.py:194-356) onto
    our variables {params, batch_stats}."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    _nested_set(params, "encoder/src_word_emb", sd["encoder.src_word_emb.weight"])
    if cfg.use_multi_speaker_condition:
        _import_ecapa(sd, "encoder.speaker_encoder", params, stats, "encoder/speaker_encoder")
    _import_fft_stack(sd, "encoder", params, stats, "encoder", cfg.encoder_n_layer)
    _import_fft_stack(sd, "decoder", params, stats, "decoder", cfg.decoder_n_layer)

    # duration predictor (module.py:110-156)
    dp = "length_regulator.duration_predictor"
    for i in (1, 2):
        _nested_set(params, f"duration_predictor/conv1d_{i}/Conv_0/kernel",
                    _conv_w(sd[f"{dp}.conv_layer.conv1d_{i}.conv.weight"]))
        _nested_set(params, f"duration_predictor/conv1d_{i}/Conv_0/bias",
                    sd[f"{dp}.conv_layer.conv1d_{i}.conv.bias"])
        _nested_set(params, f"duration_predictor/layer_norm_{i}/LayerNorm_0/scale",
                    sd[f"{dp}.conv_layer.layer_norm_{i}.weight"])
        _nested_set(params, f"duration_predictor/layer_norm_{i}/LayerNorm_0/bias",
                    sd[f"{dp}.conv_layer.layer_norm_{i}.bias"])
    _nested_set(params, "duration_predictor/linear_layer/Dense_0/kernel",
                _lin_w(sd[f"{dp}.linear_layer.linear_layer.weight"]))
    _nested_set(params, "duration_predictor/linear_layer/Dense_0/bias",
                sd[f"{dp}.linear_layer.linear_layer.bias"])

    for name in ("WVF_linear", "last_linear"):
        _nested_set(params, f"{name}/Dense_0/kernel", _lin_w(sd[f"{name}.linear_layer.weight"]))
        _nested_set(params, f"{name}/Dense_0/bias", sd[f"{name}.linear_layer.bias"])

    # CBHG postnet (module.py:287-364)
    for k in range(8):
        _nested_set(params, f"postnet/conv1d_banks_{k}/conv1d/Conv_0/kernel",
                    _conv_w(sd[f"postnet.conv1d_banks.{k}.conv1d.weight"]))
        _bn(sd, f"postnet.conv1d_banks.{k}.bn", params, stats, f"postnet/conv1d_banks_{k}/bn")
    for i in range(2):
        _nested_set(params, f"postnet/conv1d_projections_{i}/conv1d/Conv_0/kernel",
                    _conv_w(sd[f"postnet.conv1d_projections.{i}.conv1d.weight"]))
        _bn(sd, f"postnet.conv1d_projections.{i}.bn", params, stats, f"postnet/conv1d_projections_{i}/bn")
    for i in range(4):
        _nested_set(params, f"postnet/highways_{i}/Dense_0/kernel", _lin_w(sd[f"postnet.highways.{i}.H.weight"]))
        _nested_set(params, f"postnet/highways_{i}/Dense_0/bias", sd[f"postnet.highways.{i}.H.bias"])
        _nested_set(params, f"postnet/highways_{i}/Dense_1/kernel", _lin_w(sd[f"postnet.highways.{i}.T.weight"]))
        _nested_set(params, f"postnet/highways_{i}/Dense_1/bias", sd[f"postnet.highways.{i}.T.bias"])
    for d_, t_ in (("fwd", ""), ("bwd", "_reverse")):
        _nested_set(params, f"postnet/gru/{d_}_w_ih", _lin_w(sd[f"postnet.gru.weight_ih_l0{t_}"]))
        _nested_set(params, f"postnet/gru/{d_}_w_hh", _lin_w(sd[f"postnet.gru.weight_hh_l0{t_}"]))
        _nested_set(params, f"postnet/gru/{d_}_b_ih", sd[f"postnet.gru.bias_ih_l0{t_}"])
        _nested_set(params, f"postnet/gru/{d_}_b_hh", sd[f"postnet.gru.bias_hh_l0{t_}"])

    # ConvAttention (module.py:455-545): key_proj.0/2, query_proj.0/2/4
    if cfg.learn_alignments:
        pairs = [
            ("attention.key_proj.0.conv", "attention/key_conv1"),
            ("attention.key_proj.2.conv", "attention/key_conv2"),
            ("attention.query_proj.0.conv", "attention/query_conv1"),
            ("attention.query_proj.2.conv", "attention/query_conv2"),
            ("attention.query_proj.4.conv", "attention/query_conv3"),
        ]
        for src, dst in pairs:
            _nested_set(params, f"{dst}/Conv_0/kernel", _conv_w(sd[f"{src}.weight"]))
            _nested_set(params, f"{dst}/Conv_0/bias", sd[f"{src}.bias"])

    return {"params": params, "batch_stats": stats}


# ---- Vec2Wav ---------------------------------------------------------------

def import_vec2wav_generator(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """Map a reference Generator state_dict (vec2wav/models.py:77-156)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    spectral: Dict[str, Any] = {}

    _wn_conv(sd, "conv_pre", params, "conv_pre")
    _wn_conv(sd, "conv_post", params, "conv_post")
    n_ups = len(cfg.upsample_rates)
    n_kernels = len(cfg.resblock_kernel_sizes)
    for i in range(n_ups):
        _wn_conv(sd, f"ups.{i}", params, f"ups_{i}", transpose=True)
        _nested_set(params, f"fcs_{i}/Dense_0/kernel", _lin_w(sd[f"fcs.{i}.weight"]))
        _nested_set(params, f"fcs_{i}/Dense_0/bias", sd[f"fcs.{i}.bias"])
        # CBN: BN(affine=False) running stats + spectral-norm linear
        _nested_set(stats, f"cbns_{i}/batch_norm/BatchNorm_0/mean",
                    sd[f"cbns.{i}.batch_nrom.running_mean"])
        _nested_set(stats, f"cbns_{i}/batch_norm/BatchNorm_0/var",
                    sd[f"cbns.{i}.batch_nrom.running_var"])
        _nested_set(params, f"cbns_{i}/layer/kernel", _lin_w(sd[f"cbns.{i}.layer.weight_orig"]))
        _nested_set(params, f"cbns_{i}/layer/bias", sd[f"cbns.{i}.layer.bias"])
        _nested_set(spectral, f"cbns_{i}/layer/u", sd[f"cbns.{i}.layer.weight_u"])
        _nested_set(spectral, f"cbns_{i}/layer/v", sd[f"cbns.{i}.layer.weight_v"])
    n_res = n_ups * n_kernels
    for n in range(n_res):
        if cfg.use_resblock1:
            for j in range(3):
                _wn_conv(sd, f"resblocks.{n}.convs1.{j}", params, f"resblocks_{n}/convs1_{j}")
                _wn_conv(sd, f"resblocks.{n}.convs2.{j}", params, f"resblocks_{n}/convs2_{j}")
        else:
            for j in range(2):
                _wn_conv(sd, f"resblocks.{n}.convs.{j}", params, f"resblocks_{n}/convs_{j}")
    return {"params": params, "batch_stats": stats, "spectral": spectral}


def import_vec2wav_mpd(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    for i in range(len(cfg.periods)):
        for j in range(5):
            _wn_conv2d(sd, f"discriminators.{i}.convs.{j}", params,
                       f"discriminators_{i}/convs_{j}")
        _wn_conv2d(sd, f"discriminators.{i}.conv_post", params,
                   f"discriminators_{i}/conv_post")
    return {"params": params}


def import_vec2wav_msd(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    spectral: Dict[str, Any] = {}
    for i in range(3):
        for j in range(7):
            src = f"discriminators.{i}.convs.{j}"
            dst = f"discriminators_{i}/convs_{j}"
            if i == 0:
                _sn_conv(sd, src, params, spectral, dst)
            else:
                _wn_conv(sd, src, params, dst)
        src = f"discriminators.{i}.conv_post"
        dst = f"discriminators_{i}/conv_post"
        if i == 0:
            _sn_conv(sd, src, params, spectral, dst)
        else:
            _wn_conv(sd, src, params, dst)
    return {"params": params, "spectral": spectral}


# ---- SpeechBrain ECAPA (spkrec-ecapa-voxceleb embedding_model) -------------

def import_speechbrain_ecapa(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a SpeechBrain ``spkrec-ecapa-voxceleb`` ``embedding_model``
    state dict (the ``embedding_model.ckpt`` inside the pretrained bundle the
    reference downloads at vec2wav/pre_spk_emb.py:12) onto
    ``models.ecapa_speechbrain.ECAPA_TDNN_SB`` variables.

    Accepts keys with or without an ``embedding_model.`` prefix.
    """
    sd = {k[len("embedding_model."):] if k.startswith("embedding_model.") else k: v
          for k, v in sd.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def sb_conv(src, dst):
        _nested_set(params, f"{dst}/conv/Conv_0/kernel", _conv_w(sd[f"{src}.conv.weight"]))
        _nested_set(params, f"{dst}/conv/Conv_0/bias", sd[f"{src}.conv.bias"])

    def tdnn(src, dst):
        sb_conv(f"{src}.conv", f"{dst}/conv")
        _bn(sd, f"{src}.norm.norm", params, stats, f"{dst}/norm")

    tdnn("blocks.0", "blocks_0")
    scale = 8
    for i in (1, 2, 3):
        b, d = f"blocks.{i}", f"blocks_{i}"
        tdnn(f"{b}.tdnn1", f"{d}/tdnn1")
        for j in range(scale - 1):
            tdnn(f"{b}.res2net_block.blocks.{j}", f"{d}/res2net_block/blocks_{j}")
        tdnn(f"{b}.tdnn2", f"{d}/tdnn2")
        sb_conv(f"{b}.se_block.conv1", f"{d}/se_block/conv1")
        sb_conv(f"{b}.se_block.conv2", f"{d}/se_block/conv2")
    tdnn("mfa", "mfa")
    tdnn("asp.tdnn", "asp/tdnn")
    sb_conv("asp.conv", "asp/conv")
    _bn(sd, "asp_bn.norm", params, stats, "asp_bn")
    sb_conv("fc", "fc")
    return {"params": params, "batch_stats": stats}


def assert_tree_shapes_match(imported: Any, target: Any, name: str = "") -> None:
    """Sanity check: imported tree leaves must match the model's init tree."""
    imp_flat = {
        "/".join(str(getattr(k, "key", k)) for k in p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(imported)[0]
    }
    tgt_flat = {
        "/".join(str(getattr(k, "key", k)) for k in p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(target)[0]
    }
    missing = set(tgt_flat) - set(imp_flat)
    extra = set(imp_flat) - set(tgt_flat)
    mismatched = {
        k: (imp_flat[k], tgt_flat[k])
        for k in set(imp_flat) & set(tgt_flat)
        if tuple(imp_flat[k]) != tuple(tgt_flat[k])
    }
    if missing or extra or mismatched:
        raise ValueError(
            f"import mismatch for {name}: missing={sorted(missing)[:8]} "
            f"extra={sorted(extra)[:8]} mismatched={dict(list(mismatched.items())[:8])}"
        )
