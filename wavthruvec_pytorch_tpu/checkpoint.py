"""Checkpointing: orbax for native state, plus torch-pickle translation in
BOTH directions — importers mapping reference PyTorch checkpoints onto our
flax trees (parity requirement), and exporters writing our trees back into
the reference's file formats (``save_reference_*``, CLI ``export-torch``).

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
    (``checkpoint_1200``) do not.  Entries without a trailing step number
    are skipped — notably orbax's ``*.orbax-checkpoint-tmp`` leftovers from
    an interrupted save, which must not be picked up by auto-resume."""
    pattern = os.path.join(cp_dir, prefix + "*")
    paths = sorted(
        (p for p in glob.glob(pattern) if checkpoint_step(p) >= 0),
        key=checkpoint_step,
    )
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


def _nested_get(tree: Any, path: str) -> Optional[np.ndarray]:
    node = tree
    for k in path.split("/"):
        if not hasattr(node, "get") or node.get(k) is None:
            return None
        node = node[k]
    return np.asarray(node)


def _conv_w(w):  # torch Conv1d [out, in, k] -> (k, in, out)
    return np.transpose(w, (2, 1, 0))


def _convT_w(w):  # torch ConvTranspose1d [in, out, k] -> (k, in, out)
    return np.transpose(w, (2, 0, 1))


def _conv2d_w(w):  # torch Conv2d [out, in, kh, kw] -> (kh, kw, in, out)
    return np.transpose(w, (2, 3, 1, 0))


def _lin_w(w):  # torch Linear [out, in] -> (in, out)
    return np.transpose(w)


def _bn(sd, prefix, params, stats, dst, affine=True):
    """torch BatchNorm1d -> flax BN (used by the SpeechBrain importer; the
    reference-model specs below carry the same mapping as 'bn' entries)."""
    if affine:
        _nested_set(params, f"{dst}/BatchNorm_0/scale", sd[f"{prefix}.weight"])
        _nested_set(params, f"{dst}/BatchNorm_0/bias", sd[f"{prefix}.bias"])
    _nested_set(stats, f"{dst}/BatchNorm_0/mean", sd[f"{prefix}.running_mean"])
    _nested_set(stats, f"{dst}/BatchNorm_0/var", sd[f"{prefix}.running_var"])


# inverse layout transforms (flax -> torch)
def _inv_conv_w(w):
    return np.transpose(w, (2, 1, 0))


def _inv_convT_w(w):
    return np.transpose(w, (1, 2, 0))


def _inv_conv2d_w(w):
    return np.transpose(w, (3, 2, 0, 1))


# ---------------------------------------------------------------------------
# torch <-> flax mapping specs
#
# Each model's layout translation is ONE table of (kind, torch_prefix,
# our_path) entries, consumed in BOTH directions: import (reference torch
# checkpoint -> our flax variables) and export (our variables ->
# reference-format torch state dict).  Kinds:
#
#   emb    exact copy of a single tensor (torch key given in full)
#   lin    Linear  .weight/.bias        <-> {dst}/kernel, {dst}/bias
#   conv   Conv1d  .weight/.bias        <-> {dst}/kernel, {dst}/bias
#   bn     BatchNorm1d affine+stats     <-> {dst}/BatchNorm_0/{scale,bias} +
#          (bn_na: stats only)              batch_stats mean/var
#   wn     weight-normed Conv1d  (wnT: ConvTranspose1d, wn2d: Conv2d)
#          .weight_{g,v}/.bias          <-> {dst}/{g,v,bias}
#   sn     spectral-normed Conv1d (snlin: Linear)
#          .weight_orig/.bias           <-> params {dst}/{kernel,bias}
#          .weight_{u,v}                <-> spectral {dst}/{u,v}
#   linw   single Linear-layout weight tensor (GRU weights; torch key full)
#   raw    single tensor, no transform (GRU biases; torch key full)
#
# Biases are optional on conv-family kinds (emitted iff present on the
# source side).  On export every bn entry also emits the
# ``num_batches_tracked`` buffer torch checkpoints carry.
# ---------------------------------------------------------------------------

Spec = list


def _ecapa_spec(src: str, dst: str) -> Spec:
    """ECAPA-TDNN TaoRuijie (text2vec/ecapa_tdnn_TaoRuijie.py:11-206)."""
    s: Spec = [
        ("conv", f"{src}.conv1", f"{dst}/conv1/Conv_0"),
        ("bn", f"{src}.bn1", f"{dst}/bn1"),
    ]
    for li in (1, 2, 3):
        b, d = f"{src}.layer{li}", f"{dst}/layer{li}"
        s += [("conv", f"{b}.conv1", f"{d}/conv1/Conv_0"), ("bn", f"{b}.bn1", f"{d}/bn1")]
        for ci in range(7):  # scale 8 -> nums 7
            s += [
                ("conv", f"{b}.convs.{ci}", f"{d}/convs_{ci}/Conv_0"),
                ("bn", f"{b}.bns.{ci}", f"{d}/bns_{ci}"),
            ]
        s += [
            ("conv", f"{b}.conv3", f"{d}/conv3/Conv_0"),
            ("bn", f"{b}.bn3", f"{d}/bn3"),
            # SE: se.se.1 (C->128), se.se.3 (128->C)
            ("conv", f"{b}.se.se.1", f"{d}/se/Conv1d_0/Conv_0"),
            ("conv", f"{b}.se.se.3", f"{d}/se/Conv1d_1/Conv_0"),
        ]
    s += [
        ("conv", f"{src}.layer4", f"{dst}/layer4/Conv_0"),
        # attention: Sequential[0]=conv, [2]=bn, [4]=conv
        ("conv", f"{src}.attention.0", f"{dst}/att_conv1/Conv_0"),
        ("bn", f"{src}.attention.2", f"{dst}/att_bn"),
        ("conv", f"{src}.attention.4", f"{dst}/att_conv2/Conv_0"),
        ("bn", f"{src}.bn5", f"{dst}/bn5"),
        ("lin", f"{src}.fc6", f"{dst}/fc6/Dense_0"),
        ("bn", f"{src}.bn6", f"{dst}/bn6"),
    ]
    return s


def _fft_stack_spec(src: str, dst: str, n_layers: int) -> Spec:
    """FFT block stack (text2vec/subLayer.py:34-174)."""
    s: Spec = []
    for i in range(n_layers):
        b, d = f"{src}.layer_stack.{i}", f"{dst}/layer_stack_{i}"
        for name in ("w_qs", "w_ks", "w_vs", "fc"):
            s.append(("lin", f"{b}.slf_attn.{name}", f"{d}/slf_attn/{name}"))
        s.append(("ln", f"{b}.slf_attn.layer_norm", f"{d}/slf_attn/LayerNorm_0/LayerNorm_0"))
        for w in ("w_1", "w_2"):
            s.append(("conv", f"{b}.pos_ffn.{w}", f"{d}/pos_ffn/{w}/Conv_0"))
        s.append(("ln", f"{b}.pos_ffn.layer_norm", f"{d}/pos_ffn/LayerNorm_0/LayerNorm_0"))
    return s


def _text2vec_spec(cfg) -> Spec:
    """Text2Vec (text2vec/model.py:194-356)."""
    s: Spec = [("emb", "encoder.src_word_emb.weight", "encoder/src_word_emb")]
    if cfg.use_multi_speaker_condition:
        s += _ecapa_spec("encoder.speaker_encoder", "encoder/speaker_encoder")
    s += _fft_stack_spec("encoder", "encoder", cfg.encoder_n_layer)
    s += _fft_stack_spec("decoder", "decoder", cfg.decoder_n_layer)

    # duration predictor (module.py:110-156)
    dp = "length_regulator.duration_predictor"
    for i in (1, 2):
        s += [
            ("conv", f"{dp}.conv_layer.conv1d_{i}.conv", f"duration_predictor/conv1d_{i}/Conv_0"),
            ("ln", f"{dp}.conv_layer.layer_norm_{i}", f"duration_predictor/layer_norm_{i}/LayerNorm_0"),
        ]
    s.append(("lin", f"{dp}.linear_layer.linear_layer", "duration_predictor/linear_layer/Dense_0"))

    for name in ("WVF_linear", "last_linear"):
        s.append(("lin", f"{name}.linear_layer", f"{name}/Dense_0"))

    # CBHG postnet (module.py:287-364)
    for k in range(8):
        s += [
            ("conv", f"postnet.conv1d_banks.{k}.conv1d", f"postnet/conv1d_banks_{k}/conv1d/Conv_0"),
            ("bn", f"postnet.conv1d_banks.{k}.bn", f"postnet/conv1d_banks_{k}/bn"),
        ]
    for i in range(2):
        s += [
            ("conv", f"postnet.conv1d_projections.{i}.conv1d",
             f"postnet/conv1d_projections_{i}/conv1d/Conv_0"),
            ("bn", f"postnet.conv1d_projections.{i}.bn", f"postnet/conv1d_projections_{i}/bn"),
        ]
    for i in range(4):
        s += [
            ("lin", f"postnet.highways.{i}.H", f"postnet/highways_{i}/Dense_0"),
            ("lin", f"postnet.highways.{i}.T", f"postnet/highways_{i}/Dense_1"),
        ]
    for d_, t_ in (("fwd", ""), ("bwd", "_reverse")):
        s += [
            ("linw", f"postnet.gru.weight_ih_l0{t_}", f"postnet/gru/{d_}_w_ih"),
            ("linw", f"postnet.gru.weight_hh_l0{t_}", f"postnet/gru/{d_}_w_hh"),
            ("raw", f"postnet.gru.bias_ih_l0{t_}", f"postnet/gru/{d_}_b_ih"),
            ("raw", f"postnet.gru.bias_hh_l0{t_}", f"postnet/gru/{d_}_b_hh"),
        ]

    # ConvAttention (module.py:455-545): key_proj.0/2, query_proj.0/2/4
    if cfg.learn_alignments:
        s += [
            ("conv", "attention.key_proj.0.conv", "attention/key_conv1/Conv_0"),
            ("conv", "attention.key_proj.2.conv", "attention/key_conv2/Conv_0"),
            ("conv", "attention.query_proj.0.conv", "attention/query_conv1/Conv_0"),
            ("conv", "attention.query_proj.2.conv", "attention/query_conv2/Conv_0"),
            ("conv", "attention.query_proj.4.conv", "attention/query_conv3/Conv_0"),
        ]
    return s


def _vec2wav_generator_spec(cfg) -> Spec:
    """Generator (vec2wav/models.py:77-156)."""
    s: Spec = [("wn", "conv_pre", "conv_pre"), ("wn", "conv_post", "conv_post")]
    for i in range(len(cfg.upsample_rates)):
        s += [
            ("wnT", f"ups.{i}", f"ups_{i}"),
            ("lin", f"fcs.{i}", f"fcs_{i}/Dense_0"),
            # CBN: BN(affine=False) running stats + spectral-norm linear;
            # "batch_nrom" reproduces the reference's typo'd attribute name
            # (vec2wav/modules.py:14)
            ("bn_na", f"cbns.{i}.batch_nrom", f"cbns_{i}/batch_norm"),
            ("snlin", f"cbns.{i}.layer", f"cbns_{i}/layer"),
        ]
    for n in range(len(cfg.upsample_rates) * len(cfg.resblock_kernel_sizes)):
        if cfg.use_resblock1:
            for j in range(3):
                s += [
                    ("wn", f"resblocks.{n}.convs1.{j}", f"resblocks_{n}/convs1_{j}"),
                    ("wn", f"resblocks.{n}.convs2.{j}", f"resblocks_{n}/convs2_{j}"),
                ]
        else:
            for j in range(2):
                s.append(("wn", f"resblocks.{n}.convs.{j}", f"resblocks_{n}/convs_{j}"))
    return s


def _vec2wav_mpd_spec(cfg) -> Spec:
    """MultiPeriodDiscriminator (vec2wav/models.py:159-215)."""
    s: Spec = []
    for i in range(len(cfg.periods)):
        for j in range(5):
            s.append(("wn2d", f"discriminators.{i}.convs.{j}", f"discriminators_{i}/convs_{j}"))
        s.append(("wn2d", f"discriminators.{i}.conv_post", f"discriminators_{i}/conv_post"))
    return s


def _vec2wav_msd_spec() -> Spec:
    """MultiScaleDiscriminator (vec2wav/models.py:218-275): first scale
    spectral-normed, others weight-normed."""
    s: Spec = []
    for i in range(3):
        kind = "sn" if i == 0 else "wn"
        for j in range(7):
            s.append((kind, f"discriminators.{i}.convs.{j}", f"discriminators_{i}/convs_{j}"))
        s.append((kind, f"discriminators.{i}.conv_post", f"discriminators_{i}/conv_post"))
    return s


def _apply_import(sd: Dict[str, np.ndarray], spec: Spec,
                  params: Dict, stats: Dict, spectral: Dict) -> None:
    for kind, src, dst in spec:
        if kind == "emb" or kind == "raw":
            _nested_set(params, dst, sd[src])
        elif kind == "linw":
            _nested_set(params, dst, _lin_w(sd[src]))
        elif kind == "lin":
            _nested_set(params, f"{dst}/kernel", _lin_w(sd[f"{src}.weight"]))
            if f"{src}.bias" in sd:
                _nested_set(params, f"{dst}/bias", sd[f"{src}.bias"])
        elif kind == "conv":
            _nested_set(params, f"{dst}/kernel", _conv_w(sd[f"{src}.weight"]))
            if f"{src}.bias" in sd:
                _nested_set(params, f"{dst}/bias", sd[f"{src}.bias"])
        elif kind == "ln":
            _nested_set(params, f"{dst}/scale", sd[f"{src}.weight"])
            _nested_set(params, f"{dst}/bias", sd[f"{src}.bias"])
        elif kind == "bn" or kind == "bn_na":
            if kind == "bn":
                _nested_set(params, f"{dst}/BatchNorm_0/scale", sd[f"{src}.weight"])
                _nested_set(params, f"{dst}/BatchNorm_0/bias", sd[f"{src}.bias"])
            _nested_set(stats, f"{dst}/BatchNorm_0/mean", sd[f"{src}.running_mean"])
            _nested_set(stats, f"{dst}/BatchNorm_0/var", sd[f"{src}.running_var"])
        elif kind in ("wn", "wnT", "wn2d"):
            trans = {"wn": _conv_w, "wnT": _convT_w, "wn2d": _conv2d_w}[kind]
            _nested_set(params, f"{dst}/v", trans(sd[f"{src}.weight_v"]))
            _nested_set(params, f"{dst}/g", trans(sd[f"{src}.weight_g"]))
            if f"{src}.bias" in sd:
                _nested_set(params, f"{dst}/bias", sd[f"{src}.bias"])
        elif kind in ("sn", "snlin"):
            trans = _conv_w if kind == "sn" else _lin_w
            _nested_set(params, f"{dst}/kernel", trans(sd[f"{src}.weight_orig"]))
            if f"{src}.bias" in sd:
                _nested_set(params, f"{dst}/bias", sd[f"{src}.bias"])
            _nested_set(spectral, f"{dst}/u", sd[f"{src}.weight_u"])
            _nested_set(spectral, f"{dst}/v", sd[f"{src}.weight_v"])
        else:  # pragma: no cover
            raise ValueError(f"unknown spec kind {kind}")


def _apply_export(variables: Any, spec: Spec) -> Dict[str, np.ndarray]:
    params = variables.get("params", {})
    stats = variables.get("batch_stats", {})
    spectral = variables.get("spectral", {})
    sd: Dict[str, np.ndarray] = {}

    def put(key, value):
        if value is not None:
            sd[key] = np.asarray(value)

    for kind, src, dst in spec:
        if kind == "emb" or kind == "raw":
            put(src, _nested_get(params, dst))
        elif kind == "linw":
            put(src, _lin_w(_nested_get(params, dst)))
        elif kind == "lin":
            put(f"{src}.weight", _lin_w(_nested_get(params, f"{dst}/kernel")))
            put(f"{src}.bias", _nested_get(params, f"{dst}/bias"))
        elif kind == "conv":
            put(f"{src}.weight", _inv_conv_w(_nested_get(params, f"{dst}/kernel")))
            put(f"{src}.bias", _nested_get(params, f"{dst}/bias"))
        elif kind == "ln":
            put(f"{src}.weight", _nested_get(params, f"{dst}/scale"))
            put(f"{src}.bias", _nested_get(params, f"{dst}/bias"))
        elif kind == "bn" or kind == "bn_na":
            if kind == "bn":
                put(f"{src}.weight", _nested_get(params, f"{dst}/BatchNorm_0/scale"))
                put(f"{src}.bias", _nested_get(params, f"{dst}/BatchNorm_0/bias"))
            put(f"{src}.running_mean", _nested_get(stats, f"{dst}/BatchNorm_0/mean"))
            put(f"{src}.running_var", _nested_get(stats, f"{dst}/BatchNorm_0/var"))
            put(f"{src}.num_batches_tracked", np.zeros((), np.int64))
        elif kind in ("wn", "wnT", "wn2d"):
            inv = {"wn": _inv_conv_w, "wnT": _inv_convT_w, "wn2d": _inv_conv2d_w}[kind]
            put(f"{src}.weight_v", inv(_nested_get(params, f"{dst}/v")))
            put(f"{src}.weight_g", inv(_nested_get(params, f"{dst}/g")))
            put(f"{src}.bias", _nested_get(params, f"{dst}/bias"))
        elif kind in ("sn", "snlin"):
            inv = _inv_conv_w if kind == "sn" else _lin_w
            put(f"{src}.weight_orig", inv(_nested_get(params, f"{dst}/kernel")))
            put(f"{src}.bias", _nested_get(params, f"{dst}/bias"))
            put(f"{src}.weight_u", _nested_get(spectral, f"{dst}/u"))
            put(f"{src}.weight_v", _nested_get(spectral, f"{dst}/v"))
        else:  # pragma: no cover
            raise ValueError(f"unknown spec kind {kind}")
    return sd


def _import_ecapa(sd, src, params, stats, dst) -> None:
    """Standalone ECAPA import (used by the ECAPA-only parity tests and any
    caller mapping a bare ECAPA_TDNN state dict)."""
    _apply_import(sd, _ecapa_spec(src, dst), params, stats, {})


# ---- import entry points ---------------------------------------------------

def import_text2vec(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """Map a reference Text2Vec state_dict (text2vec/model.py:194-356) onto
    our variables {params, batch_stats}."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    _apply_import(sd, _text2vec_spec(cfg), params, stats, {})
    return {"params": params, "batch_stats": stats}


def import_vec2wav_generator(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """Map a reference Generator state_dict (vec2wav/models.py:77-156)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    spectral: Dict[str, Any] = {}
    _apply_import(sd, _vec2wav_generator_spec(cfg), params, stats, spectral)
    return {"params": params, "batch_stats": stats, "spectral": spectral}


def import_vec2wav_mpd(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    _apply_import(sd, _vec2wav_mpd_spec(cfg), params, {}, {})
    return {"params": params}


def import_vec2wav_msd(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    spectral: Dict[str, Any] = {}
    _apply_import(sd, _vec2wav_msd_spec(), params, {}, spectral)
    return {"params": params, "spectral": spectral}


# ---- export entry points (our variables -> reference torch formats) --------

def export_text2vec(variables: Any, cfg) -> Dict[str, np.ndarray]:
    """Our Text2Vec variables -> a reference-layout ``model`` state dict.

    Constants the reference stores as module state are recomputed and
    emitted: the frozen sinusoid ``position_enc`` tables (model.py:56-58,
    150-152) and — when our conditional module never created it — the
    reference's dead ``postnet.pre_highway`` weight (zeros; defined at
    module.py:312 but bypassed whenever projections[-1] == in_dim, which
    holds at the reference config).  The reference ECAPA's ``torchfbank``
    buffers (PreEmphasis/MelSpectrogram constants,
    ecapa_tdnn_TaoRuijie.py:138-143) are NOT emitted — unused on the t2v
    path (``input_wav=False``); reference tooling should load with
    ``strict=False`` (see ``cli export-torch``)."""
    from wavthruvec_pytorch_tpu.ops.positional import sinusoid_encoding_table

    sd = _apply_export(variables, _text2vec_spec(cfg))
    sd["encoder.position_enc.weight"] = sinusoid_encoding_table(
        cfg.vocab_size + 1, cfg.encoder_dim, padding_idx=0
    ).astype(np.float32)
    sd["decoder.position_enc.weight"] = sinusoid_encoding_table(
        cfg.max_seq_len + 1, cfg.decoder_model_dim, padding_idx=0
    ).astype(np.float32)
    if "postnet.pre_highway.weight" not in sd:
        pre = _nested_get(variables.get("params", {}), "postnet/pre_highway/Dense_0/kernel")
        proj_last = 1024  # CBHG projections (256, 1024) (module.py:293,312)
        sd["postnet.pre_highway.weight"] = (
            _lin_w(pre) if pre is not None
            else np.zeros((cfg.n_feat_dim, proj_last), np.float32)
        )
    return sd


def export_vec2wav_generator(variables: Any, cfg) -> Dict[str, np.ndarray]:
    return _apply_export(variables, _vec2wav_generator_spec(cfg))


def export_vec2wav_mpd(variables: Any, cfg) -> Dict[str, np.ndarray]:
    return _apply_export(variables, _vec2wav_mpd_spec(cfg))


def export_vec2wav_msd(variables: Any) -> Dict[str, np.ndarray]:
    return _apply_export(variables, _vec2wav_msd_spec())


def _to_torch(sd: Dict[str, np.ndarray]):
    import torch

    # torch.tensor copies — the exported arrays can be read-only jax buffers
    return {k: torch.tensor(np.asarray(v)) for k, v in sd.items()}


def _param_group_stub(sd: Dict[str, np.ndarray], **hyper) -> Dict[str, Any]:
    """A loadable torch optimizer state dict with EMPTY per-param state:
    ``param_groups`` ids cover every trainable tensor in ``sd`` (buffers —
    running stats, counters, spectral u/v — excluded).  torch's
    ``Optimizer.load_state_dict`` accepts it and restores the group
    hyperparameters; moments start fresh (they are native-optimizer state
    we do not translate)."""
    # weight-norm's weight_v IS a parameter (unlike spectral-norm's buffer
    # weight_v); distinguish by the presence of a sibling weight_g.
    n = 0
    for k in sd:
        if k.endswith((".running_mean", ".running_var", ".num_batches_tracked",
                       ".weight_u")):
            continue
        if k.endswith(".weight_v") and k[: -len("weight_v")] + "weight_g" not in sd:
            continue  # spectral-norm buffer
        n += 1
    return {"state": {}, "param_groups": [dict(hyper, params=list(range(n)))]}


def save_reference_text2vec(path: str, variables: Any, cfg,
                            epoch: int = 0, learning_rate: float = None) -> None:
    """Write a reference-format Text2Vec checkpoint
    (``checkpoint_{step}.pth.tar`` = {model, optimizer, learning_rate, epoch},
    text2vec/train.py:426-432) from our variables."""
    import torch

    lr = cfg.learning_rate if learning_rate is None else learning_rate
    sd = export_text2vec(variables, cfg)
    ckpt = {
        "model": _to_torch(sd),
        "optimizer": _param_group_stub(
            sd, lr=lr, betas=(cfg.beta1, cfg.beta2),
            eps=cfg.epsilon, weight_decay=cfg.weight_decay),
        "learning_rate": lr,
        "epoch": epoch,
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    torch.save(ckpt, path)


def save_reference_vec2wav(cp_dir: str, step: int, gen_vars: Any, cfg,
                           mpd_vars: Any = None, msd_vars: Any = None,
                           epoch: int = 0) -> None:
    """Write reference-format Vec2Wav checkpoints: ``g_{step:08d}`` =
    {generator} and (when discriminator variables are given)
    ``do_{step:08d}`` = {mpd, msd, optim_g, optim_d, steps, epoch}
    (vec2wav/train.py:227-238)."""
    import torch

    os.makedirs(cp_dir, exist_ok=True)
    gen_sd = export_vec2wav_generator(gen_vars, cfg)
    torch.save({"generator": _to_torch(gen_sd)},
               os.path.join(cp_dir, f"g_{step:08d}"))
    if mpd_vars is not None and msd_vars is not None:
        mpd_sd = export_vec2wav_mpd(mpd_vars, cfg)
        msd_sd = export_vec2wav_msd(msd_vars)
        adamw = dict(lr=cfg.learning_rate, betas=(cfg.adam_b1, cfg.adam_b2),
                     eps=1e-8, weight_decay=0.01, amsgrad=False)
        torch.save({
            "mpd": _to_torch(mpd_sd),
            "msd": _to_torch(msd_sd),
            "optim_g": _param_group_stub(gen_sd, **adamw),
            "optim_d": _param_group_stub({**mpd_sd, **msd_sd}, **adamw),
            "steps": step,
            "epoch": epoch,
        }, os.path.join(cp_dir, f"do_{step:08d}"))


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
