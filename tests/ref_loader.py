"""Test-harness loader for the reference implementation at /root/reference.

The reference is loaded READ-ONLY at test time to serve as a numerical
oracle; nothing is copied.  Two of its dependencies are not in this image,
so we install minimal shims before exec'ing reference modules:

* ``numba``  — reference text2vec/alignment.py decorates ``mas_width1`` with
  ``@jit(nopython=True)``; the shim makes ``jit`` a no-op decorator so the
  kernel runs as pure Python (fine for test-size inputs).
* ``torchaudio`` — reference ecapa_tdnn_TaoRuijie.py:140 builds
  ``torchaudio.transforms.MelSpectrogram(sample_rate=16000, n_fft=512,
  win_length=400, hop_length=160, f_min=20, f_max=7600,
  window_fn=torch.hamming_window, n_mels=80)``.  The shim reimplements the
  documented torchaudio semantics (torch.stft with center=True reflect pad,
  power-2 magnitude, HTK-scale mel filterbank without normalization) with
  torch ops so the raw-wav fbank path can be exercised end-to-end.

The loader itself handles the reference's flat ``import hparams`` style by
temporarily putting the stage directory on sys.path and clearing the generic
module names, then restoring everything.
"""

from __future__ import annotations

import importlib.machinery
import importlib.util
import math
import os
import sys
import types

import torch

REF = "/root/reference"

# every top-level module name the reference's flat imports can resolve to
_REF_NAMES = (
    "hparams",
    "utils",
    "modules",
    "models",
    "model",
    "module",
    "subLayer",
    "Constants",
    "alignment",
    "ecapa_tdnn_TaoRuijie",
    "ecapa_tdnn_lawlict",
    "ecapa_tdnn",
    "text",
    "dataset",
    "loss",
    "optimizer",
    "log_utils",
)


def _install_numba_shim() -> None:
    if "numba" in sys.modules:
        return
    fake = types.ModuleType("numba")

    def jit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]

        def deco(fn):
            return fn

        return deco

    fake.jit = jit
    sys.modules["numba"] = fake


def _htk_mel_filterbank_torch(
    sr: int, n_fft: int, n_mels: int, f_min: float, f_max: float
) -> torch.Tensor:
    """torchaudio.functional.melscale_fbanks defaults: HTK mel scale, no
    Slaney normalization.  Returns [n_freqs, n_mels]."""

    def hz_to_mel(f):
        return 2595.0 * math.log10(1.0 + f / 700.0)

    all_freqs = torch.linspace(0, sr // 2, n_fft // 2 + 1, dtype=torch.float64)
    m_pts = torch.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2, dtype=torch.float64)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)  # [F, n_mels+2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = torch.clamp(torch.min(down, up), min=0.0)
    return fb.to(torch.float32)


class _MelSpectrogram(torch.nn.Module):
    """Minimal torchaudio.transforms.MelSpectrogram equivalent (power=2,
    center=True with reflect pad, onesided, HTK mel, norm=None)."""

    def __init__(
        self,
        sample_rate=16000,
        n_fft=400,
        win_length=None,
        hop_length=None,
        f_min=0.0,
        f_max=None,
        window_fn=torch.hann_window,
        n_mels=128,
        power=2.0,
    ):
        super().__init__()
        self.n_fft = n_fft
        self.win_length = win_length if win_length is not None else n_fft
        self.hop_length = hop_length if hop_length is not None else self.win_length // 2
        self.power = power
        f_max = f_max if f_max is not None else sample_rate / 2.0
        self.register_buffer("window", window_fn(self.win_length))
        self.register_buffer(
            "fb", _htk_mel_filterbank_torch(sample_rate, n_fft, n_mels, f_min, f_max)
        )

    def forward(self, wav: torch.Tensor) -> torch.Tensor:
        spec = torch.stft(
            wav,
            self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
            window=self.window,
            center=True,
            pad_mode="reflect",
            normalized=False,
            onesided=True,
            return_complex=True,
        )
        power_spec = spec.abs() ** self.power  # [B, F, T]
        return torch.matmul(power_spec.transpose(-1, -2), self.fb).transpose(-1, -2)


def _install_torchaudio_shim() -> None:
    if "torchaudio" in sys.modules:
        return
    fake = types.ModuleType("torchaudio")
    transforms = types.ModuleType("torchaudio.transforms")
    transforms.MelSpectrogram = _MelSpectrogram
    fake.transforms = transforms
    # a real ModuleSpec so importlib.util.find_spec("torchaudio") — which
    # third-party libs (transformers) call to probe availability — does not
    # raise ValueError on the shim
    fake.__spec__ = importlib.machinery.ModuleSpec("torchaudio", None)
    transforms.__spec__ = importlib.machinery.ModuleSpec(
        "torchaudio.transforms", None)
    sys.modules["torchaudio"] = fake
    sys.modules["torchaudio.transforms"] = transforms


def ensure_shims() -> None:
    _install_numba_shim()
    _install_torchaudio_shim()


def load_ref_module(subdir: str, name: str, alias: str):
    """Import reference ``{subdir}/{name}.py`` under ``alias`` without
    polluting generic module names for the rest of the test session."""
    ensure_shims()
    path = os.path.join(REF, subdir)
    saved = {k: sys.modules.get(k) for k in _REF_NAMES}
    sys.path.insert(0, path)
    cwd = os.getcwd()
    try:
        os.chdir(REF)  # hparams reads ./data/vocab.txt
        for k in _REF_NAMES:
            sys.modules.pop(k, None)
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(path, f"{name}.py")
        )
        mod = importlib.util.module_from_spec(spec)
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


def cpu_mask_from_lengths(lengths: torch.Tensor, max_len=None) -> torch.Tensor:
    """CPU-safe stand-in for the reference's CUDA-only
    ``get_mask_from_lengths`` (text2vec/model.py:19-30, utils.py:24-31 both
    allocate ``torch.cuda.LongTensor``); identical semantics."""
    if max_len is None:
        max_len = int(torch.max(lengths).item())
    ids = torch.arange(0, max_len, dtype=torch.long)
    return (ids < lengths.unsqueeze(1)).bool()


def cpu_binarize_attention(ref_model_module):
    """CPU-safe stand-in for Text2Vec.binarize_attention (model.py:239-253):
    the original materializes the result with ``device=attn.get_device()``
    which is CUDA-only.  Same math, same reference ``mas`` kernel."""

    def binarize(self, attn, in_lens, out_lens):
        b_size = attn.shape[0]
        with torch.no_grad():
            attn_cpu = attn.data.cpu().numpy()
            attn_out = torch.zeros_like(attn)
            for ind in range(b_size):
                hard = ref_model_module.mas(
                    attn_cpu[ind, 0, : out_lens[ind], : in_lens[ind]]
                )
                attn_out[ind, 0, : out_lens[ind], : in_lens[ind]] = torch.tensor(hard)
        return attn_out

    return binarize
