"""Offline ingest: wav -> wav2vec-2.0 features (.npy), filelists, vocab.

Reference: prepare_data.py:1-114 — per-wav torch Wav2Vec2Model forward,
alternating train/val filelist lines ``{spk/file.npy}|{text}|{spk}``, vocab =
'PE ' + observed chars.

TPU-native: the model runs as HuggingFace **Flax**Wav2Vec2Model, batched and
jitted, with length-bucketed padding + attention masks so one compiled graph
serves many utterances (the reference runs one unbatched torch forward per
file, prepare_data.py:80-82).  Weights must be available locally (zero-egress
environments can't download); pass ``model_path``.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Sequence

import numpy as np

from wavthruvec_pytorch_tpu.data.vocoder_data import load_wav

_STRIP_CHARSET = "PE abcdefghijklmnopqrstuvwxyz0123456789.?"


def clean_label_text(text: str) -> str:
    """AISHELL-3 content.txt cleanup (prepare_data.py:52-55): lowercase,
    strip the latin/digit/punct charset, collapse spaces."""
    text = text.lower()
    text = re.sub("[{}]".format(_STRIP_CHARSET), " ", text)
    text = re.sub("[ ]+", "", text)
    return text.strip()


def parse_content_file(label_file_path: str) -> Dict[str, str]:
    """content.txt: ``{file}\\t{text}`` -> {file: cleaned_text}
    (prepare_data.py:43-57)."""
    label_dict: Dict[str, str] = {}
    with open(label_file_path, "r", encoding="utf-8") as f:
        for line in f.readlines():
            _path, text = line.strip().split("\t")
            label_dict[_path] = clean_label_text(text)
    return label_dict


def build_vocab(vocab_path: str, label_dict: Dict[str, str]) -> str:
    """'PE ' + observed chars -> single-line vocab file
    (prepare_data.py:100-114; set-ordering is made deterministic here)."""
    symbols = "PE "
    chars = set()
    for v in label_dict.values():
        chars.update(v)
    symbols += "".join(sorted(chars))
    os.makedirs(os.path.dirname(vocab_path) or ".", exist_ok=True)
    with open(vocab_path, "w", encoding="utf-8") as fw:
        fw.write(symbols)
    return symbols


class Wav2VecFeaturizer:
    """Batched, jitted wav2vec-2.0 feature extraction on TPU.

    ``model_path``: local HF checkpoint dir (e.g. TencentGameMate
    chinese-wav2vec2-large, readme.md:41-43).  ``random_init=True`` builds a
    randomly-initialized model for pipeline tests without weights.
    """

    def __init__(
        self,
        model_path: Optional[str] = None,
        random_init: bool = False,
        config_overrides: Optional[dict] = None,
        wav_buckets: Sequence[int] = (16000, 32000, 64000, 96000, 160000),
    ):
        import jax
        from transformers import FlaxWav2Vec2Model, Wav2Vec2Config

        self.wav_buckets = tuple(wav_buckets)
        if random_init:
            config = Wav2Vec2Config(**(config_overrides or {}))
            self.model = FlaxWav2Vec2Model(config, seed=0)
        else:
            if model_path is None:
                raise ValueError(
                    "model_path required (zero-egress: weights must be local); "
                    "or pass random_init=True for pipeline tests"
                )
            self.model = FlaxWav2Vec2Model.from_pretrained(model_path)
        self.do_normalize = True  # Wav2Vec2FeatureExtractor default

        import jax.numpy as jnp

        def forward(params, input_values, attention_mask):
            out = self.model(
                input_values, attention_mask=attention_mask, params=params
            )
            return out.last_hidden_state

        self._forward = jax.jit(forward)
        del jnp

    def _normalize(self, wav: np.ndarray) -> np.ndarray:
        # Wav2Vec2FeatureExtractor zero-mean/unit-var normalization
        if self.do_normalize:
            return (wav - wav.mean()) / np.sqrt(wav.var() + 1e-7)
        return wav

    def _bucket(self, n: int) -> int:
        for b in self.wav_buckets:
            if n <= b:
                return b
        return self.wav_buckets[-1]

    def extract_batch(self, wavs: List[np.ndarray]) -> List[np.ndarray]:
        """Featurize a list of float32 waveforms -> list of [T_i, C]."""
        import jax.numpy as jnp

        pad_len = self._bucket(max(len(w) for w in wavs))
        B = len(wavs)
        x = np.zeros((B, pad_len), np.float32)
        mask = np.zeros((B, pad_len), np.int32)
        for i, w in enumerate(wavs):
            w = self._normalize(w[:pad_len])
            x[i, : len(w)] = w
            mask[i, : len(w)] = 1
        hidden = np.asarray(
            self._forward(self.model.params, jnp.asarray(x), jnp.asarray(mask))
        )
        outs = []
        for i, w in enumerate(wavs):
            t = int(self.model._get_feat_extract_output_lengths(min(len(w), pad_len)))
            outs.append(hidden[i, :t])
        return outs


def prepare_data(
    wavs_path: str,
    feat_output_path: str,
    label_file_path: str,
    enc_train_list_path: str,
    enc_val_list_path: str,
    vocab_path: str,
    featurizer: Wav2VecFeaturizer,
    n_speakers: int = 15,
    n_files_per_speaker: int = 40,
    batch_size: int = 8,
) -> None:
    """Full ingest (reference flow prepare_data.py:61-114): featurize
    ``n_speakers x n_files``, alternate lines into train/val filelists
    (even index -> train, odd -> val, prepare_data.py:90-93), build vocab."""
    label_dict = parse_content_file(label_file_path)
    os.makedirs(feat_output_path, exist_ok=True)
    os.makedirs(os.path.dirname(enc_train_list_path) or ".", exist_ok=True)

    fw_train = open(enc_train_list_path, "w", encoding="utf-8")
    fw_val = open(enc_val_list_path, "w", encoding="utf-8")
    try:
        for spk in sorted(os.listdir(wavs_path))[:n_speakers]:
            spk_path = os.path.join(wavs_path, spk)
            if not os.path.isdir(spk_path):
                continue
            os.makedirs(os.path.join(feat_output_path, spk), exist_ok=True)
            files = sorted(os.listdir(spk_path))[:n_files_per_speaker]
            for start in range(0, len(files), batch_size):
                chunk = files[start : start + batch_size]
                wavs = [load_wav(os.path.join(spk_path, f))[0] for f in chunk]
                feats = featurizer.extract_batch(wavs)
                for ind_off, (fname, feat) in enumerate(zip(chunk, feats)):
                    ind = start + ind_off
                    npy_name = fname[:-4] + ".npy"
                    suffix = os.path.join(spk, npy_name)
                    np.save(
                        os.path.join(feat_output_path, suffix), feat[None]
                    )  # [1, T, C] like the reference
                    if fname not in label_dict:
                        continue
                    line = f"{suffix}|{label_dict[fname]}|{spk}"
                    print(line, file=fw_train if ind % 2 == 0 else fw_val)
    finally:
        fw_train.close()
        fw_val.close()
    build_vocab(vocab_path, label_dict)
