"""Per-speaker embedding precompute for Vec2Wav conditioning.

Reference: vec2wav/pre_spk_emb.py:1-33 — SpeechBrain pretrained ECAPA
(`spkrec-ecapa-voxceleb`): concat the first 50 wavs per speaker at 16 kHz,
one `encode_batch`, save ``spk_emb/{spk}.pth`` of shape (1, 1, 192).

TPU-native: the shared ECAPA module (models/ecapa.py, ``input_wav=True`` raw
waveform path with the fbank frontend) runs jitted on device; embeddings are
cached as ``spk_emb/{spk}.npy``.  Pretrained weights load through the torch
importer (checkpoint.py) when available; zero-egress environments can't
download SpeechBrain's, so callers must supply params (or accept random-init
for pipeline tests).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

from wavthruvec_pytorch_tpu.data.vocoder_data import load_wav
from wavthruvec_pytorch_tpu.models.ecapa import ECAPA_TDNN


class SpeakerEmbedder:
    def __init__(
        self,
        params=None,
        C: int = 1024,
        n_speaker_dim: int = 192,
        max_samples: int = 16000 * 60,
    ):
        import jax
        import jax.numpy as jnp

        self.model = ECAPA_TDNN(
            C=C, n_feat_dim=80, n_speaker_dim=n_speaker_dim, input_wav=True
        )
        self.max_samples = max_samples
        if params is None:
            wav = jnp.zeros((1, 16000))
            params = self.model.init(jax.random.PRNGKey(0), wav, train=False)
        self.variables = params

        def forward(variables, wav):
            return self.model.apply(variables, wav, train=False)

        self._forward = jax.jit(forward)
        del jnp

    def embed_concat(self, wavs: Sequence[np.ndarray]) -> np.ndarray:
        """Concat utterances (reference concatenates the first 50 wavs,
        pre_spk_emb.py:20-29) and embed -> [192]."""
        import jax.numpy as jnp

        cat = np.concatenate(wavs)[: self.max_samples].astype(np.float32)
        # pad to a fixed bucket so the jit cache stays small
        bucket = 1 << int(np.ceil(np.log2(max(len(cat), 16000))))
        cat = np.pad(cat, (0, bucket - len(cat)))
        return np.asarray(self._forward(self.variables, jnp.asarray(cat[None])))[0]


class SpeechBrainEmbedder:
    """Embedder matching the reference's actual conditioning source: the
    pretrained SpeechBrain ``spkrec-ecapa-voxceleb`` classifier
    (vec2wav/pre_spk_emb.py:12,30).  Load the bundle's
    ``embedding_model.ckpt`` (a torch state dict) via ``torch_ckpt`` to
    reproduce the reference's ``spk_emb/{spk}.pth`` values; without weights
    the architecture runs random-init (pipeline tests only).
    """

    def __init__(self, torch_ckpt: Optional[str] = None, max_samples: int = 16000 * 60):
        import jax
        import jax.numpy as jnp

        from wavthruvec_pytorch_tpu.models.ecapa_speechbrain import (
            ECAPA_TDNN_SB,
            sb_fbank,
            sentence_norm,
        )

        self.model = ECAPA_TDNN_SB()
        self.max_samples = max_samples
        if torch_ckpt is not None:
            from wavthruvec_pytorch_tpu.checkpoint import (
                import_speechbrain_ecapa,
                load_torch_state_dict,
            )

            self.variables = import_speechbrain_ecapa(
                load_torch_state_dict(torch_ckpt)
            )
        else:
            feats = jnp.zeros((1, 100, 80))
            self.variables = self.model.init(jax.random.PRNGKey(0), feats, train=False)

        def forward(variables, wav):
            return self.model.apply(variables, sentence_norm(sb_fbank(wav)), train=False)

        self._forward = jax.jit(forward)

    def embed_concat(self, wavs: Sequence[np.ndarray], exact: bool = False) -> np.ndarray:
        """Embed the concatenation of the speaker's utterances.

        Zero-padding would shift the fbank/sentence-norm statistics (unlike
        the feature-input ECAPA), so for a bounded jit-shape count the wav is
        *truncated down* to whole seconds by default (≤1 s lost out of ~50
        utterances — negligible for a speaker centroid).  ``exact=True``
        keeps every sample (reference-exact; one compile per length).
        """
        import jax.numpy as jnp

        cat = np.concatenate(wavs)[: self.max_samples].astype(np.float32)
        if not exact:
            n = max(16000, (len(cat) // 16000) * 16000)
            cat = cat[:n]
        return np.asarray(self._forward(self.variables, jnp.asarray(cat[None])))[0]


def precompute_speaker_embeddings(
    wavs_root: str,
    out_dir: str,
    embedder: Optional[SpeakerEmbedder] = None,
    n_files_per_speaker: int = 50,
) -> Dict[str, np.ndarray]:
    """Walk ``{wavs_root}/{spk}/*.wav`` -> ``{out_dir}/{spk}.npy``
    (reference: pre_spk_emb.py:15-33)."""
    embedder = embedder or SpeakerEmbedder()
    os.makedirs(out_dir, exist_ok=True)
    out = {}
    for spk in sorted(os.listdir(wavs_root)):
        spk_dir = os.path.join(wavs_root, spk)
        if not os.path.isdir(spk_dir):
            continue
        wavs = []
        for f in sorted(os.listdir(spk_dir))[:n_files_per_speaker]:
            if f.endswith(".wav"):
                wavs.append(load_wav(os.path.join(spk_dir, f))[0])
        if not wavs:
            continue
        emb = embedder.embed_concat(wavs)
        np.save(os.path.join(out_dir, f"{spk}.npy"), emb)
        out[spk] = emb
    return out
