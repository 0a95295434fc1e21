"""Vec2Wav data pipeline: wav + wav2vec-feature + speaker-embedding loading,
host-side log-mel targets, fixed-shape padded batches.

Reference: vec2wav/dataset.py:80-228 (MelDataset + collate).  Differences by
design: librosa/torchaudio are not dependencies — wav loading uses the
stdlib/scipy, the log-mel target uses the exact same math as the in-graph
mel op (ops/stft.py), and every batch is padded to a static frame bucket so
the jitted GAN step compiles once per bucket.
"""

from __future__ import annotations

import math
import os
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from wavthruvec_pytorch_tpu.config import Vec2WavConfig
from wavthruvec_pytorch_tpu.ops.stft import _dft_kernel, mel_filterbank


def load_wav(path: str, target_sr: int = 16000) -> Tuple[np.ndarray, int]:
    """float32 mono waveform in [-1, 1] (reference: dataset.py:16-20 uses
    librosa.load(sr=16000); here scipy + polyphase resampling)."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    data = np.asarray(data)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data.mean(axis=1)
    if sr != target_sr:
        from scipy.signal import resample_poly

        g = math.gcd(sr, target_sr)
        data = resample_poly(data, target_sr // g, sr // g).astype(np.float32)
        sr = target_sr
    return data, sr


def normalize(audio: np.ndarray) -> np.ndarray:
    """librosa.util.normalize: peak-normalize to 1.0 (dataset.py:133)."""
    peak = np.max(np.abs(audio))
    return audio / peak if peak > 0 else audio


def mel_spectrogram_np(
    y: np.ndarray,
    n_fft: int,
    num_mels: int,
    sampling_rate: int,
    hop_size: int,
    win_size: int,
    fmin: float,
    fmax: Optional[float],
) -> np.ndarray:
    """Host (numpy) twin of ops.stft.mel_spectrogram: [L] -> [frames, M].

    Same reflect pad, windowed-DFT kernel and slaney filterbank, so the
    host-computed training target matches the in-graph op bit-for-bit up to
    f32 accumulation order (reference computes the target in its Dataset,
    vec2wav/dataset.py:177-179).
    """
    pad = int((n_fft - hop_size) / 2)
    y = np.pad(y, (pad, pad), mode="reflect")
    n_frames = (len(y) - n_fft) // hop_size + 1
    idx = np.arange(n_fft)[None, :] + hop_size * np.arange(n_frames)[:, None]
    frames = y[idx]  # [frames, n_fft]
    kernel = _dft_kernel(n_fft, win_size)[:, 0, :]  # [2F, n_fft]
    spec = frames @ kernel.T  # [frames, 2F]
    F = n_fft // 2 + 1
    mag = np.sqrt(spec[:, :F] ** 2 + spec[:, F:] ** 2 + 1e-9)
    basis = mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax)
    mel = mag @ basis.T  # [frames, M]
    return np.log(np.clip(mel, 1e-5, None)).astype(np.float32)


def get_dataset_filelist(
    input_training_file: str, input_validation_file: str
) -> Tuple[List[str], List[str]]:
    # reference: vec2wav/dataset.py:80-87 (first |-field per line)
    def read(p):
        with open(p, "r", encoding="utf-8") as f:
            return [x.split("|")[0] for x in f.read().split("\n") if len(x) > 0]

    return read(input_training_file), read(input_validation_file)


def load_spk_emb(path: str) -> np.ndarray:
    """Per-speaker embedding: .npy, or the reference's torch .pth
    (vec2wav/dataset.py:183)."""
    if path.endswith(".npy"):
        return np.load(path).squeeze().astype(np.float32)
    import torch

    return torch.load(path, map_location="cpu").squeeze().numpy().astype(np.float32)


class VocoderDataset:
    """Per-item loading mirroring the reference MelDataset path scheme:
    filelist entry ``train/SSB.../x.npy`` ->
    wav ``{train_wav_path}/train/wav/SSB.../x.wav``,
    feats ``{feat_ground_truth}/train/SSB.../x.npy``,
    spk emb ``{spk_emb_path}/{SSB...}.pth`` (vec2wav/dataset.py:115-187).
    """

    def __init__(
        self,
        files: Sequence[str],
        cfg: Vec2WavConfig,
        fine_tuning: bool = False,
        base_mels_path: Optional[str] = None,
        split: Optional[bool] = None,
        seed: int = 1234,
        npy_loader=None,
        cache_budget_bytes: int = 4 << 30,
        compute_mel: Optional[bool] = None,
    ):
        self.files = list(files)
        self.cfg = cfg
        self.fine_tuning = fine_tuning
        self.base_mels_path = base_mels_path
        self.split = cfg.split if split is None else split
        # device_mel_target moves the mel-loss target into the jitted step;
        # the loader then skips the host mel entirely (validation datasets
        # pass compute_mel=True — their mel use is host-side)
        self.compute_mel = (
            not getattr(cfg, "device_mel_target", False)
            if compute_mel is None else compute_mel
        )
        if not self.compute_mel and not self.split:
            # the device target is exact only when item length == batch
            # length (the host op reflect-pads at each ITEM's boundary; the
            # in-graph op sees batch zero-padding there) — guaranteed in
            # windowed mode, where it also matters: windows are random per
            # epoch so the host mel cannot be item-cached.  Full-utterance
            # mode caches the host mel from epoch 2 — keep it there.
            raise ValueError(
                "device_mel_target requires windowed training (split=True); "
                "full-utterance mode keeps the (cached) host mel target"
            )
        self.rng = np.random.default_rng(seed)
        self._rng_lock = threading.Lock()
        self.load_npy = npy_loader or np.load
        # RAM cache across epochs (the reference caches raw audio,
        # vec2wav/dataset.py:129-137; we additionally cache the whole
        # deterministic item in full-utterance mode — audio, host mel and
        # feats are all epoch-invariant there).  Bounded by a byte budget;
        # beyond it new items are served uncached.
        self.cache_budget_bytes = cache_budget_bytes
        self._cache_bytes = 0
        self._cache_lock = threading.Lock()
        self._audio_cache: Dict[int, np.ndarray] = {}
        self._feat_cache: Dict[int, np.ndarray] = {}
        self._item_cache: Dict[int, Dict] = {}
        self._spk_cache: Dict[str, np.ndarray] = {}

    def __len__(self):
        return len(self.files)

    def _cache_put(self, store, key, value, nbytes) -> None:
        with self._cache_lock:
            if key in store:
                return  # a concurrent worker won the race; don't double-count
            if self._cache_bytes + nbytes <= self.cache_budget_bytes:
                store[key] = value
                self._cache_bytes += nbytes

    def _load_spk(self, spk: str) -> np.ndarray:
        emb = self._spk_cache.get(spk)
        if emb is None:
            cfg = self.cfg
            spk_path_pth = os.path.join(cfg.spk_emb_path, spk + ".pth")
            spk_path_npy = os.path.join(cfg.spk_emb_path, spk + ".npy")
            emb = load_spk_emb(
                spk_path_npy if os.path.exists(spk_path_npy) else spk_path_pth
            )
            with self._cache_lock:
                self._spk_cache[spk] = emb
        return emb

    def full_arrays(self, index: int):
        """Un-windowed (full-length) arrays for one item: (wv_feat [T,C],
        normalized audio [L], spk_emb [D]).  Used by VocoderDeviceData to
        stage the corpus in HBM; non-fine-tuning only (the fine-tuning
        branch windows precomputed mels from disk)."""
        if self.fine_tuning:
            raise ValueError("full_arrays: fine_tuning items window "
                             "precomputed mels; use the host path")
        cfg = self.cfg
        filename = self.files[index]
        parts = filename.split("/")
        wav_file = os.path.join(
            cfg.train_wav_path, parts[0], "wav", parts[1], parts[2][:-4] + ".wav"
        )
        audio = self._audio_cache.get(index)
        if audio is None:
            audio, _ = load_wav(wav_file, cfg.sampling_rate)
            audio = normalize(audio) * 0.95
        wv_feat = self._feat_cache.get(index)
        if wv_feat is None:
            wv_feat = np.asarray(
                self.load_npy(os.path.join(cfg.feat_ground_truth, filename))
            ).squeeze().astype(np.float32)
        return wv_feat, audio, self._load_spk(parts[1])

    def __getitem__(self, index: int) -> Dict:
        cfg = self.cfg
        cached = self._item_cache.get(index)
        if cached is not None:
            return cached
        filename = self.files[index]
        parts = filename.split("/")
        wav_file = os.path.join(
            cfg.train_wav_path, parts[0], "wav", parts[1], parts[2][:-4] + ".wav"
        )
        feat_file = os.path.join(cfg.feat_ground_truth, filename)
        spk = parts[1]

        audio = self._audio_cache.get(index)
        if audio is None:
            audio, sr = load_wav(wav_file, cfg.sampling_rate)
            if not self.fine_tuning:
                audio = normalize(audio) * 0.95
            self._cache_put(self._audio_cache, index, audio, audio.nbytes)

        wv_feat = self._feat_cache.get(index)
        if wv_feat is None:
            wv_feat = (
                np.asarray(self.load_npy(feat_file)).squeeze().astype(np.float32)
            )
            if self.split:  # item cache covers the non-split path
                self._cache_put(self._feat_cache, index, wv_feat, wv_feat.nbytes)

        if not self.fine_tuning:
            if self.split:
                # Windowed-generator mode.  The reference defines it but
                # leaves it off in the train loop (dataset.py:146-154,
                # train.py:109-112) — and its inactive version windows audio
                # while returning the FULL wav2vec features, which cannot
                # train (G(feats) and the audio window are different speech).
                # Deviation by design: window in *feature space* so the
                # (feats, audio, mel) triple stays aligned — seg_frames
                # latent frames paired with seg_frames*320 samples
                # (8192//320 = 25 frames -> 8000 samples per window).
                seg_frames = cfg.segment_size // cfg.total_upsample
                seg_samples = seg_frames * cfg.total_upsample
                T = wv_feat.shape[0]
                if T > seg_frames:
                    with self._rng_lock:  # loader worker threads share rng
                        fstart = int(self.rng.integers(0, T - seg_frames + 1))
                    wv_feat = wv_feat[fstart : fstart + seg_frames]
                    a = audio[
                        fstart * cfg.total_upsample : fstart * cfg.total_upsample
                        + seg_samples
                    ]
                else:
                    wv_feat = np.pad(wv_feat, ((0, seg_frames - T), (0, 0)))
                    a = audio[: seg_samples]
                if len(a) < seg_samples:
                    a = np.pad(a, (0, seg_samples - len(a)))
                audio = a
        else:
            # fine-tuning branch: precomputed mels from disk
            # (reference: dataset.py:158-175)
            mel = np.load(
                os.path.join(
                    self.base_mels_path,
                    os.path.splitext(os.path.split(filename)[-1])[0] + ".npy",
                )
            )
            mel = np.asarray(mel).squeeze()
            if self.split:
                frames_per_seg = math.ceil(cfg.segment_size / cfg.hop_size)
                if len(audio) >= cfg.segment_size:
                    with self._rng_lock:
                        mel_start = int(
                            self.rng.integers(
                                0, max(mel.shape[0] - frames_per_seg - 1, 1)
                            )
                        )
                    mel = mel[mel_start : mel_start + frames_per_seg]
                    audio = audio[
                        mel_start * cfg.hop_size : (mel_start + frames_per_seg)
                        * cfg.hop_size
                    ]
                else:
                    mel = np.pad(mel, ((0, frames_per_seg - mel.shape[0]), (0, 0)))
                    audio = np.pad(audio, (0, cfg.segment_size - len(audio)))

        spk_emb = self._load_spk(spk)
        item = {
            "wv_feat": wv_feat,  # [T, 1024]
            "spk_emb": spk_emb,  # [192]
            "audio": audio,  # [L]
            "filename": filename,
        }
        nbytes = wv_feat.nbytes + audio.nbytes
        if self.compute_mel:
            item["mel_loss"] = mel_spectrogram_np(
                audio, cfg.n_fft, cfg.num_mels, cfg.sampling_rate,
                cfg.hop_size, cfg.win_size, cfg.fmin, cfg.fmax_for_loss,
            )  # [F, 80]
            nbytes += item["mel_loss"].nbytes
        if not self.split:
            # full-utterance mode is deterministic: cache the whole item
            # (wav read + host mel + feat read all skipped from epoch 2 on)
            self._cache_put(self._item_cache, index, item, nbytes)
        return item


def pad_vocoder_batch(
    items: List[Dict], cfg: Vec2WavConfig, frame_pad: Optional[int] = None
) -> Dict[str, np.ndarray]:
    """Pad to a static frame bucket: feats [B,T,C], audio [B,T*320,1],
    mel [B,T*320/256,M] (replaces vec2wav/dataset.py:194-228 collate)."""
    from wavthruvec_pytorch_tpu.train.text2vec_train import pad_to_bucket

    B = len(items)
    t_lens = [it["wv_feat"].shape[0] for it in items]
    T = frame_pad or pad_to_bucket(max(t_lens), cfg.frame_buckets)
    L = T * cfg.total_upsample
    n_mel_frames = L // cfg.hop_size

    with_mel = "mel_loss" in items[0]
    wv = np.zeros((B, T, cfg.n_feat_dim), np.float32)
    audio = np.zeros((B, L, 1), np.float32)
    mel = np.zeros((B, n_mel_frames, cfg.num_mels), np.float32)
    mel_frames = np.zeros((B,), np.int32)
    spk = np.zeros((B, cfg.spk_dim), np.float32)
    names = []
    pad = (cfg.n_fft - cfg.hop_size) // 2
    for i, it in enumerate(items):
        t = min(it["wv_feat"].shape[0], T)
        wv[i, :t] = it["wv_feat"][:t]
        a = it["audio"][: L]
        audio[i, : len(a), 0] = a
        if with_mel:
            m = it["mel_loss"][: n_mel_frames]
            mel[i, : m.shape[0]] = m
        else:
            # frames the host mel op would produce for this length (its
            # reflect pad is `pad` per side): the device-mel path masks the
            # target beyond this, matching the host path's zero padding
            mel_frames[i] = np.clip(
                (len(a) + 2 * pad - cfg.n_fft) // cfg.hop_size + 1,
                0, n_mel_frames)
        spk[i] = it["spk_emb"]
        names.append(it["filename"])
    out = {
        "wv_feat": wv,
        "spk_emb": spk,
        "audio": audio,
        "filenames": names,
    }
    if with_mel:
        out["mel_loss"] = mel
    else:
        out["mel_frames"] = mel_frames
    return out


class VocoderLoader:
    """Shuffled fixed-shape batch iterator over a VocoderDataset.

    ``num_workers`` threads load the items of a batch concurrently (the
    reference's DataLoader(num_workers=8) analog; scipy/numpy release the
    GIL for the wav read and host-mel work).  Batch-level overlap with the
    device step is provided by ``data.prefetch.prefetched``.
    """

    def __init__(self, dataset: VocoderDataset, batch_size: int, seed: int = 1234,
                 shuffle: bool = True, drop_last: bool = True,
                 num_workers: int = 4, pad_to_max: Optional[bool] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self._pool = None
        # multi-process SPMD needs host-independent batch shapes (hosts hold
        # different filelist shards, so per-batch bucket picks can diverge);
        # full-utterance mode pads to the largest frame bucket then.
        # Windowed mode is one exact static shape already.
        if pad_to_max is None:
            import jax

            pad_to_max = jax.process_count() > 1
        self.pad_to_max = pad_to_max

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _get_items(self, idx):
        if self.num_workers and len(idx) > 1:
            if self._pool is None:
                from concurrent.futures import ThreadPoolExecutor

                self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
            return list(self._pool.map(self.dataset.__getitem__, [int(i) for i in idx]))
        return [self.dataset[int(i)] for i in idx]

    def epoch_indices(self) -> Iterator[np.ndarray]:
        """Per-batch item indices in the same order epoch() would emit
        (consumes the same RNG stream — use one of the two per epoch).
        Lets VocoderDeviceData assemble identical batch compositions
        on-device."""
        order = (
            self.rng.permutation(len(self.dataset))
            if self.shuffle
            else np.arange(len(self.dataset))
        )
        for b in range(len(self)):
            yield order[b * self.batch_size : (b + 1) * self.batch_size]

    def epoch(self) -> Iterator[Dict[str, np.ndarray]]:
        order = (
            self.rng.permutation(len(self.dataset))
            if self.shuffle
            else np.arange(len(self.dataset))
        )
        cfg = self.dataset.cfg
        # windowed mode emits one exact static shape; no bucket rounding
        frame_pad = (
            cfg.segment_size // cfg.total_upsample
            if (self.dataset.split and not self.dataset.fine_tuning)
            else (cfg.frame_buckets[-1] if self.pad_to_max else None)
        )
        n_batches = len(self)
        for b in range(n_batches):
            idx = order[b * self.batch_size : (b + 1) * self.batch_size]
            items = self._get_items(idx)
            yield pad_vocoder_batch(items, cfg, frame_pad=frame_pad)
