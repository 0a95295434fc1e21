"""HBM-resident windowed GAN dataset: stage once, window on-device.

Round-5 measurement (BENCH_NOTES "Windowed-B128 through the production
loop"): at the recommended GAN throughput mode (windowed B128 bf16) the
production loop ran 0.66-0.76 s/step against a 0.225 s chained step — the
bottleneck is not H2D volume (a windowed batch is ~2 MB) but the HOST
work of re-slicing/collating hundreds of segments per epoch on a
few-core host.  Fix, mirroring data/device_cache.py: stage the full
corpus flat in HBM once (audio normalized and trimmed/padded to exactly
T*320 samples per item, features ragged), and assemble every windowed
batch with one jitted gather — per step the host only draws the random
window offsets and uploads two [B] int32 vectors.

Window semantics match VocoderDataset.__getitem__ split-mode exactly
(data/vocoder_data.py:230-246): seg_frames = segment_size//total_upsample
(8192//320 = 25), fstart ~ U[0, T-seg_frames] for long items, 0 with
zero-padding for short ones; audio window = the SAME frames x 320
samples (the feature-synced windowing that fixes the reference's broken
split path).  Offsets are drawn on the host with the dataset's RNG
family, so the distribution is identical; exact per-item draws are not
reproducible in the host path either (its loader worker threads race on
one locked RNG).

Scope: split=True, fine_tuning=False (the fine-tuning branch windows
precomputed mels from disk), device_mel_target=True (the windowed batch
then needs no host mel; ``mel_frames`` is the constant full-window count
the host collate produces, since split items are pre-padded to
seg_samples).  Composes with a single-process mesh like the t2v cache.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from wavthruvec_pytorch_tpu.config import Vec2WavConfig


class VocoderDeviceData:
    """Flat ragged (feat, audio, spk) corpus in HBM + jitted window gather."""

    def __init__(self, dataset, cfg: Vec2WavConfig, mesh=None):
        if not dataset.split or dataset.fine_tuning:
            raise ValueError(
                "VocoderDeviceData requires split=True, fine_tuning=False "
                "(windowed training mode)")
        if not cfg.device_mel_target:
            raise ValueError(
                "VocoderDeviceData requires device_mel_target=True (the "
                "host mel target would need the host windowing path)")
        self.cfg = cfg
        self.mesh = mesh
        up = cfg.total_upsample
        self.seg_frames = cfg.segment_size // up
        self.seg_samples = self.seg_frames * up
        n = len(dataset)

        feats, audios, spks, t_lens = [], [], [], []
        self.filenames: List[str] = []
        for i in range(n):
            feat, audio, spk = dataset.full_arrays(i)
            T = feat.shape[0]
            # audio normalized full-length, aligned to exactly T*320: the
            # host window never reads past (fstart+seg)*320 <= T*320, and
            # pads with zeros where the raw audio runs short — identical
            a = np.zeros(T * up, np.float32)
            m = min(len(audio), T * up)
            a[:m] = audio[:m]
            feats.append(feat.astype(np.float32))
            audios.append(a)
            spks.append(spk.astype(np.float32))
            t_lens.append(T)
            self.filenames.append(dataset.files[i])

        t_lens = np.asarray(t_lens, np.int32)
        self.t_lens_host = t_lens
        feat_off = np.zeros(n, np.int32)
        np.cumsum(t_lens[:-1], out=feat_off[1:], dtype=np.int32)
        sum_t = int(t_lens.sum())

        est = (sum_t + self.seg_frames) * cfg.n_feat_dim * 4 \
            + (sum_t + self.seg_frames) * up * 4 + n * cfg.spk_dim * 4
        limit = None
        try:
            stats = jax.devices()[0].memory_stats() or {}
            limit = stats.get("bytes_limit")
        except Exception:
            pass
        if limit and est > 0.8 * limit:
            raise ValueError(
                f"vec2wav device_resident_data: staging needs "
                f"~{est / 2**30:.1f} GiB HBM (limit {limit / 2**30:.1f} "
                f"GiB, 80% budget) — use the host data path instead.")

        # zero tails so a full window starting at the last frame stays in
        # range (jnp.take's OOB fill is NaN for floats)
        flat_feat = np.zeros((sum_t + self.seg_frames, cfg.n_feat_dim),
                             np.float32)
        flat_audio = np.zeros((sum_t + self.seg_frames) * up, np.float32)
        for i in range(n):
            o, T = feat_off[i], t_lens[i]
            flat_feat[o:o + T] = feats[i]
            flat_audio[o * up:(o + T) * up] = audios[i]

        host = {
            "flat_feat": flat_feat,
            "flat_audio": flat_audio,
            "spk_emb": np.stack(spks, axis=0),
            "feat_off": feat_off,
            "t_lens": t_lens,
        }
        if mesh is None:
            self._d = {k: jax.device_put(v) for k, v in host.items()}
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            self._d = {k: jax.device_put(v, repl) for k, v in host.items()}
        jax.block_until_ready(self._d)
        self._rng = np.random.default_rng(cfg.seed + 7)

        S, L = self.seg_frames, self.seg_samples
        # host collate's mel_frames for a full seg_samples window
        # (vocoder_data.pad_vocoder_batch: split items are pre-padded to
        # seg_samples, so len(a) == seg_samples for every item)
        pad = (cfg.n_fft - cfg.hop_size) // 2
        self._mel_frames = int(np.clip(
            (L + 2 * pad - cfg.n_fft) // cfg.hop_size + 1, 0, L // cfg.hop_size))

        def gather(d, idx, fstart):
            T = jnp.take(d["t_lens"], idx, axis=0)            # [B]
            off = jnp.take(d["feat_off"], idx, axis=0)
            ar_f = jnp.arange(S, dtype=jnp.int32)
            ar_a = jnp.arange(L, dtype=jnp.int32)
            fmask = (fstart[:, None] + ar_f[None, :]) < T[:, None]
            feat = jnp.take(d["flat_feat"],
                            (off + fstart)[:, None] + ar_f[None, :],
                            axis=0) * fmask[:, :, None]
            amask = ((fstart[:, None] * up + ar_a[None, :])
                     < (T[:, None] * up))
            audio = jnp.take(d["flat_audio"],
                             ((off + fstart) * up)[:, None] + ar_a[None, :],
                             axis=0) * amask
            spk = jnp.take(d["spk_emb"], idx, axis=0)
            return {
                "wv_feat": feat,
                "spk_emb": spk,
                "audio": audio[:, :, None],
                "mel_frames": jnp.full(idx.shape, self._mel_frames, jnp.int32),
            }

        if mesh is None:
            self._gather = jax.jit(gather)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            self._gather = jax.jit(
                gather,
                in_shardings=({k: repl for k in host}, data, data),
                out_shardings={k: data for k in
                               ("wv_feat", "spk_emb", "audio", "mel_frames")},
            )

    def nbytes(self) -> int:
        return sum(int(np.prod(v.shape)) * v.dtype.itemsize
                   for v in self._d.values())

    def draw_fstarts(self, idx: np.ndarray) -> np.ndarray:
        """Random window offsets, same law as the host path: U[0, T-seg]
        for items longer than a window, 0 otherwise."""
        hi = np.maximum(self.t_lens_host[idx] - self.seg_frames, 0)
        return self._rng.integers(0, hi + 1).astype(np.int32)

    def batch(self, idx: Sequence[int],
              fstart: Optional[np.ndarray] = None) -> Dict[str, jnp.ndarray]:
        idx = np.asarray(idx, np.int32)
        if fstart is None:
            fstart = self.draw_fstarts(idx)
        return self._gather(self._d, jnp.asarray(idx),
                            jnp.asarray(np.asarray(fstart, np.int32)))

    def batch_filenames(self, idx: Sequence[int]) -> List[str]:
        return [self.filenames[int(i)] for i in idx]
