"""Text2Vec data pipeline: RAM buffer + length-bucketed batching.

Reference: text2vec/dataset.py:57-214 — the entire dataset is loaded to RAM
(`get_data_to_buffer`), the DataLoader draws ``batch_size*batch_expand_size``
items, sorts by text length descending, slices into ``batch_expand_size``
real batches (length bucketing), pads, and emits dicts.

TPU-native: every emitted batch is padded to a fixed (text_bucket,
frame_bucket) shape from the config so the jitted train step compiles once
per bucket pair instead of once per max-length (jit cache friendliness).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from wavthruvec_pytorch_tpu.config import Text2VecConfig
from wavthruvec_pytorch_tpu.data.prior import get_attention_prior
from wavthruvec_pytorch_tpu.text import TextFrontend
from wavthruvec_pytorch_tpu.train.text2vec_train import (
    make_padded_batch,
    pad_to_bucket,
)


def process_text(text_path: str) -> List[str]:
    with open(text_path, "r", encoding="utf-8") as f:
        return list(f.readlines())


def load_buffer(
    file_lists: Sequence[str],
    cfg: Text2VecConfig,
    frontend: TextFrontend,
    feat_root: Optional[str] = None,
    limit: Optional[int] = None,
    npy_loader=None,
    shard_across_hosts: bool = True,
) -> List[Dict]:
    """Load every ``npy|text|spk`` line into RAM (reference: dataset.py:64-103).

    By default the native C++ prefetcher (native/npy_loader.cc) streams the
    ``.npy`` files ahead of the parse loop; pass ``npy_loader=np.load`` to
    force the pure-python path.
    """
    feat_root = feat_root if feat_root is not None else cfg.feat_ground_truth
    lines: List[str] = []
    for p in file_lists:
        lines.extend(process_text(p))
    if limit is not None:
        lines = lines[:limit]
    if shard_across_hosts:
        # per-host shard under multi-process data parallelism (the
        # DistributedSampler replacement); no-op single-process
        from wavthruvec_pytorch_tpu.parallel import process_shard

        lines = process_shard(lines)

    parsed = [line.strip().split("|") for line in lines]
    paths = [os.path.join(feat_root, p[0]) for p in parsed]

    prefetcher = None
    if npy_loader is None:
        from wavthruvec_pytorch_tpu.data import native_io

        if native_io.get_lib() is not None:
            prefetcher = native_io.Prefetcher(paths)
    load = npy_loader or np.load

    buffer = []
    start = time.perf_counter()
    for i, ((npy_file, character, spk), feat_path) in enumerate(zip(parsed, paths)):
        feat = (
            np.asarray(prefetcher.get(i))
            if prefetcher is not None
            else np.asarray(load(feat_path))
        )
        feat = feat.squeeze()  # [1, T, C] -> [T, C]
        text_enc = np.asarray(frontend.text_to_sequence(character), np.int32)
        attn_prior = (
            get_attention_prior(
                text_enc.shape[0],
                feat.shape[0],
                cache_path=cfg.betabinom_cache_path,
                scaling_factor=cfg.betabinom_scaling_factor,
                use_attn_prior_masking=cfg.use_attn_prior_masking,
            )
            if cfg.use_attn_prior_masking
            else None
        )
        buffer.append(
            {
                "text_enc": text_enc,
                "feat_gt_target": feat.astype(np.float32),
                "audiopath": feat_path,
                "attn_prior": attn_prior,
                "speaker": spk,
            }
        )
    print(
        "cost {:.2f}s to load all data into buffer.".format(
            time.perf_counter() - start
        )
    )
    if buffer:
        # fail fast on data the sinusoid position tables cannot represent
        # (the in-graph gathers clamp instead of erroring; aliased positions
        # trained silently would be a far worse failure mode)
        cfg.validate_position_capacity(
            max(len(it["text_enc"]) for it in buffer),
            max(it["feat_gt_target"].shape[0] for it in buffer),
        )
    return buffer


class BucketedLoader:
    """Length-bucketed batch iterator (replaces DataLoader+collate_fn_tensor).

    Each epoch: shuffle; draw ``batch_size * batch_expand_size`` items; sort
    by text length descending; emit ``batch_expand_size`` padded batches of
    ``batch_size`` (reference: dataset.py:200-214).  Batches are padded up to
    the config's static shape buckets.
    """

    def __init__(
        self,
        buffer: List[Dict],
        cfg: Text2VecConfig,
        seed: int = 0,
        drop_last: bool = True,
        shuffle: bool = True,
        batch_size: Optional[int] = None,
        pad_to_max: Optional[bool] = None,
    ):
        self.buffer = buffer
        self.cfg = cfg
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last
        self.shuffle = shuffle
        # per-host batch size may differ from the global cfg.batch_size
        # under multi-process data parallelism (parallel.local_batch_size)
        self.batch_size = batch_size or cfg.batch_size
        self.super_batch = self.batch_size * cfg.batch_expand_size
        # Multi-process SPMD requires every host's j-th batch to have the
        # SAME padded shape (the global batch is assembled from per-host
        # slices, parallel.shard_batch) — but hosts hold different filelist
        # shards, so per-batch bucket picks can diverge.  Padding to the
        # largest configured buckets makes shapes host-independent; default
        # auto-enables exactly when multi-process.
        if pad_to_max is None:
            import jax

            pad_to_max = jax.process_count() > 1
        self.pad_to_max = pad_to_max

    def __len__(self) -> int:
        n_super = len(self.buffer) // self.super_batch
        return n_super * self.cfg.batch_expand_size

    def epoch_indices(self) -> Iterator[np.ndarray]:
        """Per-batch item indices, identical order/composition to epoch():
        shuffle -> super-batch -> sort by text length desc -> chunk.  Lets a
        device-resident dataset (DeviceResidentData) assemble the same
        batches on-device instead of re-uploading ~hundreds of MB per step."""
        if self.shuffle:
            order = self.rng.permutation(len(self.buffer))
        else:
            order = np.arange(len(self.buffer))
        n_super = len(order) // self.super_batch
        for s in range(n_super):
            idx = list(order[s * self.super_batch : (s + 1) * self.super_batch])
            idx.sort(key=lambda i: -len(self.buffer[i]["text_enc"]))
            for j in range(self.cfg.batch_expand_size):
                yield np.asarray(
                    idx[j * self.batch_size : (j + 1) * self.batch_size],
                    np.int32,
                )

    def epoch(self) -> Iterator[Dict[str, np.ndarray]]:
        for idx in self.epoch_indices():
            chunk = [self.buffer[i] for i in idx]
            if self.pad_to_max:
                yield make_padded_batch(
                    chunk, self.cfg,
                    text_pad=self.cfg.text_buckets[-1],
                    frame_pad=self.cfg.frame_buckets[-1],
                )
            else:
                yield make_padded_batch(chunk, self.cfg)

    def bucket_shapes(self):
        """All (text_bucket, frame_bucket) pairs this dataset can emit —
        useful for jit pre-compilation."""
        pairs = set()
        for it in self.buffer:
            pairs.add(
                (
                    pad_to_bucket(len(it["text_enc"]), self.cfg.text_buckets),
                    pad_to_bucket(
                        it["feat_gt_target"].shape[0], self.cfg.frame_buckets
                    ),
                )
            )
        return sorted(pairs)
