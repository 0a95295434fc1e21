"""HBM-resident dataset: upload the padded corpus once, gather batches on-device.

The reference loads the ENTIRE dataset into host RAM up front
(text2vec/dataset.py:64-103, "get_data_to_buffer") and re-uploads each
padded batch to the accelerator every step.  At long buckets that is
~350 MB/step of host->device traffic (B16 x [3072,1024] f32 targets +
[3072,768] priors); on hosts with slow or degrading DMA paths it dominates
the step (measured: tools/upload_bench.py --with_step — 0.3 s/batch before
the first train-program execution, 6.5-7 s after, an allocator/runtime
pathology of the tunnel environment).  The TPU-native fix is to finish the
reference's idea: if the dataset fits in host RAM, its padded form usually
fits in HBM too — stage it on-device ONCE (while the fast path holds) and
assemble every batch with an on-device gather, reducing per-step H2D to a
[B]-int32 index vector.

Semantics are identical to BucketedLoader with pad-to-max buckets: batch
composition comes from BucketedLoader.epoch_indices() (same shuffle ->
sort-by-text-length -> chunk order), and make_padded_batch is the oracle
(tests/test_data_pipeline.py::test_device_resident_data_matches_host_collate).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from wavthruvec_pytorch_tpu.config import Text2VecConfig


class DeviceResidentData:
    """Stacked, padded per-item arrays living in HBM + a jitted batch gather.

    Memory: n_items x (frame_pad x n_feat_dim f32 + frame_pad x text_pad
    f32 prior + ints).  For the AISHELL-3-shaped long-bucket demo corpus
    that is ~22 MB/item; the full 17k-utterance AISHELL-3 at its true
    (shorter) lengths would not fit padded — this is an opt-in for corpora
    whose padded form fits, exactly like the reference's load-everything
    host buffer is.
    """

    def __init__(
        self,
        buffer: List[Dict],
        cfg: Text2VecConfig,
        text_pad: Optional[int] = None,
        frame_pad: Optional[int] = None,
    ):
        n = len(buffer)
        N = text_pad or cfg.text_buckets[-1]
        T = frame_pad or cfg.frame_buckets[-1]
        text = np.zeros((n, N), np.int32)
        src_pos = np.zeros((n, N), np.int32)
        feat = np.zeros((n, T, cfg.n_feat_dim), np.float32)
        feat_pos = np.zeros((n, T), np.int32)
        prior = np.zeros((n, T, N), np.float32)
        in_lens = np.zeros((n,), np.int32)
        out_lens = np.zeros((n,), np.int32)
        self.audiopaths = []
        for i, it in enumerate(buffer):
            tn = len(it["text_enc"])
            tt = it["feat_gt_target"].shape[0]
            in_lens[i], out_lens[i] = tn, tt
            text[i, :tn] = it["text_enc"]
            src_pos[i, :tn] = np.arange(1, tn + 1)
            feat[i, :tt] = it["feat_gt_target"]
            feat_pos[i, :tt] = np.arange(1, tt + 1)
            if it.get("attn_prior") is not None:
                prior[i, :tt, :tn] = it["attn_prior"]
            self.audiopaths.append(it.get("audiopath", ""))
        self._arrays = {
            "text": jax.device_put(text),
            "src_pos": jax.device_put(src_pos),
            "feat_target": jax.device_put(feat),
            "input_lengths": jax.device_put(in_lens),
            "output_lengths": jax.device_put(out_lens),
            "feat_pos": jax.device_put(feat_pos),
            "attn_prior": jax.device_put(prior),
        }
        jax.block_until_ready(self._arrays)

        @jax.jit
        def gather(arrays, idx):
            return {k: jnp.take(v, idx, axis=0) for k, v in arrays.items()}

        self._gather = gather

    def nbytes(self) -> int:
        return sum(int(np.prod(v.shape)) * v.dtype.itemsize
                   for v in self._arrays.values())

    def batch(self, idx: Sequence[int]) -> Dict[str, jnp.ndarray]:
        """Assemble one batch on-device; only the [B] index vector crosses
        the host->device boundary."""
        return self._gather(self._arrays, jnp.asarray(np.asarray(idx, np.int32)))

    def batch_audiopaths(self, idx: Sequence[int]) -> List[str]:
        return [self.audiopaths[int(i)] for i in idx]
