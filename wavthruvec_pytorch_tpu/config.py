"""Frozen dataclass configs replacing the reference's two ``hparams.py``
modules (reference: text2vec/hparams.py:1-89, vec2wav/hparams.py:1-70).

Everything that the reference expresses as module-level attributes lives here
as typed, immutable dataclasses so that configs can be snapshotted, hashed
into jit caches, and passed through pure functions.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple


def _read_vocab(vocab_path: str) -> str:
    # reference: text2vec/hparams.py:3-6 (get_vocab reads one line)
    with open(vocab_path, "r", encoding="utf-8") as fr:
        return fr.readline()


@dataclasses.dataclass(frozen=True)
class Text2VecConfig:
    """Text2Vec model + training config (reference: text2vec/hparams.py)."""

    # wav2vec feature dim (reference: hparams.py:9)
    n_feat_dim: int = 1024

    # beta-binomial attention prior (reference: hparams.py:11-13)
    betabinom_cache_path: str = "./data/align_prior"
    betabinom_scaling_factor: float = 1.0
    use_attn_prior_masking: bool = True

    # ECAPA-TDNN speaker encoder (reference: hparams.py:17-20)
    spk_channel: int = 1024
    n_speaker_dim: int = 192
    n_speakers: int = 200
    input_wav: bool = False  # t2v feeds wav2vec feats, not raw wav

    # transformer dims (reference: hparams.py:24-41)
    max_seq_len: int = 3000
    encoder_dim: int = 256
    encoder_n_layer: int = 4
    encoder_head: int = 2
    encoder_conv1d_filter_size: int = 1024
    decoder_dim: int = 256
    decoder_n_layer: int = 4
    decoder_head: int = 2
    decoder_conv1d_filter_size: int = 1024
    fft_conv1d_kernel: Tuple[int, int] = (9, 1)
    fft_conv1d_padding: Tuple[int, int] = (4, 0)
    duration_predictor_filter_size: int = 256
    duration_predictor_kernel_size: int = 3
    dropout: float = 0.1

    # vocab (reference: hparams.py:54-56); size must be static for jit.
    vocab_size: int = 4285
    vocab_path: str = "./data/vocab.txt"

    # run dirs (reference: hparams.py:44-48)
    run_path: str = "./run"
    log_seed: str = "30_30_spk_4fft"
    feat_ground_truth: str = "/data_mnt/aishell3/w2v_feat/"

    # data lists (reference: hparams.py:52-53)
    train_list: Tuple[str, ...] = ("./data/enc_train_full.txt",)
    val_list: Tuple[str, ...] = ("./data/enc_val_full.txt",)

    # training (reference: hparams.py:59-77)
    batch_size: int = 16
    epochs: int = 200
    n_warm_up_step: int = 4000
    batch_expand_size: int = 16
    save_step: int = 5000
    log_step: int = 1000
    val_step: int = 50000
    learning_rate: float = 0.1
    beta1: float = 0.9
    beta2: float = 0.98
    epsilon: float = 1e-9
    weight_decay: float = 1e-6
    grad_clip_thresh: float = 1.0
    # reference clips gradients only every 10 iters (text2vec/train.py:373-375)
    grad_clip_every: int = 10

    # alignment training (reference: hparams.py:82-87)
    binarization_start_iter: int = 0
    kl_loss_start_iter: int = 0
    learn_alignments: bool = True
    binarization_loss_weight: float = 1.0
    use_multi_speaker_condition: bool = True
    use_speaker_emb_for_alignment: bool = True
    # partial-padding convs in ConvAttention — the reference ConvNorm's
    # selectable, default-off mode (text2vec/module.py:423,433-434)
    attn_use_partial_padding: bool = False

    # --- TPU-native additions (no reference equivalent) ---
    # compute dtype for matmuls/convs; params stay float32.
    compute_dtype: str = "float32"
    # blockwise (flash) self-attention for frame buckets that are multiples
    # of 128 and >= 256 — O(T) memory instead of the T^2 score matrix; see
    # models/fft_block.py for the (documented) attn-dropout deviation
    flash_attention: bool = False
    # rematerialize FFT blocks in the backward pass (trades FLOPs for HBM on
    # long frame buckets)
    remat: bool = False
    # PRNG implementation for the per-step dropout keys: "threefry2x32"
    # (jax default) or "rbg" (TPU-fast mask generation via the hardware RNG;
    # same Bernoulli(keep_prob) dropout law, different random stream — the
    # reference's torch RNG stream is a third stream anyway).  Param init
    # stays threefry regardless so checkpoints/goldens are unaffected.
    # Measured (tools/rbg_prng_bench.py, B16/1024, 3 alternating reps):
    # rbg is ~2-4% faster per step (best 174.7 vs 182.3 ms sync-fetch) —
    # threefry stays the default for jax-default reproducibility across
    # backends/versions; flip to "rbg" for long production runs.
    dropout_prng_impl: str = "threefry2x32"
    # CBHG biGRU forward recurrence: "scan" (lax.scan, exact f32) or
    # "pallas" (ops/gru_pallas.py — w_hh VMEM-resident in bf16 across steps;
    # matches TPU default matmul precision; falls back to scan when the
    # shapes don't fit VMEM)
    gru_impl: str = "scan"
    # static shape buckets for jit-cache friendliness: text lengths and frame
    # lengths are padded up to the nearest bucket edge.
    text_buckets: Tuple[int, ...] = (32, 64, 128)
    frame_buckets: Tuple[int, ...] = (256, 512, 1024, 2048, 3000)
    # HBM-resident dataset (data/device_cache.py): stage the whole corpus
    # on-device once (flat ragged layout, no padding waste) and gather
    # padded batches by index, eliminating the per-step host collation +
    # upload (~350 MB/step at long buckets).  Composes with a
    # single-process mesh (batches emitted sharded over "data");
    # multi-process runs fall back to the host path.  Opt-in: requires the
    # corpus (at true lengths) to fit in HBM.
    device_resident_data: bool = False

    @property
    def tensorboard_logs_path(self) -> str:
        return os.path.join(self.run_path, self.log_seed, "tb_logs")

    @property
    def checkpoint_path(self) -> str:
        return os.path.join(self.run_path, self.log_seed, "model_new")

    @property
    def logger_path(self) -> str:
        return os.path.join(self.run_path, self.log_seed, "logger")

    @property
    def encoder_output_dim(self) -> int:
        # encoder concatenates the 192-d speaker emb (reference: model.py:99)
        if self.use_multi_speaker_condition:
            return self.encoder_dim + self.n_speaker_dim
        return self.encoder_dim

    @property
    def decoder_model_dim(self) -> int:
        # decoder runs at the concatenated width too (reference: model.py:155-156)
        if self.use_multi_speaker_condition:
            return self.decoder_dim + self.n_speaker_dim
        return self.decoder_dim

    def with_vocab_from_file(self, vocab_path: str) -> "Text2VecConfig":
        symbols = _read_vocab(vocab_path)
        return dataclasses.replace(
            self, vocab_path=vocab_path, vocab_size=len(symbols)
        )

    def validate_position_capacity(
        self, max_text_len: int, max_frame_len: int
    ) -> None:
        """Fail fast when real sequence lengths exceed a position table.

        The reference sizes the encoder sinusoid table to vocab_size+1 rows
        (a quirk: model.py:86 reuses vocab_size as len_max_seq) and the
        decoder table to max_seq_len+1 (model.py:158); feeding longer
        sequences there is an IndexError on GPU.  Our in-graph gathers clamp
        to the last row instead — finite but position-aliased — so training
        data must be rejected up front: 1-based positions run to the item
        length, hence the longest text must be <= vocab_size and the longest
        feature sequence <= max_seq_len.
        """
        if max_text_len > self.vocab_size:
            raise ValueError(
                f"longest text ({max_text_len} tokens) exceeds the encoder "
                f"position table (vocab_size={self.vocab_size}, table rows "
                "vocab_size+1 — the reference's n_position quirk, "
                "text2vec/model.py:86). Grow the vocab or trim the data; "
                "positions past the table would alias to one embedding."
            )
        if max_frame_len > self.max_seq_len:
            raise ValueError(
                f"longest feature sequence ({max_frame_len} frames) exceeds "
                f"the decoder position table (max_seq_len={self.max_seq_len},"
                " text2vec/model.py:158). Raise max_seq_len or trim the "
                "data; positions past the table would alias to one embedding."
            )


@dataclasses.dataclass(frozen=True)
class Vec2WavConfig:
    """Vec2Wav (HiFi-GAN + conditional BN) config (reference: vec2wav/hparams.py)."""

    # run dirs (reference: vec2wav/hparams.py:5-12)
    run_path: str = "./run_dec"
    log_seed: str = "30_30"
    feat_ground_truth: str = "/data_mnt/aishell3/w2v_feat/"
    train_wav_path: str = "/data_mnt/aishell3/"
    spk_emb_path: str = "/data_mnt/aishell3/spk_emb/"
    input_training_file: str = "./data/enc_train_full.txt"
    input_validation_file: str = "./data/enc_val_full.txt"

    save_step: int = 5000
    log_step: int = 1000
    val_step: int = 100000

    # dims (reference: vec2wav/hparams.py:25-27)
    n_feat_dim: int = 1024
    spk_dim: int = 192
    noise_dim: int = 192

    # hifi-gan (reference: vec2wav/hparams.py:30-37)
    # NOTE the reference quirk: hparams has the *int* 1 but models.py:84
    # compares against the *string* '1', so ResBlock2 is what actually runs.
    # We keep the same int-vs-str selection semantics for parity.
    resblock: object = 1
    batch_size: int = 2
    learning_rate: float = 2e-4
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    lr_decay: float = 0.999
    seed: int = 1234

    # generator (reference: vec2wav/hparams.py:40-44)
    upsample_rates: Tuple[int, ...] = (5, 4, 4, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (11, 8, 8, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5),
        (1, 3, 5),
        (1, 3, 5),
    )

    # MPD (reference: vec2wav/hparams.py:47)
    periods: Tuple[int, ...] = (13, 17, 19)

    # audio / stft (reference: vec2wav/hparams.py:49-61)
    segment_size: int = 8192
    num_mels: int = 80
    num_wv_feat: int = 1024
    num_freq: int = 1025
    n_fft: int = 1024
    hop_size: int = 256
    win_size: int = 1024
    sampling_rate: int = 16000
    fmin: float = 0.0
    fmax: Optional[float] = 8000.0
    fmax_for_loss: Optional[float] = None

    # windowed-generator training: the reference defines segment_size but its
    # train loop constructs MelDataset with split=False (vec2wav/train.py:109-112),
    # i.e. full-utterance training.  We expose the switch explicitly.
    split: bool = False

    # TPU-native additions
    compute_dtype: str = "float32"
    frame_buckets: Tuple[int, ...] = (64, 128, 256, 512)
    # Run each sub-discriminator once on concat([y, y_hat]) instead of twice:
    # the MSD conv chain is utilization-bound at batch 2, and the batched pass
    # cuts its fwd+bwd from 138 to 93 ms at T=40960 (tools/disc_pair_bench.py).
    # Math-identical for the convs; spectral-norm power iteration advances
    # once per step instead of twice (see PARITY.md).
    disc_pair_batched: bool = True
    # Route the MSD grouped convs through the MXU-packed repack
    # (ops/tiled_conv.py): identical math (equivalence-tested), measured
    # multi-x faster fwd+bwd on chip — the plain grouped lowering runs the
    # G=16 layers at ~1 TFLOP/s (tools/disc_grad_split.py, BENCH_NOTES
    # "MSD grouped-conv repack").
    msd_tiled_conv: bool = True
    # compute the mel-loss TARGET inside the jitted train step from the
    # batch audio instead of per-item on the host (reference computes it in
    # its Dataset, vec2wav/dataset.py:177-179).  For windowed (split=True)
    # training, where windows are uniform-length: there the device target is
    # numerically identical to the host op AND the host mel is the loader's
    # dominant un-cacheable cost (random windows defeat the item cache) —
    # on few-core hosts this is the difference between loader-bound and
    # compute-bound steps.
    device_mel_target: bool = False
    # HBM-resident windowed dataset (data/vocoder_device_cache.py): stage
    # the full corpus on-device once and window every batch with a jitted
    # gather — per-step host work drops to drawing [B] random offsets.
    # Requires split=True + device_mel_target=True, single-process; the
    # measured win is on few-core hosts where per-epoch segment re-slicing
    # dominates the B128 windowed step (BENCH_NOTES round 5).
    device_resident_data: bool = False

    @property
    def tensorboard_logs_path(self) -> str:
        return os.path.join(self.run_path, self.log_seed, "tb_logs")

    @property
    def checkpoint_path(self) -> str:
        return os.path.join(self.run_path, self.log_seed, "model_new")

    @property
    def logger_path(self) -> str:
        return os.path.join(self.run_path, self.log_seed, "logger")

    @property
    def total_upsample(self) -> int:
        out = 1
        for u in self.upsample_rates:
            out *= u
        return out  # 5*4*4*2*2 = 320 (reference: readme.md:17)

    @property
    def use_resblock1(self) -> bool:
        # reference quirk (vec2wav/models.py:84): ResBlock1 only if resblock == '1'
        return self.resblock == "1"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit data parallelism.

    Replaces the reference's NCCL/DDP/DistributedSampler stack
    (vec2wav/hparams.py:65-69, vec2wav/train.py:58-60,91-94,114).
    """

    data_axis: str = "data"
    n_data: int = -1  # -1 = all visible devices


def save_config(cfg, path: str) -> None:
    """Snapshot a config into the run dir (the reference copies hparams.py:
    text2vec/train.py:35-40, vec2wav/train.py:43-48)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)


def load_config(cls, path: str):
    with open(path, "r", encoding="utf-8") as f:
        raw = json.load(f)
    field_names = {f.name for f in dataclasses.fields(cls)}
    kwargs = {k: v for k, v in raw.items() if k in field_names}
    for k, v in list(kwargs.items()):
        if isinstance(v, list):
            kwargs[k] = tuple(tuple(x) if isinstance(x, list) else x for x in v)
    return cls(**kwargs)
