"""Text2Vec: FastSpeech-style FFT encoder/decoder with RAD-TTS unsupervised
alignment, duration predictor / length regulator, CBHG postnet and ECAPA
speaker conditioning.

Reference: text2vec/model.py:194-356 (top model), 71-136 (Encoder),
139-190 (Decoder).  TPU-native differences (behavior-preserving):

* MAS binarization is an on-device batched lax.scan (ops/mas.py) instead of
  a per-item numba CPU round trip (model.py:239-253);
* inference length-regulation is a cumsum/gather expansion (ops/
  length_regulator.py) instead of the host-side Python triple loop
  (module.py:45-53);
* all shapes are static (padded buckets); masks carry the valid lengths.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from wavthruvec_pytorch_tpu.config import Text2VecConfig
from wavthruvec_pytorch_tpu.models.cbhg import CBHG
from wavthruvec_pytorch_tpu.models.conv_attention import ConvAttention
from wavthruvec_pytorch_tpu.models.duration import DurationPredictor
from wavthruvec_pytorch_tpu.models.ecapa import ECAPA_TDNN
from wavthruvec_pytorch_tpu.models.fft_block import FFTBlock
from wavthruvec_pytorch_tpu.models.layers import Linear, normal_init
from wavthruvec_pytorch_tpu.ops.length_regulator import expand_by_durations
from wavthruvec_pytorch_tpu.ops.mas import mas_width1_batched
from wavthruvec_pytorch_tpu.ops.masking import (
    get_attn_key_pad_mask,
    get_mask_from_lengths,
    get_non_pad_mask,
    positions_from_lengths,
)
from wavthruvec_pytorch_tpu.ops.positional import sinusoid_encoding_table_jnp


class Encoder(nn.Module):
    """Char embedding + sinusoid positions + ECAPA speaker concat + FFT stack
    (reference: text2vec/model.py:71-136; note n_position = vocab_size + 1,
    model.py:86 — the reference reuses vocab_size as len_max_seq)."""

    cfg: Text2VecConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, src_seq, src_pos, wav_feat=None, deterministic=True,
                 train=False, spk_emb=None):
        cfg = self.cfg
        slf_attn_mask = get_attn_key_pad_mask(src_seq, src_seq)
        non_pad_mask = get_non_pad_mask(src_seq)

        emb_table = self.param(
            "src_word_emb", normal_init(1.0), (cfg.vocab_size, cfg.encoder_dim)
        )
        text_emb = jnp.take(emb_table, src_seq, axis=0)
        # padding_idx=0 keeps the pad row at zero (model.py:88-90)
        text_emb = text_emb * non_pad_mask

        pos_table = sinusoid_encoding_table_jnp(
            cfg.vocab_size + 1, cfg.encoder_dim, padding_idx=0
        )
        # clamp like the decoder: positions past the table's vocab_size+1
        # rows (reference would IndexError, model.py:86; jnp.take's default
        # OOB mode is NaN-fill) alias to the last row instead of going NaN.
        # Training configs are validated up front against this capacity
        # (config.validate_position_capacity), so the clamp only ever fires
        # on out-of-contract inference inputs.
        pos_ids = jnp.minimum(src_pos, cfg.vocab_size)
        enc_output = text_emb + jnp.take(pos_table, pos_ids, axis=0)

        if cfg.use_multi_speaker_condition:
            if spk_emb is None:
                spk_emb = ECAPA_TDNN(
                    C=cfg.spk_channel,
                    n_feat_dim=cfg.n_feat_dim,
                    n_speaker_dim=cfg.n_speaker_dim,
                    input_wav=cfg.input_wav,
                    dtype=self.dtype,
                    name="speaker_encoder",
                )(wav_feat, train=train)
            spk_rep = jnp.broadcast_to(
                spk_emb[:, None, :],
                (enc_output.shape[0], enc_output.shape[1], cfg.n_speaker_dim),
            )
            enc_output = jnp.concatenate([enc_output, spk_rep], axis=-1)

        d_model = cfg.encoder_output_dim
        d_k = d_model // cfg.encoder_head
        block_cls = (
            nn.remat(FFTBlock, static_argnums=(4,)) if cfg.remat else FFTBlock
        )
        for i in range(cfg.encoder_n_layer):
            enc_output, _ = block_cls(
                d_model,
                cfg.encoder_conv1d_filter_size,
                cfg.encoder_head,
                d_k,
                d_k,
                fft_conv1d_kernel=cfg.fft_conv1d_kernel,
                fft_conv1d_padding=cfg.fft_conv1d_padding,
                dropout=cfg.dropout,
                use_flash=cfg.flash_attention,
                dtype=self.dtype,
                name=f"layer_stack_{i}",
            )(enc_output, non_pad_mask, slf_attn_mask, deterministic)
        return enc_output, non_pad_mask, text_emb, spk_emb


class Decoder(nn.Module):
    """FFT stack over expanded frames (reference: text2vec/model.py:139-190)."""

    cfg: Text2VecConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, enc_seq, enc_pos, deterministic=True):
        cfg = self.cfg
        slf_attn_mask = get_attn_key_pad_mask(enc_pos, enc_pos)
        non_pad_mask = get_non_pad_mask(enc_pos)

        d_model = cfg.decoder_model_dim
        pos_table = sinusoid_encoding_table_jnp(
            cfg.max_seq_len + 1, d_model, padding_idx=0
        )
        # clamp so padded buckets longer than max_seq_len cannot OOB-gather
        pos_ids = jnp.minimum(enc_pos, cfg.max_seq_len)
        dec_output = enc_seq + jnp.take(pos_table, pos_ids, axis=0)

        d_k = d_model // cfg.encoder_head  # reference uses encoder_head here (model.py:162)
        block_cls = (
            nn.remat(FFTBlock, static_argnums=(4,)) if cfg.remat else FFTBlock
        )
        for i in range(cfg.decoder_n_layer):
            dec_output, _ = block_cls(
                d_model,
                cfg.decoder_conv1d_filter_size,
                cfg.decoder_head,
                d_k,
                d_k,
                fft_conv1d_kernel=cfg.fft_conv1d_kernel,
                fft_conv1d_padding=cfg.fft_conv1d_padding,
                dropout=cfg.dropout,
                use_flash=cfg.flash_attention,
                dtype=self.dtype,
                name=f"layer_stack_{i}",
            )(dec_output, non_pad_mask, slf_attn_mask, deterministic)
        return dec_output


class Text2Vec(nn.Module):
    cfg: Text2VecConfig
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        cfg = self.cfg
        self.encoder = Encoder(cfg, dtype=self.dtype)
        self.decoder = Decoder(cfg, dtype=self.dtype)
        self.duration_predictor = DurationPredictor(
            cfg.duration_predictor_filter_size,
            cfg.duration_predictor_kernel_size,
            cfg.dropout,
            dtype=self.dtype,
        )
        self.WVF_linear = Linear(cfg.n_feat_dim, w_init_gain="linear", dtype=self.dtype)
        self.postnet = CBHG(
            cfg.n_feat_dim, K=8, projections=(256, cfg.n_feat_dim),
            dtype=self.dtype, gru_impl=cfg.gru_impl,
        )
        self.last_linear = Linear(cfg.n_feat_dim, w_init_gain="linear", dtype=self.dtype)
        if cfg.learn_alignments:
            n_text_ch = (
                cfg.encoder_dim + cfg.n_speaker_dim
                if cfg.use_speaker_emb_for_alignment
                else cfg.encoder_dim
            )
            self.attention = ConvAttention(
                n_feat_channels=cfg.n_feat_dim,
                n_text_channels=n_text_ch,
                use_partial_padding=cfg.attn_use_partial_padding,
            )

    # -- helpers ----------------------------------------------------------
    def mask_tensor(self, x, position, max_len):
        """Zero-fill frames beyond the per-item length (model.py:224-228)."""
        lengths = jnp.max(position, axis=-1)
        mask = get_mask_from_lengths(lengths, max_len)
        return x * mask[:, :, None].astype(x.dtype)

    # -- branches ---------------------------------------------------------
    def __call__(
        self,
        src_seq,
        src_pos,
        wav_feat,
        in_lens,
        out_lens,
        WVF_pos,
        attn_prior=None,
        binarize_attention=True,
        deterministic=False,
        train_bn=True,
    ) -> Dict[str, Any]:
        """Training branch (reference: model.py:297-339).

        Shapes: src_seq/src_pos [B, N]; wav_feat [B, T, n_feat];
        in_lens/out_lens [B]; WVF_pos [B, T]; attn_prior [B, T, N].
        """
        cfg = self.cfg
        encoder_output, _, _, speaker_vecs = self.encoder(
            src_seq, src_pos, wav_feat, deterministic=deterministic, train=train_bn
        )

        # soft alignment -> MAS -> durations (model.py:255-294)
        attn_soft, attn_logprob = self.attention(
            wav_feat,
            encoder_output,
            key_lens=in_lens,
            attn_prior=attn_prior,
        )
        if binarize_attention:
            attn_hard = mas_width1_batched(
                jax.lax.stop_gradient(attn_soft), in_lens, out_lens
            )
        else:
            attn_hard = attn_soft
        duration = jnp.sum(attn_hard, axis=1).astype(jnp.int32)  # [B, N]

        # length regulator: hard-attention matmul expansion (module.py:79-85)
        lr_output = jnp.einsum(
            "btn,bnc->btc",
            attn_hard.astype(encoder_output.dtype),
            encoder_output,
            preferred_element_type=jnp.float32,
        )
        duration_predictor_output = self.duration_predictor(
            encoder_output, deterministic=deterministic
        )

        max_len = wav_feat.shape[1]
        decoder_output = self.decoder(lr_output, WVF_pos, deterministic=deterministic)
        WVF_output = self.WVF_linear(decoder_output)
        WVF_output = self.mask_tensor(WVF_output, WVF_pos, max_len)
        residual = self.postnet(WVF_output, train=train_bn)
        residual = self.last_linear(residual)
        WVF_postnet_output = WVF_output + residual
        WVF_postnet_output = self.mask_tensor(WVF_postnet_output, WVF_pos, max_len)
        return {
            "feat_output": WVF_output,
            "feat_postnet_output": WVF_postnet_output,
            "duration_predictor_output": duration_predictor_output,
            "duration": duration,
            "attn": attn_hard,
            "attn_soft": attn_soft,
            "attn_logprob": attn_logprob,
        }

    def infer(
        self,
        src_seq,
        src_pos,
        wav_feat,
        max_frames: int,
        alpha: float = 1.0,
        spk_emb=None,
        train_bn: bool = False,
    ) -> Dict[str, Any]:
        """Inference branch (reference: model.py:340-356): duration-predictor
        path, no MAS; output padded to the static ``max_frames`` with a
        per-item ``total_frames`` length.

        ``spk_emb`` (precomputed [B, n_speaker_dim], e.g. from
        ``speaker_embedding``) skips the per-call ECAPA pass over the
        reference clip — the serving fast path where the speaker is fixed.

        ``train_bn=True`` runs the BN layers (ECAPA + CBHG) on batch
        statistics instead of running averages — used ONLY by the
        running-stat recalibration pass (infer/recalibrate.py); the
        reference's ``model.eval()`` (text2vec/eval.py:24) has no analog and
        is exposed to the eval-mode BN overflow documented in BENCH_NOTES
        ("Val-NaN root cause").
        """
        encoder_output, _, _, _ = self.encoder(
            src_seq, src_pos, wav_feat, deterministic=True, train=train_bn,
            spk_emb=spk_emb,
        )
        dp_out = self.duration_predictor(encoder_output, deterministic=True)
        # (dp + 0.5) * alpha, truncated toward zero (module.py:97-98)
        durations = jnp.floor((dp_out + 0.5) * alpha).astype(jnp.int32)
        # zero out durations at text pad positions
        durations = durations * (src_seq != 0).astype(jnp.int32)

        lr_output, total_frames = expand_by_durations(
            encoder_output, durations, max_frames
        )
        WVF_pos = positions_from_lengths(total_frames, max_frames)

        decoder_output = self.decoder(lr_output, WVF_pos, deterministic=True)
        WVF_output = self.WVF_linear(decoder_output)
        WVF_output = self.mask_tensor(WVF_output, WVF_pos, max_frames)
        residual = self.postnet(WVF_output, train=train_bn)
        residual = self.last_linear(residual)
        WVF_postnet_output = WVF_output + residual
        WVF_postnet_output = self.mask_tensor(WVF_postnet_output, WVF_pos, max_frames)
        return {
            "feat_output": WVF_output,
            "feat_postnet_output": WVF_postnet_output,
            "duration_predictor_output": dp_out,
            "durations": durations,
            "total_frames": total_frames,
        }

    def speaker_embedding(self, wav_feat):
        """Expose the ECAPA embedding (used by eval tooling)."""
        spk = self.encoder.speaker_encoder if hasattr(self.encoder, "speaker_encoder") else None
        del spk
        _, _, _, spk_emb = self.encoder(
            jnp.zeros((wav_feat.shape[0], 1), jnp.int32),
            jnp.zeros((wav_feat.shape[0], 1), jnp.int32),
            wav_feat,
            deterministic=True,
            train=False,
        )
        return spk_emb
