"""End-to-end synthesis: raw text -> wav2vec latents -> 16 kHz waveform.

Covers the reference's two-stage inference (text2vec/eval.py:19-138 for the
latent stage; the reference has no vocoder CLI — the full chain is the paper
pipeline).  Jitted per (text_bucket, frame_bucket) shape pair; all padding is
masked so batch synthesis of mixed-length texts is exact.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wavthruvec_pytorch_tpu.config import Text2VecConfig, Vec2WavConfig
from wavthruvec_pytorch_tpu.models import Generator, Text2Vec
from wavthruvec_pytorch_tpu.text import TextFrontend
from wavthruvec_pytorch_tpu.train.text2vec_train import pad_to_bucket


def init_import_models(
    t2v_cfg: Text2VecConfig,
    v2w_cfg: Vec2WavConfig,
    t2v_checkpoint: Optional[str] = None,
    gen_checkpoint: Optional[str] = None,
    ref_feat: Optional[np.ndarray] = None,
    folded: bool = False,
    fused: bool = False,
):
    """Initialize Text2Vec + Generator variable trees and import checkpoints
    — the shared construction core of the ``synthesize`` and ``serve`` CLIs.

    Checkpoint-type detection is uniform for both models: a DIRECTORY is an
    orbax checkpoint, a file is a reference torch pickle
    (``checkpoint_N.pth.tar`` with key ``model`` for Text2Vec,
    ``g_XXXXXXXX`` with key ``generator`` for the vocoder).

    ``ref_feat``: optional ``[1, T, n_feat_dim]`` reference clip used only to
    shape the init batch (checkpoints overwrite the values).  Returns
    ``(t2v, t2v_vars, gen, gen_vars)``; ``folded``/``fused`` configure the
    Generator's inference-export graph (weight-norm folding is applied to
    the params when ``folded``).
    """
    import os

    from wavthruvec_pytorch_tpu import checkpoint as ckpt

    t2v = Text2Vec(t2v_cfg)
    gen = Generator(v2w_cfg, folded=folded, fused=fused)
    rng = jax.random.PRNGKey(0)
    if ref_feat is None:
        ref_feat = np.zeros((1, 16, t2v_cfg.n_feat_dim), np.float32)
    t_ref = ref_feat.shape[1]
    # init through the train branch -> full param tree for restore
    t2v_vars = t2v.init(
        {"params": rng, "dropout": rng},
        jnp.ones((1, 8), jnp.int32), jnp.arange(1, 9, dtype=jnp.int32)[None],
        jnp.asarray(ref_feat, jnp.float32),
        jnp.array([8]), jnp.array([t_ref]),
        jnp.arange(1, t_ref + 1, dtype=jnp.int32)[None],
        attn_prior=jnp.ones((1, t_ref, 8)),
        deterministic=True, train_bn=False,
    )
    if t2v_checkpoint:
        if os.path.isdir(t2v_checkpoint):
            t2v_vars = ckpt.restore_checkpoint(t2v_checkpoint, t2v_vars)
        else:
            sd = ckpt.load_torch_state_dict(t2v_checkpoint, key="model")
            t2v_vars = ckpt.import_text2vec(sd, t2v_cfg)

    gen_vars = gen.init(
        rng, jnp.zeros((1, 8, v2w_cfg.n_feat_dim)),
        jnp.zeros((1, v2w_cfg.spk_dim)), jnp.zeros((1, v2w_cfg.noise_dim)),
        train=False,
    )
    if gen_checkpoint:
        if os.path.isdir(gen_checkpoint):
            gen_vars = ckpt.restore_checkpoint(gen_checkpoint, gen_vars)
        else:
            sd = ckpt.load_torch_state_dict(gen_checkpoint, key="generator")
            gen_vars = ckpt.import_vec2wav_generator(sd, v2w_cfg)
    if folded:
        from wavthruvec_pytorch_tpu.models.vec2wav import fold_weight_norm

        gen_vars = dict(gen_vars)
        gen_vars["params"] = fold_weight_norm(gen_vars["params"])
    return t2v, t2v_vars, gen, gen_vars


class _F32OutputGenerator:
    """Duck-typed Generator whose ``apply`` casts the waveform to f32.

    Wraps a reduced-precision Generator so downstream consumers
    (``Synthesizer._voc_fn``, ``StreamingVocoder``, wav writers) always see
    float32 audio regardless of the compute dtype.
    """

    def __init__(self, gen: Generator):
        self._gen = gen

    def apply(self, variables, *args, **kwargs):
        return self._gen.apply(variables, *args, **kwargs).astype(jnp.float32)


def make_serving_generator(
    v2w_cfg: Vec2WavConfig,
    gen_variables,
    precision: str = "f32",
    fused: bool = False,
):
    """Build the inference-export Generator + variables for a serving mode.

    ``precision``:
      * ``"f32"`` — exact training-graph math (default; bit-matches the
        train-branch forward).
      * ``"bf16"`` — weight-norm pre-folded (the reference's
        ``remove_weight_norm`` export, vec2wav/models.py:149-156) with
        bf16-STORED parameters and bf16 compute; halves weight HBM traffic.
        Measured −12% generator latency at B4/1000 frames on one v5e chip
        (tools/gen_variants_bench.py; int8 weights measured no further gain
        over bf16 and add quantization error — tools/gen_int8_bench.py).

    Returns ``(gen, variables)`` ready for ``Synthesizer(..., gen=gen)``.
    Audio output is always float32.
    """
    from wavthruvec_pytorch_tpu.models.vec2wav import fold_weight_norm

    if precision == "f32":
        return Generator(v2w_cfg, fused=fused), gen_variables
    if precision != "bf16":
        raise ValueError(f"unknown serving precision: {precision!r}")
    variables = dict(gen_variables)
    variables["params"] = fold_weight_norm(variables["params"])
    variables = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.bfloat16)
        if jnp.asarray(x).dtype == jnp.float32 else jnp.asarray(x),
        variables,
    )
    gen = Generator(v2w_cfg, folded=True, fused=fused, dtype=jnp.bfloat16)
    return _F32OutputGenerator(gen), variables


class Synthesizer:
    def __init__(
        self,
        t2v_cfg: Text2VecConfig,
        v2w_cfg: Vec2WavConfig,
        t2v_variables,
        gen_variables,
        frontend: TextFrontend,
        gen: Optional[Generator] = None,
    ):
        self.t2v_cfg = t2v_cfg
        self.v2w_cfg = v2w_cfg
        self.t2v = Text2Vec(t2v_cfg)
        self.gen = gen if gen is not None else Generator(v2w_cfg)
        self.t2v_variables = t2v_variables
        self.gen_variables = gen_variables
        self.frontend = frontend

    # --- jitted stages (cached per static shapes) --------------------------
    @functools.lru_cache(maxsize=16)
    def _t2v_fn(self, max_frames: int, alpha: float, use_spk_emb: bool):
        def fn(variables, src_seq, src_pos, ref_feat, spk_emb):
            out = self.t2v.apply(
                variables, src_seq, src_pos, ref_feat, max_frames, alpha,
                spk_emb if use_spk_emb else None,
                method=Text2Vec.infer,
            )
            # per-row finiteness computed in-graph so serving guards fetch a
            # [B] bool instead of host-scanning the full padded latents
            # (eval-mode BN overflow guard, see infer/serve.py).  Frame
            # counts and the finite mask ride ONE [2, B] int32 output so
            # the serving path pays a single small-fetch round trip for
            # both (each separate fetch costs a full tunnel RTT).
            finite = (
                jnp.isfinite(out["feat_output"]).all(axis=(1, 2))
                & jnp.isfinite(out["feat_postnet_output"]).all(axis=(1, 2))
            )
            meta = jnp.stack([
                jnp.asarray(out["total_frames"], jnp.int32),
                finite.astype(jnp.int32),
            ])
            return (
                out["feat_output"],
                out["feat_postnet_output"],
                meta,
            )

        return jax.jit(fn)

    @functools.lru_cache(maxsize=4)
    def _spk_fn(self):
        def fn(variables, ref_feat):
            return self.t2v.apply(
                variables, ref_feat, method=Text2Vec.speaker_embedding
            )

        return jax.jit(fn)

    def speaker_embedding(self, ref_feats: np.ndarray) -> np.ndarray:
        """Precompute the t2v-ECAPA speaker embedding once per speaker;
        pass the result as ``t2v_spk_emb`` to skip the ECAPA pass (and the
        reference-clip transfer) on every synthesis call."""
        return np.asarray(
            self._spk_fn()(self.t2v_variables, jnp.asarray(ref_feats, jnp.float32))
        )

    @functools.lru_cache(maxsize=16)
    def _voc_fn(self, pcm16: bool = False):
        def fn(variables, latents, spk_emb, noise):
            wav = self.gen.apply(variables, latents, spk_emb, noise,
                                 train=False)
            finite = jnp.isfinite(wav).all(axis=(1, 2))
            if pcm16:
                # quantize to the 16-bit PCM the serving front ends emit
                # anyway, IN GRAPH: the fetched bytes drop 4x -> 2x, which
                # is the dominant serving cost on a tunneled chip
                # (BENCH_NOTES "Serving load").  Same math as the host
                # conversion: clip, scale, truncate toward zero.  The
                # finite guard reads the float wav, so NaN rows are caught
                # before the (undefined) NaN->int cast could matter.
                pcm = (jnp.clip(wav[..., 0], -1.0, 1.0) * 32767.0
                       ).astype(jnp.int16)
                return pcm, finite
            return wav, finite

        return jax.jit(fn)

    # --- public API ---------------------------------------------------------
    def text_to_latents(
        self,
        texts: Sequence[str],
        ref_feats: Optional[np.ndarray] = None,
        alpha: float = 1.0,
        max_frames: Optional[int] = None,
        t2v_spk_emb: Optional[np.ndarray] = None,
        keep_device: bool = False,
    ) -> Dict[str, np.ndarray]:
        """texts + [B, T_ref, 1024] speaker-reference wav2vec feats ->
        padded latents [B, max_frames, 1024] + per-item frame counts.

        With ``t2v_spk_emb`` ([B, n_speaker_dim] from ``speaker_embedding``)
        the ECAPA pass is skipped (``ref_feats`` may be None).

        ``keep_device=True`` returns jax device arrays instead of numpy:
        the serving path feeds ``feat_postnet_output`` straight into
        ``latents_to_wav``, and fetching the [B, max_frames, 1024] latents
        to host costs seconds per batch on a tunneled chip (BENCH_NOTES
        "Serving load" — the tunnel moves ~25-40 MB/s).  In this mode the
        dict has a ``meta`` key (device [2, B] int32: total_frames row 0,
        finite mask row 1) instead of ``total_frames``/``finite_ok``."""
        ids, lengths = self.frontend.encode_batch(
            texts, pad_to=pad_to_bucket(
                max(len(self.frontend.text_to_sequence(t)) for t in texts),
                self.t2v_cfg.text_buckets,
            ),
        )
        src_pos = np.where(ids != 0, np.arange(1, ids.shape[1] + 1)[None], 0)
        if max_frames is None:
            max_frames = self.t2v_cfg.frame_buckets[-1]
        use_spk = t2v_spk_emb is not None
        fn = self._t2v_fn(max_frames, float(alpha), use_spk)
        B = ids.shape[0]
        if use_spk:
            ref = jnp.zeros((B, 1, self.t2v_cfg.n_feat_dim), jnp.float32)
            spk = jnp.asarray(t2v_spk_emb, jnp.float32)
        else:
            ref = jnp.asarray(ref_feats, jnp.float32)
            spk = jnp.zeros((B, self.t2v_cfg.n_speaker_dim), jnp.float32)
        feat, feat_postnet, meta = fn(
            self.t2v_variables,
            jnp.asarray(ids, jnp.int32),
            jnp.asarray(src_pos, jnp.int32),
            ref,
            spk,
        )
        if keep_device:
            # everything stays on device; "meta" is the [2, B] int32
            # (total_frames; finite) pair — callers fetch it in ONE small
            # transfer AFTER dispatching the vocoder stage, so the fetch
            # rides behind stage-2 execution instead of gating it
            return {
                "feat_output": feat,
                "feat_postnet_output": feat_postnet,
                "meta": meta,
                "input_lengths": lengths,
            }
        meta_h = np.asarray(meta)
        return {
            "feat_output": np.asarray(feat),
            "feat_postnet_output": np.asarray(feat_postnet),
            "total_frames": meta_h[0],
            "input_lengths": lengths,
            "finite_ok": meta_h[1].astype(bool),
        }

    def latents_to_wav(
        self,
        latents: np.ndarray,
        spk_emb: np.ndarray,
        noise: Optional[np.ndarray] = None,
        seed: int = 0,
        with_finite: bool = False,
        keep_device: bool = False,
        pcm16: bool = False,
    ):
        """[B, T, 1024] latents + [B, 192] speaker emb -> [B, T*320] wav.

        ``latents`` may be a jax device array (``text_to_latents`` with
        ``keep_device=True``) — it is consumed in place with no host round
        trip.  ``with_finite=True`` additionally returns the in-graph
        per-row finiteness [B] bool (serving guard; avoids a host scan).
        ``keep_device=True`` returns the device wav ([B, L, 1] float, or
        [B, L] int16 with ``pcm16=True``) — callers slice to the emitted
        samples before fetching.  ``pcm16=True`` quantizes to 16-bit PCM
        in graph (the serving wire format; halves fetched bytes vs f32
        twice over)."""
        B = latents.shape[0]
        if noise is None:
            noise = np.asarray(
                jax.random.normal(
                    jax.random.PRNGKey(seed), (B, self.v2w_cfg.noise_dim)
                )
            )
        wav, finite = self._voc_fn(pcm16)(
            self.gen_variables,
            jnp.asarray(latents, jnp.float32),
            jnp.asarray(spk_emb, jnp.float32),
            jnp.asarray(noise, jnp.float32),
        )
        if keep_device:
            return (wav, finite) if with_finite else wav
        if not pcm16:
            wav = wav[..., 0]
        if with_finite:
            return np.asarray(wav), np.asarray(finite)
        return np.asarray(wav)

    def synthesize(
        self,
        texts: Sequence[str],
        ref_feats: Optional[np.ndarray],
        spk_emb: np.ndarray,
        alpha: float = 1.0,
        max_frames: Optional[int] = None,
        seed: int = 0,
        t2v_spk_emb: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Full pipeline -> ([B, L] waveforms, [B] sample counts)."""
        out = self.text_to_latents(
            texts, ref_feats, alpha, max_frames, t2v_spk_emb=t2v_spk_emb
        )
        wav = self.latents_to_wav(out["feat_postnet_output"], spk_emb, seed=seed)
        n_samples = out["total_frames"] * self.v2w_cfg.total_upsample
        return wav, n_samples


def write_wav(path: str, wav: np.ndarray, sample_rate: int = 16000) -> None:
    from scipy.io import wavfile

    if wav.dtype == np.int16:  # already-quantized PCM (serving path)
        wavfile.write(path, sample_rate, wav)
    else:
        wavfile.write(path, sample_rate, np.clip(wav, -1, 1))
