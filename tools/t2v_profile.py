"""Ablation timing of the Text2Vec train step at the throughput shape
(B16, 64-text / 1024-frame buckets): which component dominates the 192 ms?

Shape cap: the call lambdas close over the input arrays, which JAX inlines
as HLO literals — above ~B16/T1024 (the [B,T,N] prior alone is 151 MB at
T3072/N768) the tunneled compile service rejects the program with HTTP 413.
Profile long buckets with the chained A/B tools (tools/longbucket_account.py)
instead.

Same methodology as tools/gan_profile.py: each piece is jitted standalone
with a scalar output (scalar-fetch; null-program overhead subtracted), and
for each module both forward-only and forward+grad are timed so the
backward share falls out as the difference.  Standalone-module sums won't
exactly reproduce the full step (XLA fuses across boundaries) but they rank
the levers, which is what an ablation is for.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import FrozenDict

from wavthruvec_pytorch_tpu.config import Text2VecConfig
from wavthruvec_pytorch_tpu.models.cbhg import CBHG
from wavthruvec_pytorch_tpu.models.conv_attention import ConvAttention
from wavthruvec_pytorch_tpu.models.duration import DurationPredictor
from wavthruvec_pytorch_tpu.models.ecapa import ECAPA_TDNN
from wavthruvec_pytorch_tpu.models.text2vec import Decoder, Text2Vec
from wavthruvec_pytorch_tpu.ops.mas import mas_width1_batched
from wavthruvec_pytorch_tpu.train import text2vec_train as t2v


def _cache():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _t(fn, iters=10):
    for _ in range(2):
        float(fn(jnp.float32(0.0)))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(jnp.float32(i) * 1e-20))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _scalar(tree):
    return sum(jnp.sum(x[..., :1]) for x in jax.tree_util.tree_leaves(tree))


def profile_module(name, model, variables, call, res, overhead, grad=True):
    """Time fwd and fwd+grad of ``call(variables, eps) -> scalar``."""

    fwd_fn = jax.jit(call)
    res[f"{name}_fwd_ms"] = round((_t(lambda e: fwd_fn(variables, e)) - overhead) * 1e3, 2)
    if grad:
        g_fn = jax.jit(
            lambda v, e: _scalar(jax.grad(lambda vv, ee: call(vv, ee))(v, e))
        )
        fb = _t(lambda e: g_fn(variables, e)) - overhead
        res[f"{name}_fwd_bwd_ms"] = round(fb * 1e3, 2)


def main(B=16, N=64, T=1024, dtype="float32"):
    _cache()
    import dataclasses

    # long-bucket shapes need the decoder position table to cover T and
    # run at the production dtype (round-5: N768/T3072 bf16 ablation)
    cfg = dataclasses.replace(
        Text2VecConfig(), compute_dtype=dtype,
        max_seq_len=max(3000, T), dropout=0.0)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    wav_feat = jnp.asarray(rng.standard_normal((B, T, cfg.n_feat_dim)) * 0.1, jnp.float32)
    enc_out = jnp.asarray(rng.standard_normal((B, N, cfg.encoder_output_dim)), jnp.float32)
    in_lens = jnp.full((B,), N, jnp.int32)
    out_lens = jnp.full((B,), T, jnp.int32)
    pos_T = jnp.broadcast_to(jnp.arange(1, T + 1, dtype=jnp.int32), (B, T))
    prior = jnp.full((B, T, N), 1.0 / N, jnp.float32)

    @jax.jit
    def null(eps):
        return eps * 2.0

    overhead = _t(null)
    res = {"overhead_ms": round(overhead * 1e3, 2)}

    # --- ECAPA speaker encoder (B, T, 1024) -> (B, 192) ---
    ecapa = ECAPA_TDNN(C=cfg.spk_channel, n_feat_dim=cfg.n_feat_dim,
                       n_speaker_dim=cfg.n_speaker_dim, input_wav=False)
    ev = ecapa.init(key, wav_feat, train=False)

    def ecapa_call(v, eps):
        out, _ = ecapa.apply(
            {"params": v["params"], "batch_stats": v.get("batch_stats", FrozenDict())},
            wav_feat + eps, train=True, mutable=["batch_stats"])
        return jnp.sum(out)

    profile_module("ecapa", ecapa, ev, ecapa_call, res, overhead)

    # --- Decoder FFT stack at (B, T, 448) ---
    dec = Decoder(cfg)
    dv = dec.init({"params": key, "dropout": key},
                  jnp.zeros((B, T, cfg.decoder_model_dim)), pos_T,
                  deterministic=True)
    lr_out = jnp.asarray(rng.standard_normal((B, T, cfg.decoder_model_dim)), jnp.float32)

    def dec_call(v, eps):
        out = dec.apply(v, lr_out + eps, pos_T, deterministic=False,
                        rngs={"dropout": key})
        return jnp.sum(out[:, ::16, :1])

    profile_module("decoder_stack", dec, dv, dec_call, res, overhead)

    # --- ConvAttention (soft alignment) ---
    attn = ConvAttention(n_feat_channels=cfg.n_feat_dim,
                         n_text_channels=cfg.encoder_output_dim)
    av = attn.init(key, wav_feat, enc_out, key_lens=in_lens, attn_prior=prior)

    def attn_call(v, eps):
        soft, logp = attn.apply(v, wav_feat + eps, enc_out,
                                key_lens=in_lens, attn_prior=prior)
        return jnp.sum(soft[:, ::16, :1])

    profile_module("conv_attention", attn, av, attn_call, res, overhead)

    # --- MAS (stop-gradient in the real step: forward only) ---
    soft = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((B, T, N)), jnp.float32), axis=-1)

    mas_fn = jax.jit(lambda e: jnp.sum(
        mas_width1_batched(soft + e, in_lens, out_lens)[:, ::16, :1]))
    res["mas_fwd_ms"] = round((_t(mas_fn) - overhead) * 1e3, 2)

    # --- CBHG postnet at (B, T, 1024) ---
    cbhg = CBHG(cfg.n_feat_dim, K=8, projections=(256, cfg.n_feat_dim))
    wvf = jnp.asarray(rng.standard_normal((B, T, cfg.n_feat_dim)), jnp.float32)
    cv = cbhg.init(key, wvf, train=False)

    def cbhg_call(v, eps):
        out, _ = cbhg.apply(
            {"params": v["params"], "batch_stats": v.get("batch_stats", FrozenDict())},
            wvf + eps, train=True, mutable=["batch_stats"])
        return jnp.sum(out[:, ::16, :1])

    profile_module("cbhg", cbhg, cv, cbhg_call, res, overhead)

    # --- DurationPredictor (B, N, 448) ---
    dp = DurationPredictor(cfg.duration_predictor_filter_size,
                           cfg.duration_predictor_kernel_size, cfg.dropout)
    dpv = dp.init({"params": key, "dropout": key}, enc_out, deterministic=True)

    def dp_call(v, eps):
        return jnp.sum(dp.apply(v, enc_out + eps, deterministic=False,
                                rngs={"dropout": key}))

    profile_module("duration_predictor", dp, dpv, dp_call, res, overhead)

    # --- Encoder FFT stack at (B, N, 448) (post-speaker-concat width) ---
    from wavthruvec_pytorch_tpu.models.fft_block import FFTBlock

    d_model = cfg.encoder_output_dim
    d_k = d_model // cfg.encoder_head
    enc_blocks = [
        FFTBlock(d_model, cfg.encoder_conv1d_filter_size, cfg.encoder_head,
                 d_k, d_k, fft_conv1d_kernel=cfg.fft_conv1d_kernel,
                 fft_conv1d_padding=cfg.fft_conv1d_padding,
                 dropout=cfg.dropout)
        for _ in range(cfg.encoder_n_layer)
    ]
    evars = [b.init({"params": key, "dropout": key}, enc_out,
                    deterministic=True) for b in enc_blocks]

    def enc_call(vs, eps):
        x = enc_out + eps
        for b, v in zip(enc_blocks, vs):
            x, _ = b.apply(v, x, deterministic=False, rngs={"dropout": key})
        return jnp.sum(x[:, :, :1])

    profile_module("encoder_stack", None, evars, enc_call, res, overhead)

    # --- LR expansion einsum: attn_hard [B,T,N] @ enc_out [B,N,448] ---
    hard = jnp.zeros((B, T, N), jnp.float32).at[:, :, 0].set(1.0)

    def lr_call(v, eps):
        out = jnp.einsum("btn,bnc->btc", hard, v + eps,
                         preferred_element_type=jnp.float32)
        return jnp.sum(out[:, ::16, :1])

    profile_module("lr_expansion", None, enc_out, lr_call, res, overhead)

    # --- output linears: WVF_linear (448->1024) + last_linear (2048->1024) ---
    from wavthruvec_pytorch_tpu.models.layers import Linear

    lin1 = Linear(cfg.n_feat_dim, w_init_gain="linear")
    lin2 = Linear(cfg.n_feat_dim, w_init_gain="linear")
    dec_out = jnp.asarray(
        rng.standard_normal((B, T, cfg.decoder_model_dim)), jnp.float32)
    cbhg_out = jnp.asarray(
        rng.standard_normal((B, T, 2 * cfg.n_feat_dim)), jnp.float32)
    l1v = lin1.init(key, dec_out)
    l2v = lin2.init(key, cbhg_out)

    def lin_call(vs, eps):
        a = lin1.apply(vs[0], dec_out + eps)
        b = lin2.apply(vs[1], cbhg_out + eps)
        return jnp.sum(a[:, ::16, :1]) + jnp.sum(b[:, ::16, :1])

    profile_module("output_linears", None, (l1v, l2v), lin_call, res, overhead)

    # --- loss terms: 3x masked MSE + attention binarization ---
    from wavthruvec_pytorch_tpu.models.losses import (
        attention_binarization_loss,
        dnn_loss,
    )

    feat = jnp.asarray(rng.standard_normal((B, T, cfg.n_feat_dim)), jnp.float32)
    target = feat * 0.9
    dur = jnp.ones((B, N), jnp.float32)
    soft_l = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((B, T, N)), jnp.float32), axis=-1)
    hard_l = (soft_l == soft_l.max(-1, keepdims=True)).astype(jnp.float32)

    def loss_call(v, eps):
        l1, l2, l3 = dnn_loss(v + eps, feat * 0.99 + eps, target,
                              dur + eps, dur)
        lb = attention_binarization_loss(hard_l, soft_l + eps)
        return l1 + l2 + l3 + lb

    profile_module("losses", None, feat, loss_call, res, overhead)

    # --- dropout mask generation at the big shapes (PRNG cost) ---
    def drop_call(v, eps):
        k = jax.random.fold_in(key, 0)
        m1 = jax.random.bernoulli(k, 0.9, (B, T, cfg.decoder_model_dim))
        m2 = jax.random.bernoulli(jax.random.fold_in(k, 1), 0.9,
                                  (B, T, cfg.decoder_conv1d_filter_size))
        return jnp.sum(m1[:, ::64, :1]) + jnp.sum(m2[:, ::64, :1]) + eps

    profile_module("dropout_masks", None, jnp.float32(0), drop_call, res,
                   overhead, grad=False)

    print(json.dumps(res), flush=True)

    # --- full step pieces: fwd-only loss, fwd+bwd, LAMB, full step ---
    batch = t2v.make_padded_batch(
        [
            {
                "text_enc": rng.integers(4, 200, size=N).astype(np.int32),
                "feat_gt_target": rng.standard_normal((T, cfg.n_feat_dim)).astype(np.float32) * 0.1,
                "attn_prior": np.full((T, N), 1.0 / N, np.float32),
            }
            for _ in range(B)
        ],
        cfg, text_pad=N, frame_pad=T,
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "audiopaths"}
    model, state = t2v.init_state(cfg, key, batch)
    tx = t2v.make_optimizer(cfg)

    def loss_only(params, eps):
        outputs, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["text"], batch["src_pos"], batch["feat_target"] + eps,
            batch["input_lengths"], batch["output_lengths"], batch["feat_pos"],
            attn_prior=batch["attn_prior"], binarize_attention=True,
            deterministic=False, train_bn=True,
            rngs={"dropout": key}, mutable=["batch_stats"])
        return jnp.sum(outputs["feat_postnet_output"][:, ::16, :1])

    res2 = {}
    f = jax.jit(loss_only)
    res2["full_fwd_ms"] = round((_t(lambda e: f(state.params, e)) - overhead) * 1e3, 1)
    g = jax.jit(lambda p, e: _scalar(jax.grad(loss_only)(p, e)))
    res2["full_fwd_bwd_ms"] = round((_t(lambda e: g(state.params, e)) - overhead) * 1e3, 1)

    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)

    @jax.jit
    def lamb_only(params, eps):
        grads = jax.tree_util.tree_map(lambda z: z + eps, zero_grads)
        updates, _ = tx.update(grads, state.opt_state, params)
        return _scalar(optax.apply_updates(params, updates))

    res2["lamb_ms"] = round((_t(lambda e: lamb_only(state.params, e)) - overhead) * 1e3, 1)

    step, _ = t2v.make_train_step(model, cfg)
    keys = [jax.random.PRNGKey(i) for i in range(8)]
    holder = {"s": state}
    holder["s"], m = step(holder["s"], batch, keys[0])
    float(m["total_loss"])
    ts = []
    for i in range(8):
        t0 = time.perf_counter()
        holder["s"], m = step(holder["s"], batch, keys[i % 8])
        float(m["total_loss"])
        ts.append(time.perf_counter() - t0)
    res2["full_step_ms"] = round(float(np.median(ts[2:])) * 1e3, 1)
    print(json.dumps(res2), flush=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=16)
    ap.add_argument("--N", type=int, default=64)
    ap.add_argument("--T", type=int, default=1024)
    ap.add_argument("--dtype", default="float32")
    a = ap.parse_args()
    main(a.B, a.N, a.T, a.dtype)
