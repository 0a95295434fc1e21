"""Vec2Wav GAN training: one jitted step with two optax states.

Reference loop: vec2wav/train.py:57-296.  Per step:
1. noise ~ N(0, I) [B, 192] (train.py:165);
2. y_hat = G(wv_feat, spk_emb, noise) (train-mode CBN batch stats);
3. D step: MPD + MSD on (y, stop_grad(y_hat)), LSGAN loss, AdamW update
   (train.py:188-198);
4. G step **against the updated discriminators** (torch order: optim_d.step()
   precedes the G forward, train.py:198-207): mel L1 x45 + feature-matching
   + adversarial, AdamW update (train.py:201-215);
5. ExponentialLR gamma=0.999 stepped per epoch (train.py:295-296) — exposed
   as ``set_learning_rate`` on the injected hyperparams.

AdamW keeps torch defaults the reference inherits: weight_decay 0.01,
eps 1e-8 (vec2wav/train.py:96-98).

The generator forward runs twice (once for the D-step value, once inside the
G-step grad) — the functional-JAX equivalent of torch's retained graph; both
see the same rng/batch_stats so the waveforms are identical.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from wavthruvec_pytorch_tpu.config import MeshConfig, Vec2WavConfig
from wavthruvec_pytorch_tpu.models.vec2wav import (
    Generator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)
from wavthruvec_pytorch_tpu.ops.stft import mel_spectrogram


class GANTrainState(NamedTuple):
    step: jnp.ndarray
    gen_params: Any
    gen_batch_stats: Any
    gen_spectral: Any
    disc_params: Any  # {"mpd": ..., "msd": ...}
    msd_spectral: Any
    opt_g_state: Any
    opt_d_state: Any


class V2WModels(NamedTuple):
    gen: Generator
    mpd: MultiPeriodDiscriminator
    msd: MultiScaleDiscriminator


def make_optimizers(cfg: Vec2WavConfig):
    def make():
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=cfg.learning_rate,
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            eps=1e-8,
            weight_decay=0.01,  # torch AdamW default the reference inherits
        )

    return make(), make()


def set_learning_rate(opt_state, lr: float):
    """Per-epoch ExponentialLR: lr = lr0 * gamma**epoch (train.py:104-105)."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def init_state(
    cfg: Vec2WavConfig, rng: jax.Array, sample_batch: Dict[str, jnp.ndarray]
) -> Tuple[V2WModels, GANTrainState]:
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    gen = Generator(cfg, dtype=dtype)
    mpd = MultiPeriodDiscriminator(
        cfg, dtype=dtype, pair_batched=cfg.disc_pair_batched
    )
    msd = MultiScaleDiscriminator(
        dtype=dtype, pair_batched=cfg.disc_pair_batched,
        tiled_conv=cfg.msd_tiled_conv,
    )

    g_rng, d_rng, n_rng = jax.random.split(rng, 3)
    noise = jax.random.normal(
        n_rng, (sample_batch["wv_feat"].shape[0], cfg.noise_dim)
    )
    gen_vars = gen.init(
        g_rng, sample_batch["wv_feat"], sample_batch["spk_emb"], noise, train=False
    )
    y_hat_shape = (
        sample_batch["wv_feat"].shape[0],
        sample_batch["wv_feat"].shape[1] * cfg.total_upsample,
        1,
    )
    y_dummy = jnp.zeros(y_hat_shape, jnp.float32)
    mpd_vars = mpd.init(d_rng, y_dummy, y_dummy)
    msd_vars = msd.init(d_rng, y_dummy, y_dummy)

    opt_g, opt_d = make_optimizers(cfg)
    disc_params = {"mpd": mpd_vars["params"], "msd": msd_vars["params"]}
    state = GANTrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_vars["params"],
        gen_batch_stats=gen_vars.get("batch_stats", FrozenDict()),
        gen_spectral=gen_vars.get("spectral", FrozenDict()),
        disc_params=disc_params,
        msd_spectral=msd_vars.get("spectral", FrozenDict()),
        opt_g_state=opt_g.init(gen_vars["params"]),
        opt_d_state=opt_d.init(disc_params),
    )
    return V2WModels(gen, mpd, msd), state


def _gen_forward(models, cfg, gen_params, gen_batch_stats, gen_spectral, batch, noise):
    y_hat, mutated = models.gen.apply(
        {
            "params": gen_params,
            "batch_stats": gen_batch_stats,
            "spectral": gen_spectral,
        },
        batch["wv_feat"],
        batch["spk_emb"],
        noise,
        train=True,
        mutable=["batch_stats", "spectral"],
    )
    return y_hat, mutated


def train_step(
    models: V2WModels,
    cfg: Vec2WavConfig,
    opt_g: optax.GradientTransformation,
    opt_d: optax.GradientTransformation,
    state: GANTrainState,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
    """batch: wv_feat [B,T,C], spk_emb [B,192], audio [B,T*320,1] (zero-padded),
    and either mel_loss [B,F,80] (host-computed per-item log-mel,
    zero-padded) or — with ``cfg.device_mel_target`` — mel_frames [B] and the
    target is computed here, in-graph, from the batch audio (masked beyond
    each item's frames to reproduce the host path's zero padding)."""
    noise = jax.random.normal(rng, (batch["wv_feat"].shape[0], cfg.noise_dim))
    y = batch["audio"]

    if cfg.device_mel_target:
        mel_t = mel_spectrogram(
            y[..., 0], cfg.n_fft, cfg.num_mels, cfg.sampling_rate,
            cfg.hop_size, cfg.win_size, cfg.fmin, cfg.fmax_for_loss,
        )  # [B, M, F]
        mel_t = jnp.transpose(mel_t, (0, 2, 1))  # [B, F, M]
        valid = (
            jnp.arange(mel_t.shape[1])[None, :] < batch["mel_frames"][:, None]
        )
        batch = dict(batch, mel_loss=mel_t * valid[..., None])

    # --- generator forward (value for the D step) ---
    y_hat, _ = _gen_forward(
        models, cfg, state.gen_params, state.gen_batch_stats, state.gen_spectral,
        batch, noise,
    )
    y_hat_sg = jax.lax.stop_gradient(y_hat)

    # --- D step ---
    def d_loss_fn(disc_params, msd_spectral):
        y_df_r, y_df_g, _, _ = models.mpd.apply(
            {"params": disc_params["mpd"]}, y, y_hat_sg
        )
        (y_ds_r, y_ds_g, _, _), msd_mut = models.msd.apply(
            {"params": disc_params["msd"], "spectral": msd_spectral},
            y,
            y_hat_sg,
            mutable=["spectral"],
        )
        loss_f, _, _ = discriminator_loss(y_df_r, y_df_g)
        loss_s, _, _ = discriminator_loss(y_ds_r, y_ds_g)
        return loss_f + loss_s, msd_mut["spectral"]

    (loss_disc_all, msd_spectral_1), d_grads = jax.value_and_grad(
        d_loss_fn, has_aux=True
    )(state.disc_params, state.msd_spectral)
    d_updates, new_opt_d = opt_d.update(
        d_grads, state.opt_d_state, state.disc_params
    )
    new_disc_params = optax.apply_updates(state.disc_params, d_updates)

    # --- G step (vs updated discriminators, matching torch step order) ---
    def g_loss_fn(gen_params, msd_spectral):
        y_g, gen_mut = _gen_forward(
            models, cfg, gen_params, state.gen_batch_stats, state.gen_spectral,
            batch, noise,
        )
        y_g_mel = mel_spectrogram(
            y_g[..., 0],
            cfg.n_fft,
            cfg.num_mels,
            cfg.sampling_rate,
            cfg.hop_size,
            cfg.win_size,
            cfg.fmin,
            cfg.fmax_for_loss,
        )  # [B, M, F]
        y_g_mel = jnp.transpose(y_g_mel, (0, 2, 1))  # [B, F, M]
        y_mel = batch["mel_loss"][:, : y_g_mel.shape[1], :]
        loss_mel = jnp.mean(jnp.abs(y_mel - y_g_mel)) * 45.0

        y_df_r, y_df_g, fmap_f_r, fmap_f_g = models.mpd.apply(
            {"params": new_disc_params["mpd"]}, y, y_g
        )
        (y_ds_r, y_ds_g, fmap_s_r, fmap_s_g), msd_mut = models.msd.apply(
            {"params": new_disc_params["msd"], "spectral": msd_spectral},
            y,
            y_g,
            mutable=["spectral"],
        )
        loss_fm_f = feature_loss(fmap_f_r, fmap_f_g)
        loss_fm_s = feature_loss(fmap_s_r, fmap_s_g)
        loss_gen_f, _ = generator_loss(y_df_g)
        loss_gen_s, _ = generator_loss(y_ds_g)
        total = loss_gen_s + loss_gen_f + loss_fm_s + loss_fm_f + loss_mel
        mel_error = jnp.mean(jnp.abs(y_mel - y_g_mel))
        aux = (gen_mut, msd_mut["spectral"], loss_mel, mel_error)
        return total, aux

    (loss_gen_all, (gen_mut, msd_spectral_2, loss_mel, mel_error)), g_grads = (
        jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.gen_params, msd_spectral_1
        )
    )
    g_updates, new_opt_g = opt_g.update(
        g_grads, state.opt_g_state, state.gen_params
    )
    new_gen_params = optax.apply_updates(state.gen_params, g_updates)

    new_state = GANTrainState(
        step=state.step + 1,
        gen_params=new_gen_params,
        gen_batch_stats=gen_mut["batch_stats"],
        gen_spectral=gen_mut["spectral"],
        disc_params=new_disc_params,
        msd_spectral=msd_spectral_2,
        opt_g_state=new_opt_g,
        opt_d_state=new_opt_d,
    )
    metrics = {
        "gen_loss_total": loss_gen_all,
        "disc_loss_total": loss_disc_all,
        "mel_loss": loss_mel,
        "mel_spec_error": mel_error,
    }
    return new_state, metrics


def make_train_step(
    models: V2WModels,
    cfg: Vec2WavConfig,
    mesh=None,
    mesh_cfg: MeshConfig = MeshConfig(),
):
    opt_g, opt_d = make_optimizers(cfg)
    step_fn = functools.partial(train_step, models, cfg, opt_g, opt_d)
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,)), (opt_g, opt_d)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(mesh_cfg.data_axis))
    batch_shardings = {
        "wv_feat": data,
        "spk_emb": data,
        "audio": data,
        ("mel_frames" if cfg.device_mel_target else "mel_loss"): data,
    }
    jitted = jax.jit(
        step_fn,
        in_shardings=(repl, batch_shardings, repl),
        donate_argnums=(0,),
    )
    return jitted, (opt_g, opt_d)
