"""Vec2Wav GAN end-to-end training loop (reference: vec2wav/train.py:57-335).

Mirrors the reference CLI:
    python -m wavthruvec_pytorch_tpu.train.vec2wav_loop \
        --training_epochs 100 --stdout_interval 50 [--fine_tuning ...]

Flow: filelists -> VocoderDataset/Loader -> jitted GAN step (D then G vs the
updated D, in-graph mel loss) -> stdout every stdout_interval, g_/do_ orbax
checkpoints every save_step with auto-resume from the latest, TB scalars at
log_step, validation (mel L1 + audio/figures for <=4 items) at val_step,
per-epoch ExponentialLR 0.999.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from wavthruvec_pytorch_tpu import checkpoint as ckpt
from wavthruvec_pytorch_tpu.config import Vec2WavConfig, save_config
from wavthruvec_pytorch_tpu.data.prefetch import prefetched
from wavthruvec_pytorch_tpu.data.vocoder_data import (
    VocoderDataset,
    VocoderLoader,
    get_dataset_filelist,
    pad_vocoder_batch,
)
from wavthruvec_pytorch_tpu.ops.stft import mel_spectrogram
from wavthruvec_pytorch_tpu.parallel import (
    globalize_state,
    local_batch_size,
    maybe_distributed_init,
    mesh_for_batch,
    process_shard,
    shard_batch,
)
from wavthruvec_pytorch_tpu.train import vec2wav_train as v2w
from wavthruvec_pytorch_tpu.utils.logging import host_logger
from wavthruvec_pytorch_tpu.utils.plots import plot_spectrogram


def make_val_fn(models, cfg):
    """Jitted eval synth + mel + L1 for one val item — ONE dispatch per
    item instead of the eager per-op path, which costs minutes per item
    through a TPU tunnel (same fix as text2vec_loop.make_val_fn).  jit
    recompiles per item length; the val set is fixed across training, so
    each distinct length compiles once (and persists in the compilation
    cache) and every later validation is dispatch-bound."""

    def run(gen_vars, feat, spk, noise, y_mel):
        y_hat = models.gen.apply(gen_vars, feat, spk, noise, train=False)
        y_hat_mel = mel_spectrogram(
            y_hat[..., 0], cfg.n_fft, cfg.num_mels, cfg.sampling_rate,
            cfg.hop_size, cfg.win_size, cfg.fmin, cfg.fmax_for_loss,
        ).transpose(0, 2, 1)
        # reference slices the stored mel to the synthesized length
        # (vec2wav/train.py:268-270); slice both to the static min so the
        # in-graph L1 matches it for every length relation
        m = min(y_mel.shape[1], y_hat_mel.shape[1])
        err = jnp.mean(jnp.abs(y_mel[:, :m, :] - y_hat_mel[:, :m, :]))
        return err, y_hat, y_hat_mel

    return jax.jit(run)


def validate(models, cfg, state, validset, logger, steps, max_items: int = 4,
             mesh=None, val_fn=None):
    """Reference validation (vec2wav/train.py:246-291, minus the stray
    pdb.set_trace): full synth, mel L1, TB audio + spectrogram figures.

    Under multi-process training the state is globally replicated (its
    arrays span non-addressable devices), so it is first converted back to
    host-local arrays — a collective every process participates in; each
    process then validates locally and ``host_logger`` keeps TB writes on
    process 0 (<=16 variable-length items, so the redundancy is cheap and
    every host stays in step for the next training collective)."""
    if mesh is not None and jax.process_count() > 1:
        from jax.experimental import multihost_utils
        from jax.sharding import PartitionSpec as P

        state = multihost_utils.global_array_to_host_local_array(
            state, mesh, P())
    if val_fn is None:
        val_fn = make_val_fn(models, cfg)
    gen_vars = {"params": state.gen_params,
                "batch_stats": state.gen_batch_stats,
                "spectral": state.gen_spectral}
    rng = jax.random.PRNGKey(steps)
    val_err_tot, n = 0.0, 0
    for j in range(min(len(validset), 16)):
        batch = pad_vocoder_batch([validset[j]], cfg)
        noise = jax.random.normal(jax.random.fold_in(rng, j), (1, cfg.noise_dim))
        err, y_hat, y_hat_mel = val_fn(
            gen_vars, jnp.asarray(batch["wv_feat"]),
            jnp.asarray(batch["spk_emb"]), noise,
            jnp.asarray(batch["mel_loss"]))
        val_err_tot += float(err)
        n += 1
        if j <= max_items:
            wav = np.asarray(y_hat)[0, :, 0]
            logger.add_audio(f"generated/y_hat_{j}", wav[None], steps, cfg.sampling_rate)
            spec = np.asarray(y_hat_mel)[0].T
            logger.add_figure(
                f"generated/y_hat_spec_{j}", plot_spectrogram(spec), steps
            )
    if n:
        logger.add_scalar("validation/mel_spec_error", val_err_tot / n, steps)
    return val_err_tot / max(n, 1)


def main(args: Optional[argparse.Namespace] = None, cfg: Optional[Vec2WavConfig] = None):
    if args is None:
        args = parse_args([])
    if cfg is None:
        if getattr(args, "config", None):
            from wavthruvec_pytorch_tpu.config import load_config

            cfg = load_config(Vec2WavConfig, args.config)
        else:
            cfg = Vec2WavConfig()

    maybe_distributed_init()
    print("Initializing Training Process.. (TPU-native)")
    training_files, validation_files = get_dataset_filelist(
        cfg.input_training_file, cfg.input_validation_file
    )
    training_files = process_shard(training_files)
    trainset = VocoderDataset(
        training_files, cfg, fine_tuning=args.fine_tuning,
        base_mels_path=args.input_mels_dir,
    )
    loader = VocoderLoader(
        trainset, local_batch_size(cfg.batch_size), seed=cfg.seed,
        num_workers=args.num_workers,
    )
    validset = VocoderDataset(
        validation_files, cfg, fine_tuning=args.fine_tuning,
        base_mels_path=args.input_mels_dir, split=False,
        compute_mel=True,  # validation compares mels on the host
    )

    mesh = mesh_for_batch(cfg.batch_size)
    if mesh is not None:
        print(f"data-parallel mesh over {mesh.devices.size} devices")

    first = next(loader.epoch())
    first.pop("filenames", None)
    first_j = {k: jnp.asarray(v) for k, v in first.items()}
    models, state = v2w.init_state(cfg, jax.random.PRNGKey(cfg.seed), first_j)
    step_fn, _ = v2w.make_train_step(models, cfg, mesh=mesh)
    val_fn = make_val_fn(models, cfg)  # jit cache shared across validations

    # auto-resume from the latest g_/do_ (reference: train.py:74-89)
    os.makedirs(cfg.checkpoint_path, exist_ok=True)
    steps, last_epoch = 0, -1
    cp = ckpt.scan_checkpoint(cfg.checkpoint_path, "state_")
    if cp is not None:
        state = ckpt.restore_checkpoint(cp, state)
        steps = int(state.step) + 1
        last_epoch = steps // max(len(loader), 1)
        print(f"resumed from {cp} at step {steps}")
    # multi-process: lift the host-local state to global replicated arrays
    # (the jitted step's in_shardings span every process's devices)
    state = globalize_state(state, mesh)

    save_config(cfg, os.path.join(cfg.run_path, cfg.log_seed, "config.json"))
    logger = host_logger(cfg.tensorboard_logs_path, cfg.logger_path)
    rng = jax.random.PRNGKey(cfg.seed + 1)

    # HBM-resident windowed dataset (data/vocoder_device_cache.py): stage
    # the corpus once, window batches on-device — per-step host work drops
    # to drawing [B] random offsets (few-core hosts are otherwise
    # loader-bound at windowed B128, BENCH_NOTES round 5)
    device_data = None
    if cfg.device_resident_data:
        if (jax.process_count() == 1 and trainset.split
                and not args.fine_tuning and cfg.device_mel_target):
            from wavthruvec_pytorch_tpu.data.vocoder_device_cache import (
                VocoderDeviceData,
            )

            device_data = VocoderDeviceData(trainset, cfg, mesh=mesh)
            print(f"device-resident dataset: "
                  f"{device_data.nbytes() / 2**20:.0f} MB staged in HBM"
                  + (" (replicated over mesh)" if mesh is not None else ""))
        else:
            print("device_resident_data ignored (needs single-process, "
                  "split=True, no fine_tuning, device_mel_target=True)")

    def batches():
        if device_data is None:
            for b in prefetched(loader.epoch(), depth=2, enabled=args.prefetch):
                b.pop("filenames", None)
                b = {k: jnp.asarray(v) for k, v in b.items()}
                if mesh is not None:
                    b = shard_batch(b, mesh)
                yield b
        else:
            for idx in loader.epoch_indices():
                # already device arrays, already sharded under a mesh
                yield device_data.batch(idx)

    for epoch in range(max(0, last_epoch), args.training_epochs):
        start = time.time()
        print("Epoch: {}".format(epoch + 1))
        # per-epoch ExponentialLR (train.py:104-105, 295-296)
        lr = cfg.learning_rate * (cfg.lr_decay ** epoch)
        state = state._replace(
            opt_g_state=v2w.set_learning_rate(state.opt_g_state, lr),
            opt_d_state=v2w.set_learning_rate(state.opt_d_state, lr),
        )
        for batch in batches():
            start_b = time.time()
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, batch, sub)

            if steps % args.stdout_interval == 0:
                print(
                    "Steps : {:d}, Gen Loss Total : {:4.3f}, Mel-Spec. Error : "
                    "{:4.3f}, s/b : {:4.3f}".format(
                        steps, float(metrics["gen_loss_total"]),
                        float(metrics["mel_spec_error"]), time.time() - start_b,
                    )
                )
            if steps % cfg.save_step == 0 and steps != 0:
                path = os.path.join(cfg.checkpoint_path, f"state_{steps:08d}")
                ckpt.save_checkpoint(path, jax.device_get(state))
            if steps % cfg.log_step == 0:
                logger.add_scalar("training/gen_loss_total",
                                  float(metrics["gen_loss_total"]), steps)
                logger.add_scalar("training/mel_spec_error",
                                  float(metrics["mel_spec_error"]), steps)
            if steps % cfg.val_step == 0 and steps != 0:
                validate(models, cfg, state, validset, logger, steps,
                         mesh=mesh, val_fn=val_fn)
            steps += 1
            if args.max_steps and steps >= args.max_steps:
                # final checkpoint on bounded runs (save_step may not divide)
                if (steps - 1) % cfg.save_step != 0:
                    path = os.path.join(
                        cfg.checkpoint_path, "state_{:08d}".format(steps)
                    )
                    ckpt.save_checkpoint(path, jax.device_get(state))
                logger.flush()
                return state
        print("Time taken for epoch {} is {} sec\n".format(
            epoch + 1, int(time.time() - start)))
    logger.flush()
    return state


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="",
                        help="Vec2WavConfig json (e.g. data/demo/vec2wav.json)")
    parser.add_argument("--group_name", default=None)
    parser.add_argument("--input_wavs_dir", default="LJSpeech-1.1/wavs")
    parser.add_argument("--input_mels_dir", default="ft_dataset")
    parser.add_argument("--training_epochs", default=100, type=int)
    parser.add_argument("--stdout_interval", default=50, type=int)
    parser.add_argument("--validation_interval", default=1000, type=int)
    parser.add_argument("--fine_tuning", default=False, type=bool)
    parser.add_argument("--max_steps", type=int, default=0)
    parser.add_argument("--num_workers", type=int, default=4,
                        help="threads loading items within a batch "
                        "(reference DataLoader num_workers=8 analog)")
    parser.add_argument("--prefetch", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="overlap host batch assembly with the device "
                        "step (--no-prefetch for synchronous)")
    return parser.parse_args(argv)


if __name__ == "__main__":
    main(parse_args())
