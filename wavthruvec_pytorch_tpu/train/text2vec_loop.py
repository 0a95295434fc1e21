"""Text2Vec end-to-end training loop (reference: text2vec/train.py:199-455).

Mirrors the reference CLI:
    python -m wavthruvec_pytorch_tpu.train.text2vec_loop \
        --restore_step 0 [--frozen_learning_rate --learning_rate_frozen 1e-3]

Flow: RAM buffer -> length-bucketed loader -> jitted train step (forward incl
on-device MAS, 4-term loss, LAMB) -> TB scalars every iter, alignment images
+ text log every log_step, orbax checkpoint every save_step, resume via
--restore_step.
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
from wavthruvec_pytorch_tpu.config import Text2VecConfig, save_config
from wavthruvec_pytorch_tpu.data.dataset import BucketedLoader, load_buffer
from wavthruvec_pytorch_tpu.data.prefetch import prefetched
from wavthruvec_pytorch_tpu.parallel import (
    globalize_state,
    local_batch_size,
    maybe_distributed_init,
    mesh_for_batch,
    shard_batch,
)
from wavthruvec_pytorch_tpu.text import TextFrontend
from wavthruvec_pytorch_tpu.train import text2vec_train as t2v
from wavthruvec_pytorch_tpu.utils.logging import StepTimer, host_logger
from wavthruvec_pytorch_tpu.utils.plots import plot_alignment_to_numpy


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def make_val_fn(model, mesh=None):
    """Jitted eval-mode forward + losses (one dispatch per val batch; the
    eager per-op path costs minutes per validation through a TPU tunnel).

    With a ``mesh``, the batch is sharded over the data axis and the state
    is replicated — host-sharded validation: under multi-process training
    each host's val loader holds its own filelist shard (load_buffer ->
    process_shard), the global batch is assembled per-host by shard_batch,
    and the returned scalars are replicated global-batch means.  Without
    this the plain jit would reject the globally-replicated train state
    (non-addressable arrays on other hosts)."""
    from wavthruvec_pytorch_tpu.models.losses import (
        attention_binarization_loss,
        dnn_loss,
    )

    def val_fn(params, batch_stats, batch):
        outputs = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["text"], batch["src_pos"], batch["feat_target"],
            batch["input_lengths"], batch["output_lengths"], batch["feat_pos"],
            attn_prior=batch["attn_prior"], deterministic=True, train_bn=False,
        )
        w, p, d = dnn_loss(
            outputs["feat_output"], outputs["feat_postnet_output"],
            batch["feat_target"], outputs["duration_predictor_output"],
            outputs["duration"],
        )
        b = attention_binarization_loss(outputs["attn"], outputs["attn_soft"])
        return {"WVF_loss": w, "WVF_postnet_loss": p,
                "duration_loss": d, "binarization_loss": b}

    if mesh is None:
        return jax.jit(val_fn)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    batch_shardings = {
        "text": data, "src_pos": data, "feat_target": data,
        "input_lengths": data, "output_lengths": data, "feat_pos": data,
        "attn_prior": data,
    }
    return jax.jit(val_fn, in_shardings=(repl, repl, batch_shardings),
                   out_shardings=repl)


def compute_validation_loss(model, cfg, state, val_loader, logger, iteration,
                            val_fn=None, mesh=None):
    """Eval-mode forward + losses over the val set (reference:
    text2vec/train.py:80-196 — defined there, call commented out).

    Averages over FINITE batches and reports non-finite ones separately
    (``val/nonfinite_batches``) instead of letting one bad batch poison the
    epoch mean.  A batch can go non-finite with perfectly healthy training:
    eval-mode BatchNorm runs on running statistics, and LAMB grows the
    scale-invariant pre-BN conv weights (train-mode BN renormalizes each
    batch, so the loss never sees the growth) until an outlier item's
    activations amplify through the ECAPA Res2Net trunk and overflow f32 —
    observed on the demo corpus, mechanism documented in BENCH_NOTES.md;
    the reference's torch eval path has the same fragility."""
    import math

    if val_fn is None:
        val_fn = make_val_fn(model, mesh=mesh)
    totals, n, bad = {}, 0, 0
    for batch in val_loader.epoch():
        batch.pop("audiopaths", None)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        losses = {k: float(v)
                  for k, v in val_fn(state.params, state.batch_stats, batch).items()}
        if all(math.isfinite(v) for v in losses.values()):
            for k, v in losses.items():
                totals[k] = totals.get(k, 0.0) + v
            n += 1
        else:
            bad += 1
    if n:
        for k, v in totals.items():
            logger.add_scalar(f"val/{k}", v / n, iteration)
    logger.add_scalar("val/nonfinite_batches", bad, iteration)
    if bad:
        print(f"validation: {bad} non-finite batch(es) at step {iteration} "
              "(eval-mode BN overflow — see compute_validation_loss docstring)")
    out = {k: v / max(n, 1) for k, v in totals.items()}
    out["nonfinite_batches"] = bad
    return out


def main(args: Optional[argparse.Namespace] = None, cfg: Optional[Text2VecConfig] = None):
    if args is None:
        args = parse_args([])
    if cfg is None:
        if getattr(args, "config", None):
            from wavthruvec_pytorch_tpu.config import load_config

            cfg = load_config(Text2VecConfig, args.config)
        else:
            cfg = Text2VecConfig()
        if os.path.exists(cfg.vocab_path):
            cfg = cfg.with_vocab_from_file(cfg.vocab_path)

    maybe_distributed_init()
    print("Use Text2Vec (TPU-native)")
    frontend = TextFrontend.from_vocab_file(cfg.vocab_path)
    buffer = load_buffer(list(cfg.train_list), cfg, frontend)
    loader = BucketedLoader(
        buffer, cfg, seed=args.seed, batch_size=local_batch_size(cfg.batch_size)
    )

    mesh = mesh_for_batch(cfg.batch_size)
    if mesh is not None:
        print(f"data-parallel mesh over {mesh.devices.size} devices")

    # init from the first batch (defines shapes only; jit recompiles per bucket)
    first = next(loader.epoch())
    first.pop("audiopaths", None)
    first_j = {k: jnp.asarray(v) for k, v in first.items()}
    model, state = t2v.init_state(cfg, jax.random.PRNGKey(args.seed), first_j)
    print("Number of TTS Parameters:", count_params(state.params))

    # two step variants: the lean one (metrics only) runs on the 999/1000
    # non-log iterations; the viz one additionally returns the first item's
    # attention maps for the TB images emitted every log_step
    step_fn, _ = t2v.make_train_step(model, cfg, mesh=mesh, with_viz=False)
    step_fn_viz, _ = t2v.make_train_step(model, cfg, mesh=mesh)
    # (single-process only: under multi-process the step consumes the
    # GLOBALIZED state, whose layout exists only after restore+globalize)
    if args.precompile and jax.process_count() == 1:
        # AOT-compile BOTH step programs for the first batch's bucket shape
        # before training starts.  Without this the viz variant compiles on
        # its first log_step iteration — a multi-minute mid-training stall
        # at long buckets that also poisons steady-rate estimates (measured:
        # the dense N768/T3072 program's compile landed inside the 100-step
        # run's second half and read as ~1.5 s/step of phantom overhead).
        # lower().compile() executes nothing, so donated args are safe.
        t0c = time.perf_counter()
        rng0 = jax.random.key(0, impl=cfg.dropout_prng_impl)
        step_fn.lower(state, first_j, rng0).compile()
        step_fn_viz.lower(state, first_j, rng0).compile()
        print(f"precompiled lean+viz step programs in "
              f"{time.perf_counter() - t0c:.1f}s")
    if args.frozen_learning_rate:
        state = t2v.set_learning_rate(state, args.learning_rate_frozen)

    # resume (reference: --restore_step + checkpoint_{step}, train.py:237-248)
    iteration = args.restore_step
    if args.restore_step > 0:
        path = os.path.join(cfg.checkpoint_path, f"checkpoint_{args.restore_step}")
        try:
            state = ckpt.restore_checkpoint(path, state)
            print(f"\n---Model Restored at Step {args.restore_step}---\n")
        except Exception as e:
            print(f"\n---Start New Training--- (restore failed: {e})\n")
            iteration = 0
    # multi-process: lift the host-local state to global replicated arrays
    # (the jitted step's in_shardings span every process's devices)
    state = globalize_state(state, mesh)

    os.makedirs(cfg.checkpoint_path, exist_ok=True)
    save_config(cfg, os.path.join(cfg.run_path, cfg.log_seed, "config.json"))
    logger = host_logger(cfg.tensorboard_logs_path, cfg.logger_path)
    timer = StepTimer()

    # validation loader (reference defines compute_validation_loss but leaves
    # the call commented, text2vec/train.py:434-440; here it's live behind
    # --validate, mirroring the vocoder loop's live validation)
    val_loader = None
    if args.validate:
        val_lists = [p for p in cfg.val_list if os.path.exists(p)]
        if val_lists:
            import dataclasses as _dc

            # load_buffer process-shards the val list, so under multi-process
            # each host validates its own shard at the local batch size and
            # val_fn's mesh shardings make the reported scalars global-batch
            # means (host-sharded validation)
            val_buffer = load_buffer(val_lists, cfg, frontend)
            # expand=1 so small val sets still yield batches (a super-batch
            # of batch_size*expand items would drop a val set smaller than it)
            val_cfg = _dc.replace(cfg, batch_expand_size=1)
            val_loader = BucketedLoader(
                val_buffer, val_cfg, seed=args.seed, shuffle=False,
                batch_size=local_batch_size(cfg.batch_size),
            )
            val_fn = make_val_fn(model, mesh=mesh)
            if len(val_loader) == 0:
                print(f"validation set too small for batch {cfg.batch_size}")
        else:
            print(f"--validate set but no val list found at {cfg.val_list}")

    total_step = cfg.epochs * len(loader)
    print("\ntotal steps:", total_step, "len(loader)", len(loader), "\n")
    # typed key so cfg.dropout_prng_impl selects the in-step mask generator
    # ("rbg" routes dropout masks through the TPU hardware RNG)
    rng = jax.random.key(args.seed + 1, impl=cfg.dropout_prng_impl)
    start_time = time.perf_counter()

    # Batched deferred metrics emit: each float(metrics[k]) is a full D2H
    # round trip, and on a tunneled chip 5-per-step round trips inflated the
    # long-bucket production loop to ~2.5 s/step vs a 0.5 s chained step
    # (BENCH_NOTES.md "Long-bucket production loop", round-4 VERDICT ask #1).
    # Instead the step packs its 5 scalars into ONE [5] f32 buffer
    # (metrics["scalars"], text2vec_train.SCALAR_KEYS order); the loop holds
    # K of those device buffers and fetches them as a single stacked [K, 5]
    # transfer every --metric_flush_steps (and at every log_step boundary so
    # the text log/images stay prompt).  TB content is unchanged — still one
    # point per step — only the transfer count drops K*5-fold.
    import functools

    pend = []

    @functools.lru_cache(maxsize=None)
    def _stacker(k):
        return jax.jit(lambda *xs: jnp.stack(xs))

    def emit_one(p, row):
        it, ep = p["it"], p["epoch"]
        if it % args.scalar_log_step == 0:
            for tag, v in zip(t2v.SCALAR_KEYS, row):
                logger.add_scalar(f"train/{tag}", float(v), it)

        if it % cfg.log_step == 0:
            elapsed = time.perf_counter() - start_time
            logger.text(
                f"Epoch [{ep + 1}/{cfg.epochs}], Step [{it}/{total_step}]:",
                "W2V Feat Loss: {:.4f}, PostNet Loss: {:.4f}, attn_bin: {:.4f};".format(
                    float(row[1]), float(row[2]), float(row[4]),
                ),
                # lr captured at dispatch time (the pre-step state's value):
                # reading the live closure state here would both block on the
                # just-dispatched step (re-adding the sync the deferral
                # removes) and log the NEXT step's lr under any lr schedule
                "Current Learning Rate is {:.6f}.".format(float(p["lr"])),
                "Time Used: {:.3f}s, Estimated Remaining: {:.3f}s.".format(
                    elapsed, (total_step - it) * timer.mean
                ),
            )
            if jax.process_count() == 1 and p["viz"] is not None:
                audiopaths = p["audiopaths"]
                name = os.path.basename(audiopaths[0]) if audiopaths else ""
                soft = np.asarray(p["viz"]["attn_soft_0"])[
                    :p["log_out_len"], :p["log_in_len"]].T
                hard = np.asarray(p["viz"]["attn_hard_0"])[
                    :p["log_out_len"], :p["log_in_len"]].T
                logger.add_image(
                    "train/attention_weights(align_soft)",
                    plot_alignment_to_numpy(soft, title=name), it)
                logger.add_image(
                    "train/attention_weights_mas(align_hard)",
                    plot_alignment_to_numpy(hard, title=name), it)

    def flush():
        if not pend:
            return
        # one program dispatch + ONE [K, 5] transfer for K steps of scalars
        rows = np.asarray(_stacker(len(pend))(*[p["scalars"] for p in pend]))
        for p, row in zip(pend, rows):
            emit_one(p, row)
        pend.clear()

    # try/finally: on ANY exit (clean, max_steps, crash, interrupt) the last
    # completed step's deferred logs are emitted and the logger flushed —
    # without it a crash silently drops the final step's scalars/images.
    # Note the deferral shifts log-line ORDER: step i's text log appears
    # after step i's checkpoint/validation messages (content is unchanged).
    # HBM-resident dataset (data/device_cache.py): stage the corpus
    # on-device once (flat ragged layout, zero padding waste); per-step H2D
    # shrinks from ~full-batch to a [B] index vector.  Composes with a
    # single-process mesh (batches come out sharded P("data"), matching the
    # sharded step's in_shardings); multi-PROCESS keeps the host path —
    # each host's buffer is a filelist shard and the global batch must be
    # assembled from per-host slices (shard_batch).
    device_data = None
    if cfg.device_resident_data:
        if jax.process_count() == 1:
            from wavthruvec_pytorch_tpu.data.device_cache import (
                DeviceResidentData,
            )

            device_data = DeviceResidentData(loader.buffer, cfg, mesh=mesh)
            print(f"device-resident dataset: "
                  f"{device_data.nbytes() / 2**20:.0f} MB staged in HBM"
                  + (" (replicated over mesh)" if mesh is not None else ""))
        else:
            print("device_resident_data ignored (multi-process run)")

    def batches(epoch_iter):
        if device_data is None:
            for b in prefetched(epoch_iter(), depth=2, enabled=args.prefetch):
                yield b.pop("audiopaths"), b
        else:
            for idx in loader.epoch_indices():
                b = device_data.batch(idx, pad_to_max=loader.pad_to_max)
                yield device_data.batch_audiopaths(idx), b

    try:
        for epoch in range(cfg.epochs):
            for audiopaths, batch in batches(loader.epoch):
                # host-side copies for logging, read ONLY on log iterations:
                # they are used solely to slice the attention images, and in
                # device-resident mode int(...) is a blocking device read
                # (sharded device arrays are also not addressable across
                # hosts under multi-process training)
                if (iteration + 1) % cfg.log_step == 0:
                    log_in_len = int(batch["input_lengths"][0])
                    log_out_len = int(batch["output_lengths"][0])
                else:
                    log_in_len = log_out_len = 0
                if device_data is None:
                    batch = {k: jnp.asarray(v) for k, v in batch.items()}
                    if mesh is not None:
                        batch = shard_batch(batch, mesh)
                # (device-resident batches are already sharded P("data")
                # by the gather's out_shardings when a mesh is active)
                rng, sub = jax.random.split(rng)
                # the lr this step applies = the PRE-step state's value.  The
                # step donates its state arg, so the raw leaf is DELETED once
                # the step is dispatched — copy it into a fresh buffer (async,
                # never blocks), and only on iterations whose emit will
                # actually print the text log (no per-step extra dispatch).
                lr_ref = None
                is_log_step = (iteration + 1) % cfg.log_step == 0
                if is_log_step:
                    lr_ref = jnp.add(
                        state.opt_state.hyperparams["learning_rate"], 0.0)
                # profiling hook (aux subsystem the reference lacks, SURVEY.md §5)
                if args.profile_dir and iteration == 3:
                    jax.profiler.start_trace(args.profile_dir)
                state, metrics = (step_fn_viz if is_log_step else step_fn)(
                    state, batch, sub)
                if args.profile_dir and iteration == 8:
                    jax.profiler.stop_trace()
                iteration += 1
                timer.tick()

                pend.append({
                    "it": iteration, "epoch": epoch,
                    "scalars": metrics["scalars"],
                    "audiopaths": audiopaths,
                    "log_in_len": log_in_len, "log_out_len": log_out_len,
                    "lr": lr_ref,
                    "viz": ({"attn_soft_0": metrics["attn_soft_0"],
                             "attn_hard_0": metrics["attn_hard_0"]}
                            if is_log_step else None),
                })
                if len(pend) >= args.metric_flush_steps or is_log_step:
                    flush()

                if iteration % cfg.save_step == 0:
                    path = os.path.join(cfg.checkpoint_path, f"checkpoint_{iteration}")
                    ckpt.save_checkpoint(path, jax.device_get(state))
                    print(f"save model at step {iteration} ...")

                if val_loader is not None and iteration % cfg.val_step == 0:
                    vals = compute_validation_loss(
                        model, cfg, state, val_loader, logger, iteration,
                        val_fn=val_fn, mesh=mesh,
                    )
                    logger.text(
                        f"Validation at step {iteration}: "
                        + ", ".join(f"{k}: {v:.4f}" for k, v in vals.items())
                    )

                if args.max_steps and iteration >= args.max_steps:
                    return state
    finally:
        try:  # best effort: never mask the original exception
            flush()
        except Exception:
            pass
        logger.flush()
    return state


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="",
                        help="Text2VecConfig json (e.g. data/demo/text2vec.json)")
    parser.add_argument("--restore_step", type=int, default=0)
    parser.add_argument("--frozen_learning_rate", type=bool, default=False)
    parser.add_argument("--learning_rate_frozen", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max_steps", type=int, default=0)
    parser.add_argument("--scalar_log_step", type=int, default=1)
    parser.add_argument("--metric_flush_steps", type=int, default=20,
                        help="fetch the per-step scalar metrics from the "
                        "device in ONE stacked transfer every this many "
                        "steps (D2H round trips are the long-bucket loop's "
                        "bottleneck on tunneled chips; TB still gets one "
                        "point per step)")
    parser.add_argument("--profile_dir", type=str, default="",
                        help="capture a jax.profiler trace of steps 3-8")
    parser.add_argument("--precompile", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="AOT-compile the lean AND viz step programs for "
                        "the first batch's shape before training (avoids a "
                        "multi-minute stall at the first log_step iteration "
                        "on long buckets)")
    parser.add_argument("--prefetch", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="overlap host batch assembly (padding, prior "
                        "lookup) with the device step")
    parser.add_argument("--validate", action="store_true",
                        help="run validation every cfg.val_step steps "
                        "(reference's compute_validation_loss, call commented "
                        "there — text2vec/train.py:434-440)")
    return parser.parse_args(argv)


if __name__ == "__main__":
    main(parse_args())
