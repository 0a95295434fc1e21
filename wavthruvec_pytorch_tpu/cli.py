"""Unified CLI mirroring the reference entry points (train.sh:1-2,
prepare_data.py, vec2wav/pre_spk_emb.py, text2vec/eval.py):

    python -m wavthruvec_pytorch_tpu.cli train-text2vec [--restore_step N ...]
    python -m wavthruvec_pytorch_tpu.cli train-vec2wav  [--training_epochs N ...]
    python -m wavthruvec_pytorch_tpu.cli eval-text2vec  [--step N --alpha A ...]
    python -m wavthruvec_pytorch_tpu.cli prepare-data   [--wavs_path ... ]
    python -m wavthruvec_pytorch_tpu.cli pre-spk-emb    [--wavs_root ...]
    python -m wavthruvec_pytorch_tpu.cli synthesize     --text "..." [...]
    python -m wavthruvec_pytorch_tpu.cli make-demo-data [--root ./data/demo]
    python -m wavthruvec_pytorch_tpu.cli serve          --spk_emb_dir ... (stdin loop)
    python -m wavthruvec_pytorch_tpu.cli serve-http     --spk_emb_dir ... [--port 8571]
    python -m wavthruvec_pytorch_tpu.cli export-torch   --stage t2v|v2w --checkpoint ...
    python -m wavthruvec_pytorch_tpu.cli recalibrate-bn --t2v_checkpoint ... --filelist ...
    python -m wavthruvec_pytorch_tpu.cli recalibrate-bn --generator_checkpoint ... --filelist ...
"""

from __future__ import annotations

import argparse
import os
import sys


def _honor_jax_platforms():
    """Some environments force-register accelerator plugins regardless of
    ``JAX_PLATFORMS``; apply the env var through jax.config so
    ``JAX_PLATFORMS=cpu`` reliably pins the CLI to CPU."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def main(argv=None):
    _honor_jax_platforms()
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(__doc__)
        return 1
    cmd, rest = argv[0], argv[1:]

    if cmd == "train-text2vec":
        from wavthruvec_pytorch_tpu.train import text2vec_loop

        text2vec_loop.main(text2vec_loop.parse_args(rest))  # returns the state
        return 0
    if cmd == "train-vec2wav":
        from wavthruvec_pytorch_tpu.train import vec2wav_loop

        vec2wav_loop.main(vec2wav_loop.parse_args(rest))
        return 0
    if cmd == "eval-text2vec":
        from wavthruvec_pytorch_tpu.infer import eval as t2v_eval

        return t2v_eval.main(t2v_eval.parse_args(rest))
    if cmd == "prepare-data":
        return _prepare_data(rest)
    if cmd == "pre-spk-emb":
        return _pre_spk_emb(rest)
    if cmd == "synthesize":
        return _synthesize(rest)
    if cmd == "make-demo-data":
        return _make_demo_data(rest)
    if cmd == "serve":
        return _serve(rest)
    if cmd == "serve-http":
        return _serve_http(rest)
    if cmd == "export-torch":
        return _export_torch(rest)
    if cmd == "recalibrate-bn":
        return _recalibrate_bn(rest)
    print(f"unknown command: {cmd}\n{__doc__}")
    return 1


def _parse_filelist(path, max_items):
    """Parse ``npy|text|spk`` rows (reference filelist format,
    prepare_data.py:90-93) tolerating '|' inside the text field: first field
    is the npy path, last is the speaker, everything between is the text.
    Raises with the offending line number on malformed rows."""
    rows = []
    with open(path, "r", encoding="utf-8") as f:
        for lineno, line in enumerate(f, 1):
            line = line.strip()
            if not line:
                continue
            parts = line.split("|")
            if len(parts) < 3:
                raise ValueError(
                    f"{path}:{lineno}: expected 'npy|text|spk' "
                    f"(>=3 |-separated fields), got {len(parts)}: {line!r}")
            rows.append((parts[0], "|".join(parts[1:-1]), parts[-1]))
            if len(rows) >= max_items:
                break
    return rows


def _recalibrate_bn(rest):
    """Re-estimate a checkpoint's BN running statistics from calibration
    data and write a recalibrated checkpoint.  Fixes the eval-mode BN
    overflow a long-trained checkpoint can hit on outlier inputs
    (BENCH_NOTES "Val-NaN root cause"; the reference's ``model.eval()``
    path, text2vec/eval.py:24, has the same exposure and no fix).
    Train-mode math is unchanged.

    Works on either stage: ``--t2v_checkpoint`` refreshes Text2Vec's
    ECAPA/CBHG BN stats; ``--generator_checkpoint`` refreshes the Vec2Wav
    Generator's Conditional-BN stats (vec2wav/modules.py:5-30 analog)."""
    import numpy as np

    from wavthruvec_pytorch_tpu import checkpoint as ckpt
    from wavthruvec_pytorch_tpu.config import (
        Text2VecConfig,
        Vec2WavConfig,
        load_config,
    )
    from wavthruvec_pytorch_tpu.infer.recalibrate import (
        recalibrate_generator_bn,
        recalibrate_text2vec_bn,
        text2vec_calibration_batches,
    )
    from wavthruvec_pytorch_tpu.infer.synthesize import init_import_models

    p = argparse.ArgumentParser()
    p.add_argument("--t2v_checkpoint", default="",
                   help="Text2Vec orbax checkpoint dir or reference .pth.tar")
    p.add_argument("--generator_checkpoint", default="",
                   help="Vec2Wav Generator orbax dir or reference g_XXXXXXXX")
    p.add_argument("--filelist", required=True,
                   help="npy|text|spk calibration lines (e.g. the val list)")
    p.add_argument("--feat_root", default="",
                   help="root for the filelist's npy paths")
    p.add_argument("--config", default="",
                   help="config JSON for the selected stage")
    p.add_argument("--vocab_path", default="./data/vocab.txt")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_items", type=int, default=128)
    p.add_argument("--max_frames", type=int, default=0,
                   help="t2v infer frame cap (default: largest frame bucket)")
    p.add_argument("--spk_emb_dir", default="",
                   help="generator mode: dir of per-speaker {spk}.npy/.pth "
                        "embeddings (vec2wav/pre_spk_emb.py output format)")
    p.add_argument("--gen_frames", type=int, default=400,
                   help="generator mode: latent frames per calibration row "
                        "(rows are cropped; shorter rows are skipped)")
    p.add_argument("--seed", type=int, default=1234,
                   help="generator mode: CBN noise seed")
    p.add_argument("--out", required=True, help="output orbax checkpoint dir")
    a = p.parse_args(rest)
    if bool(a.t2v_checkpoint) == bool(a.generator_checkpoint):
        p.error("pass exactly one of --t2v_checkpoint / --generator_checkpoint")

    rows = _parse_filelist(a.filelist, a.max_items)

    def featpath(npy):
        return os.path.join(a.feat_root, npy) if a.feat_root else npy

    if a.t2v_checkpoint:
        from wavthruvec_pytorch_tpu.models import Text2Vec
        from wavthruvec_pytorch_tpu.text import TextFrontend

        cfg = (load_config(Text2VecConfig, a.config) if a.config
               else Text2VecConfig().with_vocab_from_file(a.vocab_path))
        frontend = TextFrontend.from_vocab_file(
            a.config and cfg.vocab_path or a.vocab_path)
        t2v, t2v_vars, _, _ = init_import_models(
            cfg, Vec2WavConfig(), t2v_checkpoint=a.t2v_checkpoint)
        items = [
            (text, np.load(featpath(npy)).squeeze().astype(np.float32))
            for npy, text, _spk in rows
        ]
        batches = text2vec_calibration_batches(
            frontend, cfg, items, batch_size=a.batch_size)
        new_vars = recalibrate_text2vec_bn(
            t2v, t2v_vars, batches,
            max_frames=a.max_frames or cfg.frame_buckets[-1])
        ckpt.save_checkpoint(a.out, {"params": new_vars["params"],
                                     "batch_stats": new_vars["batch_stats"]})
        print(f"recalibrated Text2Vec BN stats over {len(items)} items "
              f"({len(batches)} batches) -> {a.out}")
        return 0

    # --- generator (Conditional-BN) path -----------------------------------
    import jax
    import jax.numpy as jnp

    from wavthruvec_pytorch_tpu.data.vocoder_data import load_spk_emb
    from wavthruvec_pytorch_tpu.models import Generator

    v2w_cfg = (load_config(Vec2WavConfig, a.config) if a.config
               else Vec2WavConfig())
    # construct the Generator directly (init_import_models would also build
    # a full-size Text2Vec this command never uses); checkpoint-type
    # detection matches it: dir = orbax, file = reference g_XXXXXXXX pickle
    gen = Generator(v2w_cfg)
    gen_vars = gen.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, v2w_cfg.n_feat_dim)),
        jnp.zeros((1, v2w_cfg.spk_dim)), jnp.zeros((1, v2w_cfg.noise_dim)),
        train=False,
    )
    if os.path.isdir(a.generator_checkpoint):
        gen_vars = ckpt.restore_checkpoint(a.generator_checkpoint, gen_vars)
    else:
        sd = ckpt.load_torch_state_dict(a.generator_checkpoint,
                                        key="generator")
        gen_vars = ckpt.import_vec2wav_generator(sd, v2w_cfg)

    def spk_vec(spk):
        d = a.spk_emb_dir or v2w_cfg.spk_emb_path
        for ext in (".npy", ".pth"):
            path = os.path.join(d, spk + ext)
            if os.path.exists(path):
                return load_spk_emb(path).reshape(-1)[: v2w_cfg.spk_dim]
        raise FileNotFoundError(
            f"no speaker embedding {spk}.npy/.pth under {d!r} "
            "(--spk_emb_dir)")

    F = a.gen_frames
    keep, skipped = [], 0
    for npy, _text, spk in rows:
        lat = np.load(featpath(npy)).squeeze().astype(np.float32)
        if lat.shape[0] < F:
            skipped += 1
            continue
        keep.append((lat[:F], spk_vec(spk)))
    if skipped:
        print(f"skipped {skipped} rows shorter than --gen_frames={F}")
    if not keep:
        raise ValueError(
            f"no calibration rows with >= {F} frames; lower --gen_frames")
    noise_key = jax.random.PRNGKey(a.seed)
    batches = []
    for i in range(0, len(keep), a.batch_size):
        chunk = keep[i : i + a.batch_size]
        noise_key, sub = jax.random.split(noise_key)
        batches.append((
            np.stack([lat for lat, _ in chunk]),
            np.stack([emb for _, emb in chunk]).astype(np.float32),
            np.asarray(jax.random.normal(
                sub, (len(chunk), v2w_cfg.noise_dim)), np.float32),
        ))
    new_vars = recalibrate_generator_bn(gen, gen_vars, batches)
    out_tree = {"params": new_vars["params"],
                "batch_stats": new_vars["batch_stats"]}
    if "spectral" in new_vars:
        out_tree["spectral"] = new_vars["spectral"]
    ckpt.save_checkpoint(a.out, out_tree)
    print(f"recalibrated Generator CBN stats over {len(keep)} items "
          f"({len(batches)} batches) -> {a.out}")
    return 0


def _export_torch(rest):
    """Export a native (orbax) training checkpoint into the reference's
    torch formats — the inverse of the torch importers, so TPU-trained
    weights can be consumed by reference tooling:

    * t2v: ``checkpoint_{step}.pth.tar`` = {model, optimizer, learning_rate,
      epoch} (reference text2vec/train.py:426-432).  The ECAPA
      ``torchfbank.*`` buffers are init-time constants the reference module
      recreates; load with ``model.load_state_dict(sd, strict=False)``.
    * v2w: ``g_{step:08d}`` {generator} + ``do_{step:08d}``
      {mpd, msd, optim_g, optim_d, steps, epoch}
      (reference vec2wav/train.py:227-238); both load strict.

    Optimizer moments are native optax state and are not translated; the
    exported optimizer dicts carry the param_groups (with lr) and empty
    state, which torch restores as a fresh optimizer at that lr."""
    from wavthruvec_pytorch_tpu import checkpoint as ckpt
    from wavthruvec_pytorch_tpu.config import (
        Text2VecConfig,
        Vec2WavConfig,
        load_config,
    )

    p = argparse.ArgumentParser()
    p.add_argument("--stage", required=True, choices=("t2v", "v2w"))
    p.add_argument("--checkpoint", required=True,
                   help="orbax checkpoint dir (t2v: .../checkpoint_{step}; "
                   "v2w: .../state_{step:08d})")
    p.add_argument("--config", default="", help="stage config JSON")
    p.add_argument("--out", default="",
                   help="t2v: output file (default checkpoint_{step}.pth.tar "
                   "next to the input); v2w: output dir (default the input's "
                   "parent)")
    p.add_argument("--step", type=int, default=-1,
                   help="step for the output name (default: parsed from the "
                   "checkpoint name)")
    a = p.parse_args(rest)

    raw = ckpt.restore_checkpoint(a.checkpoint, target=None)
    step = a.step if a.step >= 0 else max(ckpt.checkpoint_step(a.checkpoint), 0)
    if a.stage == "t2v":
        cfg = load_config(Text2VecConfig, a.config) if a.config else Text2VecConfig()
        out = a.out or os.path.join(
            os.path.dirname(os.path.abspath(a.checkpoint)),
            f"checkpoint_{step}.pth.tar")
        variables = {"params": raw["params"], "batch_stats": raw["batch_stats"]}
        ckpt.save_reference_text2vec(
            out, variables, cfg, epoch=int(raw.get("epoch", 0) or 0))
        print(f"wrote {out}")
    else:
        cfg = load_config(Vec2WavConfig, a.config) if a.config else Vec2WavConfig()
        out_dir = a.out or os.path.dirname(os.path.abspath(a.checkpoint))
        gen_vars = {
            "params": raw["gen_params"],
            "batch_stats": raw["gen_batch_stats"],
            "spectral": raw["gen_spectral"],
        }
        mpd_vars = {"params": raw["disc_params"]["mpd"]}
        msd_vars = {"params": raw["disc_params"]["msd"],
                    "spectral": raw["msd_spectral"]}
        ckpt.save_reference_vec2wav(
            out_dir, step, gen_vars, cfg, mpd_vars=mpd_vars, msd_vars=msd_vars)
        print(f"wrote {out_dir}/g_{step:08d} and {out_dir}/do_{step:08d}")
    return 0


def _serving_parser():
    """Flags shared by the stdin (``serve``) and HTTP (``serve-http``)
    serving front ends."""
    p = argparse.ArgumentParser()
    p.add_argument("--spk_emb_dir", required=True)
    p.add_argument("--ref_feat_dir", default=None,
                   help="{spk}/*.npy wav2vec reference clips for t2v "
                   "conditioning (cached per speaker)")
    p.add_argument("--t2v_config", default="",
                   help="Text2VecConfig JSON (e.g. data/demo/text2vec_tiny.json)")
    p.add_argument("--v2w_config", default="",
                   help="Vec2WavConfig JSON (e.g. data/demo/vec2wav_tiny.json)")
    p.add_argument("--t2v_checkpoint", default=None)
    p.add_argument("--gen_checkpoint", default=None)
    p.add_argument("--vocab_path", default="./data/vocab.txt")
    p.add_argument("--out_dir", default="./serve_out")
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--max_frames", type=int, default=0)
    p.add_argument("--speaker", default=None, help="default speaker id")
    p.add_argument("--warmup", action="store_true",
                   help="pre-compile all text buckets before serving")
    p.add_argument("--max_batch", type=int, default=1,
                   help="coalesce up to N queued requests into one batched "
                   "synthesis call (responses keep request order)")
    p.add_argument("--coalesce_wait_ms", type=float, default=0.0,
                   help="after the first queued request, wait up to this "
                   "long for more before dispatching (0 = dispatch "
                   "immediately with whatever is queued — the measured "
                   "best at every load level: backlog already forms "
                   "large batches under load and a window only adds its "
                   "own latency; see BENCH_NOTES 'Serving load' grid)")
    p.add_argument("--pcm", action="store_true",
                   help="write raw int16 PCM to stdout (framed by control "
                   "lines) instead of wav files")
    p.add_argument("--stream_chunk", type=int, default=0,
                   help="with --pcm: emit audio in chunks of N latent frames "
                   "while later chunks compute (StreamingVocoder)")
    p.add_argument("--gen_precision", choices=("f32", "bf16"), default="f32",
                   help="vocoder serving precision: bf16 pre-folds weight "
                   "norm and stores/computes in bf16 (-12%% latency measured; "
                   "audio output stays f32)")
    p.add_argument("--gru_impl", choices=("scan", "pallas"), default=None,
                   help="CBHG biGRU recurrence: pallas keeps the hidden "
                   "weights VMEM-resident across steps (TPU; bf16-default-"
                   "precision numerics)")
    return p


def _build_serving_stack(a):
    """(synth, store) from parsed serving flags — shared model construction
    for both serving front ends."""
    import dataclasses

    from wavthruvec_pytorch_tpu.config import (
        Text2VecConfig,
        Vec2WavConfig,
        load_config,
    )
    from wavthruvec_pytorch_tpu.infer.serve import SpeakerStore
    from wavthruvec_pytorch_tpu.infer.synthesize import (
        Synthesizer,
        init_import_models,
        make_serving_generator,
    )
    from wavthruvec_pytorch_tpu.text import TextFrontend

    t2v_cfg = (load_config(Text2VecConfig, a.t2v_config) if a.t2v_config
               else Text2VecConfig().with_vocab_from_file(a.vocab_path))
    if a.gru_impl:
        t2v_cfg = dataclasses.replace(t2v_cfg, gru_impl=a.gru_impl)
    v2w_cfg = (load_config(Vec2WavConfig, a.v2w_config) if a.v2w_config
               else Vec2WavConfig())
    frontend = TextFrontend.from_vocab_file(
        a.t2v_config and t2v_cfg.vocab_path or a.vocab_path)

    _, t2v_vars, gen, gen_vars = init_import_models(
        t2v_cfg, v2w_cfg,
        t2v_checkpoint=a.t2v_checkpoint, gen_checkpoint=a.gen_checkpoint,
    )

    gen, gen_vars = make_serving_generator(v2w_cfg, gen_vars, a.gen_precision)
    synth = Synthesizer(t2v_cfg, v2w_cfg, t2v_vars, gen_vars, frontend, gen=gen)
    store = SpeakerStore(synth, a.spk_emb_dir, a.ref_feat_dir)
    return synth, store


def _serve(rest):
    """Long-running stdin->wav synthesis loop (infer/serve.py)."""
    from wavthruvec_pytorch_tpu.infer.serve import serve_loop

    a = _serving_parser().parse_args(rest)
    synth, store = _build_serving_stack(a)
    n = serve_loop(
        synth, store, a.out_dir, default_speaker=a.speaker, alpha=a.alpha,
        max_frames=a.max_frames or None, do_warmup=a.warmup,
        max_batch=a.max_batch, pcm=a.pcm,
        stream_chunk=a.stream_chunk or None,
        coalesce_wait_ms=a.coalesce_wait_ms,
    )
    print(f"served {n} requests", file=sys.stderr if a.pcm else sys.stdout)
    return 0


def _serve_http(rest):
    """HTTP synthesis server (infer/http_serve.py): POST /synthesize
    {"text", "speaker"?} -> audio/wav; queued requests coalesce into batched
    synthesis calls up to --max_batch."""
    from wavthruvec_pytorch_tpu.infer.http_serve import serve_http

    p = _serving_parser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8571)
    a = p.parse_args(rest)
    synth, store = _build_serving_stack(a)

    def ready(server, service):
        host, port = server.server_address[:2]
        print(f"serving on http://{host}:{port} "
              f"(speakers={len(store.speakers())}, max_batch={a.max_batch})",
              flush=True)

    n = serve_http(
        synth, store, host=a.host, port=a.port, default_speaker=a.speaker,
        alpha=a.alpha, max_frames=a.max_frames or None, max_batch=a.max_batch,
        do_warmup=a.warmup, ready_cb=ready,
        coalesce_wait_ms=a.coalesce_wait_ms,
    )
    print(f"served {n} requests")
    return 0


def _make_demo_data(rest):
    from wavthruvec_pytorch_tpu.data.demo import make_demo_data

    p = argparse.ArgumentParser()
    p.add_argument("--root", default="./data/demo")
    p.add_argument("--n_speakers", type=int, default=2)
    p.add_argument("--n_utts", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(rest)
    root = make_demo_data(a.root, a.n_speakers, a.n_utts, seed=a.seed)
    print(f"demo dataset written to {root}; smoke-run with:")
    print(f"  python -m wavthruvec_pytorch_tpu.cli train-text2vec "
          f"--config {root}/text2vec_tiny.json --max_steps 3")
    print(f"  python -m wavthruvec_pytorch_tpu.cli train-vec2wav "
          f"--config {root}/vec2wav_tiny.json --max_steps 3 --training_epochs 1")
    return 0


def _prepare_data(rest):
    from wavthruvec_pytorch_tpu.data.ingest import Wav2VecFeaturizer, prepare_data

    p = argparse.ArgumentParser()
    p.add_argument("--wavs_path", required=True)
    p.add_argument("--feat_output_path", required=True)
    p.add_argument("--label_file_path", required=True)
    p.add_argument("--enc_train_list_path", default="./data/enc_train.txt")
    p.add_argument("--enc_val_list_path", default="./data/enc_val.txt")
    p.add_argument("--vocab_path", default="./data/vocab.txt")
    p.add_argument("--model_path", default=None,
                   help="local HF wav2vec2 checkpoint dir")
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--n_speakers", type=int, default=15)
    p.add_argument("--n_files_per_speaker", type=int, default=40)
    p.add_argument("--batch_size", type=int, default=8)
    a = p.parse_args(rest)
    featurizer = Wav2VecFeaturizer(a.model_path, random_init=a.random_init)
    prepare_data(
        a.wavs_path, a.feat_output_path, a.label_file_path,
        a.enc_train_list_path, a.enc_val_list_path, a.vocab_path,
        featurizer, a.n_speakers, a.n_files_per_speaker, a.batch_size,
    )
    return 0


def _pre_spk_emb(rest):
    from wavthruvec_pytorch_tpu.data.spk_emb import precompute_speaker_embeddings

    p = argparse.ArgumentParser()
    p.add_argument("--wavs_root", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--n_files_per_speaker", type=int, default=50)
    p.add_argument(
        "--speechbrain_ckpt",
        default=None,
        help="path to the SpeechBrain spkrec-ecapa-voxceleb embedding_model.ckpt "
        "(torch state dict); selects the SpeechBrain-architecture embedder the "
        "reference actually uses (vec2wav/pre_spk_emb.py:12)",
    )
    a = p.parse_args(rest)
    embedder = None
    if a.speechbrain_ckpt is not None:
        from wavthruvec_pytorch_tpu.data.spk_emb import SpeechBrainEmbedder

        embedder = SpeechBrainEmbedder(torch_ckpt=a.speechbrain_ckpt)
    embs = precompute_speaker_embeddings(
        a.wavs_root, a.out_dir, embedder=embedder,
        n_files_per_speaker=a.n_files_per_speaker,
    )
    print(f"wrote {len(embs)} speaker embeddings to {a.out_dir}")
    return 0


def _synthesize(rest):
    import numpy as np

    from wavthruvec_pytorch_tpu.config import Text2VecConfig, Vec2WavConfig
    from wavthruvec_pytorch_tpu.infer.synthesize import Synthesizer, write_wav
    from wavthruvec_pytorch_tpu.text import TextFrontend

    p = argparse.ArgumentParser()
    p.add_argument("--text", action="append", required=True)
    p.add_argument("--ref_npy", required=True,
                   help="wav2vec .npy of the reference speaker")
    p.add_argument("--spk_emb", required=True, help=".npy/.pth speaker emb")
    p.add_argument("--t2v_checkpoint", default=None)
    p.add_argument("--gen_checkpoint", default=None)
    p.add_argument("--vocab_path", default="./data/vocab.txt")
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--out_dir", default="./results")
    p.add_argument("--fused", action="store_true",
                   help="fused Pallas resblock units (TPU inference fast path)")
    p.add_argument("--folded", action="store_true",
                   help="pre-fold weight norm (remove_weight_norm analog)")
    p.add_argument("--stream", action="store_true",
                   help="chunked vocoder inference (O(chunk) memory, "
                   "low time-to-first-audio; bit-equal to full forward)")
    p.add_argument("--chunk_frames", type=int, default=100)
    p.add_argument("--max_frames", type=int, default=0,
                   help="output frame cap (default: largest frame bucket)")
    p.add_argument("--gen_precision", choices=("f32", "bf16"), default="f32",
                   help="vocoder serving precision: bf16 pre-folds weight "
                   "norm and stores/computes in bf16 (-12%% latency measured; "
                   "audio output stays f32)")
    p.add_argument("--gru_impl", choices=("scan", "pallas"), default=None,
                   help="CBHG biGRU recurrence: pallas keeps the hidden "
                   "weights VMEM-resident across steps (TPU; bf16-default-"
                   "precision numerics)")
    a = p.parse_args(rest)

    import dataclasses

    import jax

    t2v_cfg = Text2VecConfig().with_vocab_from_file(a.vocab_path)
    if a.gru_impl:
        t2v_cfg = dataclasses.replace(t2v_cfg, gru_impl=a.gru_impl)
    v2w_cfg = Vec2WavConfig()
    frontend = TextFrontend.from_vocab_file(a.vocab_path)
    ref = np.load(a.ref_npy).squeeze()[None]
    from wavthruvec_pytorch_tpu.infer.synthesize import init_import_models

    _, t2v_vars, gen, gen_vars = init_import_models(
        t2v_cfg, v2w_cfg,
        t2v_checkpoint=a.t2v_checkpoint, gen_checkpoint=a.gen_checkpoint,
        ref_feat=ref, folded=a.folded, fused=a.fused,
    )
    from wavthruvec_pytorch_tpu.data.vocoder_data import load_spk_emb

    spk = load_spk_emb(a.spk_emb)[None]
    if a.gen_precision != "f32":
        from wavthruvec_pytorch_tpu.infer.synthesize import make_serving_generator

        gen, gen_vars = make_serving_generator(
            v2w_cfg, gen_vars, a.gen_precision, fused=a.fused)
    synth = Synthesizer(t2v_cfg, v2w_cfg, t2v_vars, gen_vars, frontend, gen=gen)
    ref_b = np.repeat(ref, len(a.text), axis=0)
    spk_b = np.repeat(spk, len(a.text), axis=0)
    if a.stream:
        from wavthruvec_pytorch_tpu.infer.streaming import StreamingVocoder

        out = synth.text_to_latents(
            a.text, ref_b, alpha=a.alpha, max_frames=a.max_frames or None
        )
        sv = StreamingVocoder(gen, gen_vars, v2w_cfg, chunk_frames=a.chunk_frames)
        noise = np.asarray(jax.random.normal(
            jax.random.PRNGKey(0), (len(a.text), v2w_cfg.noise_dim)))
        wavs = sv.vocode(out["feat_postnet_output"], spk_b, noise)
        n_samples = out["total_frames"] * v2w_cfg.total_upsample
    else:
        wavs, n_samples = synth.synthesize(
            a.text, ref_b, spk_b, alpha=a.alpha,
            max_frames=a.max_frames or None,
        )
    os.makedirs(a.out_dir, exist_ok=True)
    for i, (w, n) in enumerate(zip(wavs, n_samples)):
        path = os.path.join(a.out_dir, f"synth_{i}.wav")
        write_wav(path, w[: int(n)])
        print(f"{path}: {int(n) / 16000:.2f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main() or 0)
