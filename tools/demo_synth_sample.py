"""Synthesize sample wavs from the demo-run checkpoints (tools/demo_train_runs.py)
into artifacts/demo_runs/samples/ — end-to-end proof that trained checkpoints
restore and chain through the full text->latent->wav pipeline."""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wavthruvec_pytorch_tpu import checkpoint as ckpt
from wavthruvec_pytorch_tpu.config import Text2VecConfig, Vec2WavConfig, load_config
from wavthruvec_pytorch_tpu.infer.synthesize import Synthesizer, write_wav
from wavthruvec_pytorch_tpu.models import Generator, Text2Vec
from wavthruvec_pytorch_tpu.text import TextFrontend
from wavthruvec_pytorch_tpu.train import text2vec_train as t2v
from wavthruvec_pytorch_tpu.train import vec2wav_train as v2w

ART = "artifacts/demo_runs"


def main():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    t2v_cfg = load_config(Text2VecConfig, "data/demo/text2vec.json")
    t2v_cfg = dataclasses.replace(t2v_cfg, text_buckets=(32,), frame_buckets=(64,))
    v2w_cfg = load_config(Vec2WavConfig, "data/demo/vec2wav.json")
    frontend = TextFrontend.from_vocab_file(t2v_cfg.vocab_path)

    # restore Text2Vec from the latest demo checkpoint via a train-shaped state
    from wavthruvec_pytorch_tpu.data.dataset import BucketedLoader, load_buffer

    buf = load_buffer(list(t2v_cfg.train_list), t2v_cfg, frontend)
    loader = BucketedLoader(buf, t2v_cfg, seed=0)
    first = next(loader.epoch())
    train_text = first["audiopaths"][0]
    first.pop("audiopaths")
    fj = {k: jnp.asarray(v) for k, v in first.items()}
    model, state = t2v.init_state(t2v_cfg, jax.random.PRNGKey(0), fj)
    cp = ckpt.scan_checkpoint(os.path.join(ART, "text2vec/demo/model_new"), "checkpoint_")
    state = ckpt.restore_checkpoint(cp, state)
    t2v_vars = {"params": state.params, "batch_stats": state.batch_stats}
    print("restored t2v from", cp)

    # restore the Generator out of the GAN train state
    from wavthruvec_pytorch_tpu.data.vocoder_data import (
        VocoderDataset,
        VocoderLoader,
        get_dataset_filelist,
    )

    files, _ = get_dataset_filelist(
        v2w_cfg.input_training_file, v2w_cfg.input_validation_file
    )
    ds = VocoderDataset(files, v2w_cfg)
    vloader = VocoderLoader(ds, v2w_cfg.batch_size, num_workers=0)
    vb = next(vloader.epoch())
    vb.pop("filenames")
    vbj = {k: jnp.asarray(v) for k, v in vb.items()}
    models, gstate = v2w.init_state(v2w_cfg, jax.random.PRNGKey(0), vbj)
    gcp = ckpt.scan_checkpoint(os.path.join(ART, "vec2wav/demo/model_new"), "state_")
    gstate = ckpt.restore_checkpoint(gcp, gstate)
    gen_vars = {
        "params": gstate.gen_params,
        "batch_stats": gstate.gen_batch_stats,
        "spectral": gstate.gen_spectral,
    }
    print("restored v2w from", gcp)

    synth = Synthesizer(t2v_cfg, v2w_cfg, t2v_vars, gen_vars, frontend)

    # one seen training text + one novel text from the same charset
    lines = open("data/demo/enc_train.txt", encoding="utf-8").read().splitlines()
    seen_text = lines[0].split("|")[1]
    charset = open("data/demo/vocab.txt", encoding="utf-8").read()[3:]
    novel_text = "".join(np.random.default_rng(7).choice(list(charset), size=6))

    ref = np.load(os.path.join(t2v_cfg.feat_ground_truth, lines[0].split("|")[0]))
    ref = ref.squeeze()[None].astype(np.float32)
    spk_name = lines[0].split("|")[2]
    spk = np.load(f"data/demo/spk_emb/{spk_name}.npy")[None]

    out_dir = os.path.join(ART, "samples")
    os.makedirs(out_dir, exist_ok=True)
    for name, text in (("seen", seen_text), ("novel", novel_text)):
        wavs, n = synth.synthesize(
            [text], ref, spk, alpha=1.0, max_frames=64
        )
        path = os.path.join(out_dir, f"{name}.wav")
        write_wav(path, wavs[0][: max(int(n[0]), 320)])
        print(f"{path}: text={text!r} {int(n[0]) / 16000:.2f}s "
              f"rms={float(np.sqrt(np.mean(wavs[0][:max(int(n[0]),320)]**2))):.3f}")


if __name__ == "__main__":
    main()
