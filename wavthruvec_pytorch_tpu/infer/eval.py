"""Text2Vec evaluation CLI (reference: text2vec/eval.py:19-138).

Loads a checkpoint, synthesizes the reference's six AISHELL-3 test sentences
(speaker reference = ground-truth wav2vec npy), saves
``results/{log_seed}/{step}_{i}_feat(.postnet).npy``, and (unlike the
reference, whose RTF loop is commented out at eval.py:131-138) runs an
active RTF timing harness with --rtf.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import List, Optional

import jax
import numpy as np

from wavthruvec_pytorch_tpu import checkpoint as ckpt
from wavthruvec_pytorch_tpu.config import Text2VecConfig
from wavthruvec_pytorch_tpu.models import Text2Vec
from wavthruvec_pytorch_tpu.text import TextFrontend
from wavthruvec_pytorch_tpu.train.text2vec_train import pad_to_bucket

# the reference's fixed test set (eval.py:104-118): sentence + GT npy of the
# same speaker used as the reference for speaker embedding + prior shape
TEST_SENTENCES: List[str] = [
    "广州女大学生登山失联四天警方找到疑似女尸",
    "尊敬的观众朋友们大家好",
    "教育部要求处理艺人高考成绩造假问题",
    "在这一年半的时间里",
    "他们俩一起去过很多地方",
    "国内动力电池巨头宁德时代",
]


def load_model(cfg: Text2VecConfig, checkpoint_path: str, step: int):
    model = Text2Vec(cfg)
    rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp

    # init through the TRAIN branch so the full param tree (incl. the
    # ConvAttention the infer branch never calls) exists for restore
    dummy_text = jnp.ones((1, 8), jnp.int32)
    dummy_pos = jnp.arange(1, 9, dtype=jnp.int32)[None]
    dummy_feat = jnp.zeros((1, 16, cfg.n_feat_dim))
    variables = model.init(
        {"params": rng, "dropout": rng},
        dummy_text, dummy_pos, dummy_feat,
        jnp.array([8]), jnp.array([16]),
        jnp.arange(1, 17, dtype=jnp.int32)[None],
        attn_prior=jnp.ones((1, 16, 8)),
        deterministic=True, train_bn=False,
    )
    path = os.path.join(checkpoint_path, f"checkpoint_{step}")
    if os.path.exists(path):
        variables = ckpt.restore_checkpoint(path, variables)
        print(f"restored checkpoint_{step}")
    elif os.path.exists(path + ".pth.tar"):
        sd = ckpt.load_torch_state_dict(path + ".pth.tar", key="model")
        variables = ckpt.import_text2vec(sd, cfg)
        print(f"imported torch checkpoint_{step}.pth.tar")
    else:
        print(f"WARNING: no checkpoint at {path}; using random init")
    return model, variables


def synthesize_one(
    model, variables, cfg, frontend, text: str, ref_feat: np.ndarray,
    alpha: float = 1.0,
):
    import jax.numpy as jnp

    seq = frontend.text_to_sequence(text)
    n_pad = pad_to_bucket(len(seq), cfg.text_buckets)
    ids = np.zeros((1, n_pad), np.int32)
    ids[0, : len(seq)] = seq
    pos = np.where(ids != 0, np.arange(1, n_pad + 1)[None], 0)
    max_frames = pad_to_bucket(
        min(int(ref_feat.shape[0] * 2 + 64), cfg.max_seq_len), cfg.frame_buckets
    )
    out = model.apply(
        variables,
        jnp.asarray(ids), jnp.asarray(pos),
        jnp.asarray(ref_feat[None], jnp.float32),
        max_frames, alpha,
        method=Text2Vec.infer,
    )
    total = int(out["total_frames"][0])
    return (
        np.asarray(out["feat_output"])[0, :total],
        np.asarray(out["feat_postnet_output"])[0, :total],
    )


def main(args: Optional[argparse.Namespace] = None):
    if args is None:
        args = parse_args()
    cfg = Text2VecConfig()
    vocab = args.vocab_path or cfg.vocab_path
    if not os.path.exists(vocab) and os.path.exists("./data/demo/vocab.txt"):
        vocab = "./data/demo/vocab.txt"  # bundled demo vocab fallback
        print(f"vocab fallback: {vocab}")
    cfg = cfg.with_vocab_from_file(vocab)
    frontend = TextFrontend.from_vocab_file(vocab)
    model, variables = load_model(cfg, args.checkpoint_path, args.step)

    out_dir = os.path.join("results", str(args.log_seed))
    os.makedirs(out_dir, exist_ok=True)

    # speaker references: GT npy per sentence if available, else noise
    for i, sentence in enumerate(TEST_SENTENCES[: args.n_sentences]):
        ref_path = args.ref_npys[i] if i < len(args.ref_npys) else None
        if ref_path and os.path.exists(ref_path):
            ref = np.load(ref_path).squeeze()
        else:
            ref = np.random.default_rng(i).standard_normal((128, cfg.n_feat_dim)) * 0.1
        feat, feat_postnet = synthesize_one(
            model, variables, cfg, frontend, sentence, ref, args.alpha
        )
        np.save(os.path.join(out_dir, f"{args.step}_{i}_feat.npy"), feat)
        np.save(os.path.join(out_dir, f"{args.step}_{i}_feat.postnet.npy"), feat_postnet)
        print(f"[{i}] {sentence} -> {feat.shape[0]} frames")

    if args.rtf:
        # active version of the commented timing loop (eval.py:131-138)
        ref = np.random.default_rng(0).standard_normal((128, cfg.n_feat_dim)) * 0.1
        synthesize_one(model, variables, cfg, frontend, TEST_SENTENCES[0], ref)
        t0 = time.perf_counter()
        iters = args.rtf_iters
        frames = 0
        for k in range(iters):
            s = TEST_SENTENCES[k % len(TEST_SENTENCES)]
            f, _ = synthesize_one(model, variables, cfg, frontend, s, ref)
            frames += f.shape[0]
        dt = time.perf_counter() - t0
        audio_s = frames / 50.0  # 50 Hz latent frames
        print(f"t2v RTF: {dt / audio_s:.4f} ({audio_s / dt:.1f}x realtime), "
              f"{iters / dt:.2f} utt/s")


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--step", type=int, default=0)
    parser.add_argument("--alpha", type=float, default=1.0)
    parser.add_argument("--log_seed", type=str, default="1")
    parser.add_argument("--checkpoint_path", type=str,
                        default="./run/30_30_spk_4fft/model_new")
    parser.add_argument("--feat_ground_truth", type=str,
                        default="/data_mnt/aishell3/w2v_feat/")
    parser.add_argument("--ref_npys", nargs="*", default=[])
    parser.add_argument("--n_sentences", type=int, default=6)
    parser.add_argument("--vocab_path", type=str, default="")
    parser.add_argument("--rtf", action="store_true")
    parser.add_argument("--rtf_iters", type=int, default=20)
    return parser.parse_args(argv)


if __name__ == "__main__":
    main(parse_args())
