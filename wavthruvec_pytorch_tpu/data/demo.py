"""AISHELL-3-shaped demo dataset generator.

The reference ships bundled sample data (data/vocab.txt with 4,285 symbols,
a 300-line enc_train.txt, a cached beta-binomial prior — readme.md:76) so
its scripts can be smoke-run.  This generator produces the same on-disk
layout with synthetic content (deterministic seed):

    data/demo/
      vocab.txt                 'PE ' + CJK charset
      enc_train.txt enc_val.txt 'train/SSBxxxx/uN.npy|<text>|SSBxxxx' lines
      w2v_feat/train/SSBxxxx/uN.npy   [1, T, 1024] float32 wav2vec-shaped
      aishell3/train/wav/SSBxxxx/uN.wav  16 kHz int16, T*320 samples
      spk_emb/SSBxxxx.npy       [192] float32
      text2vec.json vec2wav.json     full-size configs pointing here
      text2vec_tiny.json vec2wav_tiny.json  reduced dims for CPU smoke runs

Regenerate / resize via:  python -m wavthruvec_pytorch_tpu.cli make-demo-data
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple

import numpy as np


def _cjk_charset(n: int, seed: int = 0) -> str:
    """Deterministic sample of common CJK-unified-ideograph codepoints."""
    rng = np.random.default_rng(seed)
    pts = rng.choice(np.arange(0x4E00, 0x9FA5), size=n, replace=False)
    return "".join(chr(int(p)) for p in sorted(pts))


def make_demo_data(
    root: str = "./data/demo",
    n_speakers: int = 2,
    n_utts: int = 6,
    frames: Tuple[int, int] = (24, 40),
    n_feat_dim: int = 1024,
    n_chars: int = 120,
    seed: int = 0,
    sampling_rate: int = 16000,
    upsample: int = 320,
    max_frames: int = 0,
) -> str:
    from wavthruvec_pytorch_tpu.config import Text2VecConfig, Vec2WavConfig, save_config

    rng = np.random.default_rng(seed)
    charset = _cjk_charset(n_chars, seed)
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "vocab.txt"), "w", encoding="utf-8") as f:
        f.write("PE " + charset)  # reference vocab format: 'PE ' + chars

    from scipy.io import wavfile

    tiny_feat_dim = 64  # parallel low-dim tree for CPU-smoke tiny configs
    # Structured synthesis so the data is LEARNABLE, not noise: every char
    # has a fixed feature template and a pitch; an utterance's features are
    # its chars' templates repeated for per-char durations (plus small
    # noise), and its audio is a phase-continuous sine at the per-char
    # pitch.  Text <-> features <-> audio are therefore mutually predictable
    # — Text2Vec can actually learn the alignment/durations and Vec2Wav can
    # reduce mel loss, so demo training runs show real convergence.
    lines = []
    chars = list(charset)
    templates = rng.standard_normal((len(chars), n_feat_dim)).astype(np.float32)
    pitches = 80.0 + 8.0 * rng.permutation(len(chars)) % 400
    char_index = {c: i for i, c in enumerate(chars)}
    for s in range(n_speakers):
        spk = f"SSB{s:04d}"
        feat_dir = os.path.join(root, "w2v_feat", "train", spk)
        tiny_dir = os.path.join(root, "w2v_feat_tiny", "train", spk)
        wav_dir = os.path.join(root, "aishell3", "train", "wav", spk)
        os.makedirs(feat_dir, exist_ok=True)
        os.makedirs(tiny_dir, exist_ok=True)
        os.makedirs(wav_dir, exist_ok=True)
        os.makedirs(os.path.join(root, "spk_emb"), exist_ok=True)
        np.save(
            os.path.join(root, "spk_emb", f"{spk}.npy"),
            rng.standard_normal(192).astype(np.float32),
        )
        spk_shift = 1.0 + 0.05 * s  # mild per-speaker pitch shift
        for u in range(n_utts):
            n_txt = int(rng.integers(4, max(5, frames[1] // 5)))
            txt_chars = list(rng.choice(chars, size=n_txt))
            # deterministic per-char durations: duration is a property of
            # the char (like phoneme length), so the duration predictor has
            # a learnable target that generalizes to novel sequences
            durs = np.array([3 + char_index[c] % 5 for c in txt_chars])
            if max_frames:
                # hard frame cap (the loader pads to a fixed bucket and has
                # no over-length filter): drop trailing chars past the cap
                keep = int(np.searchsorted(np.cumsum(durs), max_frames,
                                           side="right"))
                txt_chars, durs = txt_chars[:keep], durs[:keep]
            text = "".join(txt_chars)
            T = int(durs.sum())
            idx = np.repeat([char_index[c] for c in text], durs)
            feat = templates[idx] + 0.05 * rng.standard_normal(
                (T, n_feat_dim)
            ).astype(np.float32)
            feat = feat[None].astype(np.float32)
            np.save(os.path.join(feat_dir, f"u{u}.npy"), feat)
            np.save(os.path.join(tiny_dir, f"u{u}.npy"), feat[:, :, :tiny_feat_dim])
            freqs = np.repeat(pitches[idx] * spk_shift, upsample)
            phase = np.cumsum(2 * np.pi * freqs / sampling_rate)
            wav_f = 0.5 * np.sin(phase) + 0.01 * rng.standard_normal(len(phase))
            wav = (wav_f * 20000).astype(np.int16)
            wavfile.write(os.path.join(wav_dir, f"u{u}.wav"), sampling_rate, wav)
            lines.append(f"train/{spk}/u{u}.npy|{text}|{spk}")
    n_val = max(1, len(lines) // 6)
    with open(os.path.join(root, "enc_train.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(lines[n_val:]) + "\n")
    with open(os.path.join(root, "enc_val.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(lines[:n_val]) + "\n")

    # configs pointing at the demo tree (relative to the repo root CWD)
    t2v = Text2VecConfig(
        vocab_path=f"{root}/vocab.txt",
        feat_ground_truth=f"{root}/w2v_feat",
        train_list=(f"{root}/enc_train.txt",),
        val_list=(f"{root}/enc_val.txt",),
        betabinom_cache_path=f"{root}/align_prior",
        n_feat_dim=n_feat_dim,
        batch_size=2,
        batch_expand_size=2,
        # reference lr=0.1 is tuned for batch 16 x a full corpus; on this
        # tiny demo set LAMB at 0.1 diverges after ~300 steps — 0.01
        # converges (losses incl. attn binarization drop monotonically)
        learning_rate=0.01,
        epochs=2,
        log_step=5,
        save_step=100,
        val_step=50,
    ).with_vocab_from_file(f"{root}/vocab.txt")
    v2w = Vec2WavConfig(
        feat_ground_truth=f"{root}/w2v_feat",
        train_wav_path=f"{root}/aishell3",
        spk_emb_path=f"{root}/spk_emb",
        input_training_file=f"{root}/enc_train.txt",
        input_validation_file=f"{root}/enc_val.txt",
        n_feat_dim=n_feat_dim,
        batch_size=2,
    )
    save_config(t2v, os.path.join(root, "text2vec.json"))
    save_config(v2w, os.path.join(root, "vec2wav.json"))

    # tiny configs read the 64-dim tree — the 1024-dim CBHG/postnet would
    # otherwise dominate (a "tiny" model with full n_feat_dim is still ~79M)
    t2v_tiny = dataclasses.replace(
        t2v,
        feat_ground_truth=f"{root}/w2v_feat_tiny",
        n_feat_dim=tiny_feat_dim,
        encoder_dim=32, decoder_dim=32, encoder_n_layer=1, decoder_n_layer=1,
        encoder_conv1d_filter_size=64, decoder_conv1d_filter_size=64,
        spk_channel=tiny_feat_dim, n_speaker_dim=16,
        text_buckets=(16, 32), frame_buckets=(64,),
        duration_predictor_filter_size=16,
    )
    v2w_tiny = dataclasses.replace(
        v2w,
        feat_ground_truth=f"{root}/w2v_feat_tiny",
        n_feat_dim=tiny_feat_dim,
        num_wv_feat=tiny_feat_dim,
        upsample_initial_channel=32,
        upsample_rates=(5, 4, 4, 2, 2),
        upsample_kernel_sizes=(11, 8, 8, 4, 4),
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 2), (1, 2)),
        periods=(2, 3),
        frame_buckets=(40,),
    )
    save_config(t2v_tiny, os.path.join(root, "text2vec_tiny.json"))
    save_config(v2w_tiny, os.path.join(root, "vec2wav_tiny.json"))
    return root
