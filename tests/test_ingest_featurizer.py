"""Full prepare_data ingest path with a tiny random-init Flax wav2vec2
(zero-egress: no pretrained weights; validates batching/masking/filelists)."""

import os

import numpy as np
import pytest

TINY_W2V = dict(
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=64,
    conv_dim=(16, 16, 16),
    conv_stride=(5, 4, 4),
    conv_kernel=(10, 3, 3),
    num_feat_extract_layers=3,
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
    do_stable_layer_norm=True,
    feat_extract_norm="layer",
)


@pytest.fixture(scope="module")
def featurizer():
    from wavthruvec_pytorch_tpu.data.ingest import Wav2VecFeaturizer

    return Wav2VecFeaturizer(
        random_init=True,
        config_overrides=TINY_W2V,
        wav_buckets=(8000, 16000),
    )


def test_extract_batch_shapes_and_masking(featurizer):
    rng = np.random.default_rng(0)
    wavs = [
        (rng.standard_normal(6500) * 0.1).astype(np.float32),
        (rng.standard_normal(4000) * 0.1).astype(np.float32),
    ]
    feats = featurizer.extract_batch(wavs)
    assert len(feats) == 2
    # stride product 5*4*4 = 80 -> ~T/80 frames, shorter wav -> fewer frames
    assert feats[0].shape[0] > feats[1].shape[0]
    assert feats[0].shape[1] == TINY_W2V["hidden_size"]
    assert np.isfinite(feats[0]).all()


def test_prepare_data_end_to_end(tmp_path, featurizer):
    from scipy.io import wavfile

    from wavthruvec_pytorch_tpu.data.ingest import prepare_data
    from wavthruvec_pytorch_tpu.text import TextFrontend

    rng = np.random.default_rng(1)
    wavs_path = tmp_path / "wav"
    for spk in ("SSB0001", "SSB0002"):
        (wavs_path / spk).mkdir(parents=True)
        for i in range(4):
            wav = (rng.standard_normal(5000) * 3000).astype(np.int16)
            wavfile.write(wavs_path / spk / f"{spk}{i:04d}.wav", 16000, wav)
    content = tmp_path / "content.txt"
    lines = []
    for spk in ("SSB0001", "SSB0002"):
        for i in range(4):
            lines.append(f"{spk}{i:04d}.wav\t你 ni3 好 hao3")
    content.write_text("\n".join(lines) + "\n")

    feat_out = tmp_path / "w2v_feat"
    train_list = tmp_path / "enc_train.txt"
    val_list = tmp_path / "enc_val.txt"
    vocab_path = tmp_path / "vocab.txt"
    prepare_data(
        str(wavs_path), str(feat_out), str(content),
        str(train_list), str(val_list), str(vocab_path),
        featurizer, n_speakers=2, n_files_per_speaker=4, batch_size=2,
    )

    train_lines = train_list.read_text().strip().split("\n")
    val_lines = val_list.read_text().strip().split("\n")
    # even index -> train, odd -> val (prepare_data.py:90-93)
    assert len(train_lines) == 4 and len(val_lines) == 4
    npy_file, text, spk = train_lines[0].split("|")
    assert text == "你好"
    feat = np.load(feat_out / npy_file)
    assert feat.ndim == 3 and feat.shape[0] == 1  # [1, T, C] like the reference
    # vocab usable by the frontend
    fe = TextFrontend.from_vocab_file(str(vocab_path))
    assert fe.text_to_sequence("你好")
