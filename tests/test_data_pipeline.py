"""End-to-end data pipeline tests on a synthetic on-disk dataset:
filelists + npy feats + wavs -> loaders -> train steps; checkpoint
save/restore roundtrip; ingest filelist/vocab building."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_models import T2V_SMALL, V2W_SMALL
from wavthruvec_pytorch_tpu import checkpoint as ckpt
from wavthruvec_pytorch_tpu.text import TextFrontend, build_vocab_from_texts

SYMS = "PE abcdefg"


@pytest.fixture()
def t2v_disk_dataset(tmp_path):
    cfg = dataclasses.replace(
        T2V_SMALL,
        vocab_size=len(SYMS),
        betabinom_cache_path=str(tmp_path / "align_prior"),
        feat_ground_truth=str(tmp_path / "w2v_feat"),
        batch_size=2,
        batch_expand_size=2,
        text_buckets=(8, 16),
        frame_buckets=(16, 32),
    )
    rng = np.random.default_rng(0)
    feat_dir = tmp_path / "w2v_feat" / "SSB001"
    feat_dir.mkdir(parents=True)
    lines = []
    texts = ["abc", "defg", "aceg", "bdf", "abcdefg", "gfe", "ab", "cde"]
    for i, text in enumerate(texts):
        t = int(rng.integers(10, 30))
        np.save(feat_dir / f"u{i}.npy", rng.standard_normal((1, t, cfg.n_feat_dim)).astype(np.float32))
        lines.append(f"SSB001/u{i}.npy|{text}|SSB001")
    flist = tmp_path / "train.txt"
    flist.write_text("\n".join(lines) + "\n")
    vocab = tmp_path / "vocab.txt"
    vocab.write_text(SYMS)
    return cfg, str(flist), str(vocab)


@pytest.mark.slow
def test_t2v_buffer_loader_and_step(t2v_disk_dataset):
    cfg, flist, vocab = t2v_disk_dataset
    from wavthruvec_pytorch_tpu.data.dataset import BucketedLoader, load_buffer
    from wavthruvec_pytorch_tpu.train import text2vec_train as t2v

    frontend = TextFrontend.from_vocab_file(vocab)
    buffer = load_buffer([flist], cfg, frontend, feat_root=cfg.feat_ground_truth)
    assert len(buffer) == 8
    # prior cache written
    assert len(os.listdir(cfg.betabinom_cache_path)) > 0

    loader = BucketedLoader(buffer, cfg, seed=0)
    batches = list(loader.epoch())
    assert len(batches) == len(loader) == 4  # 8 items / (2x2) super * 2 expand
    shapes = loader.bucket_shapes()
    assert all(n in cfg.text_buckets and t in cfg.frame_buckets for n, t in shapes)

    batch = batches[0]
    batch.pop("audiopaths")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model, state = t2v.init_state(cfg, jax.random.PRNGKey(0), batch)
    step, _ = t2v.make_train_step(model, cfg)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))


def test_checkpoint_roundtrip(tmp_path, t2v_disk_dataset):
    cfg, flist, vocab = t2v_disk_dataset
    from wavthruvec_pytorch_tpu.data.dataset import BucketedLoader, load_buffer
    from wavthruvec_pytorch_tpu.train import text2vec_train as t2v

    frontend = TextFrontend.from_vocab_file(vocab)
    buffer = load_buffer([flist], cfg, frontend, feat_root=cfg.feat_ground_truth)
    loader = BucketedLoader(buffer, cfg, seed=0)
    batch = next(loader.epoch())
    batch.pop("audiopaths")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model, state = t2v.init_state(cfg, jax.random.PRNGKey(0), batch)

    path = str(tmp_path / "ckpt" / "checkpoint_5")
    ckpt.save_checkpoint(path, jax.device_get(state))
    restored = ckpt.restore_checkpoint(path, state)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ckpt.scan_checkpoint(str(tmp_path / "ckpt"), "checkpoint_").endswith("checkpoint_5")
    assert ckpt.checkpoint_step(path) == 5


@pytest.fixture()
def v2w_disk_dataset(tmp_path):
    cfg = dataclasses.replace(
        V2W_SMALL,
        feat_ground_truth=str(tmp_path / "w2v_feat"),
        train_wav_path=str(tmp_path / "aishell3"),
        spk_emb_path=str(tmp_path / "spk_emb"),
        input_training_file=str(tmp_path / "train.txt"),
        input_validation_file=str(tmp_path / "val.txt"),
        n_fft=64,
        win_size=64,
        hop_size=16,
        num_mels=8,
        frame_buckets=(16, 32),
        batch_size=2,
    )
    rng = np.random.default_rng(0)
    from scipy.io import wavfile

    spk = "SSB001"
    (tmp_path / "w2v_feat" / "train" / spk).mkdir(parents=True)
    (tmp_path / "aishell3" / "train" / "wav" / spk).mkdir(parents=True)
    (tmp_path / "spk_emb").mkdir()
    np.save(tmp_path / "spk_emb" / f"{spk}.npy",
            rng.standard_normal(cfg.spk_dim).astype(np.float32))
    lines = []
    for i in range(4):
        t = int(rng.integers(10, 17))
        np.save(tmp_path / "w2v_feat" / "train" / spk / f"u{i}.npy",
                rng.standard_normal((1, t, cfg.n_feat_dim)).astype(np.float32))
        wav = (rng.standard_normal(t * cfg.total_upsample) * 3000).astype(np.int16)
        wavfile.write(tmp_path / "aishell3" / "train" / "wav" / spk / f"u{i}.wav",
                      cfg.sampling_rate, wav)
        lines.append(f"train/{spk}/u{i}.npy|text|{spk}")
    (tmp_path / "train.txt").write_text("\n".join(lines) + "\n")
    (tmp_path / "val.txt").write_text(lines[0] + "\n")
    return cfg


@pytest.mark.slow
def test_vocoder_dataset_and_gan_step(v2w_disk_dataset):
    cfg = v2w_disk_dataset
    from wavthruvec_pytorch_tpu.data.vocoder_data import (
        VocoderDataset,
        VocoderLoader,
        get_dataset_filelist,
    )
    from wavthruvec_pytorch_tpu.train import vec2wav_train as v2w

    train_files, val_files = get_dataset_filelist(
        cfg.input_training_file, cfg.input_validation_file
    )
    assert len(train_files) == 4 and len(val_files) == 1
    ds = VocoderDataset(train_files, cfg)
    item = ds[0]
    assert item["wv_feat"].shape[1] == cfg.n_feat_dim
    assert np.abs(item["audio"]).max() <= 0.951  # normalize * 0.95
    assert item["mel_loss"].shape[1] == cfg.num_mels

    loader = VocoderLoader(ds, cfg.batch_size)
    batch = next(loader.epoch())
    assert batch["audio"].shape[1] == batch["wv_feat"].shape[1] * cfg.total_upsample
    assert batch["mel_loss"].shape[1] == batch["audio"].shape[1] // cfg.hop_size

    batch.pop("filenames")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    models, state = v2w.init_state(cfg, jax.random.PRNGKey(0), batch)
    step, _ = v2w.make_train_step(models, cfg)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["gen_loss_total"]))


def test_vocoder_dataset_fine_tuning_branch(v2w_disk_dataset, tmp_path):
    """Fine-tuning mode (reference vec2wav/dataset.py:158-175): audio is NOT
    peak-normalized, precomputed mels come from ``base_mels_path``, and the
    split path windows (mel, audio) at hop granularity while wv_feat stays
    full length (the reference's exact — broken-for-training — pairing; our
    trainable windowed mode is the non-fine-tuning feature-space one)."""
    cfg = v2w_disk_dataset
    from wavthruvec_pytorch_tpu.data.vocoder_data import (
        VocoderDataset,
        get_dataset_filelist,
        mel_spectrogram_np,
    )

    train_files, _ = get_dataset_filelist(
        cfg.input_training_file, cfg.input_validation_file
    )
    # precomputed mels keyed by utterance basename (dataset.py:169-170)
    rng = np.random.default_rng(3)
    mels_dir = tmp_path / "gta_mels"
    mels_dir.mkdir()
    for f in train_files:
        base = os.path.splitext(os.path.basename(f))[0]
        # GTA mels cover the utterance: frames = samples / hop
        t_feat = np.load(os.path.join(cfg.feat_ground_truth, f)).shape[1]
        t = t_feat * cfg.total_upsample // cfg.hop_size
        np.save(mels_dir / f"{base}.npy",
                rng.standard_normal((t, cfg.num_mels)).astype(np.float32))

    ds = VocoderDataset(train_files, cfg, fine_tuning=True,
                        base_mels_path=str(mels_dir), split=False)
    item = ds[0]
    # un-normalized audio: the fixture wavs are int16/32768 scaled, peak well
    # below the 0.95 the normalizing branch would force
    assert np.abs(item["audio"]).max() < 0.5
    assert item["wv_feat"].shape[1] == cfg.n_feat_dim
    # mel_loss recomputed from the (unwindowed) audio
    ref_mel = mel_spectrogram_np(
        item["audio"], cfg.n_fft, cfg.num_mels, cfg.sampling_rate,
        cfg.hop_size, cfg.win_size, cfg.fmin, cfg.fmax_for_loss)
    np.testing.assert_allclose(item["mel_loss"], ref_mel, atol=1e-5)

    # split branch with a segment shorter than the fixture utterances so the
    # true random-window path runs: audio window = frames_per_seg * hop_size
    import math

    wcfg = dataclasses.replace(cfg, segment_size=64)
    ds_split = VocoderDataset(train_files, wcfg, fine_tuning=True,
                              base_mels_path=str(mels_dir), split=True)
    frames_per_seg = math.ceil(wcfg.segment_size / wcfg.hop_size)
    it = ds_split[0]
    full = ds[0]
    assert len(it["audio"]) == frames_per_seg * wcfg.hop_size
    # wv_feat stays full length (reference pairing)
    assert it["wv_feat"].shape[0] == full["wv_feat"].shape[0]


def test_host_mel_matches_device_mel(v2w_disk_dataset):
    cfg = v2w_disk_dataset
    from wavthruvec_pytorch_tpu.data.vocoder_data import mel_spectrogram_np
    from wavthruvec_pytorch_tpu.ops.stft import mel_spectrogram

    rng = np.random.default_rng(3)
    y = (rng.standard_normal(4096) * 0.3).clip(-1, 1).astype(np.float32)
    host = mel_spectrogram_np(y, cfg.n_fft, cfg.num_mels, cfg.sampling_rate,
                              cfg.hop_size, cfg.win_size, cfg.fmin, cfg.fmax_for_loss)
    dev = np.asarray(mel_spectrogram(jnp.asarray(y[None]), cfg.n_fft, cfg.num_mels,
                                     cfg.sampling_rate, cfg.hop_size, cfg.win_size,
                                     cfg.fmin, cfg.fmax_for_loss))[0].T
    assert host.shape == dev.shape
    np.testing.assert_allclose(host, dev, atol=2e-4)


def test_ingest_filelists_and_vocab(tmp_path):
    from wavthruvec_pytorch_tpu.data.ingest import (
        build_vocab,
        clean_label_text,
        parse_content_file,
    )

    assert clean_label_text("你A好 b2 吗?") == "你好吗"
    content = tmp_path / "content.txt"
    content.write_text("SSB1.wav\t你 hao3 好\nSSB2.wav\t世 shi4 界\n")
    d = parse_content_file(str(content))
    assert d == {"SSB1.wav": "你好", "SSB2.wav": "世界"}
    vocab = build_vocab(str(tmp_path / "vocab.txt"), d)
    assert vocab.startswith("PE ")
    assert set("你好世界") <= set(vocab)
    # frontend roundtrip on the generated vocab
    fe = TextFrontend(vocab)
    seq = fe.text_to_sequence("你好")
    assert seq[0] == vocab.index(" ") and seq[-1] == vocab.index("E")


def test_build_vocab_from_texts():
    v = build_vocab_from_texts(["abc", "cab", "d"])
    assert v == "PE abcd"


@pytest.mark.slow
def test_gan_checkpoint_roundtrip(tmp_path, v2w_disk_dataset):
    cfg = v2w_disk_dataset
    from wavthruvec_pytorch_tpu.data.vocoder_data import (
        VocoderDataset,
        VocoderLoader,
        get_dataset_filelist,
    )
    from wavthruvec_pytorch_tpu.train import vec2wav_train as v2w

    train_files, _ = get_dataset_filelist(
        cfg.input_training_file, cfg.input_validation_file
    )
    loader = VocoderLoader(VocoderDataset(train_files, cfg), cfg.batch_size)
    batch = next(loader.epoch())
    batch.pop("filenames")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    models, state = v2w.init_state(cfg, jax.random.PRNGKey(0), batch)
    step, _ = v2w.make_train_step(models, cfg)
    state, _ = step(state, batch, jax.random.PRNGKey(1))

    path = str(tmp_path / "gan_ckpt" / "state_00000001")
    ckpt.save_checkpoint(path, jax.device_get(state))
    restored = ckpt.restore_checkpoint(path, state)
    for a, b in zip(jax.tree_util.tree_leaves(state.gen_params),
                    jax.tree_util.tree_leaves(restored.gen_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 1
    # resumed state steps again
    state2, metrics = step(restored, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["gen_loss_total"]))


def test_load_buffer_rejects_data_beyond_position_tables(t2v_disk_dataset):
    """Items longer than the sinusoid position tables must fail at load time
    (the reference IndexErrors in-graph, text2vec/model.py:86,158; our
    gathers clamp, so silence here would train aliased positions)."""
    from wavthruvec_pytorch_tpu.data.dataset import load_buffer

    cfg, flist, vocab = t2v_disk_dataset
    frontend = TextFrontend.from_vocab_file(vocab)

    # text side: 14 chars + ' '/'E' affixes = 16 tokens > vocab_size 10
    feat_dir = os.path.join(cfg.feat_ground_truth, "SSB001")
    np.save(
        os.path.join(feat_dir, "long_text.npy"),
        np.zeros((1, 12, cfg.n_feat_dim), np.float32),
    )
    long_list = os.path.join(os.path.dirname(flist), "long_text.txt")
    with open(long_list, "w") as f:
        f.write("SSB001/long_text.npy|abcdefgabcdefg|SSB001\n")
    with pytest.raises(ValueError, match="encoder position table"):
        load_buffer([long_list], cfg, frontend, feat_root=cfg.feat_ground_truth)

    # frame side: 25 frames > max_seq_len 20 (decoder table)
    np.save(
        os.path.join(feat_dir, "long_frames.npy"),
        np.zeros((1, 25, cfg.n_feat_dim), np.float32),
    )
    frames_list = os.path.join(os.path.dirname(flist), "long_frames.txt")
    with open(frames_list, "w") as f:
        f.write("SSB001/long_frames.npy|abc|SSB001\n")
    cfg20 = dataclasses.replace(cfg, max_seq_len=20)
    with pytest.raises(ValueError, match="decoder position table"):
        load_buffer([frames_list], cfg20, frontend, feat_root=cfg.feat_ground_truth)


def test_encoder_clamps_positions_past_table(t2v_disk_dataset):
    """Out-of-contract src_pos past vocab_size+1 rows must stay finite
    (jnp.take's default OOB mode fills NaN; we clamp like the decoder)."""
    from wavthruvec_pytorch_tpu.models.text2vec import Encoder

    cfg, _, _ = t2v_disk_dataset  # vocab_size=10
    N = 16  # positions 1..16 exceed the 11-row table
    src_seq = jnp.ones((2, N), jnp.int32)
    src_pos = jnp.arange(1, N + 1, dtype=jnp.int32)[None, :].repeat(2, axis=0)
    spk = jnp.zeros((2, cfg.n_speaker_dim), jnp.float32)
    enc = Encoder(cfg)
    vs = enc.init(jax.random.PRNGKey(0), src_seq, src_pos, spk_emb=spk)
    out, *_ = enc.apply(vs, src_seq, src_pos, spk_emb=spk)
    assert bool(jnp.isfinite(out).all())


def test_device_resident_data_rejects_oversized_corpus(t2v_disk_dataset,
                                                       monkeypatch):
    """Staging must fail fast with a sizing message, not an opaque
    allocator error, when the corpus exceeds the HBM budget."""
    from wavthruvec_pytorch_tpu.data.dataset import load_buffer
    from wavthruvec_pytorch_tpu.data.device_cache import DeviceResidentData

    cfg, flist, vocab = t2v_disk_dataset
    frontend = TextFrontend.from_vocab_file(vocab)
    buffer = load_buffer([flist], cfg, frontend, feat_root=cfg.feat_ground_truth)
    dev = jax.devices()[0]
    monkeypatch.setattr(type(dev), "memory_stats",
                        lambda self: {"bytes_limit": 1024}, raising=False)
    with pytest.raises(ValueError, match="GiB of HBM"):
        DeviceResidentData(buffer, cfg)


@pytest.mark.parametrize("mode", ["per_bucket", "pad_to_max", "sharded"])
def test_device_resident_data_matches_host_collate(t2v_disk_dataset, mode):
    """HBM-resident gather (data/device_cache.py) must reproduce
    make_padded_batch exactly, batch for batch, in every mode: per-batch
    bucket selection, pad-to-max (the multi-process shape-agreement mode),
    and sharded over a data-parallel mesh (batches come out P('data'))."""
    from wavthruvec_pytorch_tpu.data.dataset import BucketedLoader, load_buffer
    from wavthruvec_pytorch_tpu.data.device_cache import DeviceResidentData

    cfg, flist, vocab = t2v_disk_dataset
    frontend = TextFrontend.from_vocab_file(vocab)
    buffer = load_buffer([flist], cfg, frontend, feat_root=cfg.feat_ground_truth)
    pad_to_max = mode == "pad_to_max"
    mesh = None
    if mode == "sharded":
        from jax.sharding import Mesh

        if len(jax.devices()) < 2:
            pytest.skip("needs >1 device (xla_force_host_platform_device_count)")
        mesh = Mesh(np.asarray(jax.devices()[:2]), ("data",))
    # two loaders sharing the same seed -> identical index order
    host_loader = BucketedLoader(buffer, cfg, seed=3, pad_to_max=pad_to_max)
    idx_loader = BucketedLoader(buffer, cfg, seed=3)
    drd = DeviceResidentData(buffer, cfg, mesh=mesh)
    assert drd.nbytes() > 0

    host_batches = list(host_loader.epoch())
    idx_batches = list(idx_loader.epoch_indices())
    assert len(host_batches) == len(idx_batches) > 0
    for hb, idx in zip(host_batches, idx_batches):
        paths = hb.pop("audiopaths")
        db = drd.batch(idx, pad_to_max=pad_to_max)
        assert drd.batch_audiopaths(idx) == paths
        assert set(db) == set(hb)
        for k in hb:
            if mesh is not None:
                shd = db[k].sharding
                assert shd.spec[0] == "data", (k, shd.spec)
            np.testing.assert_array_equal(
                np.asarray(db[k]), hb[k], err_msg=k)


def test_vocoder_device_data_matches_host_window(v2w_disk_dataset):
    """VocoderDeviceData's on-device window gather must reproduce the host
    path (VocoderDataset split-mode __getitem__ + pad_vocoder_batch)
    exactly for the same (item, fstart) draws, and the loader's
    epoch_indices must emit the same batch composition as epoch()."""
    import copy

    from wavthruvec_pytorch_tpu.data.vocoder_data import (
        VocoderDataset,
        VocoderLoader,
        get_dataset_filelist,
        pad_vocoder_batch,
    )
    from wavthruvec_pytorch_tpu.data.vocoder_device_cache import (
        VocoderDeviceData,
    )

    cfg = dataclasses.replace(
        v2w_disk_dataset, split=True, segment_size=64,
        device_mel_target=True, device_resident_data=True)
    train_files, _ = get_dataset_filelist(
        cfg.input_training_file, cfg.input_validation_file)
    ds = VocoderDataset(train_files, cfg)
    dd = VocoderDeviceData(ds, cfg)
    assert dd.nbytes() > 0
    S = cfg.segment_size // cfg.total_upsample

    # forced offsets: window gather vs a hand-built host item batch
    idx = np.array([0, 3, 1], np.int32)
    fstart = np.array([2, 0, 5], np.int32)
    items = []
    for i, f0 in zip(idx, fstart):
        feat, audio, spk = ds.full_arrays(int(i))
        T = feat.shape[0]
        a = np.zeros(T * cfg.total_upsample, np.float32)
        m = min(len(audio), T * cfg.total_upsample)
        a[:m] = audio[:m]
        w_feat = feat[f0:f0 + S]
        w_audio = a[f0 * cfg.total_upsample:(f0 + S) * cfg.total_upsample]
        items.append({"wv_feat": w_feat, "spk_emb": spk, "audio": w_audio,
                      "filename": ds.files[int(i)]})
    hb = pad_vocoder_batch(items, cfg, frame_pad=S)
    hb.pop("filenames")
    db = dd.batch(idx, fstart=fstart)
    assert set(db) == set(hb)
    for k in hb:
        np.testing.assert_allclose(np.asarray(db[k]), hb[k], atol=1e-6,
                                   err_msg=k)

    # random draws stay within the host law: 0 <= fstart <= T - S
    fs = dd.draw_fstarts(np.arange(len(ds)))
    assert (fs >= 0).all()
    assert (fs <= np.maximum(dd.t_lens_host - S, 0)).all()

    # epoch_indices == epoch batch composition (same RNG stream)
    la = VocoderLoader(ds, 2, seed=9)
    lb = VocoderLoader(copy.copy(ds), 2, seed=9, num_workers=0)
    names_a = [dd.batch_filenames(i) for i in la.epoch_indices()]
    names_b = [b["filenames"] for b in lb.epoch()]
    assert names_a == names_b
