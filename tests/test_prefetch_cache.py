"""Host input-pipeline tests: background prefetch, RAM caching, worker
threads, and the feature-space windowed-generator mode."""

import dataclasses
import os

import numpy as np
import pytest

from wavthruvec_pytorch_tpu.data.prefetch import PrefetchIterator, prefetched

# sub-minute smoke tier for inner-loop development (README Usage)
pytestmark = pytest.mark.smoke


def test_prefetch_yields_everything_in_order():
    src = list(range(57))
    out = list(prefetched(iter(src), depth=3))
    assert out == src


def test_prefetch_propagates_exceptions():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = PrefetchIterator(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        for _ in it:
            pass


def test_prefetch_early_break_cleans_up():
    def gen():
        for i in range(10**6):
            yield i

    for i in prefetched(gen(), depth=2):
        if i == 3:
            break
    # generator-form cleanup stops the producer thread (no hang on exit)


def test_prefetch_disabled_passthrough():
    assert list(prefetched(iter([1, 2, 3]), enabled=False)) == [1, 2, 3]


# ---------------------------------------------------------------------------
# VocoderDataset caching + windowed mode (uses the shared disk fixture)
# ---------------------------------------------------------------------------

from tests.test_data_pipeline import v2w_disk_dataset  # noqa: F401,E402


def _make_dataset(cfg, **kw):
    from wavthruvec_pytorch_tpu.data.vocoder_data import (
        VocoderDataset,
        get_dataset_filelist,
    )

    train_files, _ = get_dataset_filelist(
        cfg.input_training_file, cfg.input_validation_file
    )
    return VocoderDataset(train_files, cfg, **kw)


def test_item_cache_hits_across_epochs(v2w_disk_dataset):  # noqa: F811
    cfg = v2w_disk_dataset
    ds = _make_dataset(cfg, split=False)
    first = ds[0]
    again = ds[0]
    assert again is first  # whole-item RAM cache in deterministic mode
    assert ds._cache_bytes > 0


def test_cache_budget_zero_disables(v2w_disk_dataset):  # noqa: F811
    cfg = v2w_disk_dataset
    ds = _make_dataset(cfg, split=False, cache_budget_bytes=0)
    a, b = ds[0], ds[0]
    assert a is not b
    np.testing.assert_array_equal(a["audio"], b["audio"])


def test_split_mode_feature_space_window(v2w_disk_dataset):  # noqa: F811
    # fixture utterances are 10-16 frames; use a segment shorter than that
    cfg = dataclasses.replace(v2w_disk_dataset, segment_size=128)
    ds = _make_dataset(cfg, split=True)
    seg_frames = cfg.segment_size // cfg.total_upsample
    item = ds[0]
    assert item["wv_feat"].shape[0] == seg_frames
    assert item["audio"].shape[0] == seg_frames * cfg.total_upsample
    # window aligns: the audio window must be a slice of the full wav
    full = _make_dataset(cfg, split=False)[0]
    L = item["audio"].shape[0]
    found = any(
        np.array_equal(full["audio"][s : s + L], item["audio"])
        for s in range(0, max(1, len(full["audio"]) - L + 1), cfg.total_upsample)
    ) or len(full["audio"]) <= L
    assert found


def test_split_loader_static_shapes_and_workers(v2w_disk_dataset):  # noqa: F811
    from wavthruvec_pytorch_tpu.data.vocoder_data import VocoderLoader

    cfg = dataclasses.replace(v2w_disk_dataset, segment_size=128)
    ds = _make_dataset(cfg, split=True)
    loader = VocoderLoader(ds, batch_size=2, num_workers=2)
    seg_frames = cfg.segment_size // cfg.total_upsample
    shapes = set()
    for batch in loader.epoch():
        shapes.add(batch["wv_feat"].shape)
        assert batch["audio"].shape[1] == seg_frames * cfg.total_upsample
        assert np.isfinite(batch["mel_loss"]).all()
    assert len(shapes) == 1  # one static jit signature in windowed mode
    assert next(iter(shapes))[1] == seg_frames


def test_workers_match_serial(v2w_disk_dataset):  # noqa: F811
    from wavthruvec_pytorch_tpu.data.vocoder_data import VocoderLoader

    cfg = v2w_disk_dataset
    ds0 = _make_dataset(cfg, split=False)
    ds1 = _make_dataset(cfg, split=False)
    b0 = next(VocoderLoader(ds0, 2, seed=7, num_workers=0).epoch())
    b1 = next(VocoderLoader(ds1, 2, seed=7, num_workers=3).epoch())
    for k in ("wv_feat", "spk_emb", "audio", "mel_loss"):
        np.testing.assert_array_equal(b0[k], b1[k])
