"""Native C++ npy loader/prefetcher vs numpy oracle."""

import numpy as np
import pytest

from wavthruvec_pytorch_tpu.data import native_io

# sub-minute smoke tier for inner-loop development (README Usage)
pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def lib():
    lib = native_io.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_read_npy_dtypes(tmp_path, lib):
    rng = np.random.default_rng(0)
    cases = [
        rng.standard_normal((1, 37, 64)).astype(np.float32),
        rng.standard_normal((5, 3)).astype(np.float64),
        rng.integers(-100, 100, (7,)).astype(np.int16),
        rng.integers(-100, 100, (2, 2, 2, 2)).astype(np.int64),
    ]
    for i, arr in enumerate(cases):
        p = str(tmp_path / f"a{i}.npy")
        np.save(p, arr)
        got = native_io.read_npy(p)
        assert got.dtype == np.float32
        np.testing.assert_allclose(got, arr.astype(np.float32), rtol=1e-6)


def test_read_npy_capacity_regrow(tmp_path, lib):
    arr = np.arange(10000, dtype=np.float32).reshape(100, 100)
    p = str(tmp_path / "big.npy")
    np.save(p, arr)
    got = native_io.read_npy(p, capacity=16)  # force the -2 regrow path
    np.testing.assert_array_equal(got, arr)


def test_prefetcher_in_order(tmp_path, lib):
    rng = np.random.default_rng(1)
    paths, arrays = [], []
    for i in range(32):
        a = rng.standard_normal((1, int(rng.integers(5, 50)), 16)).astype(np.float32)
        p = str(tmp_path / f"f{i}.npy")
        np.save(p, a)
        paths.append(p)
        arrays.append(a)
    with native_io.Prefetcher(paths, n_threads=4, window=8) as pf:
        for i in range(len(paths)):
            got = pf.get(i)
            np.testing.assert_array_equal(got, arrays[i])


def test_prefetcher_feeds_buffer_loader(tmp_path, lib):
    """native prefetch plugged into the t2v buffer load path."""
    import dataclasses

    from tests.test_models import T2V_SMALL
    from wavthruvec_pytorch_tpu.data.dataset import load_buffer
    from wavthruvec_pytorch_tpu.text import TextFrontend

    cfg = dataclasses.replace(
        T2V_SMALL,
        vocab_size=10,
        betabinom_cache_path=str(tmp_path / "prior"),
        feat_ground_truth=str(tmp_path),
    )
    rng = np.random.default_rng(2)
    lines = []
    for i in range(4):
        np.save(tmp_path / f"u{i}.npy",
                rng.standard_normal((1, 20, cfg.n_feat_dim)).astype(np.float32))
        lines.append(f"u{i}.npy|abc|spk")
    flist = tmp_path / "list.txt"
    flist.write_text("\n".join(lines) + "\n")
    frontend = TextFrontend("PE abc")
    buf = load_buffer([str(flist)], cfg, frontend, npy_loader=native_io.read_npy)
    assert len(buf) == 4
    assert buf[0]["feat_gt_target"].shape == (20, cfg.n_feat_dim)
