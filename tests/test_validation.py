"""compute_validation_loss: finite-batch averaging + non-finite reporting."""

import numpy as np

from wavthruvec_pytorch_tpu.train.text2vec_loop import compute_validation_loss


class _FakeLoader:
    def __init__(self, n):
        self.n = n

    def epoch(self):
        for i in range(self.n):
            yield {"audiopaths": [f"u{i}"], "x": np.zeros((2, 3), np.float32)}


class _FakeLogger:
    def __init__(self):
        self.scalars = {}

    def add_scalar(self, tag, value, step):
        self.scalars[tag] = value


class _FakeState:
    params = None
    batch_stats = None


def test_nonfinite_batches_excluded_from_mean():
    calls = []

    def val_fn(params, batch_stats, batch):
        i = len(calls)
        calls.append(i)
        if i == 1:  # second batch goes NaN (eval-mode BN overflow scenario)
            return {"WVF_loss": np.float32("nan"), "duration_loss": np.float32(1.0)}
        return {"WVF_loss": np.float32(i), "duration_loss": np.float32(2.0)}

    logger = _FakeLogger()
    out = compute_validation_loss(
        None, None, _FakeState(), _FakeLoader(3), logger, iteration=7,
        val_fn=val_fn)
    # batches 0 and 2 are finite: mean WVF = (0 + 2) / 2
    assert out["WVF_loss"] == 1.0
    assert out["duration_loss"] == 2.0
    assert out["nonfinite_batches"] == 1
    assert logger.scalars["val/WVF_loss"] == 1.0
    assert logger.scalars["val/nonfinite_batches"] == 1


def test_all_finite_keeps_plain_mean():
    def val_fn(params, batch_stats, batch):
        return {"WVF_loss": np.float32(2.0)}

    logger = _FakeLogger()
    out = compute_validation_loss(
        None, None, _FakeState(), _FakeLoader(4), logger, iteration=1,
        val_fn=val_fn)
    assert out["WVF_loss"] == 2.0
    assert out["nonfinite_batches"] == 0
