"""Observability: TensorBoard + plain-text loggers.

Reference: TensorBoard SummaryWriter scalars every iter + alignment images
every log_step (text2vec/train.py:363-422), text logger at
run/{seed}/logger/logger.txt (train.py:403-408), v2w scalars/audio/figures
(vec2wav/train.py:241-289).  torch's SummaryWriter is used when available
(torch is in the image); otherwise scalars append to a JSONL file.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class TrainLogger:
    def __init__(self, tb_dir: str, text_dir: Optional[str] = None):
        os.makedirs(tb_dir, exist_ok=True)
        self.text_path = None
        if text_dir:
            os.makedirs(text_dir, exist_ok=True)
            self.text_path = os.path.join(text_dir, "logger.txt")
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(tb_dir)
        except Exception:
            self.tb = None
            self._jsonl = open(os.path.join(tb_dir, "scalars.jsonl"), "a")

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self.tb is not None:
            self.tb.add_scalar(tag, value, step)
        else:
            self._jsonl.write(
                json.dumps({"tag": tag, "value": float(value), "step": step}) + "\n"
            )

    def add_image(self, tag: str, image_hwc, step: int) -> None:
        if self.tb is not None:
            self.tb.add_image(tag, image_hwc, step, dataformats="HWC")

    def add_audio(self, tag: str, wav, step: int, sample_rate: int) -> None:
        if self.tb is not None:
            import torch

            self.tb.add_audio(tag, torch.from_numpy(wav), step, sample_rate)

    def add_figure(self, tag: str, fig, step: int) -> None:
        if self.tb is not None:
            self.tb.add_figure(tag, fig, step)

    def text(self, *lines: str) -> None:
        for line in lines:
            print(line)
        if self.text_path:
            with open(self.text_path, "a") as f:
                for line in lines:
                    f.write(line + "\n")
                f.write("\n")

    def flush(self) -> None:
        if self.tb is not None:
            self.tb.flush()


class NullLogger:
    """No-op logger for non-zero hosts under multi-process training (the
    reference gates TB/text logging to rank 0, vec2wav/train.py:124-136)."""

    def add_scalar(self, *a, **k): pass
    def add_image(self, *a, **k): pass
    def add_audio(self, *a, **k): pass
    def add_figure(self, *a, **k): pass
    def text(self, *a, **k): pass
    def flush(self): pass


def host_logger(tb_dir, text_dir=None):
    """TrainLogger on process 0, NullLogger elsewhere."""
    import jax

    if jax.process_index() == 0:
        return TrainLogger(tb_dir, text_dir)
    return NullLogger()


class StepTimer:
    """Rolling per-iteration wall-clock window (reference: text2vec/train.py
    Time/clear_Time bookkeeping, lines 276, 442-448)."""

    def __init__(self, window: int = 20):
        self.window = window
        self.times = []
        self._last = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self.times.append(dt)
            if len(self.times) >= self.window:
                self.times = [sum(self.times) / len(self.times)]
        self._last = now
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0
