"""Host-side plotting for TensorBoard (reference: text2vec/log_utils.py:6-38
alignment heatmap; vec2wav/utils.py:11-22 spectrogram figure)."""

from __future__ import annotations

import numpy as np


def save_figure_to_numpy(fig) -> np.ndarray:
    data = np.frombuffer(fig.canvas.tostring_argb(), dtype=np.uint8)
    w, h = fig.canvas.get_width_height()
    data = data.reshape(h, w, 4)[..., 1:]  # ARGB -> RGB
    return data


def plot_alignment_to_numpy(alignment: np.ndarray, title: str = "") -> np.ndarray:
    """[n_text, n_frames] attention map -> HWC uint8 image."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.imshow(alignment, aspect="auto", origin="lower", interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("Decoder timestep")
    ax.set_ylabel("Encoder timestep")
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.canvas.draw()
    data = save_figure_to_numpy(fig)
    plt.close(fig)
    return data


def plot_spectrogram(spectrogram: np.ndarray):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 2))
    im = ax.imshow(spectrogram, aspect="auto", origin="lower", interpolation="none")
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    return fig
