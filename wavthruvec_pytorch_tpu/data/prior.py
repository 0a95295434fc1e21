"""Beta-binomial diagonal attention prior, disk-cached per (tokens, frames).

Reference: text2vec/dataset.py:24-55 — for each frame i in 1..M the prior row
is ``BetaBinom(P-1, s*i, s*(M+1-i)).pmf(arange(P))``.  Computed on host (it
feeds the data pipeline, not the jitted step) with scipy when present and a
log-gamma closed form otherwise; cached as ``{N}_{T}_prior.npy``.
"""

from __future__ import annotations

import os

import numpy as np

try:  # scipy is available in the target image; keep a fallback anyway
    from scipy.stats import betabinom as _betabinom

    _HAVE_SCIPY = True
except Exception:  # pragma: no cover
    from scipy.special import gammaln as _gammaln  # type: ignore

    _HAVE_SCIPY = False


def _betabinom_pmf(k: np.ndarray, n: int, a: float, b: float) -> np.ndarray:
    if _HAVE_SCIPY:
        return _betabinom(n, a, b).pmf(k)
    # closed form: C(n,k) * B(k+a, n-k+b) / B(a,b)
    from math import lgamma

    def lg(x):
        return np.vectorize(lgamma)(x)

    logpmf = (
        lg(n + 1) - lg(k + 1) - lg(n - k + 1)
        + lg(k + a) + lg(n - k + b) - lg(n + a + b)
        - (lg(a) + lg(b) - lg(a + b))
    )
    return np.exp(logpmf)


def beta_binomial_prior_distribution(
    phoneme_count: int, mel_count: int, scaling_factor: float = 0.05
) -> np.ndarray:
    """[mel_count, phoneme_count] float64 prior (reference: dataset.py:24-35)."""
    P, M = phoneme_count, mel_count
    x = np.arange(0, P)
    rows = []
    for i in range(1, M + 1):
        a, b = scaling_factor * i, scaling_factor * (M + 1 - i)
        rows.append(_betabinom_pmf(x, P - 1, a, b))
    return np.asarray(rows)


def get_attention_prior(
    n_tokens: int,
    n_frames: int,
    cache_path: str = "./data/align_prior",
    scaling_factor: float = 1.0,
    use_attn_prior_masking: bool = True,
) -> np.ndarray:
    """Disk-cached prior lookup (reference: dataset.py:38-55); .npy cache."""
    if not use_attn_prior_masking:
        return np.ones((n_frames, n_tokens), dtype=np.float32)
    os.makedirs(cache_path, exist_ok=True)
    prior_path = os.path.join(cache_path, f"{n_tokens}_{n_frames}_prior.npy")
    if os.path.exists(prior_path):
        return np.load(prior_path)
    prior = beta_binomial_prior_distribution(
        n_tokens, n_frames, scaling_factor
    ).astype(np.float32)
    np.save(prior_path, prior)
    return prior
