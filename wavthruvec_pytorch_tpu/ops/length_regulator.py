"""Length-regulator expansion as XLA-friendly gather ops.

The reference builds the duration->alignment matrix with a Python triple
loop on host numpy at inference time (text2vec/module.py:45-53,63-85), a
host<->device boundary inside the generation path.  On TPU we express the
expansion as a cumsum + searchsorted gather with static padded shapes, fully
inside jit.

Semantics: frame t is assigned token j iff
``cumsum(durations)[j-1] <= t < cumsum(durations)[j]`` — identical to the
reference's ``create_alignment`` (row ``count+k`` gets a 1 at column j for
``k < durations[j]``).  Frames beyond ``sum(durations)`` map to no token
(all-zero alignment row), matching the zero-padded reference matrix.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax


def durations_to_alignment(
    durations: jnp.ndarray, max_frames: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, N] int durations -> ([B, max_frames, N] one-hot alignment, [B] total).

    The alignment matmul ``alignment @ x`` then reproduces the reference LR
    (module.py:81).  ``max_frames`` must be static (padded bucket length).
    """
    durations = durations.astype(jnp.int32)
    B, N = durations.shape
    ends = jnp.cumsum(durations, axis=1)  # [B, N] exclusive-end boundaries
    total = ends[:, -1]
    t = lax.broadcasted_iota(jnp.int32, (B, max_frames, 1), 1)
    starts = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), ends[:, :-1]], axis=1)
    # frame t belongs to token j iff starts[j] <= t < ends[j]
    align = jnp.logical_and(
        t >= starts[:, None, :], t < ends[:, None, :]
    ).astype(jnp.float32)
    return align, total


def expand_by_durations(
    x: jnp.ndarray, durations: jnp.ndarray, max_frames: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand encoder states by durations via gather (no [T, N] matmul).

    Equivalent to ``durations_to_alignment(...) @ x`` but O(T·C) instead of
    O(T·N·C): frame t gathers token ``searchsorted(ends, t, 'right')``.

    Args:
      x: [B, N, C] token states.
      durations: [B, N] int durations.
      max_frames: static output length.
    Returns:
      ([B, max_frames, C] expanded states with zeros beyond the total
      duration, [B] total frame counts).
    """
    durations = durations.astype(jnp.int32)
    B, N, C = x.shape
    ends = jnp.cumsum(durations, axis=1)
    total = ends[:, -1]
    t = lax.broadcasted_iota(jnp.int32, (B, max_frames), 1)
    # token index for each frame: number of ends <= t
    idx = jnp.sum(t[:, :, None] >= ends[:, None, :], axis=2)  # [B, T]
    valid = t < total[:, None]
    idx_clamped = jnp.minimum(idx, N - 1)
    out = jnp.take_along_axis(x, idx_clamped[:, :, None], axis=1)
    out = jnp.where(valid[:, :, None], out, 0.0)
    return out, total
