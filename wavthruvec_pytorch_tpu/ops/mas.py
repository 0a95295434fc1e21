"""Monotonic Alignment Search (Viterbi binarization) as a native TPU kernel.

The reference offloads this to a numba ``@jit(nopython=True)`` CPU kernel run
serially per batch item (text2vec/alignment.py:31-59, model.py:239-253) with a
device->host->device round trip every step.  Here MAS is a batch-vectorized
``lax.scan`` over frames that runs inside the jitted training step:

* forward pass: carry is the [B, N] log-prob row; each step does a shifted
  max against the left neighbor (vectorized over batch and text dims — the
  same parallelization as the "Super Monotonic Alignment Search" formulation,
  see PAPERS.md) and emits a boolean "came-from-left" plane;
* backtrack: a reverse ``lax.scan`` following the stored booleans, emitting a
  one-hot row per frame.

Exact semantic notes vs. the reference kernel (alignment.py:32-59):
* ``attn_map[0, 1:] = -inf`` pins the path start to text index 0;
* ties prefer the left neighbor (``>=`` comparison, alignment.py:46);
* after backtracking the reference unconditionally sets ``opt[0, 0] = 1``
  (alignment.py:58; ``prev_ind`` row 0 is never written so it reads 0) — we
  reproduce that too;
* variable lengths: the reference crops to ``[out_len, in_len]`` per item; we
  run on the padded rectangle and (a) mask text positions >= in_len to -inf,
  (b) start the backtrack at ``(out_len-1, in_len-1)`` by freezing the cursor
  on rows >= out_len.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_NEG_INF = -1e30  # large-finite; avoids inf-inf NaNs in masked rows


def _forward_scan(log_attn_tbn: jnp.ndarray) -> jnp.ndarray:
    """log_attn: [T, B, N] -> came_from_left: [T, B, N] bool."""

    def step(log_p, log_attn_row):
        # log_p: [B, N] best path score ending at (i-1, j)
        shifted = jnp.concatenate(
            [jnp.full_like(log_p[:, :1], _NEG_INF), log_p[:, :-1]], axis=1
        )
        take_left = shifted >= log_p  # tie prefers left (alignment.py:46)
        prev_best = jnp.maximum(shifted, log_p)
        new_log_p = log_attn_row + prev_best
        return new_log_p, take_left

    init = log_attn_tbn[0]
    _, take_left = lax.scan(step, init, log_attn_tbn[1:])
    # row 0 has no predecessor; prepend a false plane so indices line up
    first = jnp.zeros_like(take_left[:1], dtype=bool)
    return jnp.concatenate([first, take_left], axis=0)


def mas_width1_batched(
    attn: jnp.ndarray,
    in_lens: jnp.ndarray,
    out_lens: jnp.ndarray,
) -> jnp.ndarray:
    """Batched width-1 MAS on padded inputs.

    Args:
      attn: [B, T, N] soft attention (probabilities; frames x text).
      in_lens: [B] valid text lengths.
      out_lens: [B] valid frame lengths.
    Returns:
      [B, T, N] float32 hard alignment (0/1), zero outside valid regions.
    """
    B, T, N = attn.shape
    in_lens = in_lens.astype(jnp.int32)
    out_lens = out_lens.astype(jnp.int32)

    log_attn = jnp.log(jnp.maximum(attn.astype(jnp.float32), 0.0))
    log_attn = jnp.maximum(log_attn, _NEG_INF)

    col = lax.broadcasted_iota(jnp.int32, (B, T, N), 2)
    # invalid text positions -> -inf (reference crops to [:, :in_len])
    log_attn = jnp.where(col < in_lens[:, None, None], log_attn, _NEG_INF)
    # pin start: attn_map[0, 1:] = -inf (alignment.py:37)
    row0_pin = (lax.broadcasted_iota(jnp.int32, (B, N), 1) > 0)
    log_attn = log_attn.at[:, 0, :].set(
        jnp.where(row0_pin, _NEG_INF, log_attn[:, 0, :])
    )

    take_left = _forward_scan(jnp.transpose(log_attn, (1, 0, 2)))  # [T, B, N]

    # --- backtrack (reverse scan over frames) ---
    row_ids = lax.broadcasted_iota(jnp.int32, (T, 1), 0)[:, 0]  # [T]

    def back_step(curr, inputs):
        i, tl_row = inputs  # i: scalar frame idx, tl_row: [B, N]
        active = i < out_lens  # [B]
        mark = jnp.where(
            active[:, None],
            jax.nn.one_hot(curr, N, dtype=jnp.float32),
            jnp.zeros((B, N), jnp.float32),
        )
        came_left = jnp.take_along_axis(tl_row, curr[:, None], axis=1)[:, 0]
        step_back = jnp.logical_and(active, jnp.logical_and(came_left, i > 0))
        new_curr = jnp.where(step_back, curr - 1, curr)
        new_curr = jnp.where(active, new_curr, curr)
        return new_curr, mark

    init_curr = in_lens - 1  # backtrack starts at (out_len-1, in_len-1)
    _, marks = lax.scan(
        back_step, init_curr, (row_ids, take_left), reverse=True
    )
    opt = jnp.transpose(marks, (1, 0, 2))  # [B, T, N]

    # reference's trailing ``opt[0, curr] = 1`` with curr = prev_ind[0, ...] = 0
    # (alignment.py:58): always marks (0, 0) for any non-empty item.
    has_frames = (out_lens > 0)[:, None]
    opt = opt.at[:, 0, 0].set(
        jnp.where(has_frames[:, 0], 1.0, opt[:, 0, 0])
    )
    return opt


def mas_width1(attn: jnp.ndarray) -> jnp.ndarray:
    """Single-example MAS on a full-valid [T, N] map (convenience/tests)."""
    T, N = attn.shape
    out = mas_width1_batched(
        attn[None],
        jnp.array([N], jnp.int32),
        jnp.array([T], jnp.int32),
    )
    return out[0]


def mas_width1_numpy(attn_map: np.ndarray) -> np.ndarray:
    """Pure-numpy port of the reference numba kernel semantics
    (text2vec/alignment.py:32-59) used as the golden oracle in tests."""
    attn_map = np.asarray(attn_map, dtype=np.float64)
    T, N = attn_map.shape
    opt = np.zeros((T, N), dtype=np.float64)
    with np.errstate(divide="ignore"):
        log_attn = np.log(attn_map)
    log_attn[0, 1:] = -np.inf
    log_p = np.zeros_like(log_attn)
    log_p[0, :] = log_attn[0, :]
    prev_ind = np.zeros_like(log_attn, dtype=np.int64)
    for i in range(1, T):
        for j in range(N):
            prev_log = log_p[i - 1, j]
            prev_j = j
            if j - 1 >= 0 and log_p[i - 1, j - 1] >= log_p[i - 1, j]:
                prev_log = log_p[i - 1, j - 1]
                prev_j = j - 1
            log_p[i, j] = log_attn[i, j] + prev_log
            prev_ind[i, j] = prev_j
    curr = N - 1
    for i in range(T - 1, -1, -1):
        opt[i, curr] = 1
        curr = prev_ind[i, curr]
    opt[0, curr] = 1
    return opt
