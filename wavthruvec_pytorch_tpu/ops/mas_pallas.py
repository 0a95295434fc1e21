"""Pallas TPU kernel for width-1 Monotonic Alignment Search.

The lax.scan implementation (ops/mas.py) round-trips the [B, N] carry through
XLA's while-loop machinery for every one of up to 3000 frames.  This kernel
keeps the whole per-item problem resident in VMEM — the [T, N] log-attention,
the came-from-left plane and the output — and runs both the forward DP and
the backtrack as in-kernel fori_loops, one grid step per batch item.

Semantics identical to ops.mas.mas_width1_batched (and therefore to the
reference numba kernel, text2vec/alignment.py:32-59): left-tie preference,
row-0 pinning, crop via in_len/out_len, trailing opt[0, 0] = 1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _mas_kernel(in_lens_ref, out_lens_ref, attn_ref, opt_ref, take_left_ref):
    b = pl.program_id(0)
    in_len = in_lens_ref[b]
    out_len = out_lens_ref[b]
    T, N = attn_ref.shape[1], attn_ref.shape[2]

    col = lax.broadcasted_iota(jnp.int32, (1, N), 1)
    col_valid = col < in_len

    def log_row(i):
        row = attn_ref[0, i, :].reshape(1, N)
        lrow = jnp.log(jnp.maximum(row, 0.0))
        lrow = jnp.maximum(lrow, _NEG_INF)
        return jnp.where(col_valid, lrow, _NEG_INF)

    # row 0: pin the path start to text index 0 (alignment.py:37)
    log_p0 = jnp.where(col > 0, _NEG_INF, log_row(0))
    take_left_ref[0, :] = jnp.zeros((1, N), jnp.float32)[0]

    def fwd_body(i, log_p):
        shifted = pltpu.roll(log_p, 1, axis=1)
        shifted = jnp.where(col == 0, _NEG_INF, shifted)
        take_left = shifted >= log_p  # left tie preference (alignment.py:46)
        prev_best = jnp.maximum(shifted, log_p)
        new_log_p = log_row(i) + prev_best
        take_left_ref[i, :] = take_left.astype(jnp.float32)[0]
        return new_log_p

    lax.fori_loop(1, T, fwd_body, log_p0)

    # backtrack from (out_len - 1, in_len - 1)
    def bwd_body(k, curr):
        i = T - 1 - k
        active = i < out_len
        one_hot = (col[0] == curr).astype(jnp.float32)
        mark = jnp.where(active, one_hot, 0.0)
        opt_ref[0, i, :] = mark
        tl_row = take_left_ref[i, :]
        came_left = jnp.sum(tl_row * one_hot) > 0.0
        step_back = jnp.logical_and(
            active, jnp.logical_and(came_left, i > 0)
        )
        return jnp.where(step_back, curr - 1, curr)

    lax.fori_loop(0, T, bwd_body, in_len - 1)

    # trailing opt[0, 0] = 1 (alignment.py:58)
    @pl.when(out_len > 0)
    def _():
        row0 = opt_ref[0, 0, :]
        opt_ref[0, 0, :] = jnp.where(col[0] == 0, 1.0, row0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mas_width1_pallas(
    attn: jnp.ndarray,
    in_lens: jnp.ndarray,
    out_lens: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, T, N] soft attention + lengths -> [B, T, N] hard alignment."""
    B, T, N = attn.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, N), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, N), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T, N), jnp.float32)],
    )
    return pl.pallas_call(
        _mas_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, N), jnp.float32),
        interpret=interpret,
    )(
        in_lens.astype(jnp.int32),
        out_lens.astype(jnp.int32),
        attn.astype(jnp.float32),
    )
