"""Pallas TPU kernel for width-1 Monotonic Alignment Search.

The lax.scan implementation (ops/mas.py) round-trips the [B, N] carry through
XLA's while-loop machinery for every one of up to 3000 frames.  This kernel
keeps a TILE of batch items resident in VMEM and runs both the forward DP and
the backtrack as in-kernel fori_loops whose per-step work is a vectorized
[Bt, N] row update (batch on sublanes, text on lanes).  Scratch planes are
batch-major ([Bt, T, N]: batch on the untiled leading axis, (T, N) on the
(8, 128) tiling); rows are accessed with a dynamic index on the middle axis.

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
_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom under the ~16 MB/core VMEM


def _mas_kernel(in_lens_ref, out_lens_ref, attn_ref, opt_ref, take_left_ref):
    """attn_ref/opt_ref: [Bt, T, N] blocks (batch on the untiled leading axis
    so any tile size is legal; T and N land on the (8,128) tiling)."""
    b = pl.program_id(0)
    Bt, T, N = attn_ref.shape
    # SMEM (scalar-prefetch) refs only yield scalars; assemble the tile's
    # length vectors from Bt scalar reads (Bt is static).
    in_len = jnp.stack([in_lens_ref[b * Bt + j] for j in range(Bt)]).reshape(Bt, 1)
    out_len = jnp.stack([out_lens_ref[b * Bt + j] for j in range(Bt)]).reshape(Bt, 1)

    col = lax.broadcasted_iota(jnp.int32, (Bt, N), 1)
    col_valid = col < in_len

    def log_row(i):
        row = attn_ref[:, i, :]  # [Bt, N]
        lrow = jnp.log(jnp.maximum(row, 0.0))
        lrow = jnp.maximum(lrow, _NEG_INF)
        return jnp.where(col_valid, lrow, _NEG_INF)

    # row 0: pin the path start to text index 0 (alignment.py:37)
    log_p0 = jnp.where(col > 0, _NEG_INF, log_row(0))
    take_left_ref[:, 0, :] = jnp.zeros((Bt, N), jnp.float32)

    def fwd_body(i, log_p):
        shifted = pltpu.roll(log_p, 1, axis=1)
        shifted = jnp.where(col == 0, _NEG_INF, shifted)
        take_left = shifted >= log_p  # left tie preference (alignment.py:46)
        prev_best = jnp.maximum(shifted, log_p)
        new_log_p = log_row(i) + prev_best
        take_left_ref[:, i, :] = take_left.astype(jnp.float32)
        return new_log_p

    lax.fori_loop(1, T, fwd_body, log_p0)

    # backtrack from (out_len - 1, in_len - 1), vectorized over the tile
    def bwd_body(k, curr):  # curr: [Bt, 1] int32
        i = T - 1 - k
        active = i < out_len  # [Bt, 1]
        one_hot = (col == curr).astype(jnp.float32)
        mark = jnp.where(active, one_hot, 0.0)
        opt_ref[:, i, :] = mark
        tl_row = take_left_ref[:, i, :]
        came_left = jnp.sum(tl_row * one_hot, axis=1, keepdims=True) > 0.0
        step_back = jnp.logical_and(active, jnp.logical_and(came_left, i > 0))
        return jnp.where(step_back, curr - 1, curr)

    lax.fori_loop(0, T, bwd_body, in_len - 1)

    # trailing opt[0, 0] = 1 (alignment.py:58) for every non-empty item
    row0 = opt_ref[:, 0, :]
    opt_ref[:, 0, :] = jnp.where(
        jnp.logical_and(col == 0, out_len > 0), 1.0, row0
    )


def _pick_tile(B: int, T: int, N: int) -> int:
    per_item = T * N * 4 * 3  # attn + take_left + out, f32
    bt = max(1, _VMEM_BUDGET // per_item)
    while bt > 1 and B % bt != 0:
        bt -= 1
    return min(bt, B)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mas_width1_pallas(
    attn: jnp.ndarray,
    in_lens: jnp.ndarray,
    out_lens: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, T, N] soft attention + lengths -> [B, T, N] hard alignment."""
    B, T, N = attn.shape
    Bt = _pick_tile(B, T, N)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // Bt,),
        in_specs=[
            pl.BlockSpec((Bt, T, N), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bt, T, N), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Bt, T, N), jnp.float32)],
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
