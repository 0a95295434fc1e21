"""Experimental fused vocoder ResBlock unit as a Pallas TPU kernel.

One HiFi-GAN ResBlock2 conv unit is ``x <- conv_k,d(leaky_relu(x)) + x``
(vec2wav/models.py:65-70).  XLA materializes the lrelu output and the conv
output in HBM; this kernel streams T tiles through VMEM (halo DMA from HBM),
applies the activation on the fly, computes the dilated conv as k shifted
[TILE, C] x [C, C] matmuls, and adds the residual before writing back — one
HBM read + one write per element instead of four.

Status: numerically verified vs the XLA op (standalone and inside the full
Generator — relative drift ~1e-4 on a random net) and wired behind
``Generator(cfg, fused=True)``.  Standalone the kernel beats the isolated XLA
op 2.2-6.5x, but inside the full generator graph XLA already fuses the
activation/residual into its convs, so end-to-end it is only ~1.03x — the
default therefore stays False (measurements in BENCH_NOTES.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, b_ref, o_ref, scratch, sem, *, dilation, neg_slope):
    bi = pl.program_id(0)  # batch item
    i = pl.program_id(1)  # T tile
    _, TILE, C = o_ref.shape
    k = w_ref.shape[0]
    halo = (k // 2) * dilation
    halo8 = ((halo + 7) // 8) * 8  # Mosaic: DMA offsets/sizes 8-row aligned
    T = x_hbm.shape[1]

    # zero scratch edges (conv zero-padding semantics), then DMA the valid
    # [start-halo8, start+TILE+halo8) window of x (scratch row 0 anchors at
    # start - halo8; all bounds are multiples of 8 since TILE, T are).
    scratch[...] = jnp.zeros_like(scratch)
    start = i * TILE
    lo = pl.multiple_of(jnp.maximum(start - halo8, 0), 8)
    hi = pl.multiple_of(jnp.minimum(start + TILE + halo8, T), 8)
    size = pl.multiple_of(hi - lo, 8)
    dst_off = pl.multiple_of(lo - (start - halo8), 8)
    dma = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(lo, size), :],
        scratch.at[pl.ds(dst_off, size), :],
        sem,
    )
    dma.start()
    dma.wait()

    def act(v):
        return jnp.where(v >= 0, v, neg_slope * v)

    base = halo8 - halo  # static
    # taps use STATIC offsets (VMEM dynamic sublane offsets need 8-alignment
    # proofs); the unroll's live slices bound the tile size (see _pick_tile).
    acc = jnp.broadcast_to(b_ref[0], (TILE, C)).astype(jnp.float32)
    for j in range(k):
        off = base + j * dilation
        xs = act(scratch[pl.ds(off, TILE), :])
        acc = acc + jnp.dot(xs, w_ref[j], preferred_element_type=jnp.float32)
    o_ref[0] = acc + scratch[pl.ds(halo8, TILE), :]


@functools.partial(
    jax.jit, static_argnames=("dilation", "neg_slope", "tile", "interpret")
)
def fused_conv_residual(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    dilation: int = 1,
    neg_slope: float = 0.1,
    tile: int = 8192,
    interpret: bool = False,
) -> jnp.ndarray:
    """x [T, C] or [B, T, C], w [k, C, C], b [C] ->
    conv_{k,d}(lrelu(x)) + x with zero-padded conv borders
    (torch Conv1d padding=(k*d-d)//2 semantics)."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    B, T, C = x.shape
    k = w.shape[0]
    halo = (k // 2) * dilation
    halo8 = ((halo + 7) // 8) * 8
    # the unrolled taps keep ~k live [tile, C] slices on the VMEM stack;
    # bound the tile so k*tile*C*4 stays well under the 16 MB VMEM.
    budget_rows = (6 * 1024 * 1024) // (k * C * 4)
    tile = min(tile, T, max(512, budget_rows // 8 * 8))
    while T % tile != 0:
        tile -= 8
    assert tile >= 8 and T % 8 == 0 and C % 128 == 0, (T, tile, C)
    grid = (B, T // tile)
    kernel = functools.partial(_kernel, dilation=dilation, neg_slope=neg_slope)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM; halo DMA
            pl.BlockSpec((k, C, C), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * halo8, C), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x.astype(jnp.float32), w.astype(jnp.float32), b.reshape(1, -1).astype(jnp.float32))
    return out[0] if squeeze else out


def conv_residual_reference(x, w, b, dilation=1, neg_slope=0.1):
    """XLA reference of the same op (what the Generator does today)."""
    xt = jnp.where(x >= 0, x, neg_slope * x)
    k = w.shape[0]
    pad = (k * dilation - dilation) // 2
    y = lax.conv_general_dilated(
        xt[None],
        w,
        window_strides=(1,),
        padding=[(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )[0]
    return y + b[None, :] + x


def fused_supported(x_shape, features, kernel_size, stride, groups, padding,
                    dilation, dtype) -> bool:
    """Shape/config gate for the fused path: same-channel same-length conv,
    C multiple of 128 (HBM->VMEM DMA lane alignment), T multiple of 8."""
    import jax.numpy as _jnp

    B, T, C = x_shape
    halo = (kernel_size // 2) * dilation
    return (
        stride == 1
        and groups == 1
        and features == C
        and padding == (kernel_size * dilation - dilation) // 2
        and C % 128 == 0
        and T % 8 == 0
        and T >= 2 * (((halo + 7) // 8) * 8) + 8
        and dtype in (_jnp.float32, None)
    )
