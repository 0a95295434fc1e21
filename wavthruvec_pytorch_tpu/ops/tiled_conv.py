"""MXU-packed grouped 1-D convolution (the MSD hot-op fix).

Motivation (measured, BENCH_NOTES "MSD grouped-conv repack"): the reference
MSD discriminator (vec2wav/models.py:218-243) chains k=41 convs with
``groups`` 4/16, i.e. per-group matmuls with 8-64 output channels.  On the
MXU (128x128 systolic array) those use 16/128 lanes — measured 0.6-1.1
TFLOP/s f32 on chip for the worst layer vs ~40 for dense shapes, and the
grouped-conv *gradients* are worse.  XLA lowers feature_group_count convs
faithfully but cannot change the arithmetic shape.

The repack: produce R consecutive outputs per matmul row so the lane dim
becomes ``R * (Cout/G) ~ 128``.  For output block m and in-block offset r:

    out[b, m*R + r, g, co] = sum_{j,ci} x_p[b, m*s*R + r*s + j, g, ci]
                                        * w[j, ci, g*co']

which is ONE batched matmul (batch g) between overlapping input tiles
``xt[b, m, (t_off, ci)]`` of width ``n_rows * s * R`` and a statically
expanded weight ``W_exp[g, (t_off, ci), (r, co)]`` that places ``w[j]`` at
row ``r*s + j`` of column block r.  The expansion costs
``n_rows*s*R / k`` extra FLOPs (1.4-2x here) but runs at full MXU
utilization — a measured ~6-20x win on the G=16 layers.  Gradients come
from autodiff: both einsum backwards are full-lane matmuls, and the
tile/expand backwards are slice-adds/gathers.

Semantics match ``lax.conv_general_dilated(x, w, (s,), [(p, p)],
feature_group_count=G, dimension_numbers=("NHC", "HIO", "NHC"))`` exactly
(same sums plus zero terms; float-associativity differences only).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

_TARGET_LANES = 128

# The plain lax grouped lowering only falls off a cliff when one batch
# row's spatial extent stops fitting VMEM-friendly tiles: measured f32 on
# chip (tools/disc_grad_split.py), lax fwd runs at 1-5 TFLOP/s for
# T_in >= 40k but 16-77 TFLOP/s for T_in <= 10k (where the repack's
# tile-build overhead makes it a net LOSS — windowed-B128 GAN step 308 ->
# 778 ms with the repack forced on).  Gate on input length; tests override.
MIN_T_IN = 16384


def pick_r(cout_per_group: int, target: int = _TARGET_LANES) -> int:
    """Outputs per tile so the matmul lane dim reaches ~target."""
    return max(1, target // max(1, cout_per_group))


def tiled_conv_supported(kernel_size: int, stride: int, dilation: int,
                         groups: int, cout: int,
                         t_in: Optional[int] = None) -> bool:
    """Where the repack is both valid and worth it (measured): undilated,
    grouped, small per-group output width, long spatial extent."""
    return (
        dilation == 1
        and groups > 1
        and cout % groups == 0
        and (cout // groups) < _TARGET_LANES
        and stride >= 1
        and (t_in is None or t_in >= MIN_T_IN)
    )


def mxu_grouped_conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride: int,
    padding: int,
    groups: int,
    dilation: int = 1,
    r: Optional[int] = None,
    preferred_element_type=jnp.float32,
) -> jnp.ndarray:
    """Grouped conv over [B, T, C] with HIO kernel [k, C//G, Cout].

    Drop-in for the lax.conv_general_dilated call in WNConv1d /
    SpectralNormConv1d (models/layers.py); rhs (kernel) dilation supported.
    """
    B, T, C = x.shape
    k, ci, cout = w.shape
    G = groups
    assert C == G * ci and cout % G == 0, (x.shape, w.shape, groups)
    co = cout // G
    s, d = stride, dilation
    k_eff = (k - 1) * d + 1                    # dilated kernel footprint
    R = r if r is not None else pick_r(co)

    T_out = (T + 2 * padding - k_eff) // s + 1
    if T_out <= 0:
        raise ValueError(f"empty output: T={T} k={k} s={s} p={padding} d={d}")
    sR = s * R
    span = k_eff + s * (R - 1)                 # input span of one tile
    n_rows = math.ceil(span / sR)              # whole sR-rows covering it
    n_tiles = math.ceil(T_out / R)
    # rows m .. m+n_rows-1 must exist for m = n_tiles-1
    T_need = (n_tiles - 1 + n_rows) * sR
    pad_right = T_need - T - padding
    assert pad_right >= 0
    x_p = jnp.pad(x, ((0, 0), (padding, pad_right), (0, 0)))

    # [B, n_tiles + n_rows - 1, sR, G, ci] -> stacked rows per tile
    xr = x_p.reshape(B, n_tiles + n_rows - 1, sR, G, ci)
    xt = jnp.concatenate(
        [xr[:, rr: rr + n_tiles] for rr in range(n_rows)], axis=2
    )  # [B, n_tiles, n_rows*sR, G, ci]

    # W_exp[(t_off), ci, g, r, co] = w[j : t_off = r*s + j*d] for 0 <= j < k
    wg = w.reshape(k, ci, G, co)
    W_exp = jnp.zeros((n_rows * sR, ci, G, R, co), w.dtype)
    for rr in range(R):
        if d == 1:
            W_exp = W_exp.at[rr * s: rr * s + k, :, :, rr, :].set(wg)
        else:
            W_exp = W_exp.at[rr * s: rr * s + k_eff: d, :, :, rr, :].set(wg)

    out_t = jnp.einsum(
        "btsgi,sigrn->btgrn", xt, W_exp,
        preferred_element_type=preferred_element_type,
    ).astype(x.dtype)                          # [B, n_tiles, G, R, co]
    out = jnp.swapaxes(out_t, 2, 3).reshape(B, n_tiles * R, G * co)
    return out[:, :T_out]


def reference_grouped_conv1d(x, w, stride, padding, groups, dilation=1):
    """The plain XLA lowering (test oracle)."""
    from jax import lax

    return lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        feature_group_count=groups,
        dimension_numbers=("NHC", "HIO", "NHC"),
    )


def _self_test():
    rng = np.random.default_rng(0)
    for (B, T, G, ci, co, k, s, p, d) in [
        (2, 203, 4, 32, 32, 41, 2, 20, 1),
        (2, 101, 16, 8, 16, 41, 2, 20, 1),
        (1, 57, 16, 16, 32, 41, 4, 20, 1),
        (2, 64, 2, 4, 8, 5, 1, 2, 1),
        (1, 33, 3, 5, 7, 9, 3, 4, 1),
        (2, 80, 1, 1, 128, 15, 1, 7, 1),   # MSD layer-0 family
        (2, 96, 1, 32, 32, 3, 1, 3, 3),    # ResBlock dilated family
        (1, 50, 2, 8, 16, 5, 2, 6, 2),
    ]:
        x = jnp.asarray(rng.standard_normal((B, T, G * ci)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, ci, G * co)), jnp.float32)
        a = mxu_grouped_conv1d(x, w, s, p, G, dilation=d)
        b = reference_grouped_conv1d(x, w, s, p, G, dilation=d)
        assert a.shape == b.shape, (a.shape, b.shape)
        err = float(jnp.max(jnp.abs(a - b)))
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        assert err / scale < 1e-5, (err, scale)
    print("tiled_conv self-test ok")


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")  # env alone does not skip axon
    _self_test()
