"""Pallas TPU kernel for the CBHG biGRU forward recurrence.

The lax.scan forward (models/layers.py:gru_stacked) is latency-bound: each
of T steps is a tiny [B, H] x [H, 3H] matmul plus XLA while-loop overhead
(BENCH_NOTES "GRU backward fix" — unrolling and direction fusion measured
within noise; the identified next lever was keeping h and w_hh resident in
VMEM across steps).  This kernel does exactly that — and measured
PERFORMANCE-NEUTRAL vs the scan (chained-repeat timing, BENCH_NOTES
"Pallas GRU forward kernel"): XLA's while-loop lowering already keeps the
loop-invariant weights on-chip, and both implementations sit at the MXU
small-M matmul latency floor (~6 us/step at B=16).  It stays as a
validated, selectable alternative (``Text2VecConfig(gru_impl="pallas")``),
with the scan as default.  Design notes:

* grid = (T,) — Mosaic's pipeline double-buffers the per-step input
  projections ([D, B, 3H] slices) and output rows automatically;
* ``w_hh`` for BOTH directions stays resident in VMEM for the whole
  sequence (constant block index), stored bf16 — which is what the MXU
  sees under XLA's default matmul precision anyway (inputs are rounded to
  bf16, accumulation in f32), so numerics match the scan at TPU default
  precision;
* the carried hidden state lives in a VMEM scratch that persists across
  sequential grid steps (same idiom as ops/mas_pallas.py).

Gate math is torch nn.GRU (reference text2vec/module.py:356-358 CBHG GRU):
r/z sigmoid, candidate tanh(i_n + r * (W_hn h + b_hn)), h' = (1-z) n + z h.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 14 * 1024 * 1024  # stay under the ~16 MB/core VMEM


def _gru_fwd_kernel(gi_ref, w_ref, b_ref, o_ref, h_ref):
    """One time step for D stacked directions.

    gi_ref: [D, 1, B, 3H] f32 — this step's input projections (+ b_ih)
    w_ref:  [D, H, 3H] bf16 — hidden weights, VMEM-resident across steps
    b_ref:  [D, 1, 3H] f32 — hidden bias
    o_ref:  [D, 1, B, H] f32 — this step's output rows
    h_ref:  [D, B, H] f32 scratch — carried hidden state (persists)
    """
    t = pl.program_id(0)
    D, _, _, H3 = gi_ref.shape
    H = H3 // 3

    @pl.when(t == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    for d in range(D):  # D is static (2): unrolled, matmuls pipeline
        h = h_ref[d]  # [B, H]
        gh = (
            jnp.dot(
                h.astype(jnp.bfloat16),
                w_ref[d],
                preferred_element_type=jnp.float32,
            )
            + b_ref[d]
        )  # [B, 3H]
        gi_t = gi_ref[d, 0]  # [B, 3H]
        r = jax.nn.sigmoid(gi_t[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gi_t[:, H : 2 * H] + gh[:, H : 2 * H])
        n = jnp.tanh(gi_t[:, 2 * H :] + r * gh[:, 2 * H :])
        h_new = (1.0 - z) * n + z * h
        h_ref[d] = h_new
        o_ref[d, 0] = h_new


def gru_pallas_supported(D: int, B: int, H: int) -> bool:
    """VMEM/layout gate: resident bf16 weights + pipelined step buffers must
    fit; H must be lane-aligned (the kernel slices gates at offsets H, 2H)."""
    w_bytes = D * H * 3 * H * 2
    step_bytes = 2 * (D * B * 3 * H * 4 + D * B * H * 4)  # double-buffered
    scratch = D * B * H * 4 + D * 3 * H * 4
    return H % 128 == 0 and (w_bytes + step_bytes + scratch) <= _VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("interpret",))
def gru_fwd_pallas(
    gi: jnp.ndarray,
    w_hh: jnp.ndarray,
    b_hh: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """gi [D, B, T, 3H] (input projections, b_ih already added), w_hh
    [D, H, 3H], b_hh [D, 3H] -> stacked hidden states [D, B, T, H] with
    h0 = 0 (torch nn.GRU default)."""
    D, B, T, H3 = gi.shape
    H = H3 // 3
    out = pl.pallas_call(
        _gru_fwd_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (D, 1, B, H3), lambda t: (0, t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (D, H, H3), lambda t: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (D, 1, H3), lambda t: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (D, 1, B, H), lambda t: (0, t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((D, T, B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((D, B, H), jnp.float32)],
        interpret=interpret,
    )(
        jnp.moveaxis(gi, 2, 1).astype(jnp.float32),  # [D, T, B, 3H]
        w_hh.astype(jnp.bfloat16),
        b_hh[:, None, :].astype(jnp.float32),
    )
    return jnp.moveaxis(out, 1, 2)  # [D, B, T, H]
