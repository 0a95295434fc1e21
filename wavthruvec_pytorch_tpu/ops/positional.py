"""Sinusoid position-encoding table.

Reference: text2vec/model.py:37-56 — angle = pos / 10000^(2*(i//2)/d),
sin on even dims, cos on odd dims, row ``padding_idx`` zeroed.  The table is
a frozen constant; we build it once on host in float64 then cast.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax


def sinusoid_encoding_table(
    n_position: int, d_hid: int, padding_idx: int | None = None
) -> np.ndarray:
    positions = np.arange(n_position, dtype=np.float64)[:, None]
    dim_idx = np.arange(d_hid, dtype=np.float64)[None, :]
    angles = positions / np.power(10000.0, 2.0 * np.floor(dim_idx / 2.0) / d_hid)
    table = np.empty((n_position, d_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(angles[:, 0::2])
    table[:, 1::2] = np.cos(angles[:, 1::2])
    if padding_idx is not None:
        table[padding_idx] = 0.0
    return table.astype(np.float32)


def sinusoid_encoding_table_jnp(
    n_position: int, d_hid: int, padding_idx: int | None = None
) -> jnp.ndarray:
    """In-graph twin of ``sinusoid_encoding_table`` built from iota — a large
    host-built table baked as an HLO literal bloats every compile (and this
    environment's compile transport rejects multi-MB programs), so the table
    is computed on device instead (a one-off elementwise op XLA folds)."""
    pos = lax.broadcasted_iota(jnp.float32, (n_position, d_hid), 0)
    dim = lax.broadcasted_iota(jnp.int32, (n_position, d_hid), 1)
    exponent = (2.0 * jnp.floor(dim.astype(jnp.float32) / 2.0)) / d_hid
    angles = pos / jnp.power(10000.0, exponent)
    table = jnp.where(dim % 2 == 0, jnp.sin(angles), jnp.cos(angles))
    if padding_idx is not None:
        row = lax.broadcasted_iota(jnp.int32, (n_position, d_hid), 0)
        table = jnp.where(row == padding_idx, 0.0, table)
    return table
