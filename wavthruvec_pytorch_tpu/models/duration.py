"""Duration predictor (reference: text2vec/module.py:110-156):
2 x (Conv1d k=3 pad=1 -> LayerNorm -> ReLU -> Dropout) -> Linear -> ReLU.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from wavthruvec_pytorch_tpu.models.layers import Conv1d, LayerNorm, Linear


class DurationPredictor(nn.Module):
    filter_size: int = 256
    kernel_size: int = 3
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        """[B, T, C] encoder output -> [B, T] non-negative durations (float)."""
        for i in (1, 2):
            x = Conv1d(
                self.filter_size,
                kernel_size=self.kernel_size,
                padding=1,
                w_init_gain="linear",
                dtype=self.dtype,
                name=f"conv1d_{i}",
            )(x)
            x = LayerNorm(name=f"layer_norm_{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = Linear(1, w_init_gain="linear", name="linear_layer")(x)
        x = nn.relu(x)
        return x[..., 0]
