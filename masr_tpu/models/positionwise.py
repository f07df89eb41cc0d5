"""Position-wise feed-forward (parity: conformer/positionwise.py:5-37)."""
from typing import Callable

import jax.numpy as jnp
import flax.linen as nn


class PositionwiseFeedForward(nn.Module):
    idim: int
    hidden_units: int
    dropout_rate: float = 0.1
    activation: Callable = nn.silu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden_units, dtype=self.dtype, name="w_1")(x)
        x = self.activation(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        return nn.Dense(self.idim, dtype=self.dtype, name="w_2")(x)
