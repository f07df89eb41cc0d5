"""Positional encodings (parity: masr/model_utils/conformer/embedding.py).

Rather than a precomputed max_len table, encodings are computed on the fly
from (possibly traced) positions — XLA constant-folds the full-context case
and the streaming case gets offset-indexed encodings without dynamic-shape
table slicing (embedding.py:56-70 in the reference does table slicing).
"""
import math

import jax
import jax.numpy as jnp
import flax.linen as nn


def sinusoid_position_encoding(positions: jax.Array, d_model: int,
                               dtype=jnp.float32) -> jax.Array:
    """positions (T,) → (T, d_model): pe[:,0::2]=sin, pe[:,1::2]=cos."""
    half = d_model // 2
    div_term = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                       * -(math.log(10000.0) / d_model))
    args = positions.astype(jnp.float32)[:, None] * div_term[None, :]  # (T, half)
    pe = jnp.stack([jnp.sin(args), jnp.cos(args)], axis=-1).reshape(-1, 2 * half)
    if 2 * half < d_model:  # odd d_model: trailing sin column
        pe = jnp.pad(pe, ((0, 0), (0, d_model - 2 * half)))
    return pe.astype(dtype)


class PositionalEncoding(nn.Module):
    """Absolute sinusoidal PE: returns (x * sqrt(d) + pe, pe)."""
    d_model: int
    dropout_rate: float = 0.1

    def pos_emb(self, offset, size, dtype=jnp.float32):
        positions = jnp.maximum(offset + jnp.arange(size), 0)
        return sinusoid_position_encoding(positions, self.d_model, dtype)[None]

    @nn.compact
    def __call__(self, x, offset=0, train: bool = False):
        xscale = math.sqrt(self.d_model)
        pos_emb = self.pos_emb(offset, x.shape[1], x.dtype)
        x = x * xscale + pos_emb
        drop = nn.Dropout(self.dropout_rate)
        x = drop(x, deterministic=not train)
        pos_emb = drop(pos_emb, deterministic=not train)
        return x, pos_emb


class RelPositionalEncoding(nn.Module):
    """Transformer-XL style: x scaled, pe returned separately
    (embedding.py:73-101 — pe is absolute-indexed; rel_shift is removed in
    the reference attention so these act as windowed absolute encodings)."""
    d_model: int
    dropout_rate: float = 0.1

    def pos_emb(self, offset, size, dtype=jnp.float32):
        positions = jnp.maximum(offset + jnp.arange(size), 0)
        return sinusoid_position_encoding(positions, self.d_model, dtype)[None]

    @nn.compact
    def __call__(self, x, offset=0, train: bool = False):
        xscale = math.sqrt(self.d_model)
        pos_emb = self.pos_emb(offset, x.shape[1], x.dtype)
        x = x * xscale
        drop = nn.Dropout(self.dropout_rate)
        x = drop(x, deterministic=not train)
        pos_emb = drop(pos_emb, deterministic=not train)
        return x, pos_emb


class NoPositionalEncoding(nn.Module):
    d_model: int
    dropout_rate: float = 0.1

    def pos_emb(self, offset, size, dtype=jnp.float32):
        return jnp.zeros((1, size, self.d_model), dtype)

    @nn.compact
    def __call__(self, x, offset=0, train: bool = False):
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        return x, jnp.zeros((1, x.shape[1], self.d_model), x.dtype)


POS_ENC_CLASSES = {
    "abs_pos": PositionalEncoding,
    "rel_pos": RelPositionalEncoding,
    "no_pos": NoPositionalEncoding,
}
