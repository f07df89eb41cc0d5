"""Shared model utilities (parity: masr/model_utils/utils/common.py)."""
import jax
import jax.numpy as jnp

IGNORE_ID = -1


def get_activation(name: str):
    """Activation registry (common.py:143-160)."""
    acts = {
        "hardtanh": jax.nn.hard_tanh,
        "tanh": jnp.tanh,
        "relu": jax.nn.relu,
        "selu": jax.nn.selu,
        "swish": jax.nn.silu,
        "gelu": jax.nn.gelu,
    }
    if name not in acts:
        raise ValueError(f"unsupported activation: {name}")
    return acts[name]


def add_sos_eos(ys_pad: jax.Array, ys_lens: jax.Array, sos: int, eos: int,
                ignore_id: int = IGNORE_ID):
    """Prepend <sos> and append <eos> (common.py:48-91), fixed shapes.

    Args:
      ys_pad: (B, L) labels padded with ignore_id.
      ys_lens: (B,) label lengths.
    Returns:
      ys_in:  (B, L+1) = [sos, y..., eos-pad...]  (padded with eos)
      ys_out: (B, L+1) = [y..., eos, ignore-pad...] (padded with ignore_id)
    """
    B, L = ys_pad.shape
    ys = jnp.where(ys_pad == ignore_id, 0, ys_pad)
    ys_in = jnp.concatenate([jnp.full((B, 1), sos, ys.dtype), ys], axis=1)
    pos = jnp.arange(L + 1)[None, :]
    ys_in = jnp.where(pos <= ys_lens[:, None], ys_in, eos)
    ys_out = jnp.concatenate([ys, jnp.full((B, 1), ignore_id, ys.dtype)], axis=1)
    ys_out = jnp.where(pos == ys_lens[:, None], eos, ys_out)
    ys_out = jnp.where(pos > ys_lens[:, None], ignore_id, ys_out)
    return ys_in, ys_out


def reverse_pad_list(ys_pad: jax.Array, ys_lens: jax.Array,
                     pad_value: float = -1.0) -> jax.Array:
    """Reverse each sequence within its valid length (common.py:94-119),
    implemented as a fixed-shape gather."""
    B, L = ys_pad.shape
    pos = jnp.arange(L)[None, :]
    rev_idx = ys_lens[:, None] - 1 - pos
    valid = rev_idx >= 0
    gathered = jnp.take_along_axis(ys_pad, jnp.maximum(rev_idx, 0), axis=1)
    return jnp.where(valid, gathered, pad_value)


def th_accuracy(pad_outputs: jax.Array, pad_targets: jax.Array,
                ignore_label: int = IGNORE_ID) -> jax.Array:
    """Token accuracy over non-ignored positions (common.py:122-140).

    pad_outputs: (B*L, V) logits; pad_targets: (B, L) ids.
    """
    B, L = pad_targets.shape
    pred = pad_outputs.reshape(B, L, -1).argmax(axis=2)
    mask = pad_targets != ignore_label
    num = jnp.sum((pred == pad_targets) & mask)
    den = jnp.maximum(jnp.sum(mask), 1)
    return num / den
