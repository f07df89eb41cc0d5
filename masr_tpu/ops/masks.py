"""Attention/padding mask builders (parity: masr/model_utils/utils/mask.py).

All functions are trace-friendly: chunk sizes may be traced scalars, so one
compiled training step serves every randomly drawn chunk size (the reference
re-builds boolean masks per batch on host; here the mask is computed on
device from iota comparisons — no dynamic shapes, no recompilation).

Mask convention: True = attend / valid (same as the reference).
"""
import jax
import jax.numpy as jnp


def make_pad_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """(B,) lengths → (B, T) bool, True at padded positions
    (parity: mask.py:146-175)."""
    return jnp.arange(max_len)[None, :] >= lengths[:, None]


def make_non_pad_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    return ~make_pad_mask(lengths, max_len)


def subsequent_mask(size: int) -> jax.Array:
    """(T, T) lower-triangular causal mask, True = visible (mask.py:4-37)."""
    return jnp.tril(jnp.ones((size, size), dtype=bool))


def subsequent_chunk_mask(size: int, chunk_size, num_left_chunks=-1) -> jax.Array:
    """Block-causal chunk mask (mask.py:40-75). `chunk_size` and
    `num_left_chunks` may be traced int scalars.

    Row i can see columns j with:
      j < (i // chunk + 1) * chunk                     (own + earlier chunks)
      j >= max(0, (i // chunk - num_left_chunks) * chunk)  if limited left context
    """
    row = jnp.arange(size)[:, None]
    col = jnp.arange(size)[None, :]
    chunk_size = jnp.asarray(chunk_size)
    row_chunk = row // chunk_size
    ending = (row_chunk + 1) * chunk_size
    num_left = jnp.asarray(num_left_chunks)
    start = jnp.where(num_left < 0, 0,
                      jnp.maximum((row_chunk - num_left) * chunk_size, 0))
    return (col < ending) & (col >= start)


def add_optional_chunk_mask(xs_len: int, masks: jax.Array,
                            use_dynamic_chunk: bool,
                            use_dynamic_left_chunk: bool,
                            decoding_chunk_size: int,
                            static_chunk_size: int,
                            num_decoding_left_chunks: int,
                            rng: jax.Array | None = None) -> jax.Array:
    """Combine pad mask with a (possibly random) chunk mask
    (parity: mask.py:78-143 — dynamic chunk training).

    Args:
      xs_len: padded time length T (static).
      masks: (B, 1, T) bool non-pad mask.
      rng: PRNG key for dynamic chunk draw (training only).
    Returns (B, T, T) bool attention mask.
    """
    if use_dynamic_chunk:
        if decoding_chunk_size < 0:
            chunk_size = jnp.asarray(xs_len)
            num_left_chunks = jnp.asarray(-1)
        elif decoding_chunk_size > 0:
            chunk_size = jnp.asarray(decoding_chunk_size)
            num_left_chunks = jnp.asarray(num_decoding_left_chunks)
        else:
            assert rng is not None, "dynamic chunk training needs an rng key"
            k1, k2 = jax.random.split(rng)
            # reference draw: chunk = randint(1, max_len) ; if > max_len//2
            # use full context, else (chunk % 25) + 1, optionally random
            # left chunks (mask.py:106-133)
            draw = jax.random.randint(k1, (), 1, xs_len)
            full = draw > xs_len // 2
            chunk_size = jnp.where(full, xs_len, draw % 25 + 1)
            if use_dynamic_left_chunk:
                # reference mask.py:130: (max_len - 1) // chunk_size, drawn
                # high-exclusive — NOT a ceil-div over xs_len
                max_left = (xs_len - 1) // chunk_size
                left_draw = jax.random.randint(k2, (), 0, jnp.maximum(max_left, 1))
                num_left_chunks = jnp.where(full, -1, left_draw)
            else:
                num_left_chunks = jnp.asarray(-1)
        chunk_masks = subsequent_chunk_mask(xs_len, chunk_size, num_left_chunks)
    elif static_chunk_size > 0:
        chunk_masks = subsequent_chunk_mask(xs_len, static_chunk_size,
                                            num_decoding_left_chunks)
    else:
        # full context: every row sees all non-pad columns (reference returns
        # the (B, 1, T) pad mask and lets attention broadcast it)
        return jnp.broadcast_to(masks, (masks.shape[0], xs_len, xs_len))
    return masks & chunk_masks[None, :, :]


def mask_finished_scores(scores: jax.Array, flag: jax.Array) -> jax.Array:
    """For finished beams force choosing <eos> (used by attention rescoring)."""
    beam = scores.shape[-1]
    zero_mask = jnp.zeros_like(flag, dtype=bool)
    unfinished = jnp.concatenate([zero_mask, jnp.tile(flag, (1, beam - 1))], axis=1)
    finished = jnp.concatenate([flag, jnp.tile(zero_mask, (1, beam - 1))], axis=1)
    scores = jnp.where(unfinished, -jnp.inf, scores)
    return jnp.where(finished, 0.0, scores)
