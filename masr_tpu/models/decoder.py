"""Transformer decoders for attention rescoring / hybrid loss
(parity: masr/model_utils/transformer/decoder.py)."""

import jax
import jax.numpy as jnp
import flax.linen as nn

from masr_tpu.models.attention import MultiHeadedAttention
from masr_tpu.models.embedding import PositionalEncoding
from masr_tpu.models.positionwise import PositionwiseFeedForward
from masr_tpu.ops.masks import make_pad_mask, subsequent_mask


class DecoderLayer(nn.Module):
    """Self-attn (causal) + cross-attn + FFN, pre-norm (decoder.py:273-394)."""
    size: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, tgt_mask, memory, memory_mask, train: bool = False):
        drop = nn.Dropout(self.dropout_rate)
        ln = lambda name: nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name=name)

        residual = tgt
        x = ln("norm1")(tgt) if self.normalize_before else tgt
        x, _ = MultiHeadedAttention(self.attention_heads, self.size,
                                    self.self_attention_dropout_rate,
                                    dtype=self.dtype, name="self_attn")(
            x, x, x, mask=tgt_mask, train=train)
        x = residual + drop(x, deterministic=not train)
        if not self.normalize_before:
            x = ln("norm1")(x)

        residual = x
        y = ln("norm2")(x) if self.normalize_before else x
        y, _ = MultiHeadedAttention(self.attention_heads, self.size,
                                    self.src_attention_dropout_rate,
                                    dtype=self.dtype, name="src_attn")(
            y, memory, memory, mask=memory_mask, train=train)
        x = residual + drop(y, deterministic=not train)
        if not self.normalize_before:
            x = ln("norm2")(x)

        residual = x
        y = ln("norm3")(x) if self.normalize_before else x
        y = PositionwiseFeedForward(self.size, self.linear_units,
                                    self.dropout_rate, activation=nn.relu,
                                    dtype=self.dtype, name="feed_forward")(y, train)
        x = residual + drop(y, deterministic=not train)
        if not self.normalize_before:
            x = ln("norm3")(x)
        return x


class TransformerDecoder(nn.Module):
    """Embed + abs-pos PE → N decoder layers → LN → output projection
    (decoder.py:125-271)."""
    vocab_size: int
    encoder_output_size: int
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    use_output_layer: bool = True
    normalize_before: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.encoder_output_size,
                              dtype=self.dtype, name="embed")
        self.pos_enc = PositionalEncoding(self.encoder_output_size,
                                          self.positional_dropout_rate,
                                          name="pos_enc")
        self.layers = [DecoderLayer(self.encoder_output_size,
                                    self.attention_heads, self.linear_units,
                                    self.dropout_rate,
                                    self.self_attention_dropout_rate,
                                    self.src_attention_dropout_rate,
                                    self.normalize_before, dtype=self.dtype,
                                    name=f"layer_{i}")
                       for i in range(self.num_blocks)]
        self.after_norm = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                                       name="after_norm")
        if self.use_output_layer:
            self.output_layer = nn.Dense(self.vocab_size, dtype=self.dtype,
                                         name="output_layer")

    def __call__(self, memory, memory_mask, ys_in_pad, ys_in_lens,
                 train: bool = False):
        """→ (B, L, V) logits."""
        L = ys_in_pad.shape[1]
        tgt_mask = ~make_pad_mask(ys_in_lens, L)[:, None, :]  # (B, 1, L)
        tgt_mask = tgt_mask & subsequent_mask(L)[None, :, :]  # (B, L, L)
        x, _ = self.pos_enc(self.embed(ys_in_pad), 0, train)
        for layer in self.layers:
            x = layer(x, tgt_mask, memory, memory_mask, train)
        if self.normalize_before:
            x = self.after_norm(x)
        if self.use_output_layer:
            x = self.output_layer(x)
        return x

    def forward_one_step(self, memory, memory_mask, tgt, tgt_mask):
        """Incremental decode step (no KV cache — recomputes the prefix;
        used for attention rescoring over short label sequences)."""
        x, _ = self.pos_enc(self.embed(tgt), 0, False)
        for layer in self.layers:
            x = layer(x, tgt_mask, memory, memory_mask, False)
        if self.normalize_before:
            y = self.after_norm(x[:, -1])
        else:
            y = x[:, -1]
        if self.use_output_layer:
            y = jax.nn.log_softmax(self.output_layer(y), axis=-1)
        return y


class BiTransformerDecoder(nn.Module):
    """Left-to-right + optional right-to-left decoder (decoder.py:14-122)."""
    vocab_size: int
    encoder_output_size: int
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    r_num_blocks: int = 0
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    use_output_layer: bool = True
    normalize_before: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        common = dict(vocab_size=self.vocab_size,
                      encoder_output_size=self.encoder_output_size,
                      attention_heads=self.attention_heads,
                      linear_units=self.linear_units,
                      dropout_rate=self.dropout_rate,
                      positional_dropout_rate=self.positional_dropout_rate,
                      self_attention_dropout_rate=self.self_attention_dropout_rate,
                      src_attention_dropout_rate=self.src_attention_dropout_rate,
                      use_output_layer=self.use_output_layer,
                      normalize_before=self.normalize_before, dtype=self.dtype)
        self.left_decoder = TransformerDecoder(
            num_blocks=self.num_blocks, name="left_decoder", **common)
        if self.r_num_blocks > 0:
            self.right_decoder = TransformerDecoder(
                num_blocks=self.r_num_blocks, name="right_decoder", **common)

    def __call__(self, memory, memory_mask, ys_in_pad, ys_in_lens,
                 r_ys_in_pad=None, reverse_weight: float = 0.0,
                 train: bool = False):
        l_x = self.left_decoder(memory, memory_mask, ys_in_pad, ys_in_lens, train)
        r_x = jnp.zeros(())
        if reverse_weight > 0.0 and self.r_num_blocks > 0:
            r_x = self.right_decoder(memory, memory_mask, r_ys_in_pad,
                                     ys_in_lens, train)
        return l_x, r_x
