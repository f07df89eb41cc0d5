"""Efficient Conformer (parity: masr/model_utils/efficient_conformer/).

Progressive downsampling: `stride_layer_idx` layers use a strided conv
module with an AvgPool residual (encoder.py:395-545); the first
`group_layer_idx` layers use grouped rel-pos attention — Q/K/V/P reshaped
(B, h, T, d_k) → (B, h, T/g, d_k*g) after padding T to a multiple of
g=group_size, attention at coarser granularity, scores /√(d_k·g)
(attention.py:11-183). Streaming caches live at FULL resolution with
stride-sliced views per layer (encoder.py:343-381), fixed shapes here.

NOTE on grouped attention in streaming: group boundaries are relative to
the key window, which shifts by `chunk` frames per step, so streamed
grouped attention is only approximately equal to full-context grouped
attention unless chunk % group_size == 0 — the reference has the identical
approximation (its window also shifts). Additionally, with fixed-size
right-aligned caches a warm-up group can mix valid and still-empty slots;
the group's mask representative (stride-g slice, matching the reference's
mask[:, ::g, ::g]) then decides visibility for the whole group, which can
drop up to g-1 valid frames of the oldest context during the first
few chunks.
"""
from typing import Any, Dict, Optional

import jax.numpy as jnp
import flax.linen as nn

from masr_tpu.models.attention import (MultiHeadedAttention,
                                       RelPositionMultiHeadedAttention,
                                       cache_key_mask)
from masr_tpu.models.conformer import ConformerEncoderLayer, ConformerModel
from masr_tpu.models.embedding import sinusoid_position_encoding
from masr_tpu.models.positionwise import PositionwiseFeedForward
from masr_tpu.models.subsampling import SUBSAMPLING_CLASSES, Conv2dSubsampling2
from masr_tpu.ops.common import get_activation
from masr_tpu.ops.masks import add_optional_chunk_mask, make_pad_mask


def _pad_to_multiple(x, multiple, axis):
    r = x.shape[axis] % multiple
    if r == 0:
        return x, 0
    pad = multiple - r
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), pad


class GroupedRelPositionMultiHeadedAttention(MultiHeadedAttention):
    """(parity: efficient_conformer/attention.py:11-183)."""
    group_size: int = 3

    def setup(self):
        super().setup()
        self.linear_pos = nn.Dense(self.n_feat, use_bias=False,
                                   dtype=self.dtype, name="linear_pos")
        init = nn.initializers.xavier_uniform()
        self.pos_bias_u = self.param(
            "pos_bias_u", init, (self.n_head, self.d_k * self.group_size))
        self.pos_bias_v = self.param(
            "pos_bias_v", init, (self.n_head, self.d_k * self.group_size))

    def _group(self, x):
        """(B, h, T, d) → (B, h, ceil(T/g), d*g), replicating the
        reference's exact view semantics (attention.py:58-61): the reshape
        happens in (B, T, h, d) layout, so groups interleave heads and time
        — weight-compatibility requires matching it bit-for-bit."""
        B, h, T, d = x.shape
        x = x.transpose(0, 2, 1, 3)  # (B, T, h, d)
        x, pad = _pad_to_multiple(x, self.group_size, axis=1)
        x = x.reshape(B, -1, h, d * self.group_size)
        return x.transpose(0, 2, 1, 3), pad

    def __call__(self, query, key, value, mask=None, pos_emb=None,
                 cache=None, train: bool = False):
        g = self.group_size
        q, k, v = self._qkv(query, key, value)
        k, v, new_cache = self._merge_cache(k, v, cache)
        T1 = q.shape[2]

        p = self.linear_pos(pos_emb.astype(self.dtype))
        p = p.reshape(1, -1, self.n_head, self.d_k).transpose(0, 2, 1, 3)

        qg, pad_q = self._group(q)
        kg, _ = self._group(k)
        vg, _ = self._group(v)
        pg, _ = self._group(p)
        if mask is not None:
            mask = mask[:, ::g, ::g]

        bias_u = self.pos_bias_u.astype(self.dtype)[None, :, None, :]
        bias_v = self.pos_bias_v.astype(self.dtype)[None, :, None, :]
        # AC+BD fused into one matmul over a 2·d_k·g contraction (see
        # models/attention.py — doubles MXU fill, halves matmul count)
        q_cat = jnp.concatenate([qg + bias_u, qg + bias_v], axis=-1)
        k_cat = jnp.concatenate([kg, jnp.broadcast_to(pg, kg.shape)],
                                axis=-1)
        scores = jnp.einsum("bhqe,bhke->bhqk", q_cat, k_cat,
                            preferred_element_type=jnp.float32) \
            / jnp.sqrt(jnp.float32(self.d_k * g))
        # _attend's (B, T1g, h, d_k*g) → (B, T1g*g, n_feat) reshape IS the
        # un-grouping (reference view semantics, attention.py:114-116);
        # truncate the group padding afterwards
        x = self._attend(vg, scores, mask, train)
        x = x[:, :T1, :]
        return x, new_cache


class StridedConvolutionModule(nn.Module):
    """Conv module whose depthwise conv strides time
    (parity: efficient_conformer/convolution.py:8-134)."""
    channels: int
    kernel_size: int = 15
    activation: Any = nn.silu
    norm: str = "layer_norm"
    causal: bool = False
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @property
    def lorder(self):
        return self.kernel_size - 1 if self.causal else 0

    @nn.compact
    def __call__(self, x, mask_pad=None, cache=None, train: bool = False):
        if mask_pad is not None:
            x = jnp.where(mask_pad.transpose(0, 2, 1), x, 0.0)
        new_cache = None
        if self.causal:
            if cache is None:
                x = jnp.pad(x, ((0, 0), (self.lorder, 0), (0, 0)))
            else:
                x = jnp.concatenate(
                    [cache[:, -self.lorder:, :].astype(x.dtype), x], axis=1)
            new_cache = x[:, -self.lorder:, :]
            padding = "VALID"
        else:
            assert (self.kernel_size - 1) % 2 == 0
            padding = [((self.kernel_size - 1) // 2,) * 2]
        x = nn.Dense(2 * self.channels, dtype=self.dtype,
                     name="pointwise_conv1")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * nn.sigmoid(b)
        x = nn.Conv(self.channels, (self.kernel_size,),
                    strides=(self.stride,), padding=padding,
                    feature_group_count=self.channels, dtype=self.dtype,
                    name="depthwise_conv")(x)
        if self.norm == "layer_norm":
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        else:
            # torch momentum=0.1 convention (see convolution.py)
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                             momentum=0.9, dtype=self.dtype, name="norm")(x)
        x = self.activation(x)
        x = nn.Dense(self.channels, dtype=self.dtype,
                     name="pointwise_conv2")(x)
        if mask_pad is not None:
            m = mask_pad[:, :, ::self.stride] \
                if mask_pad.shape[2] != x.shape[1] else mask_pad
            x = jnp.where(m.transpose(0, 2, 1)[:, :x.shape[1]], x, 0.0)
        return x, new_cache


class StrideConformerEncoderLayer(nn.Module):
    """Conformer layer whose conv module strides time ×s and whose residual
    path is AvgPool (encoder.py:395-545)."""
    size: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    macaron_style: bool = True
    cnn_module_kernel: int = 15
    cnn_module_norm: str = "layer_norm"
    causal: bool = False
    stride: int = 2
    activation_type: str = "swish"
    grouped: bool = False
    group_size: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        act = get_activation(self.activation_type)
        if self.grouped:
            self.self_attn = GroupedRelPositionMultiHeadedAttention(
                self.attention_heads, self.size, self.attention_dropout_rate,
                group_size=self.group_size, dtype=self.dtype, name="self_attn")
        else:
            self.self_attn = RelPositionMultiHeadedAttention(
                self.attention_heads, self.size, self.attention_dropout_rate,
                dtype=self.dtype, name="self_attn")
        self.feed_forward = PositionwiseFeedForward(
            self.size, self.linear_units, self.dropout_rate, act,
            dtype=self.dtype, name="feed_forward")
        if self.macaron_style:
            self.feed_forward_macaron = PositionwiseFeedForward(
                self.size, self.linear_units, self.dropout_rate, act,
                dtype=self.dtype, name="feed_forward_macaron")
        self.conv_module = StridedConvolutionModule(
            self.size, self.cnn_module_kernel, act, self.cnn_module_norm,
            self.causal, self.stride, dtype=self.dtype, name="conv_module")
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        self.norm_ff = ln("norm_ff")
        self.norm_mha = ln("norm_mha")
        if self.macaron_style:
            self.norm_ff_macaron = ln("norm_ff_macaron")
        self.norm_conv = ln("norm_conv")
        self.norm_final = ln("norm_final")
        self.dropout = nn.Dropout(self.dropout_rate)

    @property
    def ff_scale(self):
        return 0.5 if self.macaron_style else 1.0

    def _avg_pool(self, x):
        """AvgPool1d(kernel=stride, stride=stride, ceil_mode=True,
        count_include_pad=False) over time."""
        B, T, C = x.shape
        pad = (-T) % self.stride
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            counts = jnp.minimum(
                self.stride,
                T - jnp.arange(0, T + pad, self.stride))
        else:
            counts = jnp.full(((T + pad) // self.stride,), self.stride)
        x = x.reshape(B, -1, self.stride, C).sum(axis=2)
        return x / counts[None, :, None].astype(x.dtype)

    def __call__(self, x, mask, pos_emb, mask_pad=None, att_cache=None,
                 cnn_cache=None, train: bool = False):
        det = not train
        if self.macaron_style:
            residual = x
            if self.normalize_before:
                x = self.norm_ff_macaron(x)
            x = residual + self.ff_scale * self.dropout(
                self.feed_forward_macaron(x, train), deterministic=det)
            if not self.normalize_before:
                x = self.norm_ff_macaron(x)

        residual = x
        if self.normalize_before:
            x = self.norm_mha(x)
        x_att, new_att_cache = self.self_attn(x, x, x, mask, pos_emb,
                                              att_cache, train)
        x = residual + self.dropout(x_att, deterministic=det)
        if not self.normalize_before:
            x = self.norm_mha(x)

        residual = x
        if self.normalize_before:
            x = self.norm_conv(x)
        x, new_cnn_cache = self.conv_module(x, mask_pad, cnn_cache, train)
        residual = self._avg_pool(residual)[:, : x.shape[1], :]
        x = residual + self.dropout(x, deterministic=det)
        if not self.normalize_before:
            x = self.norm_conv(x)

        residual = x
        if self.normalize_before:
            x = self.norm_ff(x)
        x = residual + self.ff_scale * self.dropout(
            self.feed_forward(x, train), deterministic=det)
        if not self.normalize_before:
            x = self.norm_ff(x)
        x = self.norm_final(x)
        return x, new_att_cache, new_cnn_cache


class EfficientConformerEncoder(nn.Module):
    """(parity: efficient_conformer/encoder.py:21-392)."""
    input_size: int
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: str = "conv2d"
    pos_enc_layer_type: str = "rel_pos"
    normalize_before: bool = True
    static_chunk_size: int = 0
    use_dynamic_chunk: bool = False
    use_dynamic_left_chunk: bool = False
    macaron_style: bool = True
    activation_type: str = "swish"
    use_cnn_module: bool = True
    cnn_module_kernel: int = 15
    causal: bool = False
    cnn_module_norm: str = "batch_norm"
    stride_layer_idx: Any = (3,)
    stride: Any = (2,)
    group_layer_idx: Any = (0, 1, 2, 3)
    group_size: int = 3
    stride_kernel: bool = True
    efficient_conf: Optional[Dict] = None
    # fused fast paths: the layers AFTER the last stride/grouped layer
    # are standard conformer layers at the final (downsampled) resolution
    # — route that tail through the fused whole-layer Pallas kernels
    # (8 of 12 layers in the reference default config); serving and
    # training variants gate separately like the flagship encoder
    use_fused_layer: bool = True
    use_fused_layer_train: bool = True
    cmvn: Any = None
    dtype: jnp.dtype = jnp.float32

    @property
    def _stride_idx(self):
        eff = dict(self.efficient_conf or {})
        v = eff.get("stride_layer_idx", self.stride_layer_idx)
        return [v] if isinstance(v, int) else list(v)

    @property
    def _strides(self):
        eff = dict(self.efficient_conf or {})
        v = eff.get("stride", self.stride)
        return [v] if isinstance(v, int) else list(v)

    @property
    def _group_idx(self):
        eff = dict(self.efficient_conf or {})
        v = eff.get("group_layer_idx", self.group_layer_idx)
        return [v] if isinstance(v, int) else list(v)

    @property
    def _group_size(self):
        return dict(self.efficient_conf or {}).get("group_size",
                                                   self.group_size)

    @property
    def _kernels(self):
        eff = dict(self.efficient_conf or {})
        stride_kernel = eff.get("stride_kernel", self.stride_kernel)
        kernels = [self.cnn_module_kernel]
        for s in self._strides:
            kernels.append(kernels[-1] // s if stride_kernel else kernels[-1])
        return kernels

    @property
    def d_k(self):
        return self.output_size // self.attention_heads

    @property
    def max_lorder(self):
        return self.cnn_module_kernel - 1 if self.causal else 0

    def downsampling_factor(self, i: int) -> int:
        """Cumulative stride of all stride layers strictly BEFORE layer i
        (encoder.py:215-221: applies once i > stride_idx)."""
        factor = 1
        for idx, s in zip(self._stride_idx, self._strides):
            if i > idx:
                factor *= s
        return factor

    def total_factor(self) -> int:
        factor = 1
        for s in self._strides:
            factor *= s
        return factor

    def setup(self):
        sub_classes = dict(SUBSAMPLING_CLASSES)
        sub_classes["conv2d2"] = Conv2dSubsampling2
        self.embed = sub_classes[self.input_layer](
            idim=self.input_size, odim=self.output_size,
            dropout_rate=self.dropout_rate,
            pos_enc_type=self.pos_enc_layer_type,
            pos_dropout_rate=self.positional_dropout_rate,
            dtype=self.dtype, name="embed")
        self.after_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       name="after_norm")
        kernels = self._kernels
        layers = []
        index = 0
        for i in range(self.num_blocks):
            grouped = i in self._group_idx
            if i in self._stride_idx:
                layers.append(StrideConformerEncoderLayer(
                    size=self.output_size,
                    attention_heads=self.attention_heads,
                    linear_units=self.linear_units,
                    dropout_rate=self.dropout_rate,
                    attention_dropout_rate=self.attention_dropout_rate,
                    normalize_before=self.normalize_before,
                    macaron_style=self.macaron_style,
                    cnn_module_kernel=kernels[index],
                    cnn_module_norm=self.cnn_module_norm, causal=self.causal,
                    stride=self._strides[index],
                    activation_type=self.activation_type, grouped=grouped,
                    group_size=self._group_size, dtype=self.dtype,
                    name=f"layer_{i}"))
                index += 1
            else:
                layers.append(_EffConformerLayer(
                    size=self.output_size,
                    attention_heads=self.attention_heads,
                    linear_units=self.linear_units,
                    dropout_rate=self.dropout_rate,
                    attention_dropout_rate=self.attention_dropout_rate,
                    normalize_before=self.normalize_before,
                    macaron_style=self.macaron_style,
                    use_cnn_module=self.use_cnn_module,
                    cnn_module_kernel=kernels[index],
                    cnn_module_norm=self.cnn_module_norm, causal=self.causal,
                    activation_type=self.activation_type, grouped=grouped,
                    group_size=self._group_size, dtype=self.dtype,
                    name=f"layer_{i}"))
        self.encoders = layers

    def __call__(self, xs, xs_lens, decoding_chunk_size: int = 0,
                 num_decoding_left_chunks: int = -1, train: bool = False):
        T = xs.shape[1]
        masks = ~make_pad_mask(xs_lens, T)[:, None, :]
        if self.cmvn is not None:
            xs = self.cmvn(xs)
        xs = xs.astype(self.dtype)
        xs, pos_emb, masks = self.embed(xs, masks, 0, train)
        mask_pad = masks
        T2 = xs.shape[1]
        rng = self.make_rng("chunk") if (self.use_dynamic_chunk and
                                         decoding_chunk_size == 0) else None
        chunk_masks = add_optional_chunk_mask(
            T2, masks, self.use_dynamic_chunk, self.use_dynamic_left_chunk,
            decoding_chunk_size, self.static_chunk_size,
            num_decoding_left_chunks, rng=rng)
        index = 0
        split = self._fused_tail_split(decoding_chunk_size, train, T2,
                                       xs.shape[0])
        for i, layer in enumerate(self.encoders[:split]):
            xs, _, _ = layer(xs, chunk_masks, pos_emb, mask_pad, train=train)
            if i in self._stride_idx:
                s = self._strides[index]
                masks = masks[:, :, ::s]
                chunk_masks = chunk_masks[:, ::s, ::s]
                mask_pad = masks
                pos_emb = pos_emb[:, ::s, :]
                index += 1
        if split < len(self.encoders):
            # plain-conformer tail at the final resolution → fused kernels
            from masr_tpu.models.conformer import (fused_serve_stack,
                                                   fused_train_stack)
            from masr_tpu.parallel.mesh import fused_route_mesh
            tail = self.encoders[split:]
            B = xs.shape[0]
            lens_f = masks[:, 0, :].sum(axis=1).astype(jnp.int32)
            if train:
                T_tail = xs.shape[1]
                amask = jnp.broadcast_to(chunk_masks, (B, T_tail, T_tail))
                if (self.dropout_rate > 0
                        or self.attention_dropout_rate > 0):
                    import jax
                    seeds = jax.random.randint(
                        self.make_rng("dropout"), (len(tail), B), 0,
                        jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
                else:
                    seeds = jnp.zeros((len(tail), B), jnp.int32)
                xs = fused_train_stack(
                    tail, xs, amask, seeds, lens_f, pos_emb,
                    dtype=self.dtype, n_head=self.attention_heads,
                    ksize=tail[0].cnn_module_kernel, causal=self.causal,
                    ff_scale=tail[0].ff_scale,
                    dropout_rate=float(self.dropout_rate),
                    attention_dropout_rate=float(
                        self.attention_dropout_rate),
                    mesh_route=fused_route_mesh(B))
            else:
                xs = fused_serve_stack(
                    tail, xs, lens_f, pos_emb, dtype=self.dtype,
                    n_head=self.attention_heads,
                    ksize=tail[0].cnn_module_kernel, causal=self.causal,
                    ff_scale=tail[0].ff_scale,
                    mesh_route=fused_route_mesh(B))
        if self.normalize_before:
            xs = self.after_norm(xs)
        return xs, masks

    def _fused_tail_split(self, decoding_chunk_size, train, T2, B):
        """Start index of the fused plain-layer tail, or len(encoders)
        when the fused route is off (same gates as the flagship encoder's
        _fused_eligible / _fused_train_eligible; T at the final
        resolution prices the VMEM budget)."""
        n = self.num_blocks
        special = list(self._stride_idx) + [
            i for i in self._group_idx if i < n]
        start = (max(special) + 1) if special else 0
        if start >= n:
            return n
        if not (self.pos_enc_layer_type == "rel_pos"
                and not self.is_initializing()
                and self.normalize_before and self.macaron_style
                and self.use_cnn_module
                and self.cnn_module_norm == "layer_norm"):
            return n
        if train:
            if not self.use_fused_layer_train:
                return n
        elif not (self.use_fused_layer and decoding_chunk_size == -1
                  and (self.use_dynamic_chunk
                       or self.static_chunk_size <= 0)):
            return n
        import jax
        from masr_tpu.ops.pallas import conformer_layer as cl
        if not (jax.default_backend() == "tpu" or cl.FORCE_ON_CPU):
            return n
        from masr_tpu.parallel.mesh import fused_route_mesh
        if not fused_route_mesh(B)[0]:
            return n
        t_tail = T2
        for s in self._strides:
            t_tail = -(-t_tail // s)
        if train:
            from masr_tpu.ops.pallas.conformer_layer_train import (
                fused_train_supported)
            if not fused_train_supported(t_tail, self.output_size,
                                         self.linear_units, self.dtype):
                return n
        elif not cl.fused_layer_supported(t_tail, self.output_size,
                                          self.linear_units, self.dtype):
            return n
        return start

    # ------------------------------------------------------------------ #
    def _pos(self, start, size, stride=1):
        positions = jnp.maximum(start + stride * jnp.arange(size), 0)
        return sinusoid_position_encoding(positions, self.output_size,
                                          self.dtype)[None]

    def forward_chunk(self, xs, offset, att_cache, cnn_cache, cache_len):
        """Fixed-shape streaming chunk (parity: encoder.py:267-392).

        offset and cache_len are in FULL-resolution (pre-stride) encoder
        frames; att_cache (L, B, h, C, 2*d_k) full-resolution with
        duplicated entries for post-stride layers; cnn_cache
        (L, B, max_lorder, D), per-layer lorder right-aligned."""
        if self.cmvn is not None:
            xs = self.cmvn(xs)
        xs = xs.astype(self.dtype)
        xs, _, _ = self.embed(xs, None, offset, False)
        B, chunk = xs.shape[0], xs.shape[1]
        C = att_cache.shape[3]
        pos_full = self._pos(offset - C, C + chunk)

        new_att, new_cnn = [], []
        cur = xs
        for i, layer in enumerate(self.encoders):
            factor = self.downsampling_factor(i)
            if factor == 1:
                cache_i = att_cache[i]
                mask = cache_key_mask(C, cur.shape[1], cache_len, B)
                pos = pos_full
            else:
                cache_i = att_cache[i][:, :, factor - 1::factor, :]
                mask = cache_key_mask(C // factor, cur.shape[1],
                                      cache_len // factor, B)
                # cache entry j holds the frame at full position
                # offset - C + factor*j; chunk frames are factor-strided
                pos = jnp.concatenate(
                    [pos_full[:, 0:C:factor],
                     pos_full[:, C::factor]], axis=1)
            lorder = (self._kernels[self._stride_count_before(i)] - 1) \
                if self.causal else 0
            cnn_i = cnn_cache[i][:, -max(lorder, 1):, :] if self.causal else None
            cur, a, c = layer(cur, mask, pos, None,
                              att_cache=(cache_i, cache_len // factor),
                              cnn_cache=cnn_i, train=False)
            if factor > 1:
                a = jnp.repeat(a, factor, axis=2)
            new_att.append(a)
            if c is not None:
                pad = cnn_cache.shape[2] - c.shape[1]
                c = jnp.pad(c, ((0, 0), (pad, 0), (0, 0)))
                new_cnn.append(c)
            else:
                new_cnn.append(cnn_cache[i])
        if self.normalize_before:
            cur = self.after_norm(cur)
        return cur, jnp.stack(new_att, 0), jnp.stack(new_cnn, 0)

    def _stride_count_before(self, i):
        return sum(1 for idx in self._stride_idx if i > idx)

    def init_cache(self, batch=1, cache_size=None, chunk_size=16,
                   num_left_chunks=16):
        C = cache_size if cache_size is not None else chunk_size * num_left_chunks
        att = jnp.zeros((self.num_blocks, batch, self.attention_heads, C,
                         2 * self.d_k), self.dtype)
        cnn = jnp.zeros((self.num_blocks, batch, max(self.max_lorder, 1),
                         self.output_size), self.dtype)
        return {"att_cache": att, "cnn_cache": cnn,
                "offset": jnp.zeros((), jnp.int32),
                "cache_len": jnp.zeros((), jnp.int32)}


class _EffConformerLayer(ConformerEncoderLayer):
    """ConformerEncoderLayer with optional grouped attention."""
    grouped: bool = False
    group_size: int = 3

    def make_attention(self):
        if self.grouped:
            return GroupedRelPositionMultiHeadedAttention(
                self.attention_heads, self.size, self.attention_dropout_rate,
                group_size=self.group_size, dtype=self.dtype,
                name="self_attn")
        return super().make_attention()


class EfficientConformerModel(ConformerModel):
    """(parity: efficient_conformer/model.py:16-200)."""

    def make_encoder(self):
        enc_conf = dict(self.encoder_conf or {})
        return EfficientConformerEncoder(
            input_size=self.input_dim, cmvn=self.cmvn,
            use_dynamic_chunk=self.streaming, causal=self.streaming,
            dtype=self.dtype, name="encoder", **enc_conf)

    def get_encoder_out_chunk(self, speech, state):
        """Offset/cache_len advance in FULL-resolution frames; the emitted
        chunk is shorter by the total stride factor (encoder.py:306)."""
        ys, att, cnn = self.encoder.forward_chunk(
            speech, state["offset"], state["att_cache"], state["cnn_cache"],
            state["cache_len"])
        total = self.encoder.total_factor()
        full_frames = ys.shape[1] * total
        C = state["att_cache"].shape[3]
        new_state = {
            "att_cache": att, "cnn_cache": cnn,
            "offset": state["offset"] + full_frames,
            "cache_len": jnp.minimum(state["cache_len"] + full_frames, C),
        }
        return self.ctc.softmax(ys), new_state
