"""Squeezeformer (parity: masr/model_utils/squeezeformer/).

U-Net-like temporal reduce/recover: reduce_idx halves the frame rate
(40→80 ms), recover_idx restores it via repeat_interleave + recover linear
+ skip connection (encoder.py:191-212). Streaming uses the 'stream' time
reduction (k=1, s=2 — no lookahead) and per-layer cache rescaling: att
caches for half-rate layers live at FULL resolution with duplicated
entries, de-duplicated by a stride-2 slice on the way in and re-inflated by
repeat_interleave on the way out (encoder.py:334-351) — here with FIXED
right-aligned shapes so one compiled chunk step serves the stream.
"""
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from masr_tpu.models.attention import (RelPositionMultiHeadedAttention,
                                       cache_key_mask)
from masr_tpu.models.conformer import ConformerModel
from masr_tpu.models.convolution import ConvolutionModule
from masr_tpu.models.embedding import sinusoid_position_encoding
from masr_tpu.models.subsampling import DepthwiseConv2dSubsampling4
from masr_tpu.ops.common import get_activation
from masr_tpu.ops.masks import add_optional_chunk_mask, make_pad_mask


class AdaptiveScale(nn.Module):
    """Learned per-channel scale/bias applied to a sublayer input
    (squeezeformer attention.py:113-116, positionwise.py, convolution.py)."""
    dim: int
    enabled: bool = True

    @nn.compact
    def __call__(self, x):
        scale = self.param("ada_scale", nn.initializers.ones, (1, 1, self.dim))
        bias = self.param("ada_bias", nn.initializers.zeros, (1, 1, self.dim))
        if not self.enabled:
            # parameters exist for checkpoint-shape parity but are identity
            return x
        return x * scale + bias


class SqueezeformerAttention(RelPositionMultiHeadedAttention):
    """Rel-pos MHSA with adaptive scale on the qkv input."""
    adaptive_scale: bool = True

    def setup(self):
        super().setup()
        self.ada = AdaptiveScale(self.n_feat, self.adaptive_scale, name="ada")

    def __call__(self, query, key, value, mask=None, pos_emb=None,
                 cache=None, train: bool = False):
        query = self.ada(query)
        return super().__call__(query, query, query, mask, pos_emb, cache,
                                train)


class SqueezeformerFFN(nn.Module):
    idim: int
    hidden_units: int
    dropout_rate: float = 0.1
    activation: Any = nn.silu
    adaptive_scale: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = AdaptiveScale(self.idim, self.adaptive_scale, name="ada")(x)
        x = nn.Dense(self.hidden_units, dtype=self.dtype, name="w_1")(x)
        x = self.activation(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        return nn.Dense(self.idim, dtype=self.dtype, name="w_2")(x)


class SqueezeformerConvModule(nn.Module):
    """Conformer conv module + adaptive scale (squeezeformer convolution.py)."""
    channels: int
    kernel_size: int = 31
    activation: Any = nn.silu
    norm: str = "batch_norm"
    causal: bool = False
    adaptive_scale: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def lorder(self):
        return self.kernel_size - 1 if self.causal else 0

    @nn.compact
    def __call__(self, x, mask_pad=None, cache=None, train: bool = False):
        x = AdaptiveScale(self.channels, self.adaptive_scale, name="ada")(x)
        out, new_cache = ConvolutionModule(
            self.channels, self.kernel_size, self.activation, self.norm,
            self.causal, dtype=self.dtype, name="conv")(
            x, mask_pad, cache, train)
        return out, new_cache


class TimeReductionLayer(nn.Module):
    """conv1d (k5 s2, offline) | stream (k1 s2, causal) time halving
    (squeezeformer/time_reduction.py)."""
    channel: int
    out_dim: int
    kind: str = "stream"  # 'conv1d' | 'stream'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, mask_pad=None):
        """xs (B, T, C) → (B, ceil(T/2), C)."""
        B, T, C = xs.shape
        if mask_pad is not None:
            xs = jnp.where(mask_pad.transpose(0, 2, 1), xs, 0.0)
        if self.kind == "stream":
            k, pad = 1, [(0, 0)]
        else:
            k, pad = 5, [(3, 3)]
        xs = nn.Conv(self.channel, (k,), strides=(2,), padding=pad,
                     feature_group_count=self.channel, dtype=self.dtype,
                     name="dw_conv")(xs)
        xs = nn.Conv(self.out_dim, (1,), dtype=self.dtype, name="pw_conv")(xs)
        L = -(-T // 2)  # target: ceil(T/2), the strided-mask length
        if xs.shape[1] >= L:
            xs = xs[:, :L]
        else:
            xs = jnp.pad(xs, ((0, 0), (0, L - xs.shape[1]), (0, 0)))
        return xs


class SqueezeformerEncoderLayer(nn.Module):
    """MHSA → FFN → conv → FFN, post-norm default (encoder.py:364-463)."""
    size: int
    attention_heads: int
    ffn_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.1
    cnn_module_kernel: int = 31
    cnn_norm: str = "batch_norm"
    causal: bool = False
    adaptive_scale: bool = True
    activation_type: str = "swish"
    normalize_before: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        act = get_activation(self.activation_type)
        self.self_attn = SqueezeformerAttention(
            self.attention_heads, self.size, self.attention_dropout_rate,
            adaptive_scale=self.adaptive_scale, dtype=self.dtype,
            name="self_attn")
        self.ffn1 = SqueezeformerFFN(self.size, self.ffn_units,
                                     self.dropout_rate, act,
                                     self.adaptive_scale, self.dtype,
                                     name="ffn1")
        self.conv_module = SqueezeformerConvModule(
            self.size, self.cnn_module_kernel, act, self.cnn_norm,
            self.causal, self.adaptive_scale, self.dtype, name="conv_module")
        self.ffn2 = SqueezeformerFFN(self.size, self.ffn_units,
                                     self.dropout_rate, act,
                                     self.adaptive_scale, self.dtype,
                                     name="ffn2")
        ln = lambda name: nn.LayerNorm(dtype=self.dtype, name=name)
        self.layer_norm1 = ln("layer_norm1")
        self.layer_norm2 = ln("layer_norm2")
        self.layer_norm3 = ln("layer_norm3")
        self.layer_norm4 = ln("layer_norm4")
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, x, mask, pos_emb, mask_pad=None, att_cache=None,
                 cnn_cache=None, train: bool = False):
        det = not train
        residual = x
        if self.normalize_before:
            x = self.layer_norm1(x)
        x_att, new_att_cache = self.self_attn(x, x, x, mask, pos_emb,
                                              att_cache, train)
        x = residual + self.dropout(x_att, deterministic=det)
        if not self.normalize_before:
            x = self.layer_norm1(x)

        residual = x
        if self.normalize_before:
            x = self.layer_norm2(x)
        x = residual + self.dropout(self.ffn1(x, train), deterministic=det)
        if not self.normalize_before:
            x = self.layer_norm2(x)

        residual = x
        if self.normalize_before:
            x = self.layer_norm3(x)
        x, new_cnn_cache = self.conv_module(x, mask_pad, cnn_cache, train)
        x = residual + self.dropout(x, deterministic=det)
        if not self.normalize_before:
            x = self.layer_norm3(x)

        residual = x
        if self.normalize_before:
            x = self.layer_norm4(x)
        x = residual + self.dropout(self.ffn2(x, train), deterministic=det)
        if not self.normalize_before:
            x = self.layer_norm4(x)
        return x, new_att_cache, new_cnn_cache


class SqueezeformerEncoder(nn.Module):
    """(parity: squeezeformer/encoder.py:18-361)."""
    input_size: int
    encoder_dim: int = 256
    output_size: int = 256
    attention_heads: int = 4
    num_blocks: int = 12
    reduce_idx: Any = 5
    recover_idx: Any = 11
    feed_forward_expansion_factor: int = 8
    dw_stride: bool = False
    input_dropout_rate: float = 0.1
    pos_enc_layer_type: str = "rel_pos"
    time_reduction_layer_type: str = "conv1d"
    feed_forward_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.1
    cnn_module_kernel: int = 31
    cnn_norm_type: str = "batch_norm"
    dropout: float = 0.1
    causal: bool = False
    adaptive_scale: bool = True
    activation_type: str = "swish"
    init_weights: bool = True
    normalize_before: bool = False
    use_dynamic_chunk: bool = False
    static_chunk_size: int = 0
    use_dynamic_left_chunk: bool = False
    # whole-layer fused Pallas serving kernel
    # (ops/pallas/squeezeformer_layer.py) — same gating pattern as the
    # Conformer fused path; reduce/recover plumbing stays on XLA
    use_fused_layer: bool = True
    # fused TRAIN layer (fwd + hand-written bwd with recompute,
    # ops/pallas/squeezeformer_layer_train.py) — layer_norm-conv configs
    # only (BatchNorm couples grads across the batch grid,
    # design_deviations.md #14)
    use_fused_layer_train: bool = True
    cmvn: Any = None
    dtype: jnp.dtype = jnp.float32

    @property
    def reduce_idx_list(self):
        r = self.reduce_idx
        return [r] if isinstance(r, int) else list(r or [])

    @property
    def recover_idx_list(self):
        r = self.recover_idx
        return [r] if isinstance(r, int) else list(r or [])

    @property
    def d_k(self):
        return self.encoder_dim // self.attention_heads

    @property
    def lorder(self):
        return self.cnn_module_kernel - 1 if self.causal else 0

    def downsampling_factor(self, i: int) -> int:
        """(parity: encoder.py:226-238)."""
        reduce_exp = sum(1 for idx in self.reduce_idx_list if i >= idx)
        recover_exp = sum(1 for idx in self.recover_idx_list if i >= idx)
        return int(2 ** max(reduce_exp - recover_exp, 0))

    def setup(self):
        self.embed = DepthwiseConv2dSubsampling4(
            idim=self.input_size, odim=self.encoder_dim,
            dropout_rate=self.input_dropout_rate,
            pos_enc_type=self.pos_enc_layer_type, dw_stride=self.dw_stride,
            dtype=self.dtype, name="embed")
        self.preln = nn.LayerNorm(dtype=self.dtype, name="preln")
        self.encoders = [SqueezeformerEncoderLayer(
            size=self.encoder_dim, attention_heads=self.attention_heads,
            ffn_units=self.encoder_dim * self.feed_forward_expansion_factor,
            dropout_rate=self.dropout,
            attention_dropout_rate=self.attention_dropout_rate,
            cnn_module_kernel=self.cnn_module_kernel,
            cnn_norm=self.cnn_norm_type, causal=self.causal,
            adaptive_scale=self.adaptive_scale,
            activation_type=self.activation_type,
            normalize_before=self.normalize_before, dtype=self.dtype,
            name=f"layer_{i}") for i in range(self.num_blocks)]
        self.time_reduction_layer = TimeReductionLayer(
            self.encoder_dim, self.encoder_dim,
            kind="stream" if self.time_reduction_layer_type == "stream"
            else "conv1d", dtype=self.dtype, name="time_reduction_layer")
        self.time_recover_layer = nn.Dense(self.encoder_dim, dtype=self.dtype,
                                           name="time_recover_layer")
        if self.output_size != self.encoder_dim:
            self.final_proj = nn.Dense(self.output_size, dtype=self.dtype,
                                       name="final_proj")

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
        xs = self.preln(xs)
        B = xs.shape[0]
        fused = self._fused_eligible(decoding_chunk_size, train, T2, B)
        fused_train = self._fused_train_eligible(train, T2, B)
        seeds = None
        if fused_train:
            if self.dropout > 0 or self.attention_dropout_rate > 0:
                seeds = jax.random.randint(
                    self.make_rng("dropout"), (len(self.encoders), B), 0,
                    jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
            else:
                seeds = jnp.zeros((len(self.encoders), B), jnp.int32)
        cur_lens = mask_pad[:, 0, :].sum(axis=1).astype(jnp.int32)
        recover_acts: List[Tuple] = []
        index = 0
        for i, layer in enumerate(self.encoders):
            if i in self.reduce_idx_list:
                recover_acts.append((xs, chunk_masks, pos_emb, mask_pad,
                                     cur_lens))
                xs = self.time_reduction_layer(xs, mask_pad)
                chunk_masks = chunk_masks[:, ::2, ::2]
                mask_pad = mask_pad[:, :, ::2]
                pos_emb = pos_emb[:, ::2, :]
                cur_lens = -(-cur_lens // 2)            # ceil: kept cols
                index += 1
            if i in self.recover_idx_list:
                index -= 1
                (r_xs, r_chunk_masks, r_pos_emb, r_mask_pad,
                 r_lens) = recover_acts[index]
                xs = jnp.repeat(xs, 2, axis=1)
                xs = self.time_recover_layer(xs)
                recovered_t = r_xs.shape[1]
                xs = r_xs + xs[:, :recovered_t, :]
                chunk_masks, pos_emb, mask_pad, cur_lens = (
                    r_chunk_masks, r_pos_emb, r_mask_pad, r_lens)
            if fused:
                xs = self._fused_layer(layer, xs, cur_lens, pos_emb)
            elif fused_train:
                xs = self._fused_train_layer(layer, xs, chunk_masks,
                                             seeds[i], cur_lens, pos_emb)
            else:
                xs, _, _ = layer(xs, chunk_masks, pos_emb, mask_pad,
                                 train=train)
        if self.output_size != self.encoder_dim:
            xs = self.final_proj(xs)
        return xs, masks

    # ------------------------------------------------------------------ #
    def _fused_eligible(self, decoding_chunk_size, train, T, B):
        """Whole-layer fused serving kernel (post-norm default config;
        see ops/pallas/squeezeformer_layer.py). Serving-only, full
        context, within the VMEM budget."""
        if not (self.use_fused_layer and not train
                and decoding_chunk_size == -1 and not self.is_initializing()
                and self.pos_enc_layer_type == "rel_pos"
                and not self.normalize_before
                and (self.use_dynamic_chunk
                     or self.static_chunk_size <= 0)):
            return False
        from masr_tpu.ops.pallas import conformer_layer as cl
        if not (jax.default_backend() == "tpu" or cl.FORCE_ON_CPU):
            return False
        from masr_tpu.parallel.mesh import fused_route_mesh
        if not fused_route_mesh(B)[0]:
            return False
        from masr_tpu.ops.pallas.squeezeformer_layer import sq_layer_supported
        return sq_layer_supported(
            T, self.encoder_dim,
            self.encoder_dim * self.feed_forward_expansion_factor,
            self.dtype)

    def _fused_train_eligible(self, train, T, B):
        """Fused TRAIN layer: layer_norm-conv configs only (the BatchNorm
        default couples gradients across the batch grid — the XLA path
        keeps it, design_deviations.md #14)."""
        if not (self.use_fused_layer_train and train
                and not self.is_initializing()
                and self.pos_enc_layer_type == "rel_pos"
                and not self.normalize_before
                and self.cnn_norm_type == "layer_norm"):
            return False
        from masr_tpu.ops.pallas import conformer_layer as cl
        if not (jax.default_backend() == "tpu" or cl.FORCE_ON_CPU):
            return False
        from masr_tpu.parallel.mesh import fused_route_mesh
        if not fused_route_mesh(B)[0]:
            return False
        from masr_tpu.ops.pallas.squeezeformer_layer_train import (
            fused_sq_train_supported)
        return fused_sq_train_supported(
            T, self.encoder_dim,
            self.encoder_dim * self.feed_forward_expansion_factor,
            self.dtype)

    def _fused_train_layer(self, layer, xs, chunk_masks, seeds, cur_lens,
                           pos_emb):
        """One fused TRAIN layer call at the current time resolution;
        multi-device wraps it in shard_map over the active mesh (batch
        over every axis, weights broadcast)."""
        from jax.sharding import PartitionSpec as P
        from masr_tpu.parallel.mesh import fused_route_mesh
        from masr_tpu.ops.pallas.squeezeformer_layer import (
            pack_sq_layer_params)
        from masr_tpu.ops.pallas.squeezeformer_layer_train import (
            fused_squeezeformer_layer_train)
        packed = pack_sq_layer_params(
            layer.variables["params"], None, self.dtype,
            adaptive_scale=self.adaptive_scale, conv_ln=True)
        packed["posp"] = jnp.einsum(
            "td,de->te", pos_emb[0].astype(self.dtype),
            packed.pop("linear_pos"),
            preferred_element_type=jnp.float32).astype(self.dtype)[None]
        B, T = xs.shape[0], xs.shape[1]
        amask = jnp.broadcast_to(chunk_masks, (B, T, T))
        interpret = jax.default_backend() != "tpu"

        def call(x, am, sd, lens, pk):
            return fused_squeezeformer_layer_train(
                x, am, sd, lens, pk, self.attention_heads,
                self.cnn_module_kernel, self.causal, 1e-6, 1e-5,
                float(self.dropout), float(self.attention_dropout_rate),
                True, interpret)

        ok, mesh = fused_route_mesh(B)
        if mesh is None:
            return call(xs, amask, seeds, cur_lens, packed)
        ax = tuple(mesh.axis_names)
        return jax.shard_map(
            call, mesh=mesh, in_specs=(P(ax), P(ax), P(ax), P(ax), P()),
            out_specs=P(ax), check_vma=False,
        )(xs, amask, seeds, cur_lens, packed)

    def _fused_layer(self, layer, xs, cur_lens, pos_emb):
        """One fused layer call; multi-device wraps it in shard_map over
        the active mesh (batch over every axis, weights broadcast —
        reduce/recover in between stays on plain GSPMD)."""
        from jax.sharding import PartitionSpec as P
        from masr_tpu.parallel.mesh import fused_route_mesh
        from masr_tpu.ops.pallas.squeezeformer_layer import (
            fused_squeezeformer_layer, pack_sq_layer_params)
        conv_ln = self.cnn_norm_type == "layer_norm"
        packed = pack_sq_layer_params(
            layer.variables["params"],
            layer.variables.get("batch_stats"), self.dtype,
            adaptive_scale=self.adaptive_scale, conv_ln=conv_ln)
        pos_p = jnp.einsum(
            "td,de->te", pos_emb[0].astype(self.dtype),
            packed.pop("linear_pos"),
            preferred_element_type=jnp.float32).astype(self.dtype)

        def call(x, lens, pp, pk):
            return fused_squeezeformer_layer(
                x, lens, pp, pk, n_head=self.attention_heads,
                ksize=self.cnn_module_kernel, causal=self.causal,
                conv_ln=conv_ln)

        ok, mesh = fused_route_mesh(xs.shape[0])
        if mesh is None:
            return call(xs, cur_lens, pos_p, packed)
        ax = tuple(mesh.axis_names)
        return jax.shard_map(
            call, mesh=mesh, in_specs=(P(ax), P(ax), P(), P()),
            out_specs=P(ax), check_vma=False,
        )(xs, cur_lens, pos_p, packed)

    def _pos(self, start, size, stride=1):
        positions = jnp.maximum(start + stride * jnp.arange(size), 0)
        return sinusoid_position_encoding(positions, self.encoder_dim,
                                          self.dtype)[None]

    def forward_chunk(self, xs, offset, att_cache, cnn_cache, cache_len):
        """Fixed-shape streaming chunk (parity: encoder.py:240-361).

        att_cache: (L, B, h, C, 2*d_k) FULL-resolution; half-rate layers
        store duplicated entries, de-duplicated with a stride-2 slice."""
        assert self.time_reduction_layer_type == "stream" or \
            not self.reduce_idx_list, \
            "streaming squeezeformer requires the 'stream' time reduction"
        if self.cmvn is not None:
            xs = self.cmvn(xs)
        xs = xs.astype(self.dtype)
        xs, _, _ = self.embed(xs, None, offset, False)
        B, chunk = xs.shape[0], xs.shape[1]
        C = att_cache.shape[3]
        pos_full = self._pos(offset - C, C + chunk)
        # half-rate keys: cache entry j holds the half-frame at full position
        # offset-C+2j (2 half-frames emitted per chunk), then the strided chunk
        pos_half = jnp.concatenate(
            [pos_full[:, 0:C:2], pos_full[:, C::2]], axis=1)

        xs = self.preln(xs)
        new_att, new_cnn = [], []
        recover_acts: List[Tuple] = []
        index = 0
        cur = xs
        for i, layer in enumerate(self.encoders):
            if i in self.reduce_idx_list:
                recover_acts.append(cur)
                cur = self.time_reduction_layer(cur, None)
                index += 1
            if i in self.recover_idx_list:
                index -= 1
                r_xs = recover_acts[index]
                cur = jnp.repeat(cur, 2, axis=1)
                cur = self.time_recover_layer(cur)
                cur = r_xs + cur[:, : r_xs.shape[1], :]
            factor = self.downsampling_factor(i)
            if factor == 1:
                cache_i = att_cache[i]
                mask = cache_key_mask(C, cur.shape[1], cache_len, B)
                pos = pos_full
            else:
                cache_i = att_cache[i][:, :, 1::2, :]
                mask = cache_key_mask(C // 2, cur.shape[1], cache_len // 2, B)
                pos = pos_half
            cur, a, c = layer(cur, mask, pos, None,
                              att_cache=(cache_i, cache_len // factor),
                              cnn_cache=cnn_cache[i] if self.causal else None)
            if factor > 1:  # re-inflate to full resolution for storage
                a = jnp.repeat(a, factor, axis=2)
            new_att.append(a)
            new_cnn.append(c if c is not None else cnn_cache[i])
        if self.output_size != self.encoder_dim:
            cur = self.final_proj(cur)
        return cur, jnp.stack(new_att, 0), jnp.stack(new_cnn, 0)

    def init_cache(self, batch=1, cache_size=None, chunk_size=16,
                   num_left_chunks=16):
        C = cache_size if cache_size is not None else chunk_size * num_left_chunks
        att = jnp.zeros((self.num_blocks, batch, self.attention_heads, C,
                         2 * self.d_k), self.dtype)
        cnn = jnp.zeros((self.num_blocks, batch, max(self.lorder, 1),
                         self.encoder_dim), self.dtype)
        return {"att_cache": att, "cnn_cache": cnn,
                "offset": jnp.zeros((), jnp.int32),
                "cache_len": jnp.zeros((), jnp.int32)}

    # ------------------------------------------------------------------ #
    # fused batched streaming (the batch engine's fast path)
    # ------------------------------------------------------------------ #
    def fused_chunk_eligible(self, chunk, cache_size, batch=None):
        """Whether forward_chunk_batched can take the fused kernel path
        (ops/pallas/chunk_layer_sq.py). Multi-device meshes route the
        whole per-layer stack — incl. the reduce/recover array math —
        through ONE shard_map over the active mesh, like the Conformer
        path."""
        from masr_tpu.ops.pallas import conformer_layer as cl
        from masr_tpu.ops.pallas.chunk_layer import chunk_layer_supported
        from masr_tpu.parallel.mesh import fused_route_mesh
        if not ((jax.default_backend() == "tpu" or cl.FORCE_ON_CPU)
                and self.pos_enc_layer_type == "rel_pos"
                and not self.normalize_before and self.causal
                and self.time_reduction_layer_type == "stream"
                and chunk % 2 == 0 and cache_size % 2 == 0
                and cache_size >= chunk):
            return False
        if not fused_route_mesh(batch if batch is not None
                                else jax.device_count())[0]:
            return False
        return chunk_layer_supported(
            chunk, cache_size, self.encoder_dim,
            self.encoder_dim * self.feed_forward_expansion_factor,
            self.attention_heads, self.dtype)

    def pack_chunk_params(self, cache_size=None, pos_table_len=8192):
        """Packed weights for the fused chunk path (BN folded to affine
        from running stats — exact in eval): {"layers": [(params, wpos)
        per layer], "tr": stream-time-reduction weights, "rec": recover
        Dense} — the reduce/recover weights ride along as plain arrays
        so the whole per-layer stack can run inside ONE shard_map on
        multi-device meshes (flax submodules can't be called inside a
        JAX transform). cache_size/pos_table_len are accepted for
        engine-call compatibility; there is no HBM position-table route
        here (positions always compute from the traced offsets)."""
        from masr_tpu.ops.pallas.squeezeformer_layer import \
            pack_sq_layer_params
        conv_ln = self.cnn_norm_type == "layer_norm"
        layers = []
        for layer in self.encoders:
            p = pack_sq_layer_params(
                layer.variables["params"],
                layer.variables.get("batch_stats"), self.dtype,
                adaptive_scale=self.adaptive_scale, conv_ln=conv_ln)
            wpos = p.pop("linear_pos")
            layers.append((p, wpos))
        out = {"layers": layers}
        if self.reduce_idx_list:
            tr = self.time_reduction_layer.variables["params"]
            rec = self.time_recover_layer.variables["params"]
            cast = lambda w: jnp.asarray(w, self.dtype)
            out["tr"] = {
                # stream kind: depthwise k=1 s2 (kernel (1, 1, C)) + pw
                "dw_w": cast(tr["dw_conv"]["kernel"]).reshape(1, 1, -1),
                "dw_b": cast(tr["dw_conv"]["bias"]).reshape(1, 1, -1),
                "pw_w": cast(tr["pw_conv"]["kernel"]).reshape(
                    self.encoder_dim, self.encoder_dim),
                "pw_b": cast(tr["pw_conv"]["bias"]).reshape(1, 1, -1),
            }
            out["rec"] = {"w": cast(rec["kernel"]),
                          "b": cast(rec["bias"]).reshape(1, 1, -1)}
        return out

    def forward_chunk_batched(self, xs, offsets, att_cache, cnn_cache,
                              cache_lens, packed=None,
                              wptrs=None, active=None,
                              exact_positions=False):
        """Batched streaming chunk step with PER-SLOT offsets/validity —
        the fused-kernel analogue of vmapping forward_chunk: one
        pallas_call per layer AT THAT LAYER'S RESOLUTION (half-rate
        layers get the stride-sliced cache, half positions and
        cache_lens//2, exactly like forward_chunk); the U-Net
        reduce/recover plumbing between layers stays on XLA.

        xs: (N, T_in, input_size), or (N, k, T_in, input_size) for
        MULTI-CHUNK TICKS (k buffered windows per slot in one dispatch,
        block-causal sub-chunk mask — see chunk_layer.py).
        → (ys (N, chunk[·k], D_out), new_att_cache, new_cnn_cache)."""
        from masr_tpu.ops.pallas.chunk_layer_sq import fused_chunk_layer_sq
        # positions are always computed from the traced offsets here (no
        # HBM table route), so exact_positions is inherently satisfied;
        # ring caches exist for the Conformer kernel only
        assert wptrs is None, \
            "squeezeformer fused chunk has no ring-cache variant"
        del active, exact_positions
        assert self.time_reduction_layer_type == "stream" or \
            not self.reduce_idx_list
        n_sub = 1
        if xs.ndim == 4:
            n_sub = xs.shape[1]
            xs = xs.reshape((xs.shape[0] * n_sub,) + xs.shape[2:])
        if self.cmvn is not None:
            xs = self.cmvn(xs)
        xs = xs.astype(self.dtype)
        # each sub-chunk embeds standalone, exactly as sequential steps
        # feed their overlapping raw windows
        xs, _, _ = self.embed(xs, None, 0, False)   # offset-free (rel_pos)
        if n_sub > 1:
            xs = xs.reshape(xs.shape[0] // n_sub, n_sub * xs.shape[1],
                            xs.shape[2])
        N, chunk = xs.shape[0], xs.shape[1]
        C = att_cache.shape[3]
        L = C + chunk
        positions = jnp.maximum(
            (offsets - C)[:, None] + jnp.arange(L)[None, :], 0)
        pe_full = sinusoid_position_encoding(
            positions.reshape(-1), self.encoder_dim,
            self.dtype).reshape(N, L, self.encoder_dim)
        # half-rate key positions: cache entry j (full row 2j+1) scores
        # with position row 2j, then the strided chunk — the same
        # convention as forward_chunk's pos_half
        pe_half = jnp.concatenate([pe_full[:, 0:C:2], pe_full[:, C::2]],
                                  axis=1)
        if packed is None:
            packed = self.pack_chunk_params()
        conv_ln = self.cnn_norm_type == "layer_norm"
        xs = self.preln(xs)
        dt = self.dtype

        def stack_fn(cur, pe_f, pe_h, att_c, cnn_c, clens, packs):
            new_att, new_cnn = [], []
            recover_acts = []
            index = 0
            for i in range(len(self.encoders)):
                if i in self.reduce_idx_list:
                    recover_acts.append(cur)
                    # stream time reduction: depthwise k=1 s2 + pointwise
                    # (TimeReductionLayer 'stream' — plain array math so
                    # this runs inside shard_map)
                    tr = packs["tr"]
                    red = cur[:, ::2, :].astype(dt) * tr["dw_w"] \
                        + tr["dw_b"]
                    cur = (red.astype(dt) @ tr["pw_w"]) + tr["pw_b"]
                    index += 1
                if i in self.recover_idx_list:
                    index -= 1
                    r_xs = recover_acts[index]
                    rec = packs["rec"]
                    up = jnp.repeat(cur, 2, axis=1)
                    up = (up.astype(dt) @ rec["w"]) + rec["b"]
                    cur = r_xs + up[:, : r_xs.shape[1], :]
                factor = self.downsampling_factor(i)
                p, wpos = packs["layers"][i]
                if factor == 1:
                    cache_i, clens_i, pe = att_c[i], clens, pe_f
                else:
                    cache_i = att_c[i][:, :, 1::2, :]
                    clens_i = clens // 2
                    pe = pe_h
                posp = jnp.einsum("nld,de->nle", pe.astype(wpos.dtype),
                                  wpos, preferred_element_type=jnp.float32
                                  ).astype(pe.dtype)
                cur, a, cc = fused_chunk_layer_sq(
                    cur, posp, cache_i, cnn_c[i], clens_i, p,
                    n_head=self.attention_heads,
                    ksize=self.cnn_module_kernel,
                    conv_ln=conv_ln, n_sub=n_sub)
                if factor > 1:  # re-inflate to full resolution for storage
                    a = jnp.repeat(a, factor, axis=2)
                new_att.append(a)
                new_cnn.append(cc)
            return cur, jnp.stack(new_att, 0), jnp.stack(new_cnn, 0)

        from masr_tpu.parallel.mesh import fused_route_mesh
        ok, mesh = fused_route_mesh(N)
        if mesh is None:
            cur, na, nc = stack_fn(xs, pe_full, pe_half, att_cache,
                                   cnn_cache, cache_lens, packed)
        else:
            from jax.sharding import PartitionSpec as P
            ax = tuple(mesh.axis_names)
            # slots shard over every mesh axis; weights broadcast; caches
            # shard on their slot dim (axis 1, after the layer dim)
            cur, na, nc = jax.shard_map(
                stack_fn, mesh=mesh,
                in_specs=(P(ax), P(ax), P(ax), P(None, ax), P(None, ax),
                          P(ax), P()),
                out_specs=(P(ax), P(None, ax), P(None, ax)),
                check_vma=False,
            )(xs, pe_full, pe_half, att_cache, cnn_cache, cache_lens,
              packed)
        if self.output_size != self.encoder_dim:
            cur = self.final_proj(cur)
        return cur, na, nc


class SqueezeformerModel(ConformerModel):
    """(parity: squeezeformer/model.py:16-200 — same loss/API as Conformer;
    streaming picks the 'stream' time-reduction and causal convs)."""

    def chunk_fused_ok(self, chunk, cache_size, batch=None):
        """Static check: can the batched chunk step take the fused
        Squeezeformer kernel path (ops/pallas/chunk_layer_sq.py)?"""
        return (type(self.encoder) is SqueezeformerEncoder
                and self.encoder.fused_chunk_eligible(chunk, cache_size,
                                                      batch))

    def make_encoder(self):
        enc_conf = dict(self.encoder_conf or {})
        return SqueezeformerEncoder(
            input_size=self.input_dim, cmvn=self.cmvn,
            use_dynamic_chunk=self.streaming, causal=self.streaming,
            time_reduction_layer_type="stream" if self.streaming else "conv1d",
            dtype=self.dtype, name="encoder", **enc_conf)
