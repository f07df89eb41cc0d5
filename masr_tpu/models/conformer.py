"""Conformer encoder and model — the flagship family
(parity: masr/model_utils/conformer/encoder.py, model.py).

TPU-first design points:
- Streaming caches are FIXED-SHAPE pytrees: att cache (L, B, h, C, 2*d_k)
  right-aligned with a validity counter, cnn cache (L, B, lorder, D). One
  compiled chunk step serves the whole stream (the reference grows caches
  dynamically, encoder.py:397-402; XLA requires static shapes, so
  required_cache_size must be >= 0 here — bounded left context).
- Dynamic chunk training draws the chunk size on device from an rng; the
  chunk mask is built from iota comparisons, so a single compiled train step
  covers every chunk size (reference rebuilds masks per batch on host).
"""
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from masr_tpu.models.attention import (MultiHeadedAttention,
                                       RelPositionMultiHeadedAttention,
                                       cache_key_mask)
from masr_tpu.models.convolution import ConvolutionModule
from masr_tpu.models.decoder import BiTransformerDecoder
from masr_tpu.models.losses import CTCHead, label_smoothing_loss
from masr_tpu.models.positionwise import PositionwiseFeedForward
from masr_tpu.models.subsampling import SUBSAMPLING_CLASSES
from masr_tpu.ops.common import IGNORE_ID, add_sos_eos, get_activation, \
    reverse_pad_list, th_accuracy
from masr_tpu.ops.masks import add_optional_chunk_mask, make_pad_mask


class ConformerEncoderLayer(nn.Module):
    """macaron-FFN(×0.5) → rel-pos MHSA → conv → FFN(×0.5) → final LN
    (parity: conformer/encoder.py:22-163, pre-norm default)."""
    size: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    macaron_style: bool = True
    use_cnn_module: bool = True
    cnn_module_kernel: int = 15
    cnn_module_norm: str = "layer_norm"
    causal: bool = False
    activation_type: str = "swish"
    rel_pos: bool = True
    use_flash_attention: Any = "auto"
    dtype: jnp.dtype = jnp.float32

    def make_attention(self):
        """Attention factory — overridden by grouped-attention layers."""
        if self.rel_pos:
            return RelPositionMultiHeadedAttention(
                self.attention_heads, self.size, self.attention_dropout_rate,
                use_flash=self.use_flash_attention, dtype=self.dtype,
                name="self_attn")
        return MultiHeadedAttention(
            self.attention_heads, self.size, self.attention_dropout_rate,
            dtype=self.dtype, name="self_attn")

    def setup(self):
        act = get_activation(self.activation_type)
        self.self_attn = self.make_attention()
        self.feed_forward = PositionwiseFeedForward(
            self.size, self.linear_units, self.dropout_rate, activation=act,
            dtype=self.dtype, name="feed_forward")
        if self.macaron_style:
            self.feed_forward_macaron = PositionwiseFeedForward(
                self.size, self.linear_units, self.dropout_rate, activation=act,
                dtype=self.dtype, name="feed_forward_macaron")
        if self.use_cnn_module:
            self.conv_module = ConvolutionModule(
                self.size, self.cnn_module_kernel, activation=act,
                norm=self.cnn_module_norm, causal=self.causal,
                dtype=self.dtype, name="conv_module")
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        self.norm_ff = ln("norm_ff")
        self.norm_mha = ln("norm_mha")
        if self.macaron_style:
            self.norm_ff_macaron = ln("norm_ff_macaron")
        if self.use_cnn_module:
            self.norm_conv = ln("norm_conv")
            self.norm_final = ln("norm_final")
        self.dropout = nn.Dropout(self.dropout_rate)

    @property
    def ff_scale(self):
        return 0.5 if self.macaron_style else 1.0

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
        x_att, new_att_cache = self.self_attn(
            x, x, x, mask=mask, pos_emb=pos_emb, cache=att_cache, train=train)
        x = residual + self.dropout(x_att, deterministic=det)
        if not self.normalize_before:
            x = self.norm_mha(x)

        new_cnn_cache = None
        if self.use_cnn_module:
            residual = x
            if self.normalize_before:
                x = self.norm_conv(x)
            x, new_cnn_cache = self.conv_module(x, mask_pad, cnn_cache, train)
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

        if self.use_cnn_module:
            x = self.norm_final(x)
        return x, new_att_cache, new_cnn_cache

    def fused_full_context(self, x, lens, pos_emb):
        """Whole-layer fused Pallas forward (serving, full context; see
        ops/pallas/conformer_layer.py). Reads the already-initialized
        param tree of the bound submodules directly."""
        from masr_tpu.ops.pallas.conformer_layer import (
            fused_conformer_layer, pack_layer_params)
        packed = pack_layer_params(self.variables["params"], self.dtype)
        pos_p = jnp.einsum(
            "td,de->te", pos_emb[0].astype(self.dtype),
            packed.pop("linear_pos"),
            preferred_element_type=jnp.float32).astype(self.dtype)
        return fused_conformer_layer(
            x, lens, pos_p, packed, n_head=self.attention_heads,
            ksize=self.cnn_module_kernel, causal=self.causal,
            ff_scale=self.ff_scale)

    def fused_train(self, x, amask, seeds, lens, pos_emb):
        """Whole-layer fused TRAIN step: Pallas forward with in-kernel
        dropout + hand-written backward with recompute
        (ops/pallas/conformer_layer_train.py)."""
        from masr_tpu.ops.pallas.conformer_layer import pack_layer_params
        from masr_tpu.ops.pallas.conformer_layer_train import (
            fused_conformer_layer_train)
        packed = pack_layer_params(self.variables["params"], self.dtype)
        packed["posp"] = jnp.einsum(
            "td,de->te", pos_emb[0].astype(self.dtype),
            packed.pop("linear_pos"),
            preferred_element_type=jnp.float32).astype(self.dtype)[None]
        interpret = jax.default_backend() != "tpu"
        return fused_conformer_layer_train(
            x, amask, seeds, lens, packed, self.attention_heads,
            self.cnn_module_kernel, self.causal, self.ff_scale, 1e-5,
            float(self.dropout_rate), float(self.attention_dropout_rate),
            True, interpret)


class ConformerEncoder(nn.Module):
    """(parity: conformer/encoder.py:166-420)."""
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
    cnn_module_norm: str = "layer_norm"
    use_flash_attention: Any = "auto"
    # whole-layer fused Pallas kernel for full-context serving (default on;
    # only engages on a TPU backend and when _fused_eligible holds —
    # disable via encoder_conf.use_fused_layer: false)
    use_fused_layer: bool = True
    # fused train step (fwd + hand-written bwd with recompute,
    # ops/pallas/conformer_layer_train.py); same TPU-backend gating
    use_fused_layer_train: bool = True
    cmvn: Any = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embed = SUBSAMPLING_CLASSES[self.input_layer](
            idim=self.input_size, odim=self.output_size,
            dropout_rate=self.dropout_rate,
            pos_enc_type=self.pos_enc_layer_type,
            pos_dropout_rate=self.positional_dropout_rate,
            dtype=self.dtype, name="embed")
        self.encoders = [ConformerEncoderLayer(
            size=self.output_size, attention_heads=self.attention_heads,
            linear_units=self.linear_units, dropout_rate=self.dropout_rate,
            attention_dropout_rate=self.attention_dropout_rate,
            normalize_before=self.normalize_before,
            macaron_style=self.macaron_style,
            use_cnn_module=self.use_cnn_module,
            cnn_module_kernel=self.cnn_module_kernel,
            cnn_module_norm=self.cnn_module_norm, causal=self.causal,
            activation_type=self.activation_type,
            rel_pos=self.pos_enc_layer_type == "rel_pos",
            use_flash_attention=self.use_flash_attention, dtype=self.dtype,
            name=f"layer_{i}") for i in range(self.num_blocks)]
        self.after_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       name="after_norm")

    @property
    def d_k(self):
        return self.output_size // self.attention_heads

    @property
    def lorder(self):
        return self.cnn_module_kernel - 1 if self.causal else 0

    def __call__(self, xs, xs_lens, decoding_chunk_size: int = 0,
                 num_decoding_left_chunks: int = -1, train: bool = False):
        """Full-context / dynamic-chunk forward → (out (B,T',D), masks (B,1,T'))."""
        T = xs.shape[1]
        masks = ~make_pad_mask(xs_lens, T)[:, None, :]
        if self.cmvn is not None:
            xs = self.cmvn(xs)
        xs = xs.astype(self.dtype)
        xs, pos_emb, masks = self.embed(xs, masks, 0, train)
        mask_pad = masks
        T2 = xs.shape[1]
        rng = None
        if (self.use_dynamic_chunk and decoding_chunk_size == 0):
            rng = self.make_rng("chunk")
        chunk_masks = add_optional_chunk_mask(
            T2, masks, self.use_dynamic_chunk, self.use_dynamic_left_chunk,
            decoding_chunk_size, self.static_chunk_size,
            num_decoding_left_chunks, rng=rng)
        B = xs.shape[0]
        if self._fused_eligible(decoding_chunk_size, train, T2, B):
            lens2 = masks[:, 0, :].sum(axis=1).astype(jnp.int32)
            xs = self._fused_serve_stack(xs, lens2, pos_emb)
        elif self._fused_train_eligible(train, T2, B):
            lens2 = masks[:, 0, :].sum(axis=1).astype(jnp.int32)
            amask = jnp.broadcast_to(chunk_masks, (B, T2, T2))
            if self.dropout_rate > 0 or self.attention_dropout_rate > 0:
                seeds = jax.random.randint(
                    self.make_rng("dropout"), (len(self.encoders), B), 0,
                    jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
            else:
                seeds = jnp.zeros((len(self.encoders), B), jnp.int32)
            xs = self._fused_train_stack(xs, amask, seeds, lens2, pos_emb)
        else:
            for layer in self.encoders:
                xs, _, _ = layer(xs, chunk_masks, pos_emb, mask_pad,
                                 train=train)
        if self.normalize_before:
            xs = self.after_norm(xs)
        return xs, masks

    def _fused_mesh(self, B):
        """Multi-device routing for the fused Pallas paths. GSPMD cannot
        auto-partition a pallas_call, so multi-device runs shard_map the
        whole fused stack over the ACTIVE mesh (parallel/mesh.py
        set_active_mesh — registered by the trainer / serving engines).

        Returns (ok, mesh): mesh is None single-device (plain call) or a
        Mesh whose every axis shards the batch dim; ok=False ⇒ caller
        must keep the XLA path (no registered mesh, or B not divisible)."""
        from masr_tpu.parallel.mesh import fused_route_mesh
        return fused_route_mesh(B)

    def _fused_eligible(self, decoding_chunk_size, train, T, B):
        """Whole-layer fused kernel: serving-only, full context, standard
        macaron/conv/rel-pos layer shape, and within the VMEM budget."""
        if not (self.use_fused_layer and not train
                and decoding_chunk_size == -1 and not self.is_initializing()
                and self.pos_enc_layer_type == "rel_pos"
                and self.normalize_before and self.macaron_style
                and self.use_cnn_module
                and self.cnn_module_norm == "layer_norm"
                # static-chunk models keep their block mask even at
                # decode -1 (masks.py:87) — the fused path is
                # full-context only
                and (self.use_dynamic_chunk
                     or self.static_chunk_size <= 0)):
            return False
        from masr_tpu.ops.pallas import conformer_layer as cl
        if not (jax.default_backend() == "tpu" or cl.FORCE_ON_CPU):
            return False       # interpret mode on CPU would crawl
        if not self._fused_mesh(B)[0]:
            return False
        return cl.fused_layer_supported(T, self.output_size,
                                        self.linear_units, self.dtype)

    def _fused_train_eligible(self, train, T, B):
        if not (self.use_fused_layer_train and train
                and not self.is_initializing()
                and self.pos_enc_layer_type == "rel_pos"
                and self.normalize_before and self.macaron_style
                and self.use_cnn_module
                and self.cnn_module_norm == "layer_norm"):
            return False
        from masr_tpu.ops.pallas import conformer_layer as cl
        if not (jax.default_backend() == "tpu" or cl.FORCE_ON_CPU):
            return False
        if not self._fused_mesh(B)[0]:
            return False
        from masr_tpu.ops.pallas.conformer_layer_train import (
            fused_train_supported)
        return fused_train_supported(T, self.output_size,
                                     self.linear_units, self.dtype)

    def _fused_serve_stack(self, xs, lens2, pos_emb):
        """Run every encoder layer through the fused serving kernel (see
        fused_serve_stack — also reused by the Efficient-Conformer for
        its plain-layer tail)."""
        l0 = self.encoders[0]
        return fused_serve_stack(
            self.encoders, xs, lens2, pos_emb, dtype=self.dtype,
            n_head=self.attention_heads, ksize=self.cnn_module_kernel,
            causal=self.causal, ff_scale=l0.ff_scale,
            mesh_route=self._fused_mesh(xs.shape[0]))


    def _fused_train_stack(self, xs, amask, seeds, lens2, pos_emb):
        """Fused TRAIN stack (custom-VJP Pallas layers; see
        fused_train_stack — also reused by the Efficient-Conformer for
        its plain-layer tail)."""
        l0 = self.encoders[0]
        return fused_train_stack(
            self.encoders, xs, amask, seeds, lens2, pos_emb,
            dtype=self.dtype, n_head=self.attention_heads,
            ksize=self.cnn_module_kernel, causal=self.causal,
            ff_scale=l0.ff_scale, dropout_rate=float(self.dropout_rate),
            attention_dropout_rate=float(self.attention_dropout_rate),
            mesh_route=self._fused_mesh(xs.shape[0]))

    def forward_chunk(self, xs, offset, att_cache, cnn_cache, cache_len):
        """One streaming chunk (parity: encoder.py:348-420, fixed shapes).

        Args:
          xs: (B, T_in, input_size) feature chunk,
              T_in = (chunk-1)*subsampling + right_context + 1.
          offset: traced scalar — encoder-output frames already emitted.
          att_cache: (L, B, h, C, 2*d_k); right-aligned, cache_len valid.
          cnn_cache: (L, B, lorder, D).
          cache_len: traced scalar — number of valid cache frames (≤ C).
        Returns (ys (B, chunk, D), new_att_cache, new_cnn_cache).
        """
        if self.cmvn is not None:
            xs = self.cmvn(xs)
        xs = xs.astype(self.dtype)
        xs, _, _ = self.embed(xs, None, offset, False)
        B, chunk = xs.shape[0], xs.shape[1]
        C = att_cache.shape[3]
        # key positions: offset - C .. offset + chunk (clamped at 0)
        pos_emb = self._chunk_pos_emb(offset - C, C + chunk)
        att_mask = cache_key_mask(C, chunk, cache_len, batch=B)

        new_att, new_cnn = [], []
        for i, layer in enumerate(self.encoders):
            xs, a, c = layer(
                xs, att_mask, pos_emb, None,
                att_cache=(att_cache[i], cache_len),
                cnn_cache=cnn_cache[i] if self.causal and self.use_cnn_module
                else None)
            new_att.append(a)
            if c is not None:
                new_cnn.append(c)
        if self.normalize_before:
            xs = self.after_norm(xs)
        new_att_cache = jnp.stack(new_att, axis=0)
        new_cnn_cache = jnp.stack(new_cnn, axis=0) if new_cnn else cnn_cache
        return xs, new_att_cache, new_cnn_cache

    def _chunk_pos_emb(self, start, size):
        from masr_tpu.models.embedding import sinusoid_position_encoding
        positions = jnp.maximum(start + jnp.arange(size), 0)
        return sinusoid_position_encoding(positions, self.output_size,
                                          self.dtype)[None]

    def fused_chunk_eligible(self, chunk, cache_size, batch=None):
        """Whether forward_chunk_batched can take the fused kernel path.
        `batch` (slot count) gates the multi-device shard_map route —
        None skips the divisibility check (single-device callers)."""
        from masr_tpu.ops.pallas import conformer_layer as cl
        from masr_tpu.ops.pallas.chunk_layer import chunk_layer_supported
        if not ((jax.default_backend() == "tpu" or cl.FORCE_ON_CPU)
                and self.pos_enc_layer_type == "rel_pos"
                and self.normalize_before and self.macaron_style
                and self.use_cnn_module and self.causal
                and self.cnn_module_norm == "layer_norm"
                and cache_size >= chunk):
            return False
        if not self._fused_mesh(batch if batch is not None
                                else jax.device_count())[0]:
            return False
        return chunk_layer_supported(chunk, cache_size, self.output_size,
                                     self.linear_units,
                                     self.attention_heads, self.dtype)

    def forward_chunk_batched(self, xs, offsets, att_cache, cnn_cache,
                              cache_lens, packed=None,
                              wptrs=None, active=None,
                              exact_positions=False):
        """Batched streaming chunk step with PER-SLOT offsets/validity —
        the fused-kernel analogue of vmapping forward_chunk (one
        pallas_call per layer; see ops/pallas/chunk_layer.py).

        xs: (N, T_in, input_size); offsets, cache_lens: (N,) int32;
        att_cache: (L, N, h, C, 2·d_k); cnn_cache: (L, N, lorder, D).
        wptrs + active (optional): RING-BUFFER att caches — att_cache is
        then a TUPLE of L per-layer (N, h, 2·C, 2·d_k) MIRRORED ring
        arrays (rows [C, 2·C) duplicate rows [0, C); row
        wptr[s] = oldest cached frame of slot s); each layer's kernel
        writes only its c fresh rows back (aliased buffers: inputs are
        consumed) and inactive slots' rings stay untouched. The returned
        att caches are the aliased buffers as a tuple — callers advance
        wptrs by the chunk size (mod C) for active slots and must NOT
        where()-merge these leaves.
        MULTI-CHUNK TICK: xs may be (N, k, T_in, input_size) — k buffered
        standard windows per slot, processed in ONE dispatch with a
        block-causal sub-chunk mask; bit-equivalent to k sequential
        calls while paying the per-tick cache/weight DMA once.
        → (ys (N, chunk[·k], D), new_att_cache, new_cnn_cache)."""
        from masr_tpu.models.embedding import sinusoid_position_encoding
        from masr_tpu.ops.pallas.chunk_layer import (clamp_pos_starts,
                                                     fused_chunk_layer)
        n_sub = 1
        if xs.ndim == 4:
            n_sub = xs.shape[1]
            xs = xs.reshape((xs.shape[0] * n_sub,) + xs.shape[2:])
        if self.cmvn is not None:
            xs = self.cmvn(xs)
        xs = xs.astype(self.dtype)
        # each sub-chunk embeds standalone (the raw windows overlap by the
        # subsampling context, exactly as sequential steps feed them)
        xs, _, _ = self.embed(xs, None, 0, False)   # offset-free (rel_pos)
        if n_sub > 1:
            xs = xs.reshape(xs.shape[0] // n_sub, n_sub * xs.shape[1],
                            xs.shape[2])
        N, chunk = xs.shape[0], xs.shape[1]
        ring = wptrs is not None
        # mirrored ring buffers carry 2·C rows (chunk_layer.py ring mode)
        C = att_cache[0].shape[2] // 2 if ring else att_cache.shape[3]
        L = C + chunk
        if packed is None:
            packed = self.pack_chunk_params()
        l0 = self.encoders[0]
        # packs with per-layer HBM position tables (pack_chunk_params
        # called with cache_size) route the in-kernel positions DMA: no
        # (N, L, D) sinusoid + per-layer posp einsum per tick at all.
        # Mosaic needs the DMA start row provably 8-aligned, so the
        # route additionally requires the per-window chunk size and the
        # cache depth to be multiples of 8 (engine offsets advance by
        # the chunk size); otherwise fall back to the posp einsum using
        # the wpos the pack keeps alongside the table.
        # exact_positions=True forces the per-tick sinusoid+einsum route
        # even when the pack carries position tables: the einsum computes
        # PE(offset) directly from the traced offsets, so it is exact at
        # ANY offset — the engine switches to it for ticks where a slot
        # has outlived the table window, replacing the old silent
        # position freeze (the reference CRASHES there,
        # conformer/embedding.py:50).
        use_table = (not exact_positions and len(packed[0]) == 3
                     and chunk % (8 * n_sub) == 0 and C % 8 == 0)
        if use_table:
            pos_or_starts = clamp_pos_starts(offsets,
                                             packed[0][2].shape[0], L)
        else:
            positions = jnp.maximum(
                (offsets - C)[:, None] + jnp.arange(L)[None, :], 0)
            pos_or_starts = sinusoid_position_encoding(
                positions.reshape(-1), self.output_size,
                self.dtype).reshape(N, L, self.output_size)

        def stack_fn(*a):
            if ring:
                # wptrs/active are EXPLICIT args (closure capture would
                # replicate the full (N,) arrays into every shard)
                x, pe, att_c, cnn_c, clens, wp, act, packs = a
            else:
                x, pe, att_c, cnn_c, clens, packs = a
                wp = act = None
            new_att, new_cnn = [], []
            for i in range(len(self.encoders)):
                if use_table:
                    posp, (p, _, ptab), starts = None, packs[i], pe
                else:
                    p, wpos = packs[i][0], packs[i][1]
                    ptab, starts = None, None
                    # linear_pos as ONE batched einsum per layer —
                    # projecting per slot inside the kernel was the
                    # dominant per-tick cost (12 layers × N small
                    # serialized matmuls)
                    posp = jnp.einsum(
                        "nld,de->nle", pe.astype(wpos.dtype), wpos,
                        preferred_element_type=jnp.float32).astype(pe.dtype)
                x, a, cn = fused_chunk_layer(
                    x, posp, att_c[i], cnn_c[i], clens,
                    p, None, ptab, starts, wp, act,
                    n_head=self.attention_heads,
                    ksize=self.cnn_module_kernel, ff_scale=l0.ff_scale,
                    n_sub=n_sub)
                new_att.append(a)
                new_cnn.append(cn)
            if ring:
                # aliased ring buffers stay per-layer leaves (stacking
                # would copy them and break the in-place semantics)
                return x, tuple(new_att), jnp.stack(new_cnn, 0)
            return x, jnp.stack(new_att, 0), jnp.stack(new_cnn, 0)

        ok, mesh = self._fused_mesh(N)
        if ring:
            args = (xs, pos_or_starts, att_cache, cnn_cache, cache_lens,
                    wptrs, active, packed)
        else:
            args = (xs, pos_or_starts, att_cache, cnn_cache, cache_lens,
                    packed)
        if mesh is None:
            out = stack_fn(*args)
        else:
            from jax.sharding import PartitionSpec as P
            ax = tuple(mesh.axis_names)
            # slots shard over every mesh axis; weights broadcast; caches
            # shard on their slot dim (axis 1 for stacked layouts; axis 0
            # of each per-layer ring buffer — the ring pallas_call runs
            # per shard on its local slots, the same local program the
            # single-chip route compiles, with the buffer aliasing
            # applying within each shard)
            if ring:
                # att_cache is a tuple of per-layer (N, ...) rings —
                # P(ax) acts as a pytree prefix over its leaves
                in_specs = (P(ax), P(ax), P(ax), P(None, ax), P(ax),
                            P(ax), P(ax), P())
                out_specs = (P(ax), P(ax), P(None, ax))
            else:
                in_specs = (P(ax), P(ax), P(None, ax), P(None, ax), P(ax),
                            P())
                out_specs = (P(ax), P(None, ax), P(None, ax))
            out = jax.shard_map(stack_fn, mesh=mesh, in_specs=in_specs,
                                out_specs=out_specs, check_vma=False)(*args)
        xs, att_cache, cnn_cache = out
        if self.normalize_before:
            xs = self.after_norm(xs)
        return xs, att_cache, cnn_cache

    def pack_chunk_params(self, cache_size=None, pos_table_len=8192):
        """Packed weight pytree for the fused chunk kernels — computed
        ONCE at session init and passed through each tick (repacking
        in-trace costs ~60 MB of stacking HBM traffic per call at
        production size). cache_size additionally bakes per-layer HBM
        position tables (ops/pallas/chunk_layer.make_chunk_pos_table):
        the kernels then DMA each slot's position window in place of the
        per-tick (N, L, D) sinusoid + per-layer posp einsum. Sessions
        longer than pos_table_len - cache_size - chunk frames clamp
        (positions freeze) — the reference crashes at 5000 frames
        outright (conformer/embedding.py:50,70)."""
        from masr_tpu.ops.pallas.conformer_layer import pack_layer_params
        from masr_tpu.ops.pallas.chunk_layer import make_chunk_pos_table
        out = []
        for layer in self.encoders:
            p = pack_layer_params(layer.variables["params"], self.dtype)
            wpos = p.pop("linear_pos")
            if cache_size is None:
                out.append((p, wpos))
            else:
                ptab = make_chunk_pos_table(wpos, cache_size,
                                            pos_table_len, self.dtype)
                out.append((p, wpos, ptab))
        return out

    def init_cache(self, batch=1, cache_size=None, chunk_size=16,
                   num_left_chunks=16, ring=False):
        """Zeroed streaming cache pytree.
        ring=True lays the attention cache out as per-layer MIRRORED RING
        buffers (a tuple of L (batch, h, 2·C, 2·d_k) arrays — rows
        [C, 2·C) duplicate rows [0, C) so the kernel's chronological
        window [wp, wp + C) is one contiguous DMA — plus a per-slot
        'wptr') for the ring-write fused kernel — batched-engine only;
        leaves are already batch-leading at the full slot count (no
        stacking)."""
        C = cache_size if cache_size is not None else chunk_size * num_left_chunks
        if ring:
            # lane dim padded to the 128 tiling: Mosaic only lowers the
            # ring's windowed DMA slices at 128-multiple lane widths
            # (small models would otherwise lose the route; the pad rows
            # are dead bytes the kernel never reads)
            rp = -(-2 * self.d_k // 128) * 128
            att = tuple(
                jnp.zeros((batch, self.attention_heads, 2 * C, rp),
                          self.dtype)
                for _ in range(self.num_blocks))
            cnn = jnp.zeros((self.num_blocks, batch, max(self.lorder, 1),
                             self.output_size), self.dtype)
            return {"att_cache": att, "cnn_cache": cnn,
                    "offset": jnp.zeros((batch,), jnp.int32),
                    "cache_len": jnp.zeros((batch,), jnp.int32),
                    "wptr": jnp.zeros((batch,), jnp.int32)}
        att = jnp.zeros((self.num_blocks, batch, self.attention_heads, C,
                         2 * self.d_k), self.dtype)
        cnn = jnp.zeros((self.num_blocks, batch, max(self.lorder, 1),
                         self.output_size), self.dtype)
        return {"att_cache": att, "cnn_cache": cnn,
                "offset": jnp.zeros((), jnp.int32),
                "cache_len": jnp.zeros((), jnp.int32)}

    def ring_chunk_eligible(self, chunk, cache_size, batch):
        """Whether the batched chunk step can run ring-buffer att caches:
        fused path, 8-aligned chunk, cache a multiple of the chunk
        (writes never wrap mid-copy). Meshes are eligible too (r5): the
        ring stack shard_maps with slots as the sharded axis — each
        shard runs the SAME local pallas program the single-chip route
        compiles, and the buffer aliasing applies within each shard."""
        if not self.fused_chunk_eligible(chunk, cache_size, batch):
            return False
        mesh = self._fused_mesh(batch)[1]
        if mesh is not None and batch // mesh.size < 1:
            return False
        return (chunk % 8 == 0 and cache_size % chunk == 0)


class ConformerModel(nn.Module):
    """Hybrid CTC + bidirectional-attention model
    (parity: conformer/model.py:16-195)."""
    input_dim: int
    vocab_size: int
    cmvn: Any = None
    streaming: bool = True
    encoder_conf: Optional[Dict] = None
    decoder_conf: Optional[Dict] = None
    ctc_weight: float = 0.5
    ignore_id: int = IGNORE_ID
    reverse_weight: float = 0.0
    lsm_weight: float = 0.0
    length_normalized_loss: bool = False
    dtype: jnp.dtype = jnp.float32

    def make_encoder(self):
        """Encoder factory — overridden by Squeezeformer/Efficient-Conformer
        subclasses; everything else (loss, CTC head, chunk API) is shared.
        encoder_conf may override the streaming-derived use_dynamic_chunk/
        causal defaults (the reference's splat at model.py:44-47 would
        raise on a duplicate key; here an explicit key wins — used by
        the head-to-head ablation harness)."""
        enc_conf = dict(self.encoder_conf or {})
        enc_conf.setdefault("use_dynamic_chunk", self.streaming)
        enc_conf.setdefault("causal", self.streaming)
        return ConformerEncoder(
            input_size=self.input_dim, cmvn=self.cmvn,
            dtype=self.dtype, name="encoder", **enc_conf)

    def setup(self):
        assert 0.0 <= self.ctc_weight <= 1.0
        self.encoder = self.make_encoder()
        dec_conf = dict(self.decoder_conf or {})
        self.decoder = BiTransformerDecoder(
            vocab_size=self.vocab_size,
            encoder_output_size=self.encoder.output_size,
            dtype=self.dtype, name="decoder", **dec_conf)
        self.ctc = CTCHead(self.vocab_size, dtype=self.dtype, name="ctc")

    @property
    def sos(self):
        return self.vocab_size - 1

    @property
    def eos(self):
        return self.vocab_size - 1

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 train: bool = False):
        """→ {'loss', 'loss_att', 'loss_ctc', 'acc_att'} (model.py:68-113)."""
        encoder_out, encoder_mask = self.encoder(speech, speech_lengths,
                                                 train=train)
        encoder_out_lens = encoder_mask[:, 0, :].sum(axis=1).astype(jnp.int32)

        loss_att = jnp.zeros((), jnp.float32)
        acc_att = jnp.zeros((), jnp.float32)
        if self.ctc_weight != 1.0:
            loss_att, acc_att = self._calc_att_loss(
                encoder_out, encoder_mask, text, text_lengths, train)
        loss_ctc = jnp.zeros((), jnp.float32)
        if self.ctc_weight != 0.0:
            loss_ctc = self.ctc(encoder_out, encoder_out_lens, text,
                                text_lengths, train)
        if self.ctc_weight == 0.0:
            loss = loss_att
        elif self.ctc_weight == 1.0:
            loss = loss_ctc
        else:
            loss = self.ctc_weight * loss_ctc + (1 - self.ctc_weight) * loss_att
        return {"loss": loss, "loss_att": loss_att, "loss_ctc": loss_ctc,
                "acc_att": acc_att}

    def _calc_att_loss(self, encoder_out, encoder_mask, ys_pad, ys_pad_lens,
                       train):
        ys_in_pad, ys_out_pad = add_sos_eos(ys_pad, ys_pad_lens, self.sos,
                                            self.eos, self.ignore_id)
        ys_in_lens = ys_pad_lens + 1
        r_ys_pad = reverse_pad_list(ys_pad, ys_pad_lens,
                                    float(self.ignore_id)).astype(ys_pad.dtype)
        r_ys_in_pad, r_ys_out_pad = add_sos_eos(r_ys_pad, ys_pad_lens,
                                                self.sos, self.eos,
                                                self.ignore_id)
        decoder_out, r_decoder_out = self.decoder(
            encoder_out, encoder_mask, ys_in_pad, ys_in_lens, r_ys_in_pad,
            self.reverse_weight, train)
        loss_att = label_smoothing_loss(
            decoder_out, ys_out_pad, self.vocab_size, self.ignore_id,
            self.lsm_weight, self.length_normalized_loss)
        if self.reverse_weight > 0.0 and self.decoder.r_num_blocks > 0:
            r_loss_att = label_smoothing_loss(
                r_decoder_out, r_ys_out_pad, self.vocab_size, self.ignore_id,
                self.lsm_weight, self.length_normalized_loss)
            loss_att = loss_att * (1 - self.reverse_weight) \
                + r_loss_att * self.reverse_weight
        acc_att = th_accuracy(
            decoder_out.reshape(-1, self.vocab_size), ys_out_pad,
            self.ignore_id)
        return loss_att, acc_att

    def get_encoder_out(self, speech, speech_lengths):
        """Full-context CTC softmax (model.py:152-167) → (probs, out_lens).

        The CTC head stays on the XLA path deliberately: a fused
        logits+softmax Pallas kernel measured SLOWER (8.45/8.48 ms vs
        8.17 ms full-context at block_r 128/512) — XLA's own softmax
        fusion already keeps the logits traffic off HBM."""
        encoder_out, mask = self.encoder(speech, speech_lengths,
                                         decoding_chunk_size=-1,
                                         num_decoding_left_chunks=-1)
        lens = mask[:, 0, :].sum(axis=1).astype(jnp.int32)
        return self.ctc.softmax(encoder_out), lens

    def get_encoder_out_chunk(self, speech, state):
        """Streaming chunk step (model.py:169-190) → (probs, new_state)."""
        ys, att, cnn = self.encoder.forward_chunk(
            speech, state["offset"], state["att_cache"], state["cnn_cache"],
            state["cache_len"])
        chunk = ys.shape[1]
        C = state["att_cache"].shape[3]
        new_state = {
            "att_cache": att, "cnn_cache": cnn,
            "offset": state["offset"] + chunk,
            "cache_len": jnp.minimum(state["cache_len"] + chunk, C),
        }
        return self.ctc.softmax(ys), new_state

    def chunk_fused_ok(self, chunk, cache_size, batch=None):
        """Static check (run via apply, eagerly): can the batched chunk
        step take the fused-kernel path for this model/config?"""
        return (type(self.encoder) is ConformerEncoder
                and self.encoder.fused_chunk_eligible(chunk, cache_size,
                                                      batch))

    def pack_chunk_params(self, cache_size=None, pos_table_len=8192):
        """→ packed weights for the fused chunk step (compute once at
        session init, pass to get_encoder_out_chunk_batched); cache_size
        bakes the per-layer HBM position tables (in-kernel positions
        DMA); pos_table_len sizes their window (streams past it switch
        to exact per-tick positions — engine/server knob)."""
        return self.encoder.pack_chunk_params(cache_size=cache_size,
                                              pos_table_len=pos_table_len)

    def chunk_ring_ok(self, chunk, cache_size, batch):
        """Static check: can the batched chunk step run RING-BUFFER att
        caches (write c fresh rows per tick instead of all C —
        ops/pallas/chunk_layer.py ring mode)?"""
        return (type(self.encoder) is ConformerEncoder
                and self.encoder.ring_chunk_eligible(chunk, cache_size,
                                                     batch))

    def get_encoder_out_chunk_batched(self, speech, state, packed=None,
                                      active=None, exact_positions=False):
        """Batched streaming chunk step over N slots with per-slot
        offsets/cache validity (the batch engine's stacked-state layout:
        every leaf leads with N; caches carry the per-slot batch=1 axis).
        Semantically identical to vmapping get_encoder_out_chunk, but
        runs ONE fused pallas_call per layer (ops/pallas/chunk_layer.py)
        instead of ~20 small XLA ops.
        RING layout (state has 'wptr'; init_cache(ring=True)): att_cache
        is a tuple of per-layer (N, h, 2·C, 2·d_k) mirrored ring buffers
        and
        cnn_cache is (L, N, lorder, D) — the caches never round-trip
        through XLA (no transposes/stack), the kernels write only the
        fresh rows in place, and `active` (N,) bool gates the writes.
        Callers must NOT where()-merge the returned att_cache leaves and
        must treat the input state's att buffers as consumed."""
        if "wptr" in state:
            ys, new_att, new_cnn = self.encoder.forward_chunk_batched(
                speech, state["offset"], state["att_cache"],
                state["cnn_cache"], state["cache_len"], packed=packed,
                wptrs=state["wptr"],
                active=(jnp.ones_like(state["wptr"], bool)
                        if active is None else active),
                exact_positions=exact_positions)
            chunk = ys.shape[1]
            C = state["att_cache"][0].shape[2] // 2   # mirrored ring
            new_state = {
                "att_cache": new_att, "cnn_cache": new_cnn,
                "offset": state["offset"] + chunk,
                "cache_len": jnp.minimum(state["cache_len"] + chunk, C),
                "wptr": jax.lax.rem(state["wptr"] + chunk, C)}
            return self.ctc.softmax(ys), new_state
        att = state["att_cache"]            # (N, L, 1, h, C, 2·d_k)
        cnn = state["cnn_cache"]            # (N, L, 1, lorder, D)
        C = att.shape[4]
        att_l = att[:, :, 0].transpose(1, 0, 2, 3, 4)
        cnn_l = cnn[:, :, 0].transpose(1, 0, 2, 3)
        ys, na, nc = self.encoder.forward_chunk_batched(
            speech, state["offset"], att_l, cnn_l, state["cache_len"],
            packed=packed, exact_positions=exact_positions)
        chunk = ys.shape[1]
        new_state = {
            "att_cache": na.transpose(1, 0, 2, 3, 4)[:, :, None],
            "cnn_cache": nc.transpose(1, 0, 2, 3)[:, :, None],
            "offset": state["offset"] + chunk,
            "cache_len": jnp.minimum(state["cache_len"] + chunk, C),
        }
        return self.ctc.softmax(ys), new_state

    def get_encoder_out_chunk_full(self, speech, state):
        """Like get_encoder_out_chunk but also returns the encoder hidden
        states — accumulated host-side for end-of-utterance attention
        rescoring (U2-style two-pass streaming)."""
        ys, att, cnn = self.encoder.forward_chunk(
            speech, state["offset"], state["att_cache"], state["cnn_cache"],
            state["cache_len"])
        chunk = ys.shape[1]
        C = state["att_cache"].shape[3]
        new_state = {
            "att_cache": att, "cnn_cache": cnn,
            "offset": state["offset"] + chunk,
            "cache_len": jnp.minimum(state["cache_len"] + chunk, C),
        }
        return self.ctc.softmax(ys), ys, new_state

    def ctc_logits(self, encoder_out):
        return self.ctc.logits(encoder_out)

    def ctc_log_softmax(self, encoder_out):
        return self.ctc.log_softmax(encoder_out)

    def encode_for_rescoring(self, speech, speech_lengths):
        """Full-context encode → (encoder_out, ctc_probs, out_lens); the
        hidden states feed attention rescoring without a second encode."""
        encoder_out, mask = self.encoder(speech, speech_lengths,
                                         decoding_chunk_size=-1,
                                         num_decoding_left_chunks=-1)
        lens = mask[:, 0, :].sum(axis=1).astype(jnp.int32)
        return encoder_out, self.ctc.softmax(encoder_out), lens

    @staticmethod
    def _gather_hyp_scores(logp, ys_out, ignore_id):
        """Sum per-token log-probs of each hypothesis incl. its <eos>."""
        valid = ys_out != ignore_id
        tgt = jnp.where(valid, ys_out, 0)
        tok = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return jnp.where(valid, tok, 0.0).sum(axis=1)

    def rescore_hyps(self, encoder_out, encoder_len, hyps, hyps_lens,
                     reverse_weight: float = 0.0):
        """Attention-rescoring scores for N hypotheses over ONE utterance
        (the decode mode the reference's forward_one_step was built for but
        never wired, transformer/decoder.py:233).

        encoder_out: (1, T, D); hyps: (N, L) padded with -1 → (N,) scores
        = (1-rw)·left-decoder + rw·right-decoder log-likelihoods."""
        N = hyps.shape[0]
        T = encoder_out.shape[1]
        enc = jnp.broadcast_to(encoder_out,
                               (N,) + encoder_out.shape[1:])
        enc_mask = (jnp.arange(T)[None, :] < encoder_len)[:, None, :]
        enc_mask = jnp.broadcast_to(enc_mask, (N, 1, T))
        ys_in_pad, ys_out_pad = add_sos_eos(hyps, hyps_lens, self.sos,
                                            self.eos, self.ignore_id)
        r_hyps = reverse_pad_list(hyps, hyps_lens,
                                  float(self.ignore_id)).astype(hyps.dtype)
        r_ys_in_pad, r_ys_out_pad = add_sos_eos(r_hyps, hyps_lens, self.sos,
                                                self.eos, self.ignore_id)
        decoder_out, r_decoder_out = self.decoder(
            enc, enc_mask, ys_in_pad, hyps_lens + 1, r_ys_in_pad,
            reverse_weight, False)
        logp = jax.nn.log_softmax(decoder_out.astype(jnp.float32), axis=-1)
        scores = self._gather_hyp_scores(logp, ys_out_pad, self.ignore_id)
        if reverse_weight > 0.0 and self.decoder.r_num_blocks > 0:
            r_logp = jax.nn.log_softmax(r_decoder_out.astype(jnp.float32),
                                        axis=-1)
            r_scores = self._gather_hyp_scores(r_logp, r_ys_out_pad,
                                               self.ignore_id)
            scores = (1 - reverse_weight) * scores + reverse_weight * r_scores
        return scores


def fused_serve_stack(layers, xs, lens2, pos_emb, *, dtype, n_head, ksize,
                      causal, ff_scale, mesh_route):
    """Run `layers` (standard macaron/rel-pos/conv conformer layers)
    through the fused serving kernel. Single-device: direct calls.
    Multi-device: ONE shard_map around the whole stack — batch sharded
    over every mesh axis (a dp×tp mesh serves as pure data parallelism
    here; serving weights are replicated), layer weights broadcast, one
    boundary reshard total instead of per-layer."""
    from jax.sharding import PartitionSpec as P
    from masr_tpu.ops.pallas.conformer_layer import (
        fused_conformer_layer, pack_layer_params)
    packed_all, posp_all = [], []
    for layer in layers:
        packed = pack_layer_params(layer.variables["params"], dtype)
        posp_all.append(jnp.einsum(
            "td,de->te", pos_emb[0].astype(dtype),
            packed.pop("linear_pos"),
            preferred_element_type=jnp.float32).astype(dtype))
        packed_all.append(packed)

    def stack_fn(x, lens, posps, packs):
        for pos_p, packed in zip(posps, packs):
            x = fused_conformer_layer(
                x, lens, pos_p, packed, n_head=n_head, ksize=ksize,
                causal=causal, ff_scale=ff_scale)
        return x

    ok, mesh = mesh_route
    if mesh is None:
        return stack_fn(xs, lens2, posp_all, packed_all)
    ax = tuple(mesh.axis_names)
    return jax.shard_map(
        stack_fn, mesh=mesh,
        in_specs=(P(ax), P(ax), P(), P()),
        out_specs=P(ax), check_vma=False,
    )(xs, lens2, posp_all, packed_all)


def fused_train_stack(layers, xs, amask, seeds, lens2, pos_emb, *, dtype,
                      n_head, ksize, causal, ff_scale, dropout_rate,
                      attention_dropout_rate, mesh_route):
    """Run `layers` through the fused TRAIN kernels (custom-VJP Pallas
    layers). Multi-device: shard_map over the active mesh with the batch
    split across every axis — the replicated-weight in_specs make
    shard_map's transpose psum the weight cotangents, reproducing GSPMD's
    dp gradient sum (TP-sharded params are gathered at the boundary,
    FSDP-style)."""
    from jax.sharding import PartitionSpec as P
    from masr_tpu.ops.pallas.conformer_layer import pack_layer_params
    from masr_tpu.ops.pallas.conformer_layer_train import (
        fused_conformer_layer_train)
    packed_all = []
    for layer in layers:
        packed = pack_layer_params(layer.variables["params"], dtype)
        packed["posp"] = jnp.einsum(
            "td,de->te", pos_emb[0].astype(dtype),
            packed.pop("linear_pos"),
            preferred_element_type=jnp.float32).astype(dtype)[None]
        packed_all.append(packed)
    interpret = jax.default_backend() != "tpu"

    def stack_fn(x, am, sd, lens, packs):
        for i, packed in enumerate(packs):
            x = fused_conformer_layer_train(
                x, am, sd[i], lens, packed, n_head, ksize, causal,
                ff_scale, 1e-5, dropout_rate, attention_dropout_rate,
                True, interpret)
        return x

    ok, mesh = mesh_route
    if mesh is None:
        return stack_fn(xs, amask, seeds, lens2, packed_all)
    ax = tuple(mesh.axis_names)
    return jax.shard_map(
        stack_fn, mesh=mesh,
        in_specs=(P(ax), P(ax), P(None, ax), P(ax), P()),
        out_specs=P(ax), check_vma=False,
    )(xs, amask, seeds, lens2, packed_all)
