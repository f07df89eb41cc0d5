"""Multi-head attention blocks (parity: masr/model_utils/conformer/attention.py).

TPU-first notes:
- Scores/softmax run in float32 regardless of the compute dtype; matmuls get
  `preferred_element_type` so the MXU accumulates in f32.
- Streaming uses FIXED-SHAPE right-aligned KV caches: the cache is always
  (B, h, C, 2*d_k) with the newest entries at the end and a validity count —
  no dynamic concat-and-grow (reference attention.py:156-166 grows the
  cache; XLA needs static shapes, SURVEY.md §7 hard-parts).
"""

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

NEG_INF = -1e38


def _mask_scores(scores, mask):
    """mask: bool (B, 1|T1, T2) broadcast over heads; True = attend."""
    if mask is None:
        return jax.nn.softmax(scores, axis=-1)
    m = mask[:, None, :, :]  # (B, 1, 1|T1, T2)
    scores = jnp.where(m, scores, NEG_INF)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.where(m, attn, 0.0)


class MultiHeadedAttention(nn.Module):
    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.n_feat % self.n_head == 0
        self.d_k = self.n_feat // self.n_head
        dense = lambda name, feats=self.n_feat: nn.Dense(
            feats, dtype=self.dtype, name=name)
        self.linear_q = dense("linear_q")
        self.linear_k = dense("linear_k")
        self.linear_v = dense("linear_v")
        self.linear_out = dense("linear_out")
        self.dropout = nn.Dropout(self.dropout_rate)

    def _qkv(self, query, key, value):
        B, T1 = query.shape[0], query.shape[1]
        T2 = key.shape[1]
        q = self.linear_q(query).reshape(B, T1, self.n_head, self.d_k)
        k = self.linear_k(key).reshape(B, T2, self.n_head, self.d_k)
        v = self.linear_v(value).reshape(B, T2, self.n_head, self.d_k)
        return (q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3))  # (B, h, T, d_k)

    def _attend(self, v, scores, mask, train):
        B = v.shape[0]
        attn = _mask_scores(scores.astype(jnp.float32), mask).astype(self.dtype)
        attn = self.dropout(attn, deterministic=not train)
        x = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                       preferred_element_type=jnp.float32).astype(self.dtype)
        x = x.transpose(0, 2, 1, 3).reshape(B, -1, self.n_head * self.d_k)
        return self.linear_out(x)

    def _merge_cache(self, k, v, cache):
        """Append new kv to a right-aligned fixed cache; return (k, v, new_cache).

        cache: None, or (kv (B, h, C, 2*d_k), valid_len scalar int)."""
        if cache is None:
            return k, v, None
        cache_kv, _ = cache
        k_cache, v_cache = jnp.split(cache_kv, 2, axis=-1)
        k = jnp.concatenate([k_cache.astype(k.dtype), k], axis=2)
        v = jnp.concatenate([v_cache.astype(v.dtype), v], axis=2)
        C = cache_kv.shape[2]
        new_cache = jnp.concatenate([k, v], axis=-1)[:, :, -C:, :]
        return k, v, new_cache

    def __call__(self, query, key, value, mask=None, pos_emb=None,
                 cache=None, train: bool = False):
        q, k, v = self._qkv(query, key, value)
        k, v, new_cache = self._merge_cache(k, v, cache)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(
            jnp.float32(self.d_k))
        out = self._attend(v, scores, mask, train)
        return out, new_cache


class RelPositionMultiHeadedAttention(MultiHeadedAttention):
    """Rel-pos MHSA with pos_bias_u/v (Transformer-XL §3.3); rel_shift is
    intentionally absent, matching the reference (attention.py:244-247).

    use_flash routes the full-context (cache-free, square-mask) path
    through the fused Pallas kernel (ops/pallas/attention.py):
      "auto" (default) — measured policy: engage on TPU once T reaches
        the XLA/flash crossover (attention.FLASH_CROSSOVER_T, long-form
        audio); below it XLA's fused softmax pipeline wins. At short T
        the fused whole-layer kernel bypasses this choice entirely.
      True  — always on the eligible path (the old manual knob);
      False — never."""
    use_flash: Any = "auto"

    def _flash_route(self, T, train):
        if self.use_flash is False or self.use_flash == "never":
            return False
        if train and self.dropout_rate > 0.0:
            return False              # kernel has no dropout
        if self.use_flash is True or self.use_flash == "always":
            return True
        from masr_tpu.ops.pallas import attention as pa
        if not (jax.default_backend() == "tpu" or pa.FORCE_ON_CPU):
            return False
        return T >= pa.FLASH_CROSSOVER_T

    def setup(self):
        super().setup()
        self.linear_pos = nn.Dense(self.n_feat, use_bias=False,
                                   dtype=self.dtype, name="linear_pos")
        init = nn.initializers.xavier_uniform()
        self.pos_bias_u = self.param("pos_bias_u", init, (self.n_head, self.d_k))
        self.pos_bias_v = self.param("pos_bias_v", init, (self.n_head, self.d_k))

    def __call__(self, query, key, value, mask=None, pos_emb=None,
                 cache=None, train: bool = False):
        if (cache is None and mask is not None
                and mask.ndim == 3 and mask.shape[1] == query.shape[1]
                and self._flash_route(query.shape[1], train)):
            return self._flash(query, key, value, mask, pos_emb), None
        q, k, v = self._qkv(query, key, value)
        k, v, new_cache = self._merge_cache(k, v, cache)

        # pos_emb: (1, T2, n_feat) covering the full key length
        p = self.linear_pos(pos_emb.astype(self.dtype))
        p = p.reshape(1, -1, self.n_head, self.d_k).transpose(0, 2, 1, 3)

        bias_u = self.pos_bias_u.astype(self.dtype)[None, :, None, :]
        bias_v = self.pos_bias_v.astype(self.dtype)[None, :, None, :]
        # AC + BD as ONE matmul over a 2·d_k contraction:
        # (q+bu)·k^T + (q+bv)·p^T == [q+bu ‖ q+bv] · [k ‖ p]^T.
        # d_k=64 underfills the 128-lane MXU contraction; the concat
        # doubles the fill and halves the matmul count (measured 12-20%
        # faster at training/serving shapes, 2.8x at T=1200, v5e bf16).
        q_cat = jnp.concatenate([q + bias_u, q + bias_v], axis=-1)
        k_cat = jnp.concatenate([k, jnp.broadcast_to(p, k.shape)], axis=-1)
        scores = jnp.einsum("bhqe,bhke->bhqk", q_cat, k_cat,
                            preferred_element_type=jnp.float32) \
            / jnp.sqrt(jnp.float32(self.d_k))
        out = self._attend(v, scores, mask, train)
        return out, new_cache

    def _flash(self, query, key, value, mask, pos_emb):
        from masr_tpu.ops.pallas.attention import rel_pos_flash_attention
        B, T = query.shape[0], query.shape[1]
        q, k, v = self._qkv(query, key, value)
        p = self.linear_pos(pos_emb.astype(self.dtype))
        p = p.reshape(-1, self.n_head, self.d_k).transpose(1, 0, 2)  # (H,T,d)
        out = rel_pos_flash_attention(
            q, k, v, p, self.pos_bias_u.astype(self.dtype),
            self.pos_bias_v.astype(self.dtype), mask,
            sm_scale=1.0 / (self.d_k ** 0.5),
            interpret=jax.default_backend() != "tpu")
        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.n_head * self.d_k)
        return self.linear_out(out)


def make_att_cache(num_layers, batch, n_head, cache_size, d_k, dtype=jnp.float32):
    """Zeroed per-layer attention KV cache (L, B, h, C, 2*d_k)."""
    return jnp.zeros((num_layers, batch, n_head, cache_size, 2 * d_k), dtype)


def cache_key_mask(cache_size, chunk_len, valid_len, batch=1):
    """(B, 1, C + chunk) bool mask: right-aligned valid cache + full chunk."""
    cache_ok = jnp.arange(cache_size) >= cache_size - valid_len
    chunk_ok = jnp.ones((chunk_len,), bool)
    m = jnp.concatenate([cache_ok, chunk_ok])[None, None, :]
    return jnp.broadcast_to(m, (batch, 1, cache_size + chunk_len))
