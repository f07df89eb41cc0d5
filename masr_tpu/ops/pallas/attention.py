"""Fused rel-pos flash attention (Pallas, TPU).

The Conformer's rel-pos attention (attention.py:169-249 in the reference,
rel_shift removed) is two matmuls sharing a softmax:

    scores = ((q + bu) @ k^T + (q + bv) @ p^T) * sm_scale
    out    = softmax(mask(scores)) @ v

The XLA path materializes the (T, T) scores in HBM twice (write after the
matmuls, read for the softmax·V). This kernel tiles K/V with an online
softmax so scores never leave VMEM — the classic flash-attention recipe
plus the positional (q+bv)·p^T term and the chunk/pad mask.

Status (v5e, measured on the full 12-layer encoder, bf16, both paths
with the fused AC+BD score matmul): at typical utterance lengths XLA's
fused softmax pipeline wins (T=1200 input frames: 13.1 vs 18.9 ms/batch
at B=32) because the score tensors still fit caches; at LONG-FORM
shapes this kernel wins
(T=4800 frames ≈ 48 s audio, B=8: 20.5 vs 43.1 ms, 2.1×) where XLA's
materialized scores blow past VMEM.

Routing (`encoder_conf.use_flash_attention`, default "auto"): the fused
whole-layer kernel owns short/typical lengths outright; past its VMEM
ceiling the encoder stays on XLA until FLASH_CROSSOVER_T
(post-subsampling frames) and switches to this kernel beyond it —
models/attention.py _flash_route, measured by tools/bench_attention_routing.py.
True/False force the old always/never behavior. The streaming chunk
step (T=16) always stays on the XLA path where per-kernel launch
overhead dominates.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128

# Auto-routing crossover (VERDICT r2 item 7): post-subsampling T at or
# beyond which this kernel beats XLA's materialized-scores path on v5e.
# Measured points (12-layer encoder, bf16, fused AC+BD both sides):
# T=300 (B=32): XLA 13.1 ms vs flash 18.9 — XLA wins;
# T=1200 (B=8): flash 20.5 vs 43.1 — flash 2.1×. The fused whole-layer
# kernel owns T ≲ 600 anyway (its VMEM ceiling), so the open band is
# (600, 1200); tools/bench_attention_routing.py sweeps the tipping point
# on real hardware (see its committed results in docs/status.md).
FLASH_CROSSOVER_T = 800
# tests flip this to exercise the auto route (interpret mode) on CPU
FORCE_ON_CPU = False


def _kernel(q_ref, k_ref, v_ref, p_ref, bu_ref, bv_ref, mask_ref, o_ref,
            m_scratch, l_scratch, acc_scratch, *, sm_scale, kv_tiles):
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q = q_ref[0, 0]              # (bq, d)
    k = k_ref[0, 0]              # (bk, d)
    v = v_ref[0, 0]              # (bk, d)
    p = p_ref[0]                 # (bk, d)
    bu = bu_ref[0]               # (1, d) — broadcast over rows
    bv = bv_ref[0]

    # AC+BD as one 2d-contraction matmul (d=64 underfills the 128-lane
    # MXU; see models/attention.py for the measured win)
    q_cat = jnp.concatenate([q + bu, q + bv], axis=1).astype(k.dtype)
    k_cat = jnp.concatenate([k, p.astype(k.dtype)], axis=1)
    s = jax.lax.dot_general(
        q_cat, k_cat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale   # (bq, bk) f32
    mask = mask_ref[0] != 0
    s = jnp.where(mask, s, MASK_VALUE)

    m_prev = m_scratch[...]
    l_prev = l_scratch[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)        # (bq, 1)
    m_curr = jnp.broadcast_to(m_curr, m_prev.shape)   # (bq, LANES)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    pexp = jnp.exp(s - m_next[:, :1])                 # (bq, bk)
    # fully-masked rows: pexp = exp(MASK - MASK) = 1 → zero them
    pexp = jnp.where(mask, pexp, 0.0)
    l_corr = alpha * l_prev
    l_next = l_corr + jnp.broadcast_to(
        jnp.sum(pexp, axis=1, keepdims=True), l_prev.shape)
    m_scratch[...] = m_next
    l_scratch[...] = l_next

    acc_scratch[...] *= alpha[:, :1]
    o_curr = jax.lax.dot(pexp.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
    acc_scratch[...] += o_curr

    @pl.when(j == kv_tiles - 1)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


def _pick_blocks(T):
    """Measured-best tile sizes (v5e, bf16, d=64). Small T wants tiles
    that cover T with minimal padding (T=304: bq160/bk320 = 1978 us vs
    2245 us XLA, vs 3427 us at the old 128/128 default); large T wants
    bq256/bk512 (T=1200: 4689 us vs 7046 us XLA)."""
    def round_up(n, m):
        return -(-n // m) * m
    if T > 512:
        return 256, 512
    return (min(256, round_up(-(-T // 2), 32)), round_up(T, 64))


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_q", "block_k",
                                             "interpret"))
def rel_pos_flash_attention(q, k, v, p, bias_u, bias_v, mask, sm_scale=None,
                            block_q=None, block_k=None, interpret=False):
    """q,k,v: (B, H, T, d); p: (H, T, d); bias_u/v: (H, d);
    mask: (B, T, T) bool (True = attend). → (B, H, T, d)."""
    B, H, T, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    # blocks may exceed T — the inputs are padded up to one tile, which
    # measures faster than shrinking the tile to fit
    auto_q, auto_k = _pick_blocks(T)
    block_q = block_q or auto_q
    block_k = block_k or auto_k
    # pad T to a multiple of the tiles; padded keys are masked out
    Tq = -(-T // block_q) * block_q
    Tk = -(-T // block_k) * block_k
    if Tq != T or Tk != T:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Tq - T), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Tk - T), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Tk - T), (0, 0)))
        p = jnp.pad(p, ((0, 0), (0, Tk - T), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, Tq - T), (0, Tk - T)))
    mask_i8 = mask.astype(jnp.int8)
    bu = bias_u[:, None, :]  # (H, 1, d)
    bv = bias_v[:, None, :]

    kv_tiles = Tk // block_k
    grid = (B, H, Tq // block_q, kv_tiles)
    out = pl.pallas_call(
        functools.partial(_kernel, sm_scale=float(sm_scale),
                          kv_tiles=kv_tiles),
        out_shape=jax.ShapeDtypeStruct((B, H, Tq, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda b, h, i, j: (b, h, j, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda b, h, i, j: (b, h, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, h, i, j: (h, j, 0)),
                pl.BlockSpec((1, 1, d), lambda b, h, i, j: (h, 0, 0)),
                pl.BlockSpec((1, 1, d), lambda b, h, i, j: (h, 0, 0)),
                pl.BlockSpec((1, block_q, block_k), lambda b, h, i, j: (b, i, j)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d),
                                   lambda b, h, i, j: (b, h, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(q, k, v, p, bu, bv, mask_i8)
    return out[:, :, :T, :]


def rel_pos_attention_reference(q, k, v, p, bias_u, bias_v, mask,
                                sm_scale=None):
    """Pure-XLA reference (same math as models/attention.py)."""
    d = q.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    s_ac = jnp.einsum("bhqd,bhkd->bhqk", q + bias_u[None, :, None, :], k)
    s_bd = jnp.einsum("bhqd,hkd->bhqk", q + bias_v[None, :, None, :], p)
    s = (s_ac + s_bd).astype(jnp.float32) * sm_scale
    s = jnp.where(mask[:, None], s, MASK_VALUE)
    attn = jax.nn.softmax(s, axis=-1)
    attn = jnp.where(mask[:, None], attn, 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)
