"""Fused STREAMING chunk-step Squeezeformer layer (Pallas, TPU) —
forward only, batched slots with per-slot KV/conv caches.

The Squeezeformer analogue of ops/pallas/chunk_layer.py: ONE pallas_call
per layer runs the whole POST-norm block — rel-pos MHSA over
[cache ‖ chunk] (AdaptiveScale on the qkv input) → FFN1 → causal conv
with ring cache (BatchNorm folded to affine at pack time) → FFN2, each
as x = LN_i(x + sub(x)) — and rolls the caches in place of the
concat-and-slice (reference squeezeformer/encoder.py:240-361 +
encoder.py:364-463 layer body; cache semantics == models/attention.py
`_merge_cache` and models/convolution.py exactly).

The attention head-stacking, per-slot validity masking, cache roll and
the multi-chunk-tick `n_sub` block-causal mask are shared with the
Conformer chunk kernel's design (see chunk_layer.py docstring); the
U-Net time reduce/recover plumbing between layers stays on XLA in
SqueezeformerEncoder.forward_chunk_batched — half-rate layers simply
call this kernel at (c/2, C/2) with the stride-sliced cache and half
positions, exactly like the vmapped path.

Positions arrive PRE-projected per slot (posp = linear_pos(pos_emb),
one batched einsum per layer in the caller) — no HBM table route yet
(the Conformer engine's positions-DMA lever); Squeezeformer serving
density is secondary to the flagship.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from masr_tpu.ops.pallas.chunk_layer import (MASK_VALUE,
                                             _sub_chunk_mask_parts,
                                             pick_chunk_block_b)


def _kernel(*refs, n_head, d_k, ksize, conv_ln, eps, conv_eps, n_sub=1):
    (clen_ref, x_ref, pp_ref, ac_ref, cc_ref,
     lnw_ref, adaw_ref, attw_ref, attb_ref, posb_ref,
     ffw1_ref, ffb1_ref, ffw2_ref, ffb2_ref,
     pw1w_ref, pw1b_ref, dww_ref, dwb_ref, cnw_ref, pw2w_ref, pw2b_ref,
     y_ref, nac_ref, ncc_ref, qs_ref, ks_ref, vs_ref) = refs
    g = pl.program_id(0)
    bs, c, D = x_ref.shape
    C = ac_ref.shape[2]
    L = C + c
    M = bs * c
    cdt = x_ref.dtype
    x = x_ref[...].reshape(M, D).astype(jnp.float32)

    def layer_norm(v, idx):
        s = lnw_ref[idx, 0:1, :]
        b = lnw_ref[idx, 1:2, :]
        mu = jnp.mean(v, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(v - mu), axis=1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + eps) * s + b

    def ada(v, idx):
        return v * adaw_ref[idx, 0:1, :] + adaw_ref[idx, 1:2, :]

    def mm(a, w):
        return jax.lax.dot_general(a.astype(cdt), w.astype(cdt),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def silu(v):
        return v * jax.nn.sigmoid(v)

    def ffn(v, i):
        h = silu(mm(ada(v, 1 if i == 0 else 3), ffw1_ref[i])
                 + ffb1_ref[i:i + 1, :])
        return mm(h, ffw2_ref[i]) + ffb2_ref[i:i + 1, :]

    # ---- rel-pos MHSA over [cache ‖ chunk] (ada on the qkv input) ----
    xa = ada(x, 0)
    q = mm(xa, attw_ref[0]) + attb_ref[0:1, :]
    k = mm(xa, attw_ref[1]) + attb_ref[1:2, :]
    v = mm(xa, attw_ref[2]) + attb_ref[2:3, :]
    scale = 1.0 / (d_k ** 0.5)
    row_head = jax.lax.broadcasted_iota(jnp.int32, (n_head * c, n_head * L),
                                        0) // c
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (n_head * c, n_head * L),
                                       1)
    col_head = col_idx // L
    col_pos = col_idx - col_head * L
    same_head = row_head == col_head
    if n_sub > 1:
        min_cache_col, chunk_lim = _sub_chunk_mask_parts(
            n_head, c, L, C, n_sub)
    att_rows = []
    for s in range(bs):
        rows = slice(s * c, (s + 1) * c)
        valid = clen_ref[g * bs + s]
        ph_full = pp_ref[s].astype(jnp.float32)
        for h in range(n_head):
            sl = slice(h * d_k, (h + 1) * d_k)
            qs_ref[h * c:(h + 1) * c, 0:d_k] = q[rows, sl] \
                + posb_ref[0:1, sl]
            qs_ref[h * c:(h + 1) * c, d_k:2 * d_k] = q[rows, sl] \
                + posb_ref[1:2, sl]
            ks_ref[h * L:h * L + C, 0:d_k] = \
                ac_ref[s, h, :, 0:d_k].astype(jnp.float32)
            ks_ref[h * L + C:(h + 1) * L, 0:d_k] = k[rows, sl]
            ks_ref[h * L:(h + 1) * L, d_k:2 * d_k] = ph_full[:, sl]
            vs_ref[h * L:h * L + C, :] = \
                ac_ref[s, h, :, d_k:2 * d_k].astype(jnp.float32)
            vs_ref[h * L + C:(h + 1) * L, :] = v[rows, sl]
        v_stack = vs_ref[...]
        sc = jax.lax.dot_general(
            qs_ref[...].astype(cdt), ks_ref[...].astype(cdt),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if n_sub > 1:
            ok = same_head & (
                ((col_pos < C) & (col_pos >= C - valid)
                 & (col_pos >= min_cache_col))
                | ((col_pos >= C) & (col_pos < chunk_lim)))
        else:
            ok = same_head & ((col_pos >= C - valid) | (col_pos >= C))
        sc = jnp.where(ok, sc, MASK_VALUE)
        m = jnp.max(sc, axis=1, keepdims=True)
        p = jnp.exp(sc - m)
        p = jnp.where(ok, p, 0.0)
        l = jnp.sum(p, axis=1, keepdims=True)
        attn = p / jnp.where(l == 0.0, 1.0, l)
        o_stack = jax.lax.dot_general(
            attn.astype(cdt), v_stack.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        att_rows.append(jnp.concatenate(
            [o_stack[h * c:(h + 1) * c, :] for h in range(n_head)], axis=1))
        for h in range(n_head):
            sl = slice(h * d_k, (h + 1) * d_k)
            new_kv = jnp.concatenate([k[rows, sl], v[rows, sl]], axis=1)
            if c < C:
                old = ac_ref[s, h, :, :].astype(jnp.float32)
                rolled = jnp.concatenate([old[c:, :], new_kv], axis=0)
            else:
                rolled = new_kv
            nac_ref[s, h, :, :] = rolled.astype(nac_ref.dtype)
    att = jnp.concatenate(att_rows, axis=0) if bs > 1 else att_rows[0]
    x = layer_norm(x + mm(att, attw_ref[3]) + attb_ref[3:4, :], 0)

    # ---- FFN1 (post-norm) ----
    x = layer_norm(x + ffn(x, 0), 1)

    # ---- causal conv with ring cache (cache rows are POST-ada,
    #      PRE-pointwise — SqueezeformerConvModule applies ada before
    #      ConvolutionModule concats the cache) ----
    xa2 = ada(x, 2)
    conv_rows = []
    for s in range(bs):
        rows = slice(s * c, (s + 1) * c)
        cin = jnp.concatenate(
            [cc_ref[s].astype(jnp.float32), xa2[rows, :]], axis=0)
        ncc_ref[s] = cin[c:, :].astype(ncc_ref.dtype)
        gx = mm(cin, pw1w_ref[...]) + pw1b_ref[...]
        u = gx[:, :D] * jax.nn.sigmoid(gx[:, D:])
        acc = jnp.zeros((c, D), jnp.float32)
        for i in range(ksize):
            acc = acc + u[i:i + c, :] * dww_ref[i:i + 1, :]
        conv_rows.append(acc)
    cv = jnp.concatenate(conv_rows, axis=0) if bs > 1 else conv_rows[0]
    cv = cv + dwb_ref[...]
    if conv_ln:
        mu = jnp.mean(cv, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(cv - mu), axis=1, keepdims=True)
        cv = (cv - mu) * jax.lax.rsqrt(var + conv_eps)
    cv = silu(cv * cnw_ref[0:1, :] + cnw_ref[1:2, :])
    cv = mm(cv, pw2w_ref[...]) + pw2b_ref[...]
    x = layer_norm(x + cv, 2)

    # ---- FFN2 (post-norm) ----
    x = layer_norm(x + ffn(x, 1), 3)
    y_ref[...] = x.astype(y_ref.dtype).reshape(bs, c, D)


@functools.partial(jax.jit, static_argnames=(
    "n_head", "ksize", "conv_ln", "eps", "conv_eps", "block_b",
    "interpret", "n_sub"))
def fused_chunk_layer_sq(x, posp, att_cache, cnn_cache, cache_lens, params,
                         *, n_head, ksize, conv_ln=False, eps=1e-6,
                         conv_eps=1e-5, block_b=None, interpret=None,
                         n_sub=1):
    """x: (B, c, D) chunk at this layer's resolution; posp: (B, C+c, D)
    per-slot PRE-projected positions; att_cache: (B, h, C, 2·d_k)
    right-aligned at this layer's resolution (half-rate layers pass the
    stride-sliced cache and C/2); cnn_cache: (B, lorder, D); cache_lens:
    (B,) int32 valid rows AT THIS RESOLUTION; params from
    pack_sq_layer_params (without linear_pos). n_sub as in
    fused_chunk_layer (multi-chunk ticks).
    → (y (B, c, D), new_att_cache, new_cnn_cache)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, c, D = x.shape
    C = att_cache.shape[2]
    F = params["ffw1"].shape[2]
    bs = block_b or pick_chunk_block_b(c, C, D, F, n_head, x.dtype)
    bs = max(1, min(bs, B))
    pad_b = (-B) % bs
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
        posp = jnp.pad(posp, ((0, pad_b), (0, 0), (0, 0)))
        att_cache = jnp.pad(att_cache, ((0, pad_b),) + ((0, 0),) * 3)
        cnn_cache = jnp.pad(cnn_cache, ((0, pad_b), (0, 0), (0, 0)))
        cache_lens = jnp.pad(cache_lens, (0, pad_b))
    Bp = B + pad_b
    L = C + c
    lorder = cnn_cache.shape[1]
    const = lambda shape: pl.BlockSpec(shape, lambda b, *_: (0,) * len(shape))
    bspec = lambda shape: pl.BlockSpec(
        shape, lambda b, *_: (b,) + (0,) * (len(shape) - 1))
    assert c <= C and c % n_sub == 0, (c, C, n_sub)
    y, nac, ncc = pl.pallas_call(
        functools.partial(_kernel, n_head=n_head, d_k=D // n_head,
                          ksize=ksize, conv_ln=conv_ln, eps=eps,
                          conv_eps=conv_eps, n_sub=n_sub),
        out_shape=(jax.ShapeDtypeStruct((Bp, c, D), x.dtype),
                   jax.ShapeDtypeStruct(att_cache.shape, att_cache.dtype),
                   jax.ShapeDtypeStruct(cnn_cache.shape, cnn_cache.dtype)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bp // bs,),
            in_specs=[
                bspec((bs, c, D)),                    # x
                bspec((bs, L, D)),                    # posp
                bspec((bs, n_head, C, 2 * (D // n_head))),   # att cache
                bspec((bs, lorder, D)),               # cnn cache
                const((4, 2, D)),                     # lnw (LN1..LN4)
                const((4, 2, D)),                     # adaw
                const((4, D, D)),                     # attw
                const((4, D)),                        # attb
                const((2, D)),                        # posb
                const((2, D, F)),                     # ffw1
                const((2, F)),                        # ffb1
                const((2, F, D)),                     # ffw2
                const((2, D)),                        # ffb2
                const((D, 2 * D)),                    # pw1w
                const((1, 2 * D)),                    # pw1b
                const((ksize, D)),                    # dww
                const((1, D)),                        # dwb
                const((2, D)),                        # cnw
                const((D, D)),                        # pw2w
                const((1, D)),                        # pw2b
            ],
            out_specs=(bspec((bs, c, D)),
                       bspec((bs, n_head, C, 2 * (D // n_head))),
                       bspec((bs, lorder, D))),
            scratch_shapes=[
                pltpu.VMEM((n_head * c, 2 * (D // n_head)), jnp.float32),
                pltpu.VMEM((n_head * L, 2 * (D // n_head)), jnp.float32),
                pltpu.VMEM((n_head * L, D // n_head), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(cache_lens.astype(jnp.int32), x, posp, att_cache, cnn_cache,
      params["lnw"], params["adaw"], params["attw"], params["attb"],
      params["posb"], params["ffw1"], params["ffb1"], params["ffw2"],
      params["ffb2"], params["pw1w"], params["pw1b"], params["dww"],
      params["dwb"], params["cnw"], params["pw2w"], params["pw2b"])
    if pad_b:
        return y[:B], nac[:B], ncc[:B]
    return y, nac, ncc
