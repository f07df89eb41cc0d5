"""Fused full-context Conformer encoder layer (Pallas, TPU) — forward only.

One `pallas_call` runs the ENTIRE layer (macaron FFN → rel-pos MHSA →
conv module → FFN → final LN; reference conformer/encoder.py:22-163) for
one utterance per grid step. The XLA path round-trips the (B, T, D)
activations through HBM ~20× per layer (each LayerNorm / residual / GLU /
softmax is a separate fusion); here the activations stay in VMEM for the
whole layer and the only HBM traffic is the layer weights (~5 MB bf16,
fetched once and kept resident across the batch grid — their block index
never changes) plus x in / y out.

Serving-only by design: no dropout, no caches (the streaming chunk step
keeps the XLA path where launch overhead dominates), full-context mask
from valid lengths. Numerics: LayerNorm statistics, softmax, residual
accumulation and all matmul accumulates in f32; matmul operands in the
model compute dtype (bf16 serving). That is slightly *better* than the
XLA bf16 path (which keeps bf16 between ops); f32-vs-f32 parity is ~1e-5
(tests/test_fused_layer.py).

VMEM budget: weights + (T,F) hidden + per-head (T,T) scores must fit in
~16 MB; `fused_layer_supported()` checks the estimate and callers fall
back to the XLA path (long-form audio uses the flash-attention kernel
instead, ops/pallas/attention.py).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
VMEM_BYTES = 16 * 1024 * 1024
# tests flip this to route the fused path (interpret mode) on CPU, where
# eligibility otherwise requires a real TPU backend
FORCE_ON_CPU = False


def _kernel(lens_ref, x_ref, lnw_ref, ffw1_ref, ffb1_ref, ffw2_ref,
            vecb_ref, attw_ref, posb_ref, posp_ref, pw1w_ref, pw1b_ref,
            pw2w_ref, dww_ref, o_ref, *,
            n_head, d_k, ksize, causal, ff_scale, eps, t_real):
    g = pl.program_id(0)
    bs, T, D = x_ref.shape                       # bs utterances per program
    M = bs * T
    # row-wise ops (LN/FFN/projections) run on the flattened (bs*T, D)
    # block — amortizes per-matmul fixed cost; attention/conv loop per
    # utterance below where time structure matters
    x = x_ref[...].reshape(M, D).astype(jnp.float32)
    cdt = x_ref.dtype                            # matmul operand dtype

    def layer_norm(v, idx):
        s = lnw_ref[idx, 0:1, :]                 # (1, D)
        beta = lnw_ref[idx, 1:2, :]
        mu = jnp.mean(v, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(v - mu), axis=1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + eps) * s + beta

    def matmul(a, w):                            # f32 a, pre-cast w → f32 out
        return jax.lax.dot_general(
            a.astype(cdt), w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def silu(v):
        return v * jax.nn.sigmoid(v)

    def ffn(v, i):                               # i: 0 = macaron, 1 = final
        h = silu(matmul(v, ffw1_ref[i]) + ffb1_ref[i:i + 1, :])
        return matmul(h, ffw2_ref[i]) + vecb_ref[i:i + 1, :]

    # per-utterance validity: row index (within utterance) < len
    # (built arithmetically — Mosaic can't concat (T,1) bool vregs)
    valid = [lens_ref[g * bs + u] for u in range(bs)]
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    within = iota_m - (iota_m // T) * T
    vrow = jnp.full((M, 1), valid[0], jnp.int32)
    for u in range(1, bs):
        vrow = jnp.where(iota_m // T == u, valid[u], vrow)
    row_ok = within < vrow

    # ---- macaron feed-forward (×ff_scale) ----
    x = x + ff_scale * ffn(layer_norm(x, 0), 0)

    # ---- rel-pos multi-head self-attention ----
    xn = layer_norm(x, 1)
    q = matmul(xn, attw_ref[0]) + vecb_ref[2:3, :]
    k = matmul(xn, attw_ref[1]) + vecb_ref[3:4, :]
    v = matmul(xn, attw_ref[2]) + vecb_ref[4:5, :]
    scale = 1.0 / (d_k ** 0.5)
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    att_rows = []
    for u in range(bs):
        rows = slice(u * T, (u + 1) * T)
        col_ok = iota_col < valid[u]
        heads = []
        for h in range(n_head):
            sl = slice(h * d_k, (h + 1) * d_k)
            qh, kh, vh = q[rows, sl], k[rows, sl], v[rows, sl]
            ph = posp_ref[:, sl].astype(jnp.float32)
            bu = posb_ref[0:1, sl]
            bv = posb_ref[1:2, sl]
            # AC+BD as one 2·d_k-contraction matmul (models/attention.py)
            qcat = jnp.concatenate([qh + bu, qh + bv], axis=1)
            kcat = jnp.concatenate([kh, ph], axis=1)
            s = jax.lax.dot_general(
                qcat.astype(cdt), kcat.astype(cdt), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(col_ok, s, MASK_VALUE)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            p = jnp.where(col_ok, p, 0.0)
            l = jnp.sum(p, axis=1, keepdims=True)
            attn = p / jnp.where(l == 0.0, 1.0, l)
            heads.append(jax.lax.dot_general(
                attn.astype(cdt), vh.astype(cdt), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        att_rows.append(jnp.concatenate(heads, axis=1))
    att = jnp.concatenate(att_rows, axis=0) if bs > 1 else att_rows[0]
    x = x + matmul(att, attw_ref[3]) + vecb_ref[5:6, :]

    # ---- convolution module ----
    xm = jnp.where(row_ok, layer_norm(x, 2), 0.0)
    gx = matmul(xm, pw1w_ref[:]) + pw1b_ref[0:1, :]
    u_glu = gx[:, :D] * jax.nn.sigmoid(gx[:, D:])  # GLU
    if t_real < T:
        # the wrapper's tile-alignment rows [t_real, T) do not exist in
        # the XLA path: behave like nn.Conv's zero padding there, NOT
        # like in-array masked rows (which carry GLU(pw1 bias))
        u_glu = jnp.where(within < t_real, u_glu, 0.0)
    # CAUSAL pads x BEFORE pointwise_conv1 (flax convolution.py), so those
    # rows carry GLU(pw1 bias); non-causal pads zeros inside the depthwise
    if causal:
        pad_row = pw1b_ref[0:1, :D] * jax.nn.sigmoid(pw1b_ref[0:1, D:])
    else:
        pad_row = jnp.zeros((1, D), jnp.float32)
    left = ksize - 1 if causal else (ksize - 1) // 2
    right = 0 if causal else (ksize - 1) // 2
    conv_rows = []
    for u in range(bs):
        seg = u_glu[u * T:(u + 1) * T, :]
        pieces = [seg]
        if left:                                 # Mosaic rejects 0-sized ops
            pieces.insert(0, jnp.broadcast_to(pad_row, (left, D)))
        if right:
            pieces.append(jnp.broadcast_to(pad_row, (right, D)))
        upad = jnp.concatenate(pieces, axis=0) if len(pieces) > 1 else seg
        acc = jnp.zeros((T, D), jnp.float32)
        for i in range(ksize):                   # depthwise conv on the VPU
            acc = acc + upad[i:i + T, :] * dww_ref[i:i + 1, :]
        conv_rows.append(acc)
    acc = jnp.concatenate(conv_rows, axis=0) if bs > 1 else conv_rows[0]
    acc = acc + vecb_ref[6:7, :]
    y = silu(layer_norm(acc, 3))
    y = matmul(y, pw2w_ref[:]) + vecb_ref[7:8, :]
    x = x + jnp.where(row_ok, y, 0.0)

    # ---- final feed-forward (×ff_scale) + final LN ----
    x = x + ff_scale * ffn(layer_norm(x, 4), 1)
    o_ref[...] = layer_norm(x, 5).astype(o_ref.dtype).reshape(bs, T, D)


def _vmem_estimate(T, D, F, dtype, bs):
    """Conservative VMEM estimate: weights + hidden + scores + x copies."""
    wsize = jnp.dtype(dtype).itemsize
    weights = (4 * D * F + 4 * D * D + 2 * D * D + D * D + T * D) * wsize
    M = bs * T
    hidden = M * F * 4 * 2                 # (M, F) f32 hidden ×2 in flight
    scores = T * T * 4 * 2                 # per-head (T, T) f32 ×2
    act = 6 * M * D * 4                    # x, residual, q/k/v, att
    return weights + hidden + scores + act


def pick_block_b(T, D, F, dtype=jnp.bfloat16, max_bs=4):
    """Largest utterances-per-program that fits VMEM (amortizes the
    per-matmul fixed cost — the M=T row blocks are latency-bound alone)."""
    for bs in range(max_bs, 0, -1):
        if _vmem_estimate(T, D, F, dtype, bs) < int(VMEM_BYTES * 0.82):
            return bs
    return 0


def fused_layer_supported(T, D, F, dtype=jnp.bfloat16):
    return pick_block_b(T, D, F, dtype) >= 1


@functools.partial(jax.jit, static_argnames=(
    "n_head", "ksize", "causal", "ff_scale", "eps", "block_b", "interpret"))
def fused_conformer_layer(x, lens, pos_p, params, *, n_head, ksize, causal,
                          ff_scale=0.5, eps=1e-5, block_b=None,
                          interpret=None):
    """x: (B, T, D); lens: (B,) int32 valid lengths; pos_p: (T, D)
    linear_pos(pos_emb) with heads along columns; params: packed dict from
    `pack_layer_params`. → (B, T, D) in x.dtype."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, D = x.shape
    F = params["ffw1"].shape[2]
    # pad T to the sublane tile so per-utterance row offsets in the
    # flattened (bs*T, D) block stay vreg-aligned (Mosaic requirement for
    # cross-offset slicing/concat); padded rows sit beyond every len
    pad_t = (-T) % 16
    if pad_t:
        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
        pos_p = jnp.pad(pos_p, ((0, pad_t), (0, 0)))
    Tp = T + pad_t
    bs = block_b or pick_block_b(Tp, D, F, x.dtype)
    bs = max(1, min(bs, B))
    pad_b = (-B) % bs
    if pad_b:                               # padded rows carry len=0
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
        lens = jnp.pad(lens, (0, pad_b))
    grid = ((B + pad_b) // bs,)
    # index maps receive (grid idx..., scalar-prefetch refs...)
    const = lambda shape: pl.BlockSpec(shape, lambda b, *_: (0,) * len(shape))
    out = pl.pallas_call(
        functools.partial(_kernel, n_head=n_head, d_k=D // n_head,
                          ksize=ksize, causal=causal, ff_scale=ff_scale,
                          eps=eps, t_real=T),
        out_shape=jax.ShapeDtypeStruct((B + pad_b, Tp, D), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bs, Tp, D), lambda b, *_: (b, 0, 0)),
                const((6, 2, D)),       # lnw
                const((2, D, F)),       # ffw1
                const((2, F)),          # ffb1
                const((2, F, D)),       # ffw2
                const((8, D)),          # vecb
                const((4, D, D)),       # attw
                const((2, D)),          # posb
                const((Tp, D)),         # posp
                const((D, 2 * D)),      # pw1w
                const((1, 2 * D)),      # pw1b
                const((D, D)),          # pw2w
                const((ksize, D)),      # dww
            ],
            out_specs=pl.BlockSpec((bs, Tp, D), lambda b, *_: (b, 0, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(lens.astype(jnp.int32), x, params["lnw"], params["ffw1"],
      params["ffb1"], params["ffw2"], params["vecb"], params["attw"],
      params["posb"], pos_p, params["pw1w"], params["pw1b"],
      params["pw2w"], params["dww"])
    return out[:B, :T] if (pad_b or pad_t) else out


def pack_layer_params(p, dtype):
    """Pack one ConformerEncoderLayer's flax param tree into the kernel's
    stacked arrays. `p` = variables['params'] of the layer; matmul weights
    cast to `dtype` (the compute dtype), LN/bias rows kept f32."""
    f32 = jnp.float32

    def ln(name):
        q = p[name]
        return jnp.stack([jnp.asarray(q["scale"], f32),
                          jnp.asarray(q["bias"], f32)])
    att = p["self_attn"]
    conv = p["conv_module"]
    lnw = jnp.stack([ln("norm_ff_macaron"), ln("norm_mha"), ln("norm_conv"),
                     jnp.stack([jnp.asarray(conv["norm"]["scale"], f32),
                                jnp.asarray(conv["norm"]["bias"], f32)]),
                     ln("norm_ff"), ln("norm_final")])
    ffw1 = jnp.stack([p["feed_forward_macaron"]["w_1"]["kernel"],
                      p["feed_forward"]["w_1"]["kernel"]]).astype(dtype)
    ffb1 = jnp.stack([p["feed_forward_macaron"]["w_1"]["bias"],
                      p["feed_forward"]["w_1"]["bias"]]).astype(f32)
    ffw2 = jnp.stack([p["feed_forward_macaron"]["w_2"]["kernel"],
                      p["feed_forward"]["w_2"]["kernel"]]).astype(dtype)
    vecb = jnp.stack([
        p["feed_forward_macaron"]["w_2"]["bias"],
        p["feed_forward"]["w_2"]["bias"],
        att["linear_q"]["bias"], att["linear_k"]["bias"],
        att["linear_v"]["bias"], att["linear_out"]["bias"],
        conv["depthwise_conv"]["bias"], conv["pointwise_conv2"]["bias"],
    ]).astype(f32)
    attw = jnp.stack([att["linear_q"]["kernel"], att["linear_k"]["kernel"],
                      att["linear_v"]["kernel"],
                      att["linear_out"]["kernel"]]).astype(dtype)
    posb = jnp.stack([att["pos_bias_u"].reshape(-1),
                      att["pos_bias_v"].reshape(-1)]).astype(f32)
    pw1w = jnp.asarray(conv["pointwise_conv1"]["kernel"], dtype)
    pw1b = jnp.asarray(conv["pointwise_conv1"]["bias"], f32)[None, :]
    pw2w = jnp.asarray(conv["pointwise_conv2"]["kernel"], dtype)
    # flax depthwise Conv kernel: (k, in/groups=1, D) → (k, D)
    dww = jnp.asarray(conv["depthwise_conv"]["kernel"], f32).reshape(
        conv["depthwise_conv"]["kernel"].shape[0], -1)
    return {"lnw": lnw, "ffw1": ffw1, "ffb1": ffb1, "ffw2": ffw2,
            "vecb": vecb, "attw": attw, "posb": posb, "pw1w": pw1w,
            "pw1b": pw1b, "pw2w": pw2w, "dww": dww,
            "linear_pos": jnp.asarray(att["linear_pos"]["kernel"], dtype)}
