"""Fused Squeezeformer encoder layer for TRAINING (Pallas, TPU):
forward with in-kernel dropout + hand-written backward with staged
recompute — the layer_norm-conv configuration (VERDICT r3 item 6; the
BatchNorm default couples grads across the batch grid and stays on XLA,
docs/design_deviations.md #14).

Block structure (post-norm, per-sublayer AdaptiveScale — reference
squeezeformer/encoder.py:364-463):

  half1: x1 = LN1(x0 + drop(MHSA(ada0·x0 + b0)))        (x0 → x2)
         x2 = LN2(x1 + drop(FFN1(ada1·x1 + b1)))
  half2: x3 = LN3(x2 + drop(Conv(ada2·x2 + b2)))        (x2 → y)
         y  = LN4(x3 + drop(FFN2(ada3·x3 + b3)))

Same engineering rules as the Conformer train kernel
(conformer_layer_train.py, whose leaf helpers this file imports): two
custom-VJP half-ops to fit the VMEM budget, in-kernel TPU-PRNG dropout
re-seeded identically in the backward (attention draws on their own
seed^_ATT_SEED_MIX stream so the FFN stage never burns them), saved
pre-LN residuals (s2 / s4) so the backward skips the FFN forward
recompute, column-tiled FFN backward, and f32 parameter-grad outputs
accumulated across the batch grid under dimension_semantics
("arbitrary",) with a @pl.when(g == 0) init.

Gradients validated against jax.grad of the flax SqueezeformerEncoderLayer
with PERTURBED biases in tests/test_fused_sq_train.py (fresh-init zero
biases mask real parity bugs — CLAUDE.md's hard-won rule).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from masr_tpu.ops.pallas.conformer_layer_train import (
    MASK_VALUE, _ATT_SEED_MIX, _HALF2_SEED_MIX, _bspec, _cspec,
    _dropout_mult, _dsilu, _ffn_bwd_tiled_masked, _interp, _ln_bwd,
    _ln_fwd, _mm, _mm_nt, _mm_tn, _silu)

__all__ = ["fused_squeezeformer_layer_train", "fused_sq_train_supported"]

# hidden-column tiles in the SQ FFN backwards: 8 (vs the Conformer's 4)
# — the AdaptiveScale/post-norm staging leaves ~0.5 MB less VMEM
# headroom and 4 tiles overflowed the 16 MB scoped-vmem stack on
# hardware at the production shape (T=299, D=256, F=2048)
SQ_FF_TILES = 8


def _ada(x, adaw_ref, idx):
    return x * adaw_ref[idx, 0:1, :] + adaw_ref[idx, 1:2, :]


def _ffn_sq_fwd(a, w1_ref, b1_ref, w2_ref, b2_ref, cdt, rate, train):
    """ada'd input → FFN output (hidden dropout drawn in stream order)."""
    z = _mm(a, w1_ref[...], cdt) + b1_ref[...]
    h = _silu(z)
    if train and rate > 0.0:
        h = h * _dropout_mult(h.shape, rate)
    return _mm(h, w2_ref[...], cdt) + b2_ref[...]


def _sq_attention(x0, amask, adaw_ref, attw_ref, attb_ref, posb_ref,
                  posp_ref, cdt, n_head, d_k, rate, att_rate, train):
    """ada0 → rel-pos MHSA → output dropout; draws att masks in head
    order then the output mask (fixed stream order for the bwd)."""
    xa = _ada(x0, adaw_ref, 0)
    q = _mm(xa, attw_ref[0], cdt) + attb_ref[0:1, :]
    k = _mm(xa, attw_ref[1], cdt) + attb_ref[1:2, :]
    v = _mm(xa, attw_ref[2], cdt) + attb_ref[2:3, :]
    scale = 1.0 / (d_k ** 0.5)
    prs, dms, outs = [], [], []
    for h in range(n_head):
        sl = slice(h * d_k, (h + 1) * d_k)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        ph = posp_ref[0][:, sl].astype(jnp.float32)
        qcat = jnp.concatenate([qh + posb_ref[0:1, sl],
                                qh + posb_ref[1:2, sl]], axis=1)
        kcat = jnp.concatenate([kh, ph], axis=1)
        s = _mm_nt(qcat, kcat, cdt) * scale
        s = jnp.where(amask, s, MASK_VALUE)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = jnp.where(amask, p, 0.0)
        l = jnp.sum(p, axis=1, keepdims=True)
        pr = p / jnp.where(l == 0.0, 1.0, l)
        dm = None
        if train and att_rate > 0.0:
            dm = _dropout_mult(pr.shape, att_rate)
        prd = pr if dm is None else pr * dm
        prs.append(pr)
        dms.append(dm)
        outs.append(_mm(prd, vh, cdt))
    O = jnp.concatenate(outs, axis=1)
    att = _mm(O, attw_ref[3], cdt) + attb_ref[3:4, :]
    dm_att = None
    if train and rate > 0.0:
        dm_att = _dropout_mult(att.shape, rate)
        att = att * dm_att
    return att, dict(xa=xa, q=q, k=k, v=v, prs=prs, dms=dms, O=O,
                     dm_att=dm_att)


# --------------------------------------------------------------------------
# half 1: MHSA (post-norm) → FFN1 (post-norm)
# --------------------------------------------------------------------------

def _h1_fwd_kernel(lens_ref, seed_ref, x_ref, mask_ref, lnw_ref, adaw_ref,
                   attw_ref, attb_ref, posb_ref, posp_ref, w1_ref, b1_ref,
                   w2_ref, b2_ref, o_ref, s2_ref, *, n_head, d_k, eps,
                   rate, att_rate, train):
    """Emits x2 AND s2 (= x1 + drop(ffn1), pre-LN2) so the backward only
    needs LN2 internals there — no FFN forward recompute."""
    g = pl.program_id(0)
    cdt = x_ref.dtype
    x0 = x_ref[0].astype(jnp.float32)
    amask = mask_ref[0] != 0
    if train and (rate > 0.0 or att_rate > 0.0):
        pltpu.prng_seed(seed_ref[g] ^ _ATT_SEED_MIX)
    att, _ = _sq_attention(x0, amask, adaw_ref, attw_ref, attb_ref,
                           posb_ref, posp_ref, cdt, n_head, d_k, rate,
                           att_rate, train)
    x1, _, _ = _ln_fwd(x0 + att, lnw_ref[0, 0:1, :], lnw_ref[0, 1:2, :],
                       eps)
    if train and (rate > 0.0 or att_rate > 0.0):
        pltpu.prng_seed(seed_ref[g])
    f = _ffn_sq_fwd(_ada(x1, adaw_ref, 1), w1_ref, b1_ref, w2_ref, b2_ref,
                    cdt, rate, train)
    if train and rate > 0.0:
        f = f * _dropout_mult(f.shape, rate)
    s2 = x1 + f
    y, _, _ = _ln_fwd(s2, lnw_ref[1, 0:1, :], lnw_ref[1, 1:2, :], eps)
    o_ref[0] = y.astype(o_ref.dtype)
    s2_ref[0] = s2.astype(s2_ref.dtype)


def _h1_bwd_kernel(lens_ref, seed_ref, x_ref, mask_ref, lnw_ref, adaw_ref,
                   attw_ref, attb_ref, posb_ref, posp_ref, w1_ref, b1_ref,
                   w2_ref, b2_ref, s2_ref, dy_ref, dx_ref, dlnw_ref,
                   dadaw_ref, dattw_ref, dattb_ref, dposb_ref, dposp_ref,
                   dw1_ref, db1_ref, dw2_ref, db2_ref, *, n_head, d_k,
                   eps, rate, att_rate, train):
    g = pl.program_id(0)
    T, D = x_ref.shape[1], x_ref.shape[2]
    cdt = x_ref.dtype

    @pl.when(g == 0)
    def _init():
        for r in (dlnw_ref, dadaw_ref, dattw_ref, dattb_ref, dposb_ref,
                  dposp_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
            r[...] = jnp.zeros_like(r)

    x0 = x_ref[0].astype(jnp.float32)
    amask = mask_ref[0] != 0
    dy = dy_ref[0].astype(jnp.float32)

    # stage 1: attention recompute (its own PRNG stream) → s1, x1
    if train and (rate > 0.0 or att_rate > 0.0):
        pltpu.prng_seed(seed_ref[g] ^ _ATT_SEED_MIX)
    att, A = _sq_attention(x0, amask, adaw_ref, attw_ref, attb_ref,
                           posb_ref, posp_ref, cdt, n_head, d_k, rate,
                           att_rate, train)
    s1 = x0 + att
    x1, xhat1, inv1 = _ln_fwd(s1, lnw_ref[0, 0:1, :], lnw_ref[0, 1:2, :],
                              eps)
    a1 = _ada(x1, adaw_ref, 1)

    # stage 2: FFN1 draws on the main stream (hidden (T,F) then out (T,D))
    if train and (rate > 0.0 or att_rate > 0.0):
        pltpu.prng_seed(seed_ref[g])
    dmF = _dropout_mult((T, w1_ref.shape[1]), rate) \
        if (train and rate > 0.0) else None
    dmO = _dropout_mult((T, D), rate) if (train and rate > 0.0) else None

    # ---- LN2 bwd from the SAVED s2 ----
    s2 = s2_ref[0].astype(jnp.float32)
    _, xhat2, inv2 = _ln_fwd(s2, lnw_ref[1, 0:1, :], lnw_ref[1, 1:2, :],
                             eps)
    ds2, ds, db = _ln_bwd(dy, xhat2, inv2, lnw_ref[1, 0:1, :])
    dlnw_ref[1, 0:1, :] += ds
    dlnw_ref[1, 1:2, :] += db

    # ---- FFN1 bwd (tiled) ----  s2 = x1 + drop(FFN1(ada1(x1)))
    df = ds2 if dmO is None else ds2 * dmO
    da1 = _ffn_bwd_tiled_masked(df, a1, w1_ref, b1_ref, w2_ref, cdt, dmF,
                                dw1_ref, db1_ref, dw2_ref, tiles=SQ_FF_TILES)
    db2_ref[...] += jnp.sum(df, axis=0, keepdims=True)
    dadaw_ref[1, 0:1, :] += jnp.sum(da1 * x1, axis=0, keepdims=True)
    dadaw_ref[1, 1:2, :] += jnp.sum(da1, axis=0, keepdims=True)
    dx1 = ds2 + da1 * adaw_ref[1, 0:1, :]

    # ---- LN1 bwd ----
    ds1, ds, db = _ln_bwd(dx1, xhat1, inv1, lnw_ref[0, 0:1, :])
    dlnw_ref[0, 0:1, :] += ds
    dlnw_ref[0, 1:2, :] += db

    # ---- attention bwd ----  s1 = x0 + drop(att)
    datt = ds1 if A["dm_att"] is None else ds1 * A["dm_att"]
    dattw_ref[3] += _mm_tn(A["O"], datt, cdt)
    dattb_ref[3:4, :] += jnp.sum(datt, axis=0, keepdims=True)
    dO = _mm_nt(datt, attw_ref[3], cdt)
    scale = 1.0 / (d_k ** 0.5)
    dq_b, dk_b, dv_b = [], [], []
    for h in range(n_head):
        sl = slice(h * d_k, (h + 1) * d_k)
        qh, kh, vh = A["q"][:, sl], A["k"][:, sl], A["v"][:, sl]
        ph = posp_ref[0][:, sl].astype(jnp.float32)
        pr, dm = A["prs"][h], A["dms"][h]
        dOh = dO[:, sl]
        prd = pr if dm is None else pr * dm
        dprd = _mm_nt(dOh, vh, cdt)
        dv_b.append(_mm_tn(prd, dOh, cdt))
        dpr = dprd if dm is None else dprd * dm
        dS = pr * (dpr - jnp.sum(dpr * pr, axis=1, keepdims=True)) * scale
        dq_b.append(_mm(dS, kh + ph, cdt))
        dk_b.append(_mm_tn(dS, qh + posb_ref[0:1, sl], cdt))
        dph = _mm_tn(dS, qh + posb_ref[1:2, sl], cdt)
        dposb_ref[0:1, sl] += jnp.sum(_mm(dS, kh, cdt), axis=0,
                                      keepdims=True)
        dposb_ref[1:2, sl] += jnp.sum(_mm(dS, ph, cdt), axis=0,
                                      keepdims=True)
        dposp_ref[0, :, sl] += dph
    dq = jnp.concatenate(dq_b, axis=1) if n_head > 1 else dq_b[0]
    dk = jnp.concatenate(dk_b, axis=1) if n_head > 1 else dk_b[0]
    dv = jnp.concatenate(dv_b, axis=1) if n_head > 1 else dv_b[0]
    dattw_ref[0] += _mm_tn(A["xa"], dq, cdt)
    dattw_ref[1] += _mm_tn(A["xa"], dk, cdt)
    dattw_ref[2] += _mm_tn(A["xa"], dv, cdt)
    dattb_ref[0:1, :] += jnp.sum(dq, axis=0, keepdims=True)
    dattb_ref[1:2, :] += jnp.sum(dk, axis=0, keepdims=True)
    dattb_ref[2:3, :] += jnp.sum(dv, axis=0, keepdims=True)
    dxa = _mm(dq, jnp.swapaxes(attw_ref[0], 0, 1), cdt) \
        + _mm(dk, jnp.swapaxes(attw_ref[1], 0, 1), cdt) \
        + _mm(dv, jnp.swapaxes(attw_ref[2], 0, 1), cdt)
    dadaw_ref[0, 0:1, :] += jnp.sum(dxa * x0, axis=0, keepdims=True)
    dadaw_ref[0, 1:2, :] += jnp.sum(dxa, axis=0, keepdims=True)
    dx_ref[0] = (ds1 + dxa * adaw_ref[0, 0:1, :]).astype(dx_ref.dtype)


# --------------------------------------------------------------------------
# half 2: conv module (post-norm) → FFN2 (post-norm)
# --------------------------------------------------------------------------

def _h2_conv(x2, row_ok, adaw_ref, pw1w_ref, pw1b_ref, dww_ref, dwb_ref,
             cnw_ref, pw2w_ref, pw2b_ref, cdt, ksize, causal, conv_eps,
             rate, train):
    """ada2 → zero pad rows → GLU pw1 → depthwise → LN(conv_eps) affine →
    SiLU → pw2 → row mask → layer dropout (drawn last)."""
    a2 = _ada(x2, adaw_ref, 0)
    a2m = jnp.where(row_ok, a2, 0.0)
    gx = _mm(a2m, pw1w_ref[...], cdt) + pw1b_ref[...]
    D = x2.shape[1]
    sgb = jax.nn.sigmoid(gx[:, D:])
    u = gx[:, :D] * sgb
    if causal:
        u0 = pw1b_ref[0:1, :D] * jax.nn.sigmoid(pw1b_ref[0:1, D:])
    else:
        u0 = jnp.zeros((1, D), jnp.float32)
    left = ksize - 1 if causal else (ksize - 1) // 2
    right = 0 if causal else (ksize - 1) // 2
    pieces = [u]
    if left:
        pieces.insert(0, jnp.broadcast_to(u0, (left, D)))
    if right:
        pieces.append(jnp.broadcast_to(u0, (right, D)))
    upad = jnp.concatenate(pieces, axis=0) if len(pieces) > 1 else u
    T = x2.shape[0]
    c = jnp.zeros((T, D), jnp.float32)
    for i in range(ksize):
        c = c + upad[i:i + T, :] * dww_ref[i:i + 1, :]
    c = c + dwb_ref[0:1, :]
    # conv-module LayerNorm (layer_norm config) with its own affine
    mu = jnp.mean(c, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(c - mu), axis=1, keepdims=True)
    inv3 = jax.lax.rsqrt(var + conv_eps)
    xhat3 = (c - mu) * inv3
    cn = xhat3 * cnw_ref[0:1, :] + cnw_ref[1:2, :]
    cact = _silu(cn)
    co = _mm(cact, pw2w_ref[...], cdt) + pw2b_ref[0:1, :]
    com = jnp.where(row_ok, co, 0.0)
    dm = None
    if train and rate > 0.0:
        dm = _dropout_mult(com.shape, rate)
        com = com * dm
    return com, dict(a2m=a2m, gx=gx, sgb=sgb, upad=upad, xhat3=xhat3,
                     inv3=inv3, cn=cn, cact=cact, dm=dm)


def _h2_fwd_kernel(lens_ref, seed_ref, x_ref, lnw_ref, adaw_ref, pw1w_ref,
                   pw1b_ref, dww_ref, dwb_ref, cnw_ref, pw2w_ref, pw2b_ref,
                   w1_ref, b1_ref, w2_ref, b2_ref, o_ref, s4_ref, *, ksize,
                   causal, eps, conv_eps, rate, train):
    """Emits y AND s4 (= x3 + drop(ffn2), pre-LN4, bf16) so the backward
    skips the FFN2 forward recompute."""
    g = pl.program_id(0)
    T = x_ref.shape[1]
    cdt = x_ref.dtype
    if train and rate > 0.0:
        pltpu.prng_seed(seed_ref[g])
    x2 = x_ref[0].astype(jnp.float32)
    valid = lens_ref[g]
    row_ok = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) < valid
    com, _ = _h2_conv(x2, row_ok, adaw_ref, pw1w_ref, pw1b_ref, dww_ref,
                      dwb_ref, cnw_ref, pw2w_ref, pw2b_ref, cdt, ksize,
                      causal, conv_eps, rate, train)
    x3, _, _ = _ln_fwd(x2 + com, lnw_ref[0, 0:1, :], lnw_ref[0, 1:2, :],
                       eps)
    f = _ffn_sq_fwd(_ada(x3, adaw_ref, 1), w1_ref, b1_ref, w2_ref, b2_ref,
                    cdt, rate, train)
    if train and rate > 0.0:
        f = f * _dropout_mult(f.shape, rate)
    s4 = x3 + f
    y, _, _ = _ln_fwd(s4, lnw_ref[1, 0:1, :], lnw_ref[1, 1:2, :], eps)
    o_ref[0] = y.astype(o_ref.dtype)
    s4_ref[0] = s4.astype(s4_ref.dtype)


def _h2_bwd_kernel(lens_ref, seed_ref, x_ref, lnw_ref, adaw_ref, pw1w_ref,
                   pw1b_ref, dww_ref, dwb_ref, cnw_ref, pw2w_ref, pw2b_ref,
                   w1_ref, b1_ref, w2_ref, b2_ref, s4_ref, dy_ref, dx_ref,
                   dlnw_ref, dadaw_ref, dpw1w_ref, dpw1b_ref, ddww_ref,
                   ddwb_ref, dcnw_ref, dpw2w_ref, dpw2b_ref, dw1_ref,
                   db1_ref, dw2_ref, db2_ref, *, ksize, causal, eps,
                   conv_eps, rate, train):
    g = pl.program_id(0)
    T, D = x_ref.shape[1], x_ref.shape[2]
    cdt = x_ref.dtype

    @pl.when(g == 0)
    def _init():
        for r in (dlnw_ref, dadaw_ref, dpw1w_ref, dpw1b_ref, ddww_ref,
                  ddwb_ref, dcnw_ref, dpw2w_ref, dpw2b_ref, dw1_ref,
                  db1_ref, dw2_ref, db2_ref):
            r[...] = jnp.zeros_like(r)

    if train and rate > 0.0:
        pltpu.prng_seed(seed_ref[g])
    x2 = x_ref[0].astype(jnp.float32)
    valid = lens_ref[g]
    row_ok = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) < valid
    dy = dy_ref[0].astype(jnp.float32)

    # recompute (conv internals kept; FFN re-derived per tile); the PRNG
    # stream replays in fwd order: conv dm, then ffn hidden/out masks
    com, C = _h2_conv(x2, row_ok, adaw_ref, pw1w_ref, pw1b_ref, dww_ref,
                      dwb_ref, cnw_ref, pw2w_ref, pw2b_ref, cdt, ksize,
                      causal, conv_eps, rate, train)
    s3 = x2 + com
    x3, xhat4, inv4 = _ln_fwd(s3, lnw_ref[0, 0:1, :], lnw_ref[0, 1:2, :],
                              eps)
    a3 = _ada(x3, adaw_ref, 1)
    dmF = _dropout_mult((T, w1_ref.shape[1]), rate) \
        if (train and rate > 0.0) else None
    dmO = _dropout_mult((T, D), rate) if (train and rate > 0.0) else None
    s4 = s4_ref[0].astype(jnp.float32)
    _, xhat5, inv5 = _ln_fwd(s4, lnw_ref[1, 0:1, :], lnw_ref[1, 1:2, :],
                             eps)

    # ---- LN4 bwd ----
    ds4, ds, db = _ln_bwd(dy, xhat5, inv5, lnw_ref[1, 0:1, :])
    dlnw_ref[1, 0:1, :] += ds
    dlnw_ref[1, 1:2, :] += db

    # ---- FFN2 bwd (tiled) ----
    df = ds4 if dmO is None else ds4 * dmO
    da3 = _ffn_bwd_tiled_masked(df, a3, w1_ref, b1_ref, w2_ref, cdt, dmF,
                                dw1_ref, db1_ref, dw2_ref, tiles=SQ_FF_TILES)
    db2_ref[...] += jnp.sum(df, axis=0, keepdims=True)
    dadaw_ref[1, 0:1, :] += jnp.sum(da3 * x3, axis=0, keepdims=True)
    dadaw_ref[1, 1:2, :] += jnp.sum(da3, axis=0, keepdims=True)
    dx3 = ds4 + da3 * adaw_ref[1, 0:1, :]

    # ---- LN3 bwd ----
    ds3, ds, db = _ln_bwd(dx3, xhat4, inv4, lnw_ref[0, 0:1, :])
    dlnw_ref[0, 0:1, :] += ds
    dlnw_ref[0, 1:2, :] += db

    # ---- conv bwd ----  s3 = x2 + drop(where(row_ok, conv, 0))
    dcom = ds3 if C["dm"] is None else ds3 * C["dm"]
    dco = jnp.where(row_ok, dcom, 0.0)
    dpw2w_ref[...] += _mm_tn(C["cact"], dco, cdt)
    dpw2b_ref[...] += jnp.sum(dco, axis=0, keepdims=True)
    dcact = _mm(dco, jnp.swapaxes(pw2w_ref[...], 0, 1), cdt)
    dcn = dcact * _dsilu(C["cn"])
    dcnw_ref[0:1, :] += jnp.sum(dcn * C["xhat3"], axis=0, keepdims=True)
    dcnw_ref[1:2, :] += jnp.sum(dcn, axis=0, keepdims=True)
    # LN (conv_eps) bwd with the cnw affine
    dxhat = dcn * cnw_ref[0:1, :]
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * C["xhat3"], axis=1, keepdims=True)
    dc = C["inv3"] * (dxhat - m1 - C["xhat3"] * m2)
    ddwb_ref[...] += jnp.sum(dc, axis=0, keepdims=True)
    left = ksize - 1 if causal else (ksize - 1) // 2
    right = 0 if causal else (ksize - 1) // 2
    P = left + T + right
    dzp = [dc]
    if ksize > 1:
        dzp.insert(0, jnp.zeros((ksize - 1, D), jnp.float32))
    if P > T:
        dzp.append(jnp.zeros((P - T, D), jnp.float32))
    dcz = jnp.concatenate(dzp, axis=0) if len(dzp) > 1 else dc
    du_pad = jnp.zeros((P, D), jnp.float32)
    for i in range(ksize):
        du_pad = du_pad + dcz[ksize - 1 - i:ksize - 1 - i + P, :] \
            * dww_ref[i:i + 1, :]
        ddww_ref[i:i + 1, :] += jnp.sum(dc * C["upad"][i:i + T, :], axis=0,
                                        keepdims=True)
    du = du_pad[left:left + T, :]
    dga = du * C["sgb"]
    dgb = du * C["gx"][:, :D] * C["sgb"] * (1.0 - C["sgb"])
    dg = jnp.concatenate([dga, dgb], axis=1)
    dpw1w_ref[...] += _mm_tn(C["a2m"], dg, cdt)
    dpw1b = jnp.sum(dg, axis=0, keepdims=True)
    if causal and left:
        # causal pad rows are GLU(pw1 bias) → their grad hits the bias
        du0 = jnp.sum(du_pad[:left, :], axis=0, keepdims=True)
        b_a = pw1b_ref[0:1, :D]
        s0 = jax.nn.sigmoid(pw1b_ref[0:1, D:])
        dpw1b = dpw1b + jnp.concatenate(
            [du0 * s0, du0 * b_a * s0 * (1.0 - s0)], axis=1)
    dpw1b_ref[...] += dpw1b
    da2m = _mm(dg, jnp.swapaxes(pw1w_ref[...], 0, 1), cdt)
    da2 = jnp.where(row_ok, da2m, 0.0)
    dadaw_ref[0, 0:1, :] += jnp.sum(da2 * x2, axis=0, keepdims=True)
    dadaw_ref[0, 1:2, :] += jnp.sum(da2, axis=0, keepdims=True)
    dx_ref[0] = (ds3 + da2 * adaw_ref[0, 0:1, :]).astype(dx_ref.dtype)


# --------------------------------------------------------------------------
# custom-VJP wrappers
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _sq_half1(x, mask, seeds, lens, p, n_head, eps, rate, att_rate, train,
              interpret):
    y, _ = _sq_half1_fwd(x, mask, seeds, lens, p, n_head, eps, rate,
                         att_rate, train, interpret)
    return y


def _sq_half1_fwd(x, mask, seeds, lens, p, n_head, eps, rate, att_rate,
                  train, interpret):
    B, T, D = x.shape
    F = p["w1"].shape[1]
    ip = _interp(interpret, train and (rate > 0.0 or att_rate > 0.0))
    kw = dict(n_head=n_head, d_k=D // n_head, eps=eps, rate=rate,
              att_rate=att_rate, train=train)
    y, s2 = pl.pallas_call(
        functools.partial(_h1_fwd_kernel, **kw),
        out_shape=(jax.ShapeDtypeStruct((B, T, D), x.dtype),
                   jax.ShapeDtypeStruct((B, T, D), x.dtype)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(B,),
            in_specs=[_bspec((1, T, D)), _bspec((1, T, T)),
                      _cspec((2, 2, D)), _cspec((2, 2, D)),
                      _cspec((4, D, D)), _cspec((4, D)), _cspec((2, D)),
                      _cspec((1, T, D)), _cspec((D, F)), _cspec((1, F)),
                      _cspec((F, D)), _cspec((1, D))],
            out_specs=(_bspec((1, T, D)), _bspec((1, T, D)))),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=ip,
    )(lens.astype(jnp.int32), seeds.astype(jnp.int32), x,
      mask.astype(jnp.int8), p["lnw"], p["adaw"], p["attw"], p["attb"],
      p["posb"], p["posp"], p["w1"], p["b1"], p["w2"], p["b2"])
    return y, (x, s2, mask, seeds, lens, p)


def _sq_half1_bwd(n_head, eps, rate, att_rate, train, interpret, res, dy):
    x, s2, mask, seeds, lens, p = res
    B, T, D = x.shape
    F = p["w1"].shape[1]
    ip = _interp(interpret, train and (rate > 0.0 or att_rate > 0.0))
    kw = dict(n_head=n_head, d_k=D // n_head, eps=eps, rate=rate,
              att_rate=att_rate, train=train)
    f32 = jnp.float32
    gshapes = [((2, 2, D), f32), ((2, 2, D), f32), ((4, D, D), f32),
               ((4, D), f32), ((2, D), f32), ((1, T, D), f32),
               ((D, F), f32), ((1, F), f32), ((F, D), f32), ((1, D), f32)]
    outs = pl.pallas_call(
        functools.partial(_h1_bwd_kernel, **kw),
        out_shape=tuple([jax.ShapeDtypeStruct((B, T, D), x.dtype)]
                        + [jax.ShapeDtypeStruct(s, d) for s, d in gshapes]),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(B,),
            in_specs=[_bspec((1, T, D)), _bspec((1, T, T)),
                      _cspec((2, 2, D)), _cspec((2, 2, D)),
                      _cspec((4, D, D)), _cspec((4, D)), _cspec((2, D)),
                      _cspec((1, T, D)), _cspec((D, F)), _cspec((1, F)),
                      _cspec((F, D)), _cspec((1, D)),
                      _bspec((1, T, D)), _bspec((1, T, D))],
            out_specs=tuple([_bspec((1, T, D))]
                            + [_cspec(s) for s, _ in gshapes])),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=ip,
    )(lens.astype(jnp.int32), seeds.astype(jnp.int32), x,
      mask.astype(jnp.int8), p["lnw"], p["adaw"], p["attw"], p["attb"],
      p["posb"], p["posp"], p["w1"], p["b1"], p["w2"], p["b2"], s2, dy)
    dx = outs[0]
    keys = ("lnw", "adaw", "attw", "attb", "posb", "posp", "w1", "b1",
            "w2", "b2")
    dp = {k: outs[i + 1].astype(jnp.asarray(p[k]).dtype)
          for i, k in enumerate(keys)}
    return (dx, None, None, None, dp)


_sq_half1.defvjp(_sq_half1_fwd, _sq_half1_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _sq_half2(x, seeds, lens, p, ksize, causal, eps, conv_eps, rate,
              train, interpret):
    y, _ = _sq_half2_fwd(x, seeds, lens, p, ksize, causal, eps, conv_eps,
                         rate, train, interpret)
    return y


def _sq_half2_fwd(x, seeds, lens, p, ksize, causal, eps, conv_eps, rate,
                  train, interpret):
    B, T, D = x.shape
    F = p["w1"].shape[1]
    ip = _interp(interpret, train and rate > 0.0)
    kw = dict(ksize=ksize, causal=causal, eps=eps, conv_eps=conv_eps,
              rate=rate, train=train)
    y, s4 = pl.pallas_call(
        functools.partial(_h2_fwd_kernel, **kw),
        out_shape=(jax.ShapeDtypeStruct((B, T, D), x.dtype),
                   jax.ShapeDtypeStruct((B, T, D), x.dtype)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(B,),
            in_specs=[_bspec((1, T, D)), _cspec((2, 2, D)),
                      _cspec((2, 2, D)), _cspec((D, 2 * D)),
                      _cspec((1, 2 * D)), _cspec((ksize, D)),
                      _cspec((1, D)), _cspec((2, D)), _cspec((D, D)),
                      _cspec((1, D)), _cspec((D, F)), _cspec((1, F)),
                      _cspec((F, D)), _cspec((1, D))],
            out_specs=(_bspec((1, T, D)), _bspec((1, T, D)))),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=ip,
    )(lens.astype(jnp.int32), seeds.astype(jnp.int32), x, p["lnw"],
      p["adaw"], p["pw1w"], p["pw1b"], p["dww"], p["dwb"], p["cnw"],
      p["pw2w"], p["pw2b"], p["w1"], p["b1"], p["w2"], p["b2"])
    return y, (x, s4, seeds, lens, p)


def _sq_half2_bwd(ksize, causal, eps, conv_eps, rate, train, interpret,
                  res, dy):
    x, s4, seeds, lens, p = res
    B, T, D = x.shape
    F = p["w1"].shape[1]
    ip = _interp(interpret, train and rate > 0.0)
    kw = dict(ksize=ksize, causal=causal, eps=eps, conv_eps=conv_eps,
              rate=rate, train=train)
    f32 = jnp.float32
    gshapes = [((2, 2, D), f32), ((2, 2, D), f32), ((D, 2 * D), f32),
               ((1, 2 * D), f32), ((ksize, D), f32), ((1, D), f32),
               ((2, D), f32), ((D, D), f32), ((1, D), f32),
               ((D, F), f32), ((1, F), f32), ((F, D), f32), ((1, D), f32)]
    outs = pl.pallas_call(
        functools.partial(_h2_bwd_kernel, **kw),
        out_shape=tuple([jax.ShapeDtypeStruct((B, T, D), x.dtype)]
                        + [jax.ShapeDtypeStruct(s, d) for s, d in gshapes]),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(B,),
            in_specs=[_bspec((1, T, D)), _cspec((2, 2, D)),
                      _cspec((2, 2, D)), _cspec((D, 2 * D)),
                      _cspec((1, 2 * D)), _cspec((ksize, D)),
                      _cspec((1, D)), _cspec((2, D)), _cspec((D, D)),
                      _cspec((1, D)), _cspec((D, F)), _cspec((1, F)),
                      _cspec((F, D)), _cspec((1, D)),
                      _bspec((1, T, D)), _bspec((1, T, D))],
            out_specs=tuple([_bspec((1, T, D))]
                            + [_cspec(s) for s, _ in gshapes])),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=ip,
    )(lens.astype(jnp.int32), seeds.astype(jnp.int32), x, p["lnw"],
      p["adaw"], p["pw1w"], p["pw1b"], p["dww"], p["dwb"], p["cnw"],
      p["pw2w"], p["pw2b"], p["w1"], p["b1"], p["w2"], p["b2"], s4, dy)
    dx = outs[0]
    keys = ("lnw", "adaw", "pw1w", "pw1b", "dww", "dwb", "cnw", "pw2w",
            "pw2b", "w1", "b1", "w2", "b2")
    dp = {k: outs[i + 1].astype(jnp.asarray(p[k]).dtype)
          for i, k in enumerate(keys)}
    return (dx, None, None, dp)


_sq_half2.defvjp(_sq_half2_fwd, _sq_half2_bwd)


def fused_sq_train_supported(T, D, F, dtype=jnp.bfloat16):
    """VMEM estimate for the half-op backward peaks. Same accounting as
    the Conformer train kernel, plus the SQ halves' extra staging (the
    AdaptiveScale pre-activations and post-norm saved residuals — ~3
    extra (T, D) f32 live values measured against the hardware OOM at
    T=299, D=256, F=2048 with 4 FFN tiles); the FFN backwards here run
    SQ_FF_TILES=8 column tiles, halving that tile term."""
    from masr_tpu.ops.pallas.conformer_layer_train import (
        FF_TILES, fused_train_supported)
    sq_extra = T * D * 4 * 3 \
        - T * (F // FF_TILES - F // SQ_FF_TILES) * 4 * 3
    return fused_train_supported(T, D, F, dtype) \
        and sq_extra < int(0.8 * 1024 * 1024)


def fused_squeezeformer_layer_train(x, mask, seeds, lens, params, n_head,
                                    ksize, causal, eps, conv_eps, rate,
                                    att_rate, train, interpret):
    """Full fused SQ train layer = half1 ∘ half2. `params` is the packed
    dict from squeezeformer_layer.pack_sq_layer_params(conv_ln=True)
    (+ 'posp'); the slicing below is differentiable, so parameter grads
    flow back to the original pack (and through it to the flax tree)."""
    p1 = {"lnw": params["lnw"][0:2], "adaw": params["adaw"][0:2],
          "attw": params["attw"], "attb": params["attb"],
          "posb": params["posb"], "posp": params["posp"],
          "w1": params["ffw1"][0], "b1": params["ffb1"][0:1],
          "w2": params["ffw2"][0], "b2": params["ffb2"][0:1]}
    p2 = {"lnw": params["lnw"][2:4], "adaw": params["adaw"][2:4],
          "pw1w": params["pw1w"], "pw1b": params["pw1b"],
          "dww": params["dww"], "dwb": params["dwb"],
          "cnw": params["cnw"], "pw2w": params["pw2w"],
          "pw2b": params["pw2b"], "w1": params["ffw1"][1],
          "b1": params["ffb1"][1:2], "w2": params["ffw2"][1],
          "b2": params["ffb2"][1:2]}
    x2 = _sq_half1(x, mask, seeds, lens, p1, n_head, eps, rate, att_rate,
                   train, interpret)
    seeds2 = jnp.bitwise_xor(seeds.astype(jnp.int32),
                             jnp.int32(_HALF2_SEED_MIX))
    return _sq_half2(x2, seeds2, lens, p2, ksize, causal, eps, conv_eps,
                     rate, train, interpret)
