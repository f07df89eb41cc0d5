"""Fused Conformer encoder layer for TRAINING (Pallas, TPU): forward with
in-kernel dropout + hand-written backward with staged recompute.

The layer is split into TWO custom-VJP ops so each backward kernel fits
the 16 MB VMEM budget (a single whole-layer bwd measured 27.7 MB — the
recompute-then-reverse structure keeps every intermediate live at once):

  half1: macaron-FFN(×ff_scale) → rel-pos MHSA        (x0 → x2)
  half2: conv module → FFN(×ff_scale) → final LN      (x2 → y)

Each bwd kernel saves ONLY its input activation and re-derives per
sub-block just before that sub-block's reverse step (staged recompute),
and the FFN backward runs in hidden-column tiles so the (T, F) hidden
never fully materializes. Parameter gradients accumulate across the
batch grid into f32 outputs.

Training extras vs the serving kernel (conformer_layer.py):
  - dynamic-chunk attention mask (B, T, T) (reference mask.py:78-143);
  - dropout at the layer's seven sites via the TPU PRNG, seeded per
    (layer, batch, half) so the backward regenerates identical masks
    (same Bernoulli statistics as flax's nn.Dropout, different stream);
  - causal conv pads carry GLU(pw1 bias) exactly like the flax module
    (pad happens BEFORE pointwise_conv1, convolution.py).

Gradients validated against jax.grad of the XLA layer path in
tests/test_fused_layer_train.py (dropout 0 exact; dropout > 0 by
same-seed determinism + directional finite differences).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_HALF2_SEED_MIX = 0x3779b97f  # keeps half2's dropout stream distinct
_ATT_SEED_MIX = 0x51ed2701    # attention draws get their own stream so the
#                               bwd can skip the macaron recompute entirely
FF_TILES = 4                  # hidden-column tiles in the FFN backward


def _dropout_mult(shape, rate):
    """Inverted-dropout multiplier from the already-seeded PRNG. MUST be
    drawn in the same order/shapes in fwd and bwd."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
    return jnp.where(bits >= thresh, 1.0 / (1.0 - rate), 0.0).astype(
        jnp.float32)


def _ln_fwd(v, s, b, eps):
    mu = jnp.mean(v, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(v - mu), axis=1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (v - mu) * inv
    return xhat * s + b, xhat, inv


def _ln_bwd(dy, xhat, inv, s):
    """→ (dx, dscale_row, dbias_row); means over the feature dim."""
    dxhat = dy * s
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    dx = inv * (dxhat - m1 - xhat * m2)
    return dx, jnp.sum(dy * xhat, axis=0, keepdims=True), \
        jnp.sum(dy, axis=0, keepdims=True)


def _silu(z):
    return z * jax.nn.sigmoid(z)


def _dsilu(z):
    sg = jax.nn.sigmoid(z)
    return sg * (1.0 + z * (1.0 - sg))


def _mm(a, w, cdt):
    return jax.lax.dot_general(a.astype(cdt), w.astype(cdt),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_nt(a, b, cdt):                       # a @ b^T
    return jax.lax.dot_general(a.astype(cdt), b.astype(cdt),
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_tn(a, b, cdt):                       # a^T @ b
    return jax.lax.dot_general(a.astype(cdt), b.astype(cdt),
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _ffn_fwd(x_ln, w1_ref, b1_ref, w2_ref, b2_ref, cdt, rate, train):
    """LN'd input → FFN output (+ the hidden dropout drawn in order)."""
    z = _mm(x_ln, w1_ref[...], cdt) + b1_ref[...]
    h = _silu(z)
    if train and rate > 0.0:
        h = h * _dropout_mult(h.shape, rate)
    return _mm(h, w2_ref[...], cdt) + b2_ref[...]


# --------------------------------------------------------------------------
# half 1: macaron FFN + rel-pos MHSA
# --------------------------------------------------------------------------

def _h1_recompute_x1(x0, lnw_ref, w1_ref, b1_ref, w2_ref, b2_ref, cdt,
                     ff_scale, eps, rate, train):
    a0, xhat0, inv0 = _ln_fwd(x0, lnw_ref[0, 0:1, :], lnw_ref[0, 1:2, :],
                              eps)
    f0 = _ffn_fwd(a0, w1_ref, b1_ref, w2_ref, b2_ref, cdt, rate, train)
    if train and rate > 0.0:
        f0 = f0 * _dropout_mult(f0.shape, rate)
    return x0 + ff_scale * f0, a0, xhat0, inv0


def _h1_attention(x1, amask, lnw_ref, attw_ref, attb_ref, posb_ref,
                  posp_ref, cdt, n_head, d_k, eps, rate, att_rate, train):
    """x1 → (attd, internals). Draws att-dropout masks in head order then
    the output-dropout mask (fixed stream order for bwd)."""
    a1, xhat1, inv1 = _ln_fwd(x1, lnw_ref[1, 0:1, :], lnw_ref[1, 1:2, :],
                              eps)
    q = _mm(a1, attw_ref[0], cdt) + attb_ref[0:1, :]
    k = _mm(a1, attw_ref[1], cdt) + attb_ref[1:2, :]
    v = _mm(a1, attw_ref[2], cdt) + attb_ref[2:3, :]
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
    return att, dict(a1=a1, xhat1=xhat1, inv1=inv1, q=q, k=k, v=v,
                     prs=prs, dms=dms, O=O, dm_att=dm_att)


def _h1_fwd_kernel(lens_ref, seed_ref, x_ref, mask_ref, lnw_ref, w1_ref,
                   b1_ref, w2_ref, b2_ref, attw_ref, attb_ref, posb_ref,
                   posp_ref, o_ref, x1_ref, *, n_head, d_k, ff_scale, eps,
                   rate, att_rate, train):
    """Also emits x1 (post-macaron, f32) so the backward skips the
    macaron-FFN forward recompute — x1 is a residual the fwd already
    holds; the HBM round-trip (T·D f32 per program) is ~40× cheaper
    than re-running the two (T,D)@(D,F) matmuls in the bwd kernel."""
    g = pl.program_id(0)
    cdt = x_ref.dtype
    if train and (rate > 0.0 or att_rate > 0.0):
        pltpu.prng_seed(seed_ref[g])
    x0 = x_ref[0].astype(jnp.float32)
    amask = mask_ref[0] != 0
    x1, _, _, _ = _h1_recompute_x1(x0, lnw_ref, w1_ref, b1_ref, w2_ref,
                                   b2_ref, cdt, ff_scale, eps, rate, train)
    # attention draws live on their own stream (seed ^ _ATT_SEED_MIX) so
    # the bwd can reproduce them without burning the macaron draws first
    if train and (rate > 0.0 or att_rate > 0.0):
        pltpu.prng_seed(seed_ref[g] ^ _ATT_SEED_MIX)
    att, _ = _h1_attention(x1, amask, lnw_ref, attw_ref, attb_ref,
                           posb_ref, posp_ref, cdt, n_head, d_k, eps,
                           rate, att_rate, train)
    o_ref[0] = (x1 + att).astype(o_ref.dtype)
    x1_ref[0] = x1


def _h1_bwd_kernel(lens_ref, seed_ref, x_ref, mask_ref, lnw_ref, w1_ref,
                   b1_ref, w2_ref, b2_ref, attw_ref, attb_ref, posb_ref,
                   posp_ref, x1_ref, dy_ref, dx_ref, dlnw_ref, dw1_ref,
                   db1_ref, dw2_ref, db2_ref, dattw_ref, dattb_ref,
                   dposb_ref, dposp_ref, *, n_head, d_k, ff_scale, eps,
                   rate, att_rate, train):
    g = pl.program_id(0)
    T, D = x_ref.shape[1], x_ref.shape[2]
    cdt = x_ref.dtype

    @pl.when(g == 0)
    def _init():
        for r in (dlnw_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dattw_ref,
                  dattb_ref, dposb_ref, dposp_ref):
            r[...] = jnp.zeros_like(r)

    x0 = x_ref[0].astype(jnp.float32)
    amask = mask_ref[0] != 0
    dy = dy_ref[0].astype(jnp.float32)

    # stage 1: attention recompute from the SAVED x1 (the macaron-FFN
    # forward is not re-run — its bwd only needs LN(x0) internals, cheap)
    x1 = x1_ref[0]
    if train and (rate > 0.0 or att_rate > 0.0):
        pltpu.prng_seed(seed_ref[g] ^ _ATT_SEED_MIX)
    _, A = _h1_attention(x1, amask, lnw_ref, attw_ref, attb_ref, posb_ref,
                         posp_ref, cdt, n_head, d_k, eps, rate, att_rate,
                         train)

    # ---- attention bwd ----  x2 = x1 + drop(att)
    datt = dy if A["dm_att"] is None else dy * A["dm_att"]
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
    dattw_ref[0] += _mm_tn(A["a1"], dq, cdt)
    dattw_ref[1] += _mm_tn(A["a1"], dk, cdt)
    dattw_ref[2] += _mm_tn(A["a1"], dv, cdt)
    dattb_ref[0:1, :] += jnp.sum(dq, axis=0, keepdims=True)
    dattb_ref[1:2, :] += jnp.sum(dk, axis=0, keepdims=True)
    dattb_ref[2:3, :] += jnp.sum(dv, axis=0, keepdims=True)
    da1 = _mm(dq, jnp.swapaxes(attw_ref[0], 0, 1), cdt) \
        + _mm(dk, jnp.swapaxes(attw_ref[1], 0, 1), cdt) \
        + _mm(dv, jnp.swapaxes(attw_ref[2], 0, 1), cdt)
    dxa, ds, db = _ln_bwd(da1, A["xhat1"], A["inv1"], lnw_ref[1, 0:1, :])
    dlnw_ref[1, 0:1, :] += ds
    dlnw_ref[1, 1:2, :] += db
    dx1 = dy + dxa

    # ---- macaron bwd (stage 2: re-seed and re-draw the macaron masks
    # in the original fwd stream order: hidden (T,F) then output (T,D)) ----
    if train and (rate > 0.0 or att_rate > 0.0):
        pltpu.prng_seed(seed_ref[g])
    _, xhat0, inv0 = _ln_fwd(x0, lnw_ref[0, 0:1, :], lnw_ref[0, 1:2, :],
                             eps)
    a0 = xhat0 * lnw_ref[0, 0:1, :] + lnw_ref[0, 1:2, :]
    dmF = _dropout_mult((T, w1_ref.shape[1]), rate) \
        if (train and rate > 0.0) else None
    dmO = _dropout_mult((T, D), rate) if (train and rate > 0.0) else None
    df0 = ff_scale * dx1
    if dmO is not None:
        df0 = df0 * dmO
    da0 = _ffn_bwd_tiled_masked(df0, a0, w1_ref, b1_ref, w2_ref, cdt, dmF,
                                dw1_ref, db1_ref, dw2_ref)
    db2_ref[...] += jnp.sum(df0, axis=0, keepdims=True)
    dxm, ds, db = _ln_bwd(da0, xhat0, inv0, lnw_ref[0, 0:1, :])
    dlnw_ref[0, 0:1, :] += ds
    dlnw_ref[0, 1:2, :] += db
    dx_ref[0] = (dx1 + dxm).astype(dx_ref.dtype)


def _ffn_bwd_tiled_masked(df, a, w1_ref, b1_ref, w2_ref, cdt, dmF,
                          dw1_ref, db1_ref, dw2_ref, tiles=FF_TILES):
    """Column-tiled FFN backward with a pre-drawn hidden dropout mask.
    `tiles` trades recompute-matmul count for peak VMEM (the Squeezeformer
    half-ops run 8: their AdaptiveScale/post-norm staging leaves ~0.5 MB
    less headroom than the Conformer halves and 4 tiles OOM'd the 16 MB
    scoped-vmem stack on hardware at T=299)."""
    F = w1_ref.shape[1]
    da = jnp.zeros_like(a)
    tile = F // tiles
    for t in range(tiles):
        cs = slice(t * tile, (t + 1) * tile)
        z_t = _mm(a, w1_ref[:, cs], cdt) + b1_ref[0:1, cs]
        h_t = _silu(z_t)
        if dmF is not None:
            h_t = h_t * dmF[:, cs]
        dh_t = _mm_nt(df, w2_ref[cs, :], cdt)
        if dmF is not None:
            dh_t = dh_t * dmF[:, cs]
        dz_t = dh_t * _dsilu(z_t)
        dw1_ref[:, cs] += _mm_tn(a, dz_t, cdt)
        db1_ref[0:1, cs] += jnp.sum(dz_t, axis=0, keepdims=True)
        dw2_ref[cs, :] += _mm_tn(h_t, df, cdt)
        da = da + _mm(dz_t, jnp.swapaxes(w1_ref[:, cs], 0, 1), cdt)
    return da


# --------------------------------------------------------------------------
# half 2: conv module + FFN + final LN
# --------------------------------------------------------------------------

def _h2_conv(x2, row_ok, lnw_ref, pw1w_ref, pw1b_ref, pw2w_ref, cvb_ref,
             dww_ref, cdt, ksize, causal, eps, rate, train):
    a2, xhat2, inv2 = _ln_fwd(x2, lnw_ref[0, 0:1, :], lnw_ref[0, 1:2, :],
                              eps)
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
    c = c + cvb_ref[0:1, :]
    cn, xhat3, inv3 = _ln_fwd(c, lnw_ref[1, 0:1, :], lnw_ref[1, 1:2, :],
                              eps)
    cact = _silu(cn)
    co = _mm(cact, pw2w_ref[...], cdt) + cvb_ref[1:2, :]
    com = jnp.where(row_ok, co, 0.0)
    dm = None
    if train and rate > 0.0:
        dm = _dropout_mult(com.shape, rate)
        com = com * dm
    return com, dict(xhat2=xhat2, inv2=inv2, a2m=a2m, gx=gx, sgb=sgb, u=u,
                     upad=upad, cn=cn, xhat3=xhat3, inv3=inv3, cact=cact,
                     dm=dm)


def _h2_fwd_kernel(lens_ref, seed_ref, x_ref, lnw_ref, pw1w_ref, pw1b_ref,
                   pw2w_ref, cvb_ref, dww_ref, w1_ref, b1_ref, w2_ref,
                   b2_ref, o_ref, x4_ref, *, ksize, causal, ff_scale, eps,
                   rate, train):
    """Also emits x4 (pre-final-LN, f32) so the backward skips the tiled
    FFN forward recompute — final-LN bwd only needs LN(x4) internals."""
    g = pl.program_id(0)
    T, D = x_ref.shape[1], x_ref.shape[2]
    cdt = x_ref.dtype
    if train and rate > 0.0:
        pltpu.prng_seed(seed_ref[g])
    x2 = x_ref[0].astype(jnp.float32)
    valid = lens_ref[g]
    row_ok = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) < valid
    com, _ = _h2_conv(x2, row_ok, lnw_ref, pw1w_ref, pw1b_ref, pw2w_ref,
                      cvb_ref, dww_ref, cdt, ksize, causal, eps, rate,
                      train)
    x3 = x2 + com
    a3, _, _ = _ln_fwd(x3, lnw_ref[2, 0:1, :], lnw_ref[2, 1:2, :], eps)
    f1 = _ffn_fwd(a3, w1_ref, b1_ref, w2_ref, b2_ref, cdt, rate, train)
    if train and rate > 0.0:
        f1 = f1 * _dropout_mult(f1.shape, rate)
    x4 = x3 + ff_scale * f1
    y, _, _ = _ln_fwd(x4, lnw_ref[3, 0:1, :], lnw_ref[3, 1:2, :], eps)
    o_ref[0] = y.astype(o_ref.dtype)
    # bf16: the f32 variant overflows the bwd kernel's scoped VMEM by
    # 46 KB at the production shape; the final-LN bwd tolerates the
    # rounding (the XLA reference layer holds x4 in bf16 too)
    x4_ref[0] = x4.astype(x4_ref.dtype)


def _h2_bwd_kernel(lens_ref, seed_ref, x_ref, lnw_ref, pw1w_ref, pw1b_ref,
                   pw2w_ref, cvb_ref, dww_ref, w1_ref, b1_ref, w2_ref,
                   b2_ref, x4_ref, dy_ref, dx_ref, dlnw_ref, dpw1w_ref,
                   dpw1b_ref, dpw2w_ref, dcvb_ref, ddww_ref, dw1_ref,
                   db1_ref, dw2_ref, db2_ref, *, ksize, causal, ff_scale,
                   eps, rate, train):
    g = pl.program_id(0)
    T, D = x_ref.shape[1], x_ref.shape[2]
    cdt = x_ref.dtype

    @pl.when(g == 0)
    def _init():
        for r in (dlnw_ref, dpw1w_ref, dpw1b_ref, dpw2w_ref, dcvb_ref,
                  ddww_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
            r[...] = jnp.zeros_like(r)

    if train and rate > 0.0:
        pltpu.prng_seed(seed_ref[g])
    x2 = x_ref[0].astype(jnp.float32)
    valid = lens_ref[g]
    row_ok = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) < valid
    dy = dy_ref[0].astype(jnp.float32)

    # recompute (conv internals kept; FFN internals re-derived per tile)
    com, C = _h2_conv(x2, row_ok, lnw_ref, pw1w_ref, pw1b_ref, pw2w_ref,
                      cvb_ref, dww_ref, cdt, ksize, causal, eps, rate,
                      train)
    x3 = x2 + com
    a3, xhat4, inv4 = _ln_fwd(x3, lnw_ref[2, 0:1, :], lnw_ref[2, 1:2, :],
                              eps)
    dmF = _dropout_mult((T, w1_ref.shape[1]), rate) \
        if (train and rate > 0.0) else None
    dmO = _dropout_mult((T, D), rate) if (train and rate > 0.0) else None
    # x4 was saved by the forward — no tiled-FFN forward recompute
    x4 = x4_ref[0].astype(jnp.float32)
    _, xhat5, inv5 = _ln_fwd(x4, lnw_ref[3, 0:1, :], lnw_ref[3, 1:2, :],
                             eps)

    # ---- final LN bwd ----
    dx4, ds, db = _ln_bwd(dy, xhat5, inv5, lnw_ref[3, 0:1, :])
    dlnw_ref[3, 0:1, :] += ds
    dlnw_ref[3, 1:2, :] += db

    # ---- FFN bwd (tiled) ----
    df1 = ff_scale * dx4
    if dmO is not None:
        df1 = df1 * dmO
    da3 = _ffn_bwd_tiled_masked(df1, a3, w1_ref, b1_ref, w2_ref, cdt, dmF,
                                dw1_ref, db1_ref, dw2_ref)
    db2_ref[...] += jnp.sum(df1, axis=0, keepdims=True)
    dxf, ds, db = _ln_bwd(da3, xhat4, inv4, lnw_ref[2, 0:1, :])
    dlnw_ref[2, 0:1, :] += ds
    dlnw_ref[2, 1:2, :] += db
    dx3 = dx4 + dxf

    # ---- conv bwd ----
    dcom = dx3 if C["dm"] is None else dx3 * C["dm"]
    dco = jnp.where(row_ok, dcom, 0.0)
    dpw2w_ref[...] += _mm_tn(C["cact"], dco, cdt)
    dcvb_ref[1:2, :] += jnp.sum(dco, axis=0, keepdims=True)
    dcact = _mm(dco, jnp.swapaxes(pw2w_ref[...], 0, 1), cdt)
    dcn = dcact * _dsilu(C["cn"])
    dc, ds, db = _ln_bwd(dcn, C["xhat3"], C["inv3"], lnw_ref[1, 0:1, :])
    dlnw_ref[1, 0:1, :] += ds
    dlnw_ref[1, 1:2, :] += db
    dcvb_ref[0:1, :] += jnp.sum(dc, axis=0, keepdims=True)
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
    dxc, ds, db = _ln_bwd(da2, C["xhat2"], C["inv2"], lnw_ref[0, 0:1, :])
    dlnw_ref[0, 0:1, :] += ds
    dlnw_ref[0, 1:2, :] += db
    dx_ref[0] = (dx3 + dxc).astype(dx_ref.dtype)


# --------------------------------------------------------------------------
# custom-VJP wrappers
# --------------------------------------------------------------------------

def _cspec(shape):
    n = len(shape)
    return pl.BlockSpec(shape, lambda b, *_, _n=n: (0,) * _n)


def _bspec(shape):
    return pl.BlockSpec(shape, lambda b, *_: (b,) + (0,) * (len(shape) - 1))


def _interp(interpret, need_prng):
    if interpret and need_prng:
        return pltpu.InterpretParams()
    return interpret


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _half1(x, mask, seeds, lens, p, n_head, ff_scale, eps, rate, att_rate,
           train, interpret):
    y, _ = _half1_fwd(x, mask, seeds, lens, p, n_head, ff_scale, eps, rate,
                      att_rate, train, interpret)
    return y


def _half1_fwd(x, mask, seeds, lens, p, n_head, ff_scale, eps, rate,
               att_rate, train, interpret):
    B, T, D = x.shape
    F = p["w1"].shape[1]
    ip = _interp(interpret, train and (rate > 0.0 or att_rate > 0.0))
    kw = dict(n_head=n_head, d_k=D // n_head, ff_scale=ff_scale, eps=eps,
              rate=rate, att_rate=att_rate, train=train)
    y, x1 = pl.pallas_call(
        functools.partial(_h1_fwd_kernel, **kw),
        out_shape=(jax.ShapeDtypeStruct((B, T, D), x.dtype),
                   jax.ShapeDtypeStruct((B, T, D), jnp.float32)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(B,),
            in_specs=[_bspec((1, T, D)), _bspec((1, T, T)),
                      _cspec((2, 2, D)), _cspec((D, F)), _cspec((1, F)),
                      _cspec((F, D)), _cspec((1, D)), _cspec((4, D, D)),
                      _cspec((4, D)), _cspec((2, D)), _cspec((1, T, D))],
            out_specs=(_bspec((1, T, D)), _bspec((1, T, D)))),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=ip,
    )(lens.astype(jnp.int32), seeds.astype(jnp.int32), x,
      mask.astype(jnp.int8), p["lnw"], p["w1"], p["b1"], p["w2"], p["b2"],
      p["attw"], p["attb"], p["posb"], p["posp"])
    return y, (x, x1, mask, seeds, lens, p)


def _half1_bwd(n_head, ff_scale, eps, rate, att_rate, train, interpret,
               res, dy):
    x, x1, mask, seeds, lens, p = res
    B, T, D = x.shape
    F = p["w1"].shape[1]
    ip = _interp(interpret, train and (rate > 0.0 or att_rate > 0.0))
    kw = dict(n_head=n_head, d_k=D // n_head, ff_scale=ff_scale, eps=eps,
              rate=rate, att_rate=att_rate, train=train)
    f32 = jnp.float32
    gshapes = [((2, 2, D), f32), ((D, F), f32), ((1, F), f32),
               ((F, D), f32), ((1, D), f32), ((4, D, D), f32),
               ((4, D), f32), ((2, D), f32), ((1, T, D), f32)]
    outs = pl.pallas_call(
        functools.partial(_h1_bwd_kernel, **kw),
        out_shape=tuple([jax.ShapeDtypeStruct((B, T, D), x.dtype)]
                        + [jax.ShapeDtypeStruct(s, d) for s, d in gshapes]),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(B,),
            in_specs=[_bspec((1, T, D)), _bspec((1, T, T)),
                      _cspec((2, 2, D)), _cspec((D, F)), _cspec((1, F)),
                      _cspec((F, D)), _cspec((1, D)), _cspec((4, D, D)),
                      _cspec((4, D)), _cspec((2, D)), _cspec((1, T, D)),
                      _bspec((1, T, D)), _bspec((1, T, D))],
            out_specs=tuple([_bspec((1, T, D))]
                            + [_cspec(s) for s, _ in gshapes])),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=ip,
    )(lens.astype(jnp.int32), seeds.astype(jnp.int32), x,
      mask.astype(jnp.int8), p["lnw"], p["w1"], p["b1"], p["w2"], p["b2"],
      p["attw"], p["attb"], p["posb"], p["posp"], x1, dy)
    dx = outs[0]
    keys = ("lnw", "w1", "b1", "w2", "b2", "attw", "attb", "posb", "posp")
    dp = {k: outs[i + 1].astype(jnp.asarray(p[k]).dtype)
          for i, k in enumerate(keys)}
    return (dx, None, None, None, dp)


_half1.defvjp(_half1_fwd, _half1_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _half2(x, seeds, lens, p, ksize, causal, ff_scale, eps, rate, train,
           interpret):
    y, _ = _half2_fwd(x, seeds, lens, p, ksize, causal, ff_scale, eps,
                      rate, train, interpret)
    return y


def _half2_fwd(x, seeds, lens, p, ksize, causal, ff_scale, eps, rate,
               train, interpret):
    B, T, D = x.shape
    F = p["w1"].shape[1]
    ip = _interp(interpret, train and rate > 0.0)
    kw = dict(ksize=ksize, causal=causal, ff_scale=ff_scale, eps=eps,
              rate=rate, train=train)
    y, x4 = pl.pallas_call(
        functools.partial(_h2_fwd_kernel, **kw),
        out_shape=(jax.ShapeDtypeStruct((B, T, D), x.dtype),
                   jax.ShapeDtypeStruct((B, T, D), x.dtype)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(B,),
            in_specs=[_bspec((1, T, D)), _cspec((4, 2, D)),
                      _cspec((D, 2 * D)), _cspec((1, 2 * D)),
                      _cspec((D, D)), _cspec((2, D)), _cspec((ksize, D)),
                      _cspec((D, F)), _cspec((1, F)), _cspec((F, D)),
                      _cspec((1, D))],
            out_specs=(_bspec((1, T, D)), _bspec((1, T, D)))),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=ip,
    )(lens.astype(jnp.int32), seeds.astype(jnp.int32), x, p["lnw"],
      p["pw1w"], p["pw1b"], p["pw2w"], p["cvb"], p["dww"], p["w1"],
      p["b1"], p["w2"], p["b2"])
    return y, (x, x4, seeds, lens, p)


def _half2_bwd(ksize, causal, ff_scale, eps, rate, train, interpret, res,
               dy):
    x, x4, seeds, lens, p = res
    B, T, D = x.shape
    F = p["w1"].shape[1]
    ip = _interp(interpret, train and rate > 0.0)
    kw = dict(ksize=ksize, causal=causal, ff_scale=ff_scale, eps=eps,
              rate=rate, train=train)
    f32 = jnp.float32
    gshapes = [((4, 2, D), f32), ((D, 2 * D), f32), ((1, 2 * D), f32),
               ((D, D), f32), ((2, D), f32), ((ksize, D), f32),
               ((D, F), f32), ((1, F), f32), ((F, D), f32), ((1, D), f32)]
    outs = pl.pallas_call(
        functools.partial(_h2_bwd_kernel, **kw),
        out_shape=tuple([jax.ShapeDtypeStruct((B, T, D), x.dtype)]
                        + [jax.ShapeDtypeStruct(s, d) for s, d in gshapes]),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(B,),
            in_specs=[_bspec((1, T, D)), _cspec((4, 2, D)),
                      _cspec((D, 2 * D)), _cspec((1, 2 * D)),
                      _cspec((D, D)), _cspec((2, D)), _cspec((ksize, D)),
                      _cspec((D, F)), _cspec((1, F)), _cspec((F, D)),
                      _cspec((1, D)), _bspec((1, T, D)),
                      _bspec((1, T, D))],
            out_specs=tuple([_bspec((1, T, D))]
                            + [_cspec(s) for s, _ in gshapes])),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=ip,
    )(lens.astype(jnp.int32), seeds.astype(jnp.int32), x, p["lnw"],
      p["pw1w"], p["pw1b"], p["pw2w"], p["cvb"], p["dww"], p["w1"],
      p["b1"], p["w2"], p["b2"], x4, dy)
    dx = outs[0]
    keys = ("lnw", "pw1w", "pw1b", "pw2w", "cvb", "dww", "w1", "b1", "w2",
            "b2")
    dp = {k: outs[i + 1].astype(jnp.asarray(p[k]).dtype)
          for i, k in enumerate(keys)}
    return (dx, None, None, dp)


_half2.defvjp(_half2_fwd, _half2_bwd)


def fused_train_supported(T, D, F, dtype=jnp.bfloat16):
    """VMEM estimate for the half-op backward peaks (weights + f32 grad
    buffers + staged intermediates). Calibrated against the known-good
    production shape (T=304, D=256, F=2048 ≈ 14 MB)."""
    s = jnp.dtype(dtype).itemsize
    weights = D * F * 2 * s + 4 * D * D * s + T * D * s
    grads = (2 * D * F + 4 * D * D + T * D) * 4
    att = T * T * (1 + 4 * 5)              # mask + per-head pr + dS
    act = T * D * 4 * 10 + T * (F // FF_TILES) * 4 * 3
    return weights + grads + att + act < int(15.2 * 1024 * 1024)


def fused_conformer_layer_train(x, mask, seeds, lens, params, n_head,
                                ksize, causal, ff_scale, eps, rate,
                                att_rate, train, interpret):
    """Full fused train layer = half1 ∘ half2. `params` is the packed
    dict from conformer_layer.pack_layer_params (+ 'posp'); the slicing
    below is differentiable, so parameter grads flow back to the
    original pack."""
    p1 = {"lnw": params["lnw"][0:2], "w1": params["ffw1"][0],
          "b1": params["ffb1"][0:1], "w2": params["ffw2"][0],
          "b2": params["vecb"][0:1], "attw": params["attw"],
          "attb": params["vecb"][2:6], "posb": params["posb"],
          "posp": params["posp"]}
    p2 = {"lnw": params["lnw"][2:6], "pw1w": params["pw1w"],
          "pw1b": params["pw1b"], "pw2w": params["pw2w"],
          "cvb": params["vecb"][6:8], "dww": params["dww"],
          "w1": params["ffw1"][1], "b1": params["ffb1"][1:2],
          "w2": params["ffw2"][1], "b2": params["vecb"][1:2]}
    x2 = _half1(x, mask, seeds, lens, p1, n_head, ff_scale, eps, rate,
                att_rate, train, interpret)
    seeds2 = jnp.bitwise_xor(seeds.astype(jnp.int32),
                             jnp.int32(_HALF2_SEED_MIX))
    return _half2(x2, seeds2, lens, p2, ksize, causal, ff_scale, eps,
                  rate, train, interpret)
