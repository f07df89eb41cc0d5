"""Fused STREAMING chunk-step Conformer layer (Pallas, TPU) — forward
only, batched slots with per-slot KV/conv caches.

The XLA streaming chunk step costs ~2.5 ms at B=32 (chunk 16) against a
~0.4 ms bandwidth+compute floor: every layer concats the (B, h, C, 2·d_k)
cache with the new keys, slices it back, and runs ~20 small fusions. Here
ONE pallas_call per layer does the whole thing — macaron FFN → rel-pos
MHSA over [cache ‖ chunk] → causal conv with ring cache → FFN → final
LN — and writes the rolled caches in place of the concat-and-slice.

Attention trick: with d_k = 64 the per-head score matmul contracts only
128 lanes at M=16 — tiny. All heads are STACKED into one
(h·c, 2·d_k) @ (h·(C+c), 2·d_k)^T matmul; cross-head blocks are masked
off before the softmax (block-diagonal mask via iota arithmetic), so the
A @ V_stack product needs no unstacking correction. One score matmul and
one AV matmul per slot instead of 2·h.

Cache semantics match models/attention.py / convolution.py exactly:
right-aligned fixed-shape att cache with a per-slot validity count, and
the conv ring cache holds PRE-pointwise rows (the flax module concats
the cache before pointwise_conv1).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _sub_chunk_mask_parts(n_head, c, L, C, n_sub):
    """Static per-row band bounds for multi-chunk ticks (n_sub buffered
    sub-chunks processed in ONE kernel call, exactly equivalent to n_sub
    sequential chunk steps). Query rows of sub-chunk i may see:
      - cache cols with col_pos >= i*sub_c (the sliding window: the C most
        recent frames BEFORE sub-chunk i's start), and
      - chunk cols of sub-chunks <= i (block-causal).
    Returns (min_cache_col, chunk_col_limit), both (h·c, h·L) int32."""
    sub_c = c // n_sub
    row_sub = (jax.lax.broadcasted_iota(
        jnp.int32, (n_head * c, n_head * L), 0) % c) // sub_c
    return row_sub * sub_c, C + (row_sub + 1) * sub_c


def _kernel(*refs, n_head, d_k, ksize, ff_scale, eps, table=False,
            n_sub=1, ring=False):
    # table: positions DMA'd per slot from an HBM-resident per-layer
    # projected table (rows i = linear_pos(sinusoid(max(i - C, 0))) —
    # row o+j IS the required position max(o-C+j, 0) for any o ≥ 0, so
    # one contiguous window per slot is exact; see make_chunk_pos_table).
    # Saves the per-tick sinusoid + per-layer posp einsum and its HBM
    # round-trip.
    # ring: the att cache is a MIRRORED RING BUFFER in HBM (ANY-space,
    # aliased input/output, 2·C rows per slot·head: rows [C, 2·C) always
    # equal rows [0, C)). The kernel DMAs each slot's window
    # [wp, wp + C) — which IS the chronological order, oldest first —
    # and writes the c fresh K/V rows back at the pointer in BOTH
    # mirrors. No in-VMEM rotate at all (Mosaic cannot lower a dynamic
    # sublane rotate on 16-bit vectors), and cache HBM write traffic
    # still drops C/(2·c)-fold (8× at the defaults) vs the
    # roll-and-rewrite layout, and
    # the cache never round-trips through XLA (no transpose/stack/merge
    # copies either; docs/streaming_roofline.md).
    it = iter(refs)
    clen_ref = next(it)
    start_ref = next(it) if table else None
    if ring:
        wptr_ref = next(it)
        act_ref = next(it)
    x_ref = next(it)
    tab_ref = pp_ref = None
    if table:
        tab_ref = next(it)
    else:
        pp_ref = next(it)
    ac_ref = next(it)                       # blocked VMEM | ANY (ring)
    cc_ref = next(it)
    (lnw_ref, ffw1_ref, ffb1_ref, ffw2_ref, vecb_ref, attw_ref, posb_ref,
     pw1w_ref, pw1b_ref, pw2w_ref, dww_ref) = (next(it) for _ in range(11))
    y_ref = next(it)
    nac_ref = next(it)                      # blocked VMEM | ANY aliased
    ncc_ref = next(it)
    qs_ref, ks_ref, vs_ref = (next(it) for _ in range(3))
    if table:
        pp_scr, dma_sem = next(it), next(it)
    if ring:
        ac_scr, ac_sem, nkv_scr, w_sem = (next(it) for _ in range(4))
    g = pl.program_id(0)
    bs, c, D = x_ref.shape
    C = ac_scr.shape[2] if ring else ac_ref.shape[2]
    L = C + c
    M = bs * c
    cdt = x_ref.dtype
    dmas = []
    ac_dmas = []
    if table:
        # start all slots' position DMAs up front; the macaron FFN below
        # overlaps the copies. Mosaic can only lower an HBM slice at a
        # dynamic row when the start is provably sublane-aligned —
        # engine offsets advance by the post-subsampling chunk size and
        # the table route is gated on 8-divisibility (forward_chunk_
        # batched), so the multiple_of assertion holds at runtime.
        for s in range(bs):
            start = pl.multiple_of(start_ref[g * bs + s], 8)
            dma = pltpu.make_async_copy(
                tab_ref.at[pl.ds(start, L), :], pp_scr.at[s],
                dma_sem.at[s])
            dma.start()
            dmas.append(dma)
    if ring:
        # one windowed DMA per slot·head: HBM rows [wp, wp + C) of the
        # mirrored ring ARE the chronological cache (oldest first) —
        # rows past C read the mirror copy. wp advances by c (a multiple
        # of 8, gated in fused_chunk_layer), so the dynamic start row is
        # provably sublane-aligned.
        for s in range(bs):
            wp0 = pl.multiple_of(wptr_ref[g * bs + s], 8)
            per_slot = []
            for h in range(n_head):
                dma = pltpu.make_async_copy(
                    ac_ref.at[g * bs + s, h, pl.ds(wp0, ac_scr.shape[2]), :],
                    ac_scr.at[s, h], ac_sem.at[s, h])
                dma.start()
                per_slot.append(dma)
            ac_dmas.append(per_slot)
    x = x_ref[...].reshape(M, D).astype(jnp.float32)

    def layer_norm(v, idx):
        s = lnw_ref[idx, 0:1, :]
        b = lnw_ref[idx, 1:2, :]
        mu = jnp.mean(v, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(v - mu), axis=1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + eps) * s + b

    def mm(a, w):
        return jax.lax.dot_general(a.astype(cdt), w.astype(cdt),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def silu(v):
        return v * jax.nn.sigmoid(v)

    def ffn(v, i):
        h = silu(mm(v, ffw1_ref[i]) + ffb1_ref[i:i + 1, :])
        return mm(h, ffw2_ref[i]) + vecb_ref[i:i + 1, :]

    # ---- macaron FFN (all slots share the row matmuls) ----
    x = x + ff_scale * ffn(layer_norm(x, 0), 0)

    # ---- rel-pos MHSA over [cache ‖ chunk] ----
    xn = layer_norm(x, 1)
    q = mm(xn, attw_ref[0]) + vecb_ref[2:3, :]
    k = mm(xn, attw_ref[1]) + vecb_ref[3:4, :]
    v = mm(xn, attw_ref[2]) + vecb_ref[4:5, :]
    scale = 1.0 / (d_k ** 0.5)
    # block-diagonal head mask + cache validity, shared shape (h·c, h·L)
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
        # per-slot PRE-projected positions (linear_pos applied by the
        # caller as ONE batched einsum per layer — doing the (L, D)@(D, D)
        # matmul here per slot per layer was the dominant per-grid-step
        # cost: 12 layers × B small serialized matmuls per tick)
        if table:
            dmas[s].wait()
            # scratch lane dim may be padded to the 128 tiling
            ph_full = pp_scr[s][:, 0:D].astype(jnp.float32)
        else:
            ph_full = pp_ref[s].astype(jnp.float32)
        if ring:
            for d in ac_dmas[s]:
                d.wait()
        # build the head-stacked Q/K/V directly in scratch via STORES —
        # Mosaic rejects concats whose operands sit at different LANE
        # offsets (head h's column slice starts at lane h·d_k; the cache
        # v-half at lane d_k)
        for h in range(n_head):
            sl = slice(h * d_k, (h + 1) * d_k)
            if ring:
                # the DMA already delivered chronological order (window
                # [wp, wp + C) of the mirrored ring; row 0 = oldest —
                # the mask below is unchanged)
                chron = ac_scr[s, h].astype(jnp.float32)
                cache_k, cache_v = chron[:, 0:d_k], chron[:, d_k:2 * d_k]
            else:
                cache_k = ac_ref[s, h, :, 0:d_k].astype(jnp.float32)
                cache_v = ac_ref[s, h, :, d_k:2 * d_k].astype(jnp.float32)
            qs_ref[h * c:(h + 1) * c, 0:d_k] = q[rows, sl] \
                + posb_ref[0:1, sl]
            qs_ref[h * c:(h + 1) * c, d_k:2 * d_k] = q[rows, sl] \
                + posb_ref[1:2, sl]
            ks_ref[h * L:h * L + C, 0:d_k] = cache_k
            ks_ref[h * L + C:(h + 1) * L, 0:d_k] = k[rows, sl]
            ks_ref[h * L:(h + 1) * L, d_k:2 * d_k] = ph_full[:, sl]
            vs_ref[h * L:h * L + C, :] = cache_v
            vs_ref[h * L + C:(h + 1) * L, :] = v[rows, sl]
        v_stack = vs_ref[...]                           # (h·L, dk)
        sc = jax.lax.dot_general(
            qs_ref[...].astype(cdt), ks_ref[...].astype(cdt),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        # cache positions valid iff pos >= C - cache_len; chunk always;
        # multi-chunk ticks additionally band by sub-chunk (block-causal
        # over the n_sub sub-chunks + per-sub-chunk sliding cache window)
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
        # off-head-diagonal attn is zero → A @ V_stack is exact
        o_stack = jax.lax.dot_general(
            attn.astype(cdt), v_stack.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (h·c, dk)
        att_rows.append(jnp.concatenate(
            [o_stack[h * c:(h + 1) * c, :] for h in range(n_head)], axis=1))
        if ring:
            # stage the chunk's fresh K/V rows, then write ONLY them to
            # the HBM ring at the slot's pointer — in BOTH mirror copies
            # (rows dst and dst + C), keeping the read window
            # [wp, wp + C) chronological for every wp. Inactive slots
            # skip the write: the aliased buffer cannot be un-written by
            # the engine's XLA merge. n_sub sub-chunks go as separate
            # contiguous sub_c-row DMAs so a tick never wraps mid-copy
            # (wptrs and sub_c are multiples of 8, C % sub_c == 0 —
            # gated in fused_chunk_layer).
            for h in range(n_head):
                sl = slice(h * d_k, (h + 1) * d_k)
                pieces = [k[rows, sl], v[rows, sl]]
                if nkv_scr.shape[3] > 2 * d_k:   # lane pad to the 128 tiling
                    pieces.append(jnp.zeros(
                        (c, nkv_scr.shape[3] - 2 * d_k), jnp.float32))
                nkv_scr[s, h] = jnp.concatenate(
                    pieces, axis=1).astype(nkv_scr.dtype)
            sub_c = c // n_sub
            @pl.when(act_ref[g * bs + s] != 0)
            def _():
                wp0 = wptr_ref[g * bs + s]
                for h in range(n_head):
                    for i in range(n_sub):
                        for m in range(2):
                            dst = pl.multiple_of(
                                jax.lax.rem(wp0 + i * sub_c, C) + m * C, 8)
                            pltpu.make_async_copy(
                                nkv_scr.at[s, h, pl.ds(i * sub_c, sub_c), :],
                                nac_ref.at[g * bs + s, h,
                                           pl.ds(dst, sub_c), :],
                                w_sem.at[s, h, i, m]).start()
        else:
            # rolled cache: drop the oldest c rows, append the chunk's kv
            # (built as a value — Mosaic rejects ref-to-ref copies whose
            # row offsets differ; piece list conditional — no 0-sized
            # operands when c == C)
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
    x = x + mm(att, attw_ref[3]) + vecb_ref[5:6, :]

    # ---- causal conv with ring cache (cache rows are PRE-pointwise) ----
    xn2 = layer_norm(x, 2)
    lorder = ksize - 1
    conv_rows = []
    for s in range(bs):
        rows = slice(s * c, (s + 1) * c)
        cin = jnp.concatenate(
            [cc_ref[s].astype(jnp.float32), xn2[rows, :]], axis=0)
        ncc_ref[s] = cin[c:, :].astype(ncc_ref.dtype)   # last lorder rows
        gx = mm(cin, pw1w_ref[...]) + pw1b_ref[...]
        u = gx[:, :D] * jax.nn.sigmoid(gx[:, D:])       # (lorder+c, D)
        acc = jnp.zeros((c, D), jnp.float32)
        for i in range(ksize):                           # VALID conv
            acc = acc + u[i:i + c, :] * dww_ref[i:i + 1, :]
        conv_rows.append(acc)
    cv = jnp.concatenate(conv_rows, axis=0) if bs > 1 else conv_rows[0]
    cv = cv + vecb_ref[6:7, :]
    cv = silu(layer_norm(cv, 3))
    cv = mm(cv, pw2w_ref[...]) + vecb_ref[7:8, :]
    x = x + cv

    # ---- final FFN + final LN ----
    x = x + ff_scale * ffn(layer_norm(x, 4), 1)
    y_ref[...] = layer_norm(x, 5).astype(y_ref.dtype).reshape(bs, c, D)
    if ring:
        # drain the fresh-row ring writes (issued above, overlapped by
        # the conv module and FFN compute) before the grid step retires
        sub_c = c // n_sub
        for s in range(bs):
            @pl.when(act_ref[g * bs + s] != 0)
            def _():
                for h in range(n_head):
                    for i in range(n_sub):
                        for m in range(2):
                            pltpu.make_async_copy(
                                nkv_scr.at[s, h, pl.ds(i * sub_c, sub_c), :],
                                nac_ref.at[g * bs + s, h, pl.ds(0, sub_c), :],
                                w_sem.at[s, h, i, m]).wait()


def chunk_layer_supported(c, C, D, F, n_head, dtype=jnp.bfloat16,
                          table=False):
    """VMEM estimate at the default block_b."""
    bs = pick_chunk_block_b(c, C, D, F, n_head, dtype, table=table)
    return bs >= 1


def _vmem(c, C, D, F, n_head, dtype, bs, table=False, ring=False):
    s = jnp.dtype(dtype).itemsize
    L = C + c
    weights = (4 * D * F + 7 * D * D + 2 * D * D) * s
    cache_s = s
    if ring:
        # single-buffered DMA scratch (read, chronological window) +
        # c-row staging (write) — no double-buffered in/out blocks and
        # no rotate temporary (the mirrored ring makes the DMA window
        # itself chronological); lane dim padded to the 128 tiling
        rp = -(-2 * (D // n_head) // 128) * 128
        caches = bs * n_head * C * rp * cache_s \
            + bs * n_head * c * rp * cache_s
    else:
        caches = bs * n_head * C * 2 * (D // n_head) * cache_s * 2 * 2
    # posp: double-buffered input block, or single-buffered DMA scratch
    # when positions come from the HBM table
    pe = bs * L * (-(-D // 128) * 128 if table else D) * s \
        * (1 if table else 2)
    att = n_head * c * n_head * L * 4 * 3     # stacked scores/attn + mask
    act = 8 * bs * c * D * 4 + bs * c * F * 4 * 2
    return weights + caches + pe + att + act


def pick_chunk_block_b(c, C, D, F, n_head, dtype=jnp.bfloat16, max_bs=8,
                       table=False, ring=False):
    for bs in range(max_bs, 0, -1):
        if _vmem(c, C, D, F, n_head, dtype, bs, table, ring) \
                < int(13.5 * 1024 * 1024):
            return bs
    return 0


def make_chunk_pos_table(wpos, C, table_len=8192, dtype=jnp.bfloat16):
    """Per-layer HBM position table for the in-kernel positions DMA:
    row i = linear_pos(sinusoid(max(i - C, 0))). For a slot at offset o,
    rows [o, o + C + c) are EXACTLY the per-slot posp the einsum route
    computes (positions max(o - C + j, 0)) for every o ≥ 0, so the kernel
    fetches one contiguous window per slot instead of the engine
    materializing (B, L, D) per layer per tick. Offsets beyond
    table_len - (C + c) clamp (positions freeze) — the reference asserts
    offset + size < 5000 and CRASHES there (conformer/embedding.py:50),
    so an 8192-row table is strictly more capable."""
    from masr_tpu.models.embedding import sinusoid_position_encoding
    positions = jnp.maximum(jnp.arange(table_len) - C, 0)
    pe = sinusoid_position_encoding(positions, wpos.shape[0], dtype)
    tab = jnp.einsum("ld,de->le", pe.astype(wpos.dtype), wpos,
                     preferred_element_type=jnp.float32).astype(dtype)
    # lane dim padded to the 128 tiling: Mosaic only lowers the
    # in-kernel table DMA at 128-multiple slice lane widths (the kernel
    # reads columns [0, D) of the scratch and ignores the pad)
    D = tab.shape[1]
    pad = -(-D // 128) * 128 - D
    if pad:
        tab = jnp.pad(tab, ((0, 0), (0, pad)))
    return tab


def clamp_pos_starts(offsets, table_len, L):
    """Per-slot DMA start rows into a make_chunk_pos_table table.
    The freeze bound rounds DOWN to a multiple of 8: Mosaic lowers the
    in-kernel HBM table slice only when the start row is provably
    8-aligned (sublane tiling), so every reachable start must stay a
    multiple of 8 — offsets are multiples of the post-subsampling chunk
    size (the table route is gated on its 8-divisibility) and the clamp
    must not break that. At the defaults (8192 − 272 = 7920) the bound
    is unchanged."""
    hi = (table_len - L) // 8 * 8
    if hi < 0:
        raise ValueError(
            f"position table too short: table_len={table_len} < window "
            f"L={L} (C+c) — clamping would produce a negative DMA start "
            f"row (out-of-bounds table read); bake a longer table")
    return jnp.clip(offsets, 0, hi).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "n_head", "ksize", "ff_scale", "eps", "block_b", "interpret",
    "n_sub"))
def fused_chunk_layer(x, posp, att_cache, cnn_cache, cache_lens, params,
                      wpos=None, pos_table=None, starts=None, wptrs=None,
                      active=None, *, n_head, ksize, ff_scale=0.5,
                      eps=1e-5, block_b=None, interpret=None, n_sub=1):
    """x: (B, c, D) chunk after subsampling; posp: (B, C+c, D) per-slot
    PRE-projected positions — linear_pos(pos_emb), one batched einsum per
    layer in the caller (forward_chunk_batched); att_cache: (B, h, C,
    2·d_k) right-aligned; cnn_cache: (B, lorder, D); cache_lens: (B,)
    int32; params: pack_layer_params dict (without posp). `wpos` applies
    the projection here for callers that still pass raw pos_emb.
    Alternatively pass pos_table (make_chunk_pos_table) + starts
    (clamp_pos_starts) with posp=None: positions are then DMA'd per slot
    from the HBM table inside the kernel — no per-tick (B, L, D)
    materialization at all. Every `starts` element MUST be a multiple of
    8: the in-kernel HBM slice start is an unchecked pl.multiple_of
    compiler assertion (Mosaic sublane tiling), and an unaligned start on
    real TPU silently reads wrong position rows. In-repo callers satisfy
    this because offsets advance by the post-subsampling chunk size and
    forward_chunk_batched gates the table route on its 8-divisibility;
    external callers must align (clamp_pos_starts preserves alignment,
    it does not create it).
    n_sub > 1 runs a MULTI-CHUNK TICK: x carries n_sub buffered
    sub-chunks of c/n_sub frames each, and the attention mask goes
    block-causal over them (each sub-chunk sees the C most recent frames
    before its own start + itself) — bit-equivalent to n_sub sequential
    calls while reading the caches/weights ONCE per dispatch instead of
    n_sub times (docs/streaming_roofline.md: the tick is bounded by
    per-grid-step DMA, which this amortizes n_sub×). Requires
    c ≤ C and n_sub | c.
    RING-BUFFER CACHE: pass wptrs (B,) int32 per-slot write pointers +
    active (B,) bool/int32. att_cache is then a MIRRORED ring of shape
    (B, h, 2·C, 2·d_k) — rows [C, 2·C) always duplicate rows [0, C), so
    the chronological window [wp, wp + C) is one contiguous DMA (row wp
    is the oldest cached frame; the engine advances wp by c mod C after
    every active tick; Mosaic cannot lower the dynamic sublane rotate a
    single-copy ring would need). The kernel writes ONLY the c fresh
    rows back to HBM, once per mirror (the full-C rewrite — and its XLA
    transpose/stack/merge round-trips — disappear). The returned
    new_att_cache ALIASES the input buffer; callers must treat the input
    as consumed. Inactive slots' rings are untouched. Requires
    sub_c = c/n_sub and wptrs multiples of 8, C % sub_c == 0 and bs | B
    (no pad copies of the aliased buffer).
    → (y (B, c, D), new_att_cache, new_cnn_cache)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    table = pos_table is not None
    ring = wptrs is not None
    if wpos is not None:
        posp = jnp.einsum("nld,de->nle", posp.astype(wpos.dtype), wpos,
                          preferred_element_type=jnp.float32
                          ).astype(posp.dtype)
    B, c, D = x.shape
    if ring:
        assert att_cache.shape[2] % 2 == 0, att_cache.shape
        C = att_cache.shape[2] // 2          # mirrored ring: 2·C rows
    else:
        C = att_cache.shape[2]
    F = params["ffw1"].shape[2]
    bs = block_b or pick_chunk_block_b(c, C, D, F, n_head, x.dtype,
                                       table=table, ring=ring)
    bs = max(1, min(bs, B))
    if ring:
        # padding would copy the aliased ring buffer — shrink the block
        # to a divisor of B instead
        while B % bs:
            bs -= 1
        sub_c = c // n_sub
        assert C % sub_c == 0 and sub_c % 8 == 0, (C, sub_c)
    pad_b = (-B) % bs
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
        if table:
            starts = jnp.pad(starts, (0, pad_b))
        else:
            posp = jnp.pad(posp, ((0, pad_b), (0, 0), (0, 0)))
        att_cache = jnp.pad(att_cache, ((0, pad_b),) + ((0, 0),) * 3)
        cnn_cache = jnp.pad(cnn_cache, ((0, pad_b), (0, 0), (0, 0)))
        cache_lens = jnp.pad(cache_lens, (0, pad_b))
    Bp = B + pad_b
    L = C + c
    d_k = D // n_head
    lorder = ksize - 1
    const = lambda shape: pl.BlockSpec(shape, lambda b, *_: (0,) * len(shape))
    bspec = lambda shape: pl.BlockSpec(
        shape, lambda b, *_: (b,) + (0,) * (len(shape) - 1))
    pos_spec = [pl.BlockSpec(memory_space=pl.ANY)] if table \
        else [bspec((bs, L, D))]
    scalars = (cache_lens.astype(jnp.int32),) + (
        (starts.astype(jnp.int32),) if table else ()) + ((
            wptrs.astype(jnp.int32), active.astype(jnp.int32))
        if ring else ())
    pos_args = (pos_table,) if table else (posp,)
    extra_scratch = [pltpu.VMEM((bs, L, pos_table.shape[1]),
                                pos_table.dtype),
                     pltpu.SemaphoreType.DMA((bs,))] if table else []
    if ring:
        ac_spec = pl.BlockSpec(memory_space=pl.ANY)
        nac_spec = pl.BlockSpec(memory_space=pl.ANY)
        rp = att_cache.shape[3]          # lane dim, padded to 128 tiling
        extra_scratch += [
            pltpu.VMEM((bs, n_head, C, rp), att_cache.dtype),
            pltpu.SemaphoreType.DMA((bs, n_head)),
            pltpu.VMEM((bs, n_head, c, rp), att_cache.dtype),
            pltpu.SemaphoreType.DMA((bs, n_head, n_sub, 2)),
        ]
        # alias the ring buffer: positional operand index counts the
        # scalar-prefetch args; output 1 is new_att_cache
        aliases = {len(scalars) + 2: 1}
    else:
        ac_spec = bspec((bs, n_head, C, 2 * d_k))
        nac_spec = bspec((bs, n_head, C, 2 * d_k))
        aliases = {}
    assert c <= C and c % n_sub == 0, (c, C, n_sub)
    y, nac, ncc = pl.pallas_call(
        functools.partial(_kernel, n_head=n_head, d_k=d_k,
                          ksize=ksize, ff_scale=ff_scale, eps=eps,
                          table=table, n_sub=n_sub, ring=ring),
        out_shape=(jax.ShapeDtypeStruct((Bp, c, D), x.dtype),
                   jax.ShapeDtypeStruct(att_cache.shape, att_cache.dtype),
                   jax.ShapeDtypeStruct(cnn_cache.shape, cnn_cache.dtype)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(scalars),
            grid=(Bp // bs,),
            in_specs=[
                bspec((bs, c, D)),                    # x
            ] + pos_spec + [                          # posp | pos table
                ac_spec,                              # att cache
                bspec((bs, lorder, D)),               # cnn cache
                const((6, 2, D)),                     # lnw
                const((2, D, F)),                     # ffw1
                const((2, F)),                        # ffb1
                const((2, F, D)),                     # ffw2
                const((8, D)),                        # vecb
                const((4, D, D)),                     # attw
                const((2, D)),                        # posb
                const((D, 2 * D)),                    # pw1w
                const((1, 2 * D)),                    # pw1b
                const((D, D)),                        # pw2w
                const((ksize, D)),                    # dww
            ],
            out_specs=(bspec((bs, c, D)),
                       nac_spec,
                       bspec((bs, lorder, D))),
            scratch_shapes=[
                pltpu.VMEM((n_head * c, 2 * d_k), jnp.float32),
                pltpu.VMEM((n_head * L, 2 * d_k), jnp.float32),
                pltpu.VMEM((n_head * L, d_k), jnp.float32),
            ] + extra_scratch,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        input_output_aliases=aliases,
        interpret=interpret,
    )(*scalars, x, *pos_args, att_cache, cnn_cache,
      params["lnw"], params["ffw1"], params["ffb1"], params["ffw2"],
      params["vecb"], params["attw"], params["posb"],
      params["pw1w"], params["pw1b"], params["pw2w"], params["dww"])
    if pad_b:
        return y[:B], nac[:B], ncc[:B]
    return y, nac, ncc
