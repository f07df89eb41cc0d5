"""One-kernel CTC loss (Pallas, TPU).

optax.ctc_loss lowers the alpha recursion to a lax.scan with T sequential
(B, 2L+1) steps — on this chip that is latency-bound (measured 1.56 ms
fwd+bwd for T'=299, B=16, V=4233, independent of batch size; this kernel:
0.89 ms). This module runs the whole forward recursion in ONE
pallas_call (alphas live in VMEM, the T-loop is an in-kernel fori_loop)
and the beta/occupancy recursion in one more for the backward, then lets
XLA do the embarrassingly-parallel parts (log_softmax, the state gather
as a one-hot matmul, and the scatter back to (B, T, V) grads).

Semantics match optax.ctc_loss (per-sequence negative log-likelihood,
blank-interleaved label FSA with the repeated-label skip rule, right-
padded logits/labels); tests/test_pallas_ctc.py pins values and grads
against optax on random padded batches.

Parity anchor: the reference trains with torch.nn.CTCLoss
(masr/model_utils/loss/ctc.py) — same likelihood, same reduction
handled by the caller (models/losses.py CTCHead).

Layout notes: states are padded to the 128-lane tile (S = 2L+1 ≤ 128,
i.e. label length ≤ 63 — longer batches fall back to optax); the s-1 /
s-2 shifts are MXU matmuls with constant shift matrices (lane-shifting
via concat hits Mosaic relayout restrictions); -1e30 stands in for -inf
so (-inf) - (-inf) NaNs cannot arise.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG = -1.0e30
LANES = 128
BLOCK_B = 16
# tests flip this to exercise the kernel (interpret mode) on CPU
FORCE_ON_CPU = False


def supported(T, S, B):
    """Kernel applicability: states fit one lane tile, buffers fit VMEM."""
    if S > LANES:
        return False
    # (T, bb, LANES) f32 lp + alphas (+ gamma in bwd) per program
    if T * BLOCK_B * LANES * 4 * 3 > 12 * 1024 * 1024:
        return False
    return True


def _shift_mats(dtype=jnp.float32):
    r = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    m1 = (c == r + 1).astype(dtype)      # x @ m1 -> x[s-1]
    m2 = (c == r + 2).astype(dtype)      # x @ m2 -> x[s-2]
    return m1, m2


def _edge(n):
    """(1, LANES) additive mask: NEG on the first n lanes, 0 after."""
    s = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    return jnp.where(s < n, NEG, 0.0)


def _logaddexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))


def _recurse(alpha, skip, m1, m2):
    a1 = jax.lax.dot(alpha, m1, precision=jax.lax.Precision.HIGHEST) \
        + _edge(1)
    a2 = jax.lax.dot(alpha, m2, precision=jax.lax.Precision.HIGHEST) \
        + _edge(2) + skip
    return _logaddexp3(alpha, a1, a2)


def _fwd_kernel(lp_ref, skip_ref, tlen_ref, alphas_ref, *, T):
    """lp (T, bb, S) state log-probs; skip (bb, S) additive skip mask;
    tlen (bb, 1) valid frame counts. alphas (T, bb, S): alpha AFTER
    frame t (emission included), frozen past tlen."""
    m1, m2 = _shift_mats()
    skip = skip_ref[...]
    tlen = tlen_ref[...]
    init = lp_ref[0] + jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) < 2, 0.0, NEG)
    alphas_ref[0] = init

    def body(t, alpha):
        anew = _recurse(alpha, skip, m1, m2) + lp_ref[t]
        alpha = jnp.where(t < tlen, anew, alpha)
        alphas_ref[t] = alpha
        return alpha

    jax.lax.fori_loop(1, T, body, init)


def _bwd_kernel(lp_ref, skip_ref, tlen_ref, alphas_ref, term_ref, logz_ref,
                gamma_ref, *, T):
    """Beta recursion + occupancy. term (bb, S): 0 at the two terminal
    states, NEG elsewhere; logz (bb, 1). gamma (T, bb, S) = posterior
    state occupancies (exp), 0 in padded frames."""
    m1t, m2t = _shift_mats()
    # transposed shifts: beta[s] pulls from s+1 / s+2
    skip = skip_ref[...]
    tlen = tlen_ref[...]
    term = term_ref[...]
    logz = logz_ref[...]

    def store(t, beta):
        gamma_ref[t] = jnp.exp(
            jnp.clip(alphas_ref[t] + beta - logz, NEG, 0.0))

    # t = T-1: beta is terminal where tlen-1 == T-1, else "past the end"
    beta = jnp.where(tlen - 1 == T - 1, term, NEG)
    store(T - 1, beta)

    def body(i, beta):
        t = T - 2 - i
        # advance from t+1 to t: pull contributions that EMIT at t+1
        contrib = beta + lp_ref[t + 1]
        b1 = jax.lax.dot(contrib, m1t.T,
                         precision=jax.lax.Precision.HIGHEST) + _rev_edge(1)
        b2 = jax.lax.dot(contrib + skip, m2t.T,
                         precision=jax.lax.Precision.HIGHEST) + _rev_edge(2)
        bnew = _logaddexp3(contrib, b1, b2)
        beta = jnp.where(t == tlen - 1, term,
                         jnp.where(t < tlen - 1, bnew, NEG))
        store(t, beta)
        return beta

    jax.lax.fori_loop(0, T - 1, body, beta)


def _rev_edge(n):
    """(1, LANES) additive mask: NEG on the last n lanes, 0 before."""
    s = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    return jnp.where(s >= LANES - n, NEG, 0.0)


def _states(labels, label_lens, blank_id):
    """Blank-interleaved state sequence + masks. labels (B, L) int32."""
    B, L = labels.shape
    S = 2 * L + 1
    s = jnp.arange(S)
    lab_idx = jnp.maximum((s - 1) // 2, 0)
    lab = jnp.take_along_axis(labels, jnp.broadcast_to(lab_idx, (B, S)),
                              axis=1)
    states = jnp.where(s % 2 == 1, lab, blank_id)          # (B, S)
    prev = jnp.take_along_axis(
        labels, jnp.broadcast_to(jnp.maximum(lab_idx - 1, 0), (B, S)), axis=1)
    skip_ok = (s % 2 == 1) & (s >= 3) & (lab != prev)
    # states beyond 2*label_len are invalid -> NEG everywhere
    n_states = 2 * label_lens[:, None] + 1
    valid = s[None, :] < n_states
    return states, skip_ok, valid, n_states[:, 0], S


def ctc_loss_pallas(logits, logit_paddings, labels, label_paddings,
                    blank_id=0, interpret=False):
    """Drop-in for optax.ctc_loss (returns per-sequence NLL, shape (B,))."""
    labels = labels.astype(jnp.int32)
    label_lens = jnp.sum(1.0 - label_paddings, axis=1).astype(jnp.int32)
    logit_lens = jnp.sum(1.0 - logit_paddings, axis=1).astype(jnp.int32)
    return _ctc_core(logits.astype(jnp.float32), logit_lens, labels,
                     label_lens, blank_id, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _ctc_core(logits, logit_lens, labels, label_lens, blank_id, interpret):
    loss, _ = _ctc_fwd(logits, logit_lens, labels, label_lens, blank_id,
                       interpret)
    return loss


def _pad_states(x, S, fill):
    return jnp.pad(x, ((0, 0), (0, LANES - S)), constant_values=fill)


def _block_b(B):
    return BLOCK_B if B >= BLOCK_B else 8


def _padded_inputs(logits, logit_lens, labels, label_lens, blank_id):
    """Per-state log-probs and masks, batch-padded to the block size."""
    B, T, V = logits.shape
    states, skip_ok, valid, n_states, S = _states(labels, label_lens,
                                                  blank_id)
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(states, V, dtype=logp.dtype)    # (B, S, V)
    lp_states = jnp.einsum("btv,bsv->tbs", logp, onehot,    # (T, B, S)
                           precision=jax.lax.Precision.HIGHEST)
    lp_states = jnp.pad(lp_states, ((0, 0), (0, 0), (0, LANES - S)),
                        constant_values=NEG)
    skip = _pad_states(jnp.where(skip_ok & valid, 0.0, NEG), S, NEG)
    # invalid states (beyond this sample's label length) never fire
    lp_states = jnp.where(_pad_states(valid, S, False)[None], lp_states, NEG)
    bb = _block_b(B)
    Bp = ((B + bb - 1) // bb) * bb
    if Bp != B:
        lp_states = jnp.pad(lp_states, ((0, 0), (0, Bp - B), (0, 0)),
                            constant_values=NEG)
        skip = jnp.pad(skip, ((0, Bp - B), (0, 0)), constant_values=NEG)
    tlen = jnp.pad(logit_lens, (0, Bp - B), constant_values=1)[:, None]
    return lp_states, skip, tlen, states, n_states, S, bb, Bp


def _ctc_fwd(logits, logit_lens, labels, label_lens, blank_id, interpret):
    B, T, V = logits.shape
    lp_states, skip, tlen, _, n_states, S, bb, Bp = _padded_inputs(
        logits, logit_lens, labels, label_lens, blank_id)

    alphas = pl.pallas_call(
        functools.partial(_fwd_kernel, T=T),
        grid=(Bp // bb,),
        in_specs=[
            pl.BlockSpec((T, bb, LANES), lambda g: (0, g, 0)),
            pl.BlockSpec((bb, LANES), lambda g: (g, 0)),
            pl.BlockSpec((bb, 1), lambda g: (g, 0)),
        ],
        out_specs=pl.BlockSpec((T, bb, LANES), lambda g: (0, g, 0)),
        out_shape=jax.ShapeDtypeStruct((T, Bp, LANES), jnp.float32),
        interpret=interpret,
    )(lp_states, skip, tlen)

    # logZ from the frozen final alpha row
    last = alphas[-1, :B]                                    # (B, LANES)
    aS1 = jnp.take_along_axis(last, (n_states - 1)[:, None], axis=1)[:, 0]
    aS2 = jnp.take_along_axis(last, jnp.maximum(n_states - 2, 0)[:, None],
                              axis=1)[:, 0]
    aS2 = jnp.where(n_states >= 2, aS2, NEG)
    logz = jnp.logaddexp(aS1, aS2)
    loss = -logz
    res = (logits, logit_lens, labels, label_lens, alphas, lp_states, skip,
           logz)
    return loss, res


def _ctc_bwd(blank_id, interpret, res, g):
    (logits, logit_lens, labels, label_lens, alphas, lp_states, skip,
     logz) = res
    B, T, V = logits.shape
    states, skip_ok, valid, n_states, S = _states(labels, label_lens,
                                                  blank_id)
    bb = _block_b(B)
    Bp = alphas.shape[1]
    s_idx = jnp.arange(LANES)[None, :]
    term = jnp.where((s_idx == (n_states - 1)[:, None]) |
                     ((s_idx == (n_states - 2)[:, None]) &
                      (n_states >= 2)[:, None]), 0.0, NEG)
    term = jnp.pad(term, ((0, Bp - B), (0, 0)), constant_values=NEG)
    tlen = jnp.pad(logit_lens, (0, Bp - B), constant_values=1)[:, None]
    logz_p = jnp.pad(logz, (0, Bp - B))[:, None]

    gamma = pl.pallas_call(
        functools.partial(_bwd_kernel, T=T),
        grid=(Bp // bb,),
        in_specs=[
            pl.BlockSpec((T, bb, LANES), lambda g_: (0, g_, 0)),
            pl.BlockSpec((bb, LANES), lambda g_: (g_, 0)),
            pl.BlockSpec((bb, 1), lambda g_: (g_, 0)),
            pl.BlockSpec((T, bb, LANES), lambda g_: (0, g_, 0)),
            pl.BlockSpec((bb, LANES), lambda g_: (g_, 0)),
            pl.BlockSpec((bb, 1), lambda g_: (g_, 0)),
        ],
        out_specs=pl.BlockSpec((T, bb, LANES), lambda g_: (0, g_, 0)),
        out_shape=jax.ShapeDtypeStruct((T, Bp, LANES), jnp.float32),
        interpret=interpret,
    )(lp_states, skip, tlen, alphas, term, logz_p)

    gamma = jnp.transpose(gamma[:, :B, :S], (1, 0, 2))      # (B, T, S)
    occ = jnp.sum(gamma, axis=2, keepdims=True)             # (B, T, 1)
    onehot = jax.nn.one_hot(states, V, dtype=jnp.float32)
    scatter = jnp.einsum("bts,bsv->btv", gamma, onehot,
                         precision=jax.lax.Precision.HIGHEST)
    grad = jax.nn.softmax(logits, axis=-1) * occ - scatter
    grad = grad * g[:, None, None]
    return grad.astype(logits.dtype), None, None, None


_ctc_core.defvjp(_ctc_fwd, _ctc_bwd)


def ctc_loss(logits, logit_paddings, labels, label_paddings, blank_id=0):
    """Auto-routing CTC loss: the one-kernel Pallas path on TPU (or under
    FORCE_ON_CPU in tests), optax.ctc_loss otherwise. Multi-device runs
    shard_map the kernel over the registered active mesh (batch split
    across every axis — per-sequence losses are independent, no
    collectives); without a registered mesh multi-chip keeps optax,
    which GSPMD partitions freely (same routing discipline as the fused
    encoder layers, parallel/mesh.py)."""
    import optax
    B, T, _ = logits.shape
    S = 2 * labels.shape[1] + 1
    on_tpu = jax.default_backend() == "tpu"
    if (on_tpu or FORCE_ON_CPU) and supported(T, S, B):
        from masr_tpu.parallel.mesh import fused_route_mesh
        ok, mesh = fused_route_mesh(B)
        if ok and mesh is None:
            return ctc_loss_pallas(logits, logit_paddings, labels,
                                   label_paddings, blank_id,
                                   interpret=not on_tpu)
        if ok:
            from jax.sharding import PartitionSpec as P
            ax = tuple(mesh.axis_names)

            def shard_fn(lg, lp, lb, lbp):
                return ctc_loss_pallas(lg, lp, lb, lbp, blank_id,
                                       interpret=not on_tpu)

            return jax.shard_map(
                shard_fn, mesh=mesh, in_specs=(P(ax), P(ax), P(ax), P(ax)),
                out_specs=P(ax), check_vma=False,
            )(logits, logit_paddings, labels, label_paddings)
    return optax.ctc_loss(logits, logit_paddings, labels, label_paddings,
                          blank_id=blank_id)
