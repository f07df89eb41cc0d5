"""Batched CTC prefix beam search ON DEVICE (XLA) — the north-star
decoder from SURVEY.md §2.16: where the reference decodes on the host
through a C++/SWIG extension per utterance, this runs the whole batch's
beam search as one compiled program (no D2H of the (B, T, V) probs, no
per-utterance host loop), so batch-serving decode scales with the chip.

Algorithm = the classic prefix beam search (same semantics as
masr_tpu.decoders.beam_search._PyPrefixBeamSearch without LM fusion),
vectorized:

 - beams hold (prefix tokens, p_blank, p_non_blank) per (batch, beam);
 - each frame proposes W stay-candidates + W·K extension candidates
   (K = cutoff_top_n tokens from a top-k);
 - equal prefixes among candidates MERGE (the step that makes it prefix
   — not path — search): prefixes are identified by a rolling pair of
   32-bit hashes, candidates are lex-sorted by (h1, h2) with lax.sort,
   and segment log-sum-exp runs in log2(C) Hillis–Steele doubling steps;
 - top-W survivors are selected and their token arrays updated in place.

Everything is fixed-shape; the per-frame state is a pytree, so the same
step serves offline decode (lax.scan) and stateful chunked streaming.
"""
import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

NEG = jnp.float32(-1e9)
# rolling-hash multipliers (odd → invertible mod 2^32, independent mixes)
_MULT1 = np.uint32(2654435761)
_MULT2 = np.uint32(40503)


def _logsumexp2(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG)
    return m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe))


def init_state(batch, beam_size, max_len, dtype=jnp.int32, lm_vocab=0):
    """Fresh beam state: beam 0 is the empty prefix, the rest are dead.
    lm_vocab > 0 adds LM-fusion state: accumulated shallow-fusion score
    and the last non-space token (row lm_vocab = empty context)."""
    W = beam_size
    state = {
        "tokens": jnp.full((batch, W, max_len), -1, dtype),
        "length": jnp.zeros((batch, W), jnp.int32),
        "last": jnp.full((batch, W), -1, jnp.int32),
        "h1": jnp.zeros((batch, W), jnp.uint32),
        "h2": jnp.zeros((batch, W), jnp.uint32),
        "p_b": jnp.concatenate(
            [jnp.zeros((batch, 1), jnp.float32),
             jnp.full((batch, W - 1), NEG, jnp.float32)], axis=1),
        "p_nb": jnp.full((batch, W), NEG, jnp.float32),
    }
    if lm_vocab:
        state["lm"] = jnp.zeros((batch, W), jnp.float32)
        state["lm_last"] = jnp.full((batch, W), lm_vocab, jnp.int32)
    return state


def _segment_logsumexp(sorted_h1, sorted_h2, sorted_val):
    """Merge log-values over runs of equal (h1, h2) in a sorted (B, C)
    array; → (merged values on the FIRST element of each run, run-start
    mask). Hillis–Steele doubling: log2(C) vectorized passes."""
    B, C = sorted_val.shape
    same_prev = jnp.concatenate(
        [jnp.zeros((B, 1), bool),
         (sorted_h1[:, 1:] == sorted_h1[:, :-1])
         & (sorted_h2[:, 1:] == sorted_h2[:, :-1])], axis=1)
    start = ~same_prev
    # run id per element = cumsum of starts (monotone within batch row)
    run_id = jnp.cumsum(start.astype(jnp.int32), axis=1)
    val = sorted_val
    shift = 1
    while shift < C:
        shifted = jnp.concatenate(
            [val[:, shift:], jnp.full((B, shift), NEG, val.dtype)], axis=1)
        shifted_run = jnp.concatenate(
            [run_id[:, shift:], jnp.full((B, shift), -1, run_id.dtype)],
            axis=1)
        take = shifted_run == run_id
        val = jnp.where(take, _logsumexp2(val, shifted), val)
        shift *= 2
    # after doubling, each element holds the sum over its run SUFFIX; the
    # run's first element therefore holds the full run total
    return jnp.where(start, val, NEG), start


def beam_step(state, logp_t, valid_t, beam_size, cutoff_top_n, blank_id,
              lm_table=None, alpha=0.0, beta=0.0, space_id=-1):
    """One frame of batched prefix beam search.

    state: see init_state; logp_t (B, V) log-probs; valid_t (B,) bool.
    lm_table: optional (V_lm+1, V) dense log10 P(tok|prev) with Katz
    backoff baked in (row V_lm = empty context) — shallow fusion
    alpha·log10P + beta per non-space token, matching the host engines'
    character-LM formula. → new state."""
    B, W, Lmax = state["tokens"].shape
    K = min(cutoff_top_n, logp_t.shape[1])
    C = W + W * K
    has_lm = lm_table is not None

    p_b, p_nb = state["p_b"], state["p_nb"]
    p_tot = _logsumexp2(p_b, p_nb)
    blank_lp = logp_t[:, blank_id][:, None]                      # (B, 1)
    last_tok = state["last"]
    last_lp = jnp.take_along_axis(
        logp_t, jnp.maximum(last_tok, 0), axis=1)                # (B, W)
    last_lp = jnp.where(last_tok >= 0, last_lp, NEG)

    topv, topi = lax.top_k(logp_t, K)                            # (B, K)

    # ---- candidates ------------------------------------------------- #
    # stay: same prefix — blank path + repeated-last path. The host
    # engine only credits these when blank/last survive its top-K token
    # cutoff (beam_search.py step loop); mirror that exactly.
    blank_in = jnp.any(topi == blank_id, axis=1)[:, None]        # (B, 1)
    last_in = jnp.any(topi[:, None, :] == last_tok[:, :, None],
                      axis=2)                                    # (B, W)
    stay_pb = jnp.where(blank_in, p_tot + blank_lp, NEG)         # (B, W)
    stay_pnb = jnp.where(last_in, p_nb + last_lp, NEG)
    # extend: prefix + tok (B, W, K)
    tok = jnp.broadcast_to(topi[:, None, :], (B, W, K))
    tok_lp = jnp.broadcast_to(topv[:, None, :], (B, W, K))
    is_repeat = tok == last_tok[:, :, None]
    base = jnp.where(is_repeat, p_b[:, :, None], p_tot[:, :, None])
    ext_pnb = base + tok_lp
    # blank extensions are not a new prefix — kill them (the stay
    # candidate already accounts for the blank path)
    ext_pnb = jnp.where(tok == blank_id, NEG, ext_pnb)
    ext_h1 = state["h1"][:, :, None] * _MULT1 + tok.astype(jnp.uint32) + 2
    ext_h2 = state["h2"][:, :, None] * _MULT2 + tok.astype(jnp.uint32) + 2

    # flatten: first W stays, then W*K extensions
    c_pb = jnp.concatenate([stay_pb, jnp.full((B, W * K), NEG)], axis=1)
    c_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(B, W * K)], axis=1)
    c_h1 = jnp.concatenate([state["h1"], ext_h1.reshape(B, W * K)], axis=1)
    c_h2 = jnp.concatenate([state["h2"], ext_h2.reshape(B, W * K)], axis=1)
    c_parent = jnp.concatenate(
        [jnp.broadcast_to(jnp.arange(W)[None], (B, W)),
         jnp.broadcast_to(jnp.repeat(jnp.arange(W), K)[None], (B, W * K))],
        axis=1).astype(jnp.int32)
    c_tok = jnp.concatenate(
        [jnp.full((B, W), -1, jnp.int32), tok.reshape(B, W * K)], axis=1)
    if has_lm:
        lm_par, lm_last = state["lm"], state["lm_last"]
        cond = lm_table[lm_last[:, :, None], tok]            # (B, W, K)
        is_space = tok == space_id
        ext_lm = lm_par[:, :, None] + jnp.where(
            is_space, 0.0, alpha * cond + beta)
        ext_lm_last = jnp.where(is_space, lm_last[:, :, None], tok)
        c_lm = jnp.concatenate([lm_par, ext_lm.reshape(B, W * K)], axis=1)
        c_lm_last = jnp.concatenate(
            [lm_last, ext_lm_last.reshape(B, W * K)], axis=1)
    else:
        c_lm = jnp.zeros((B, C), jnp.float32)
        c_lm_last = jnp.zeros((B, C), jnp.int32)
    # dead parents propose nothing
    parent_alive = _logsumexp2(p_b, p_nb) > NEG / 2               # (B, W)
    c_alive = jnp.take_along_axis(parent_alive, c_parent, axis=1)
    c_pb = jnp.where(c_alive, c_pb, NEG)
    c_pnb = jnp.where(c_alive, c_pnb, NEG)
    # break hash ties of dead candidates so they can't merge with live
    c_h1 = jnp.where(c_alive, c_h1,
                     jnp.arange(C, dtype=jnp.uint32)[None]
                     + np.uint32(0x80000000))

    # ---- merge equal prefixes --------------------------------------- #
    (s_h1, s_h2, s_pb, s_pnb, s_parent, s_tok, s_lm, s_lm_last) = lax.sort(
        (c_h1, c_h2, c_pb, c_pnb, c_parent, c_tok, c_lm, c_lm_last),
        num_keys=2, dimension=1, is_stable=True)
    m_pb, start = _segment_logsumexp(s_h1, s_h2, s_pb)
    m_pnb, _ = _segment_logsumexp(s_h1, s_h2, s_pnb)
    # lm is a pure function of the prefix → equal within a segment
    total = jnp.where(start, _logsumexp2(m_pb, m_pnb) + s_lm, NEG)

    # ---- select top-W ------------------------------------------------ #
    sel_total, sel_idx = lax.top_k(total, W)                      # (B, W)
    def pick(x):
        return jnp.take_along_axis(x, sel_idx, axis=1)
    n_pb = pick(m_pb)
    n_pnb = pick(m_pnb)
    n_parent = pick(s_parent)
    n_tok = pick(s_tok)
    n_h1 = pick(s_h1)
    n_h2 = pick(s_h2)
    n_lm = pick(s_lm)
    n_lm_last = pick(s_lm_last)

    # rebuild token arrays: gather parent prefixes, append tok if any
    parent_tokens = jnp.take_along_axis(
        state["tokens"], n_parent[:, :, None], axis=1)            # (B,W,L)
    parent_len = jnp.take_along_axis(state["length"], n_parent, axis=1)
    parent_last = jnp.take_along_axis(state["last"], n_parent, axis=1)
    is_ext = n_tok >= 0
    pos = jnp.minimum(parent_len, Lmax - 1)
    onehot = (jnp.arange(Lmax)[None, None, :] == pos[:, :, None]) \
        & is_ext[:, :, None]
    n_tokens = jnp.where(onehot, n_tok[:, :, None], parent_tokens)
    n_length = parent_len + is_ext.astype(jnp.int32)
    n_last = jnp.where(is_ext, n_tok, parent_last)

    dead = sel_total < NEG / 2
    n_pb = jnp.where(dead, NEG, n_pb)
    n_pnb = jnp.where(dead, NEG, n_pnb)

    new_state = {"tokens": n_tokens, "length": n_length, "last": n_last,
                 "h1": n_h1, "h2": n_h2, "p_b": n_pb, "p_nb": n_pnb}
    if has_lm:
        new_state["lm"] = n_lm
        new_state["lm_last"] = n_lm_last
    # padded frames keep the old state
    keep = valid_t[:, None]
    merged = jax.tree.map(
        lambda new, old: jnp.where(
            keep.reshape((B, 1) + (1,) * (new.ndim - 2)) if new.ndim > 2
            else keep, new, old),
        new_state, state)
    return merged


@functools.partial(jax.jit, static_argnames=("beam_size", "cutoff_top_n",
                                             "blank_id", "max_len",
                                             "space_id"))
def ctc_beam_search_jax(probs, lens, beam_size=10, cutoff_top_n=40,
                        blank_id=0, max_len=None, lm_table=None,
                        alpha=2.2, beta=4.3, space_id=-1):
    """Batched on-device CTC prefix beam search, optional shallow LM
    fusion (lm_table from `build_dense_bigram` — a character n-gram
    collapsed to dense bigram conditionals with backoff).

    probs: (B, T, V) softmax; lens: (B,) valid frames.
    → (tokens (B, W, Lmax) padded -1, lengths (B, W), scores (B, W)) —
    beams sorted best-first; scores include the fusion term."""
    B, T, V = probs.shape
    Lmax = max_len if max_len is not None else T
    logp = jnp.log(jnp.maximum(probs.astype(jnp.float32), 1e-20))
    state = init_state(B, beam_size, Lmax,
                       lm_vocab=V if lm_table is not None else 0)
    valid = jnp.arange(T)[None, :] < lens[:, None]

    def body(st, x):
        lp_t, v_t = x
        return beam_step(st, lp_t, v_t, beam_size, cutoff_top_n, blank_id,
                         lm_table=lm_table, alpha=alpha, beta=beta,
                         space_id=space_id), None

    state, _ = lax.scan(body, state,
                        (jnp.moveaxis(logp, 1, 0), jnp.moveaxis(valid, 1, 0)))
    scores = _logsumexp2(state["p_b"], state["p_nb"])
    if lm_table is not None:
        scores = scores + state["lm"]
    order = jnp.argsort(-scores, axis=1)
    return (jnp.take_along_axis(state["tokens"], order[:, :, None], axis=1),
            jnp.take_along_axis(state["length"], order, axis=1),
            jnp.take_along_axis(scores, order, axis=1))


def build_dense_bigram(language_model_path, vocab_list,
                       space_token="<space>", cache=True):
    """ARPA character LM → dense (V+1, V) float32 table of
    log10 P(tok | prev) with Katz backoff baked in; row V is the
    empty/BOS context. Host-side one-time precompute (O(V²) backoff
    lookups — minutes for a 4k-char vocab, so the result is cached next
    to the ARPA keyed by a vocab fingerprint); ship the result to the
    device for fused beam search."""
    from masr_tpu.decoders.scorer import ArpaLM
    V = len(vocab_list)
    cache_path = None
    if cache:
        import hashlib
        fp = hashlib.sha1(("\x00".join(vocab_list)).encode()).hexdigest()[:12]
        cache_path = f"{language_model_path}.bigram.{V}.{fp}.npz"
        if os.path.exists(cache_path) and \
                os.path.getmtime(cache_path) >= \
                os.path.getmtime(language_model_path):
            return np.load(cache_path)["table"]
    lm = ArpaLM(language_model_path)
    chars = [" " if t == space_token else t for t in vocab_list]
    table = np.zeros((V + 1, V), np.float32)
    for prev in range(V + 1):
        ctx = [] if prev == V else [chars[prev]]
        row = table[prev]
        for t in range(V):
            row[t] = lm.log10_cond(ctx, chars[t])
    if cache_path:
        try:
            np.savez_compressed(cache_path, table=table)
        except OSError:
            pass
    return table


def make_stream_decode_fn(beam_size=10, cutoff_top_n=40, blank_id=0,
                          lm_table=None, alpha=2.2, beta=4.3, space_id=-1,
                          max_len=4096):
    """→ (init_fn, decode_fn): the streaming beam as PURE functions, so a
    caller can fuse decoding into the SAME compiled program as the
    encoder chunk step (InferencePredictor.attach_stream_decoder) —
    samples → fbank → encoder → beam search → best hypothesis in ONE
    device dispatch per chunk, nothing but the winning token ids read
    back (the north-star fusion beyond DeviceBeamStream's separate
    program).

    init_fn(batch) → fresh decode state pytree.
    decode_fn(state, probs_chunk (B,Tc,V), frame_valid (B,Tc) bool) →
    (state, (tokens (B, max_len) int32 −1-padded, lengths (B,),
    scores (B,))) — the best beam per slot; padded frames leave state
    untouched, so one program serves every chunk including the final
    partial one."""
    lm = jnp.asarray(lm_table) if lm_table is not None else None

    def init_fn(batch):
        return init_state(batch, beam_size, max_len,
                          lm_vocab=lm.shape[1] if lm is not None else 0)

    def decode_fn(state, probs_chunk, frame_valid):
        logp = jnp.log(jnp.maximum(probs_chunk.astype(jnp.float32), 1e-20))

        def body(st, x):
            lp_t, v_t = x
            return beam_step(st, lp_t, v_t, beam_size, cutoff_top_n,
                             blank_id, lm_table=lm, alpha=alpha, beta=beta,
                             space_id=space_id), None

        state, _ = lax.scan(body, state,
                            (jnp.moveaxis(logp, 1, 0),
                             jnp.moveaxis(frame_valid, 1, 0)))
        total = _logsumexp2(state["p_b"], state["p_nb"])
        if "lm" in state:
            total = total + state["lm"]
        w = jnp.argmax(total, axis=1)                            # (B,)
        B, _, L = state["tokens"].shape
        tokens = jnp.take_along_axis(
            state["tokens"],
            jnp.broadcast_to(w[:, None, None], (B, 1, L)), axis=1)[:, 0]
        lengths = jnp.take_along_axis(state["length"], w[:, None],
                                      axis=1)[:, 0]
        scores = jnp.take_along_axis(total, w[:, None], axis=1)[:, 0]
        return state, (tokens, lengths, scores)

    return init_fn, decode_fn


class DeviceBeamStream(object):
    """Stateful CHUNKED device beam search for batched streaming serving:
    N slots advance together in one compiled step; inactive slots pass
    `active=False` and keep their state (the same masking the batched
    encoder step uses, masr_tpu/infer/batch_stream.py)."""

    def __init__(self, batch, beam_size=10, cutoff_top_n=40, blank_id=0,
                 max_len=512, lm_table=None, alpha=2.2, beta=4.3,
                 space_id=-1):
        self.batch = batch
        self.beam_size = beam_size
        self.max_len = max_len
        self._lm = jnp.asarray(lm_table) if lm_table is not None else None
        self._fresh = init_state(
            batch, beam_size, max_len,
            lm_vocab=lm_table.shape[1] if lm_table is not None else 0)
        self.state = self._fresh

        def feed(state, probs_chunk, frame_valid):
            logp = jnp.log(jnp.maximum(probs_chunk.astype(jnp.float32),
                                       1e-20))

            def body(st, x):
                lp_t, v_t = x
                return beam_step(st, lp_t, v_t, beam_size, cutoff_top_n,
                                 blank_id, lm_table=self._lm, alpha=alpha,
                                 beta=beta, space_id=space_id), None

            state, _ = lax.scan(
                body, state, (jnp.moveaxis(logp, 1, 0),
                              jnp.moveaxis(frame_valid, 1, 0)))
            return state

        self._feed = jax.jit(feed)

        def reset(state, fresh, mask):
            return jax.tree.map(
                lambda s, f: jnp.where(
                    mask.reshape((batch,) + (1,) * (s.ndim - 1)), f, s),
                state, fresh)

        self._reset = jax.jit(reset)

    def feed(self, probs_chunk, frame_valid=None):
        """probs_chunk (B, Tc, V) softmax; frame_valid (B, Tc) bool marks
        real frames per slot (None = all valid) — inactive slots/padded
        frames leave their beam state untouched."""
        probs_chunk = np.asarray(probs_chunk)
        if frame_valid is None:
            frame_valid = np.ones(probs_chunk.shape[:2], bool)
        self.state = self._feed(self.state, jnp.asarray(probs_chunk),
                                jnp.asarray(frame_valid))

    def reset_slots(self, slots):
        mask = np.zeros((self.batch,), bool)
        mask[list(slots)] = True
        self.state = self._reset(self.state, self._fresh, jnp.asarray(mask))

    def best(self, slot=None):
        """→ (token_ids list, score) for one slot, or lists for all."""
        total = _logsumexp2(self.state["p_b"], self.state["p_nb"])
        if "lm" in self.state:
            total = total + self.state["lm"]
        scores = np.asarray(total)
        tokens = np.asarray(self.state["tokens"])
        lengths = np.asarray(self.state["length"])
        best_w = scores.argmax(axis=1)
        out = []
        for b in range(self.batch):
            w = best_w[b]
            out.append((list(tokens[b, w, : lengths[b, w]]),
                        float(scores[b, w])))
        return out[slot] if slot is not None else out


def decode_batch_device(probs, lens, vocab_list, beam_size=10,
                        cutoff_top_n=40, blank_id=0, space_token="<space>",
                        lm_table=None, alpha=2.2, beta=4.3):
    """Convenience host wrapper: → [(score, text)] best hypothesis per
    utterance (same result contract as BeamSearchDecoder's batch API).
    lm_table (from build_dense_bigram) enables on-device shallow fusion."""
    space_id = vocab_list.index(space_token) if space_token in vocab_list \
        else -1
    tokens, lengths, scores = ctc_beam_search_jax(
        jnp.asarray(probs), jnp.asarray(lens, jnp.int32),
        beam_size=beam_size, cutoff_top_n=cutoff_top_n, blank_id=blank_id,
        lm_table=jnp.asarray(lm_table) if lm_table is not None else None,
        alpha=alpha, beta=beta, space_id=space_id)
    tokens = np.asarray(tokens)
    lengths = np.asarray(lengths)
    scores = np.asarray(scores)
    out = []
    for b in range(tokens.shape[0]):
        ids = tokens[b, 0, : lengths[b, 0]]
        text = "".join(" " if vocab_list[i] == space_token else vocab_list[i]
                       for i in ids)
        out.append((float(scores[b, 0]), text))
    return out
