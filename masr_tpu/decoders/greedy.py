"""CTC greedy decoding (parity: masr/decoders/ctc_greedy_decoder.py).

Offline and batch variants take softmax probs; the chunk variant carries
per-stream state across calls and re-collapses the full prefix each step
(ctc_greedy_decoder.py:52-89). NOTE: the reference accidentally swaps its
two carry lists (probs appended to the index list and vice versa,
`:78-79`) so reported scores come from indices; we implement the *intended*
semantics (scores from probs) — transcripts are unaffected, only the
confidence number differs. Documented per SURVEY.md §2.11.

`argmax_decode_jax` is the on-device batched path: argmax + collapse are
pure XLA (no host loop), returning fixed-shape token/score buffers.
"""
import numpy as np

import jax
import jax.numpy as jnp


def _collapse(max_index, max_prob, vocab_list, blank_id=0):
    """Collapse repeats → drop blanks → map to text + mean prob score."""
    tokens, probs = [], []
    prev = -1
    for idx, p in zip(max_index, max_prob):
        if idx != prev and idx != blank_id:
            tokens.append(int(idx))
            probs.append(float(p))
        prev = idx
    text = "".join(" " if vocab_list[t] == "<space>" else vocab_list[t]
                   for t in tokens)
    score = float(np.mean(probs)) * 100 if probs else 0.0
    return score, text


def greedy_decoder(probs_seq, vocab_list, blank_id=0):
    """(T, V) softmax probs → (score, text) (ctc_greedy_decoder.py:6-31)."""
    probs_seq = np.asarray(probs_seq)
    max_index = probs_seq.argmax(axis=1)
    max_prob = probs_seq.max(axis=1)
    return _collapse(max_index, max_prob, vocab_list, blank_id)


def greedy_decoder_batch(probs_split, vocab_list, blank_id=0, lens=None):
    """List/array of per-utterance probs → list of (score, text)."""
    results = []
    for i, probs in enumerate(probs_split):
        p = np.asarray(probs)
        if lens is not None:
            p = p[: int(lens[i])]
        results.append(greedy_decoder(p, vocab_list, blank_id))
    return results


class GreedyChunkDecoder(object):
    """Stateful streaming greedy decode: accumulates per-chunk argmax and
    re-collapses the whole prefix each call (ctc_greedy_decoder.py:52-89,
    with the carry-list swap fixed — see module docstring)."""

    def __init__(self, vocab_list, blank_id=0):
        self.vocab_list = vocab_list
        self.blank_id = blank_id
        self.reset()

    def reset(self):
        self._max_index = []
        self._max_prob = []

    def decode_chunk(self, probs_chunk):
        """(T_chunk, V) softmax probs → (score, text) for the full prefix."""
        p = np.asarray(probs_chunk)
        return self.decode_chunk_ids(p.argmax(axis=1), p.max(axis=1))

    def decode_chunk_ids(self, ids, max_probs):
        """Advance the carry with PRE-COMPUTED per-frame (argmax id,
        max prob) — the device-fused greedy head
        (InferencePredictor.predict_chunk_greedy) reads back only these,
        never the (T, V) probs."""
        self._max_index.extend(np.asarray(ids).ravel().tolist())
        self._max_prob.extend(np.asarray(max_probs).ravel().tolist())
        return _collapse(self._max_index, self._max_prob, self.vocab_list,
                         self.blank_id)


def argmax_decode_jax(probs, lens, blank_id=0):
    """Batched on-device greedy: (B, T, V) probs + (B,) lens →
    (tokens (B, T) int32 padded with -1, token_count (B,), scores (B,)).

    Collapse/blank-removal via masked prefix-sum scatter — fully static
    shapes, no host loop; runs fused with the encoder under one jit.
    """
    B, T, V = probs.shape
    max_index = jnp.argmax(probs, axis=2)  # (B, T)
    max_prob = jnp.max(probs, axis=2)
    valid = jnp.arange(T)[None, :] < lens[:, None]
    prev = jnp.concatenate(
        [jnp.full((B, 1), -1, max_index.dtype), max_index[:, :-1]], axis=1)
    keep = (max_index != prev) & (max_index != blank_id) & valid
    # stable compaction: position of each kept token in the output
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    pos = jnp.where(keep, pos, T)  # dump discarded into an overflow slot
    tokens = jnp.full((B, T + 1), -1, jnp.int32)
    tokens = jax.vmap(lambda buf, p, v: buf.at[p].set(v))(
        tokens, pos, jnp.where(keep, max_index, -1).astype(jnp.int32))
    token_count = keep.sum(axis=1)
    prob_sum = jnp.where(keep, max_prob, 0.0).sum(axis=1)
    scores = jnp.where(token_count > 0,
                       prob_sum / jnp.maximum(token_count, 1) * 100.0, 0.0)
    return tokens[:, :T], token_count.astype(jnp.int32), scores
