"""Fused streaming decode paths: the greedy head and the beam search run
INSIDE the encoder chunk program (InferencePredictor.predict_chunk_greedy
/ attach_stream_decoder) — only ids/hypotheses are read back, never the
(B, Tc, V) probs. These tests pin the pure decode functions to the
engines they replace."""
import jax.numpy as jnp
import numpy as np

from masr_tpu.decoders.device_beam import (ctc_beam_search_jax, init_state,
                                           make_stream_decode_fn)
from masr_tpu.decoders.greedy import GreedyChunkDecoder

V = 20
VOCAB = ["<blank>"] + [chr(ord("a") + i) for i in range(V - 2)] + ["<eos>"]


def _lattice(T, seed, peaky=True):
    rs = np.random.RandomState(seed)
    logits = rs.standard_normal((T, V)).astype(np.float32)
    if peaky:
        logits[np.arange(T), rs.randint(0, V, T)] += 4.0
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def test_greedy_ids_path_equals_probs_path():
    probs = _lattice(40, 0)
    a = GreedyChunkDecoder(VOCAB)
    b = GreedyChunkDecoder(VOCAB)
    for i in range(0, 40, 7):
        chunk = probs[i:i + 7]
        ra = a.decode_chunk(chunk)
        rb = b.decode_chunk_ids(chunk.argmax(axis=1), chunk.max(axis=1))
        assert ra == rb
    assert ra[1] != ""


def test_stream_decode_fn_matches_offline_beam():
    """decode_fn chunks (incl. a padded final chunk) == one-shot offline
    beam search, and the in-program best-selection returns the winner."""
    T, W, K = 23, 8, 6
    probs = _lattice(T, 13)
    toks, lens_, scores = ctc_beam_search_jax(
        jnp.asarray(probs[None]), jnp.asarray([T]), beam_size=W,
        cutoff_top_n=K)
    init_fn, decode_fn = make_stream_decode_fn(beam_size=W, cutoff_top_n=K,
                                               max_len=32)
    state = init_fn(1)
    for i in range(0, T, 5):
        chunk = probs[i:i + 5]
        valid = np.ones((1, chunk.shape[0]), bool)
        if chunk.shape[0] < 5:
            pad = 5 - chunk.shape[0]
            chunk = np.pad(chunk, ((0, pad), (0, 0)))
            valid = np.pad(valid, ((0, 0), (0, pad)))
        state, (btok, blen, bscore) = decode_fn(
            state, jnp.asarray(chunk[None]), jnp.asarray(valid))
    want = list(np.asarray(toks)[0, 0, : int(lens_[0, 0])])
    got = list(np.asarray(btok)[0, : int(blen[0])])
    assert got == want
    np.testing.assert_allclose(float(bscore[0]), float(scores[0, 0]),
                               rtol=1e-5)


def test_stream_decode_fn_all_invalid_keeps_state():
    """A window with zero valid frames advances the encoder but must
    leave the beam untouched (final partial windows)."""
    init_fn, decode_fn = make_stream_decode_fn(beam_size=4, cutoff_top_n=5,
                                               max_len=16)
    state = init_fn(1)
    probs = _lattice(5, 3)
    state, (t1, l1, s1) = decode_fn(state, jnp.asarray(probs[None]),
                                    jnp.ones((1, 5), bool))
    state2, (t2, l2, s2) = decode_fn(state, jnp.asarray(_lattice(5, 4)[None]),
                                     jnp.zeros((1, 5), bool))
    assert jnp.array_equal(t1, t2) and int(l1[0]) == int(l2[0])
    np.testing.assert_allclose(float(s1[0]), float(s2[0]), rtol=1e-6)
    for k in state:
        assert jnp.array_equal(state[k], state2[k]), k


def test_init_state_shape_contract():
    st = init_state(2, 4, 16)
    assert st["tokens"].shape == (2, 4, 16)
    assert "lm" not in st
    st_lm = init_state(2, 4, 16, lm_vocab=V)
    assert st_lm["lm"].shape == (2, 4) and st_lm["lm_last"].shape == (2, 4)
