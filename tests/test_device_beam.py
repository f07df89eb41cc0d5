"""On-device batched CTC prefix beam search (SURVEY.md §2.16 north star)
must agree with the host Python prefix-beam engine — same pruning rules
(cutoff_prob=1.0, same top-K) → same best hypothesis and score."""
import numpy as np
import pytest

import jax.numpy as jnp

from masr_tpu.decoders.beam_search import _PyPrefixBeamSearch
from masr_tpu.decoders.device_beam import (ctc_beam_search_jax,
                                           decode_batch_device)

V = 12
VOCAB = ["<blank>"] + [chr(ord("a") + i) for i in range(V - 1)]


def _random_lattice(T, seed, peaky=False):
    rs = np.random.RandomState(seed)
    logits = rs.standard_normal((T, V)).astype(np.float32)
    if peaky:
        peaks = rs.randint(0, V, T)
        logits[np.arange(T), peaks] += 4.0
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def _py_decode(probs, beam, K):
    eng = _PyPrefixBeamSearch(VOCAB, beam_size=beam, cutoff_prob=1.0,
                              cutoff_top_n=K, blank_id=0)
    eng.step(probs)
    return eng.result()


@pytest.mark.parametrize("seed,peaky", [(0, False), (1, False), (2, True),
                                        (3, True), (4, False)])
def test_device_beam_matches_python_engine(seed, peaky):
    probs = _random_lattice(25, seed, peaky)
    score_py, text_py = _py_decode(probs, beam=8, K=6)
    results = decode_batch_device(probs[None], np.asarray([25]), VOCAB,
                                  beam_size=8, cutoff_top_n=6)
    score_dev, text_dev = results[0]
    assert text_dev == text_py, f"{text_dev!r} != {text_py!r}"
    np.testing.assert_allclose(score_dev, score_py, rtol=1e-4, atol=1e-4)


def test_device_beam_batched_equals_per_utterance():
    lattices = [_random_lattice(20, s, s % 2 == 0) for s in range(6)]
    T = 20
    probs = np.stack(lattices)
    lens = np.full(6, T)
    batched = decode_batch_device(probs, lens, VOCAB, beam_size=8,
                                  cutoff_top_n=6)
    for b in range(6):
        single = decode_batch_device(probs[b:b + 1], lens[b:b + 1], VOCAB,
                                     beam_size=8, cutoff_top_n=6)[0]
        assert batched[b][1] == single[1]
        np.testing.assert_allclose(batched[b][0], single[0], rtol=1e-4)


def test_device_beam_respects_lens():
    """Padded frames must not contribute: decoding T=15 with 10 pad
    frames == decoding the 15-frame lattice alone."""
    probs = _random_lattice(15, 7, peaky=True)
    padded = np.concatenate(
        [probs, np.tile(_random_lattice(10, 8), (1, 1))], axis=0)
    a = decode_batch_device(padded[None], np.asarray([15]), VOCAB,
                            beam_size=8, cutoff_top_n=6)[0]
    b = decode_batch_device(probs[None], np.asarray([15]), VOCAB,
                            beam_size=8, cutoff_top_n=6)[0]
    assert a[1] == b[1]
    np.testing.assert_allclose(a[0], b[0], rtol=1e-5)


def test_device_beam_nbest_ordering_and_uniqueness():
    probs = _random_lattice(25, 11)
    tokens, lengths, scores = ctc_beam_search_jax(
        jnp.asarray(probs[None]), jnp.asarray([25]), beam_size=8,
        cutoff_top_n=6)
    scores = np.asarray(scores)[0]
    assert (np.diff(scores) <= 1e-6).all()  # best-first
    # beams are distinct prefixes
    toks = np.asarray(tokens)[0]
    lens_ = np.asarray(lengths)[0]
    seen = set()
    for w in range(toks.shape[0]):
        if scores[w] < -1e8:
            continue
        key = tuple(toks[w, : lens_[w]])
        assert key not in seen, "duplicate prefix in beam"
        seen.add(key)
    # python n-best scores agree on the shared top hypotheses
    eng = _PyPrefixBeamSearch(VOCAB, beam_size=8, cutoff_prob=1.0,
                              cutoff_top_n=6, blank_id=0)
    eng.step(probs)
    py_nbest = eng.result_nbest(4)
    dev = {tuple(toks[w, : lens_[w]]): scores[w] for w in range(8)}
    for s, ids in py_nbest[:3]:
        assert tuple(ids) in dev
        np.testing.assert_allclose(dev[tuple(ids)], s, rtol=1e-4, atol=1e-4)


def test_device_beam_clear_sequence():
    """A clean peaked lattice decodes to its obvious transcript."""
    seq = [1, 1, 0, 2, 0, 3, 3, 0, 4]
    probs = np.full((len(seq), V), 0.001, np.float32)
    for t, s in enumerate(seq):
        probs[t, s] = 0.99
    probs /= probs.sum(axis=1, keepdims=True)
    (score, text), = decode_batch_device(probs[None],
                                         np.asarray([len(seq)]), VOCAB,
                                         beam_size=4, cutoff_top_n=4)
    assert text == "abcd"
