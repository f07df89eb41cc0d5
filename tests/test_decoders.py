import numpy as np
import pytest

import jax.numpy as jnp

from masr_tpu.decoders.greedy import (GreedyChunkDecoder, argmax_decode_jax,
                                      greedy_decoder, greedy_decoder_batch)
from masr_tpu.decoders.beam_search import BeamSearchDecoder, _PyPrefixBeamSearch

VOCAB = ["<blank>", "<unk>", "a", "b", "c", "<space>", "<eos>"]


def _probs_from_ids(ids, V=len(VOCAB), peak=0.9):
    T = len(ids)
    p = np.full((T, V), (1 - peak) / (V - 1), np.float32)
    for t, i in enumerate(ids):
        p[t, i] = peak
    return p


def test_greedy_decoder_collapse():
    # a a blank b b c -> "abc"
    probs = _probs_from_ids([2, 2, 0, 3, 3, 4])
    score, text = greedy_decoder(probs, VOCAB)
    assert text == "abc"
    assert 80 < score <= 100


def test_greedy_space_mapping():
    probs = _probs_from_ids([2, 0, 5, 0, 3])
    _, text = greedy_decoder(probs, VOCAB)
    assert text == "a b"


def test_greedy_batch_with_lens():
    p1 = _probs_from_ids([2, 0, 3])
    p2 = _probs_from_ids([4, 4, 0, 0])
    batch = np.zeros((2, 4, len(VOCAB)), np.float32)
    batch[0, :3] = p1
    batch[0, 3] = _probs_from_ids([3])[0]  # past-length junk, must be ignored
    batch[1] = p2
    res = greedy_decoder_batch(batch, VOCAB, lens=[3, 4])
    assert res[0][1] == "ab"
    assert res[1][1] == "c"


def test_greedy_chunk_carry():
    dec = GreedyChunkDecoder(VOCAB)
    # chunk 1 ends with token 3; chunk 2 starts with 3 → must collapse across
    s1, t1 = dec.decode_chunk(_probs_from_ids([2, 3]))
    assert t1 == "ab"
    s2, t2 = dec.decode_chunk(_probs_from_ids([3, 4]))
    assert t2 == "abc"  # repeated b collapsed across the chunk boundary
    dec.reset()
    _, t3 = dec.decode_chunk(_probs_from_ids([4]))
    assert t3 == "c"


def test_argmax_decode_jax_matches_numpy():
    rs = np.random.RandomState(0)
    B, T, V = 3, 12, len(VOCAB)
    logits = rs.standard_normal((B, T, V)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    lens = np.array([12, 7, 1], np.int32)
    tokens, counts, scores = argmax_decode_jax(jnp.asarray(probs),
                                               jnp.asarray(lens))
    ref = greedy_decoder_batch(probs, VOCAB, lens=lens)
    for b in range(B):
        ids = [int(t) for t in np.asarray(tokens)[b][: int(counts[b])]]
        text = "".join(" " if VOCAB[i] == "<space>" else VOCAB[i] for i in ids)
        assert text == ref[b][1]
        assert abs(float(scores[b]) - ref[b][0]) < 1e-3


def test_beam_search_matches_greedy_on_peaked():
    # with sharply peaked probs and no LM, beam search == greedy transcript
    probs = _probs_from_ids([2, 2, 0, 3, 0, 4, 4], peak=0.97)
    dec = BeamSearchDecoder(VOCAB, beam_size=8)
    score, text = dec.decode_beam_search_offline(probs)
    assert text == greedy_decoder(probs, VOCAB)[1]


def test_beam_search_beats_greedy_on_ambiguous():
    """Classic CTC case: total prob of a label can exceed the greedy path."""
    # frame probs: blank .6/.4, 'a' .4/.6 -> greedy picks [blank,a] = "a"
    # but prefix "" (all blank) prob = .24 vs "a" = .4*.4+.4*.6+.6*.6=.76
    p = np.array([[0.6, 0.0, 0.4, 0.0, 0.0, 0.0, 0.0],
                  [0.4, 0.0, 0.6, 0.0, 0.0, 0.0, 0.0]], np.float32)
    dec = BeamSearchDecoder(VOCAB, beam_size=8)
    _, text = dec.decode_beam_search_offline(p)
    assert text == "a"


def test_beam_search_streaming_matches_offline():
    rs = np.random.RandomState(1)
    logits = rs.standard_normal((10, len(VOCAB))).astype(np.float32) * 2
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    dec = BeamSearchDecoder(VOCAB, beam_size=16)
    off_score, off_text = dec.decode_beam_search_offline(probs)
    dec2 = BeamSearchDecoder(VOCAB, beam_size=16)
    for i in range(0, 10, 3):
        score, text = dec2.decode_chunk(probs[i:i + 3])
    assert text == off_text
    assert abs(score - off_score) < 1e-6
    dec2.reset_state()


def test_beam_search_batch():
    probs = [_probs_from_ids([2, 0, 3]), _probs_from_ids([4])]
    dec = BeamSearchDecoder(VOCAB, beam_size=4)
    res = dec.decode_batch_beam_search_offline(probs)
    assert [t for _, t in res] == ["ab", "c"]


def test_arpa_scorer(tmp_path):
    arpa = """\\data\\
ngram 1=5
ngram 2=2

\\1-grams:
-1.0\t<s>\t-0.5
-1.0\t</s>
-2.0\t<unk>
-0.5\ta\t-0.3
-1.0\tb\t-0.2

\\2-grams:
-0.2\ta b
-0.9\tb a

\\end\\
"""
    p = tmp_path / "lm.arpa"
    p.write_text(arpa)
    from masr_tpu.decoders.scorer import ArpaLM, Scorer
    lm = ArpaLM(str(p))
    assert lm.order == 2
    assert abs(lm.log10_cond(["a"], "b") - (-0.2)) < 1e-6
    # backoff: P(b|b) = backoff(b) + P(b) = -0.2 + -1.0
    assert abs(lm.log10_cond(["b"], "b") - (-1.2)) < 1e-6
    sc = Scorer(alpha=2.0, beta=0.5, language_model_path=str(p))
    assert sc.is_character_based
    assert abs(sc.score_word(["a"], "b") - (2.0 * -0.2 + 0.5)) < 1e-6


def test_beam_search_with_lm_prefers_lm_sequence(tmp_path):
    arpa = """\\data\\
ngram 1=4
ngram 2=1

\\1-grams:
-5.0\t<unk>
-0.8\ta\t0.0
-0.8\tb\t0.0
-3.0\tc

\\2-grams:
-0.05\ta b

\\end\\
"""
    p = tmp_path / "lm.arpa"
    p.write_text(arpa)
    # acoustically ambiguous second token between 'b' (4) ... 'c'(slightly higher)
    probs = np.array([
        [0.05, 0.0, 0.9, 0.02, 0.03, 0.0, 0.0],   # 'a'
        [0.05, 0.0, 0.0, 0.44, 0.51, 0.0, 0.0],   # 'b' vs 'c' (c higher)
    ], np.float32)
    no_lm = BeamSearchDecoder(VOCAB, beam_size=8)
    _, t0 = no_lm.decode_beam_search_offline(probs)
    assert t0 == "ac"
    with_lm = BeamSearchDecoder(VOCAB, alpha=1.0, beta=0.0, beam_size=8,
                                language_model_path=str(p))
    _, t1 = with_lm.decode_beam_search_offline(probs)
    assert t1 == "ab"  # LM flips the ambiguous choice
