"""Hotword / contextual biasing in beam search (beyond the reference —
the WeNet-style mechanism): registered phrases get a per-token boost
while matching, rolled back when the match dies."""
import numpy as np
import pytest

from masr_tpu.decoders.beam_search import BeamSearchDecoder
from masr_tpu.decoders.scorer import HotwordScorer

VOCAB = ["<blank>", "你", "好", "天", "气", "小", "明"]


# --------------------------------------------------------------------- #
# scorer math
# --------------------------------------------------------------------- #
def _score_text(hs, text):
    total = 0.0
    ctx = []
    for c in text:
        total += hs.delta(ctx, c)
        ctx.append(c)
    return total


def test_full_match_banks_full_worth():
    hs = HotwordScorer(["小明"], boost=2.0, match_bonus=1.0)
    # 小 → +2 (depth 1); 明 completes: rollback −2, then +2·2+1
    assert _score_text(hs, "小明") == pytest.approx(2.0 * 2 + 1.0)


def test_partial_match_rolls_back():
    hs = HotwordScorer(["小明天"], boost=2.0)
    # 小明 holds 2 tokens of depth; 气 kills the match → net 0
    assert _score_text(hs, "小明") == pytest.approx(4.0)
    assert _score_text(hs, "小明气") == pytest.approx(0.0)


def test_match_restarts_mid_string():
    hs = HotwordScorer(["小明"], boost=2.0, match_bonus=0.0)
    assert _score_text(hs, "你小明") == pytest.approx(4.0)
    # dead match then a fresh one
    assert _score_text(hs, "小气小明") == pytest.approx(4.0)


def test_no_hotwords_is_zero():
    hs = HotwordScorer([], boost=5.0)
    assert _score_text(hs, "你好") == 0.0


# --------------------------------------------------------------------- #
# decoder integration
# --------------------------------------------------------------------- #
def _ambiguous_probs():
    """你 then an ambiguous token tilted toward 天, then 气 clear —
    acoustics alone read 你天气; the hotword 你好 flips token 2."""
    V = len(VOCAB)
    # realistic softmax floor: junk tokens are ~-14 nats, so a sane boost
    # cannot hallucinate phrases out of silence
    probs = np.full((6, V), 1e-6, np.float32)
    probs[0, 1] = 0.9    # 你
    probs[1, 0] = 0.9
    probs[2, 2] = 0.40   # 好
    probs[2, 3] = 0.52   # 天 (acoustically preferred)
    probs[3, 0] = 0.9
    probs[4, 4] = 0.9    # 气
    probs[5, 0] = 0.9
    probs /= probs.sum(axis=1, keepdims=True)
    return probs


def test_hotword_flips_ambiguous_decode():
    probs = _ambiguous_probs()
    plain = BeamSearchDecoder(VOCAB, beam_size=8, cutoff_top_n=6)
    _, base = plain.decode_beam_search_offline(probs)
    assert base == "你天气"
    boosted = BeamSearchDecoder(VOCAB, beam_size=8, cutoff_top_n=6,
                                hotwords=["你好"], hotword_score=3.0)
    assert boosted.hotword_scorer is not None
    _, text = boosted.decode_beam_search_offline(probs)
    assert text == "你好气", text


def test_irrelevant_hotword_does_not_change_decode():
    probs = _ambiguous_probs()
    boosted = BeamSearchDecoder(VOCAB, beam_size=8, cutoff_top_n=6,
                                hotwords=["小明"], hotword_score=3.0)
    _, text = boosted.decode_beam_search_offline(probs)
    assert text == "你天气"


def test_partial_hotword_rolls_back_in_decode():
    """A hotword whose tail never appears must not distort the result."""
    probs = _ambiguous_probs()
    boosted = BeamSearchDecoder(VOCAB, beam_size=8, cutoff_top_n=6,
                                hotwords=["你天明"], hotword_score=3.0)
    _, text = boosted.decode_beam_search_offline(probs)
    assert text == "你天气"  # 你天 boost rolled back when 气 arrives


def test_hotwords_streaming_chunks():
    probs = _ambiguous_probs()
    boosted = BeamSearchDecoder(VOCAB, beam_size=8, cutoff_top_n=6,
                                hotwords=["你好"], hotword_score=3.0)
    for i in range(0, len(probs), 2):
        score, text = boosted.decode_chunk(probs[i:i + 2])
    boosted.reset_state()
    assert text == "你好气"


def test_hotwords_compose_with_lm(tmp_path):
    """Hotword boosts and ARPA LM fusion stack in the Python engine."""
    arpa = ("\\data\\\nngram 1=5\n\n\\1-grams:\n"
            "-0.4\t你\n-0.5\t好\n-0.9\t天\n-0.9\t气\n-3.0\t<unk>\n\n\\end\\\n")
    p = tmp_path / "lm.arpa"
    p.write_text(arpa, encoding="utf-8")
    probs = _ambiguous_probs()
    lm_only = BeamSearchDecoder(VOCAB, alpha=0.3, beta=0.0, beam_size=8,
                                cutoff_top_n=6, use_native=False,
                                language_model_path=str(p))
    _, t0 = lm_only.decode_beam_search_offline(probs)
    both = BeamSearchDecoder(VOCAB, alpha=0.3, beta=0.0, beam_size=8,
                             cutoff_top_n=6, use_native=False,
                             language_model_path=str(p),
                             hotwords=["你好"], hotword_score=3.0)
    assert both.scorer is not None and both.hotword_scorer is not None
    _, t1 = both.decode_beam_search_offline(probs)
    assert t0 == "你天气"   # weak LM alone doesn't flip it
    assert t1 == "你好气"   # hotword on top does
