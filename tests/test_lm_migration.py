"""KenLM binary migration path (VERDICT r1 item 6): .klm files score
through the `kenlm` package at runtime (KenlmScorer), the offline tool
filters/validates ARPA, and LM fusion measurably lowers CER on an
ambiguous toy task."""
import os
import subprocess
import sys
import types

import numpy as np
import pytest

from masr_tpu.decoders.beam_search import BeamSearchDecoder
from masr_tpu.decoders.scorer import (KENLM_MAGIC, ArpaLM, KenlmScorer,
                                      Scorer, is_kenlm_binary)
from masr_tpu.utils.metrics import cer

ARPA = """\\data\\
ngram 1=6
ngram 2=4

\\1-grams:
-0.4\t你\t-0.3
-0.5\t好\t-0.3
-2.2\t天\t-0.3
-1.0\t气\t-0.3
-3.0\t<unk>
-0.4\t<s>\t-0.3

\\2-grams:
-0.05\t你 好
-2.6\t你 天
-0.4\t好 你
-0.5\t好 气

\\end\\
"""

VOCAB = ["<blank>", "你", "好", "天", "气"]


@pytest.fixture()
def arpa_path(tmp_path):
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA, encoding="utf-8")
    return str(p)


@pytest.fixture()
def fake_kenlm(arpa_path, monkeypatch):
    """A stand-in `kenlm` module whose Model scores with our ArpaLM —
    validates the KenlmScorer state-threading against known math."""
    lm = ArpaLM(arpa_path)

    class State:
        def __init__(self):
            self.ctx = ()

    class Model:
        def __init__(self, path):
            self.path = path
            self.order = lm.order

        def NullContextWrite(self, st):
            st.ctx = ()

        def BaseScore(self, st, word, out):
            lp = lm.log10_cond(list(st.ctx), word)
            out.ctx = (st.ctx + (word,))[-(self.order - 1):]
            return lp

        def __contains__(self, w):
            return (w,) in lm.ngrams

    mod = types.ModuleType("kenlm")
    mod.Model = Model
    mod.State = State
    monkeypatch.setitem(sys.modules, "kenlm", mod)
    return mod


@pytest.fixture()
def klm_path(tmp_path):
    """A file carrying the KenLM binary magic header."""
    p = tmp_path / "lm.klm"
    p.write_bytes(KENLM_MAGIC + b" 5\n\x00" + b"\x00" * 64)
    return str(p)


def test_is_kenlm_binary(klm_path, arpa_path):
    assert is_kenlm_binary(klm_path)
    assert not is_kenlm_binary(arpa_path)
    assert not is_kenlm_binary("/nonexistent/file")


def test_kenlm_scorer_matches_arpa_scorer(fake_kenlm, klm_path, arpa_path):
    """KenlmScorer (state threading through kenlm) == ARPA Scorer
    (explicit Katz backoff) for identical LMs — per-word fusion scores."""
    ks = KenlmScorer(2.2, 4.3, klm_path)
    ss = Scorer(2.2, 4.3, arpa_path)
    assert ks.is_character_based and ss.is_character_based
    for ctx, w in [([], "你"), (["你"], "好"), (["你"], "天"),
                   (["你", "好"], "你"), (["好"], "气"), ([], "气"),
                   (["天"], "好")]:
        np.testing.assert_allclose(ks.score_word(ctx, w),
                                   ss.score_word(ctx, w), rtol=1e-6)


def _ambiguous_probs():
    """Acoustics: clear 你, then 好-vs-天 ambiguous with a slight tilt
    toward the WRONG 天; the LM strongly prefers 你好."""
    V = len(VOCAB)
    T = 5
    probs = np.full((T, V), 0.01, np.float32)
    probs[0, 1] = 0.9    # 你
    probs[1, 0] = 0.9    # blank
    probs[2, 2] = 0.42   # 好
    probs[2, 3] = 0.50   # 天 (acoustically preferred, wrong)
    probs[3, 0] = 0.9
    probs[4, 0] = 0.9
    probs /= probs.sum(axis=1, keepdims=True)
    return probs


@pytest.mark.parametrize("use_native", [True, False])
def test_lm_fusion_lowers_cer(arpa_path, use_native):
    probs = _ambiguous_probs()
    truth = "你好"
    no_lm = BeamSearchDecoder(VOCAB, alpha=2.2, beta=0.0, beam_size=8,
                              cutoff_top_n=5, use_native=use_native)
    with_lm = BeamSearchDecoder(VOCAB, alpha=2.2, beta=0.0, beam_size=8,
                                cutoff_top_n=5, use_native=use_native,
                                language_model_path=arpa_path)
    _, text0 = no_lm.decode_beam_search_offline(probs)
    _, text1 = with_lm.decode_beam_search_offline(probs)
    assert cer(truth, text1) < cer(truth, text0), \
        f"LM fusion did not help: no-LM '{text0}' vs LM '{text1}'"
    assert text1 == truth


def test_beam_decoder_accepts_klm_via_kenlm(fake_kenlm, klm_path, arpa_path):
    """BeamSearchDecoder with a .klm path routes to KenlmScorer and
    produces the same decode as the ARPA python engine."""
    probs = _ambiguous_probs()
    d_klm = BeamSearchDecoder(VOCAB, alpha=2.2, beta=0.0, beam_size=8,
                              cutoff_top_n=5,
                              language_model_path=klm_path)
    assert isinstance(d_klm.scorer, KenlmScorer)
    d_arpa = BeamSearchDecoder(VOCAB, alpha=2.2, beta=0.0, beam_size=8,
                               cutoff_top_n=5, use_native=False,
                               language_model_path=arpa_path)
    s1, t1 = d_klm.decode_beam_search_offline(probs)
    s2, t2 = d_arpa.decode_beam_search_offline(probs)
    assert t1 == t2 == "你好"
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_beam_decoder_klm_without_kenlm_falls_back(klm_path, monkeypatch):
    """A corrupt/unreadable .klm (and no kenlm package) → warn and decode
    without LM (no crash) — the fixture's fake binary has a valid magic
    but no probing payload, so the in-repo reader rejects it too."""
    monkeypatch.setitem(sys.modules, "kenlm", None)  # force ImportError
    d = BeamSearchDecoder(VOCAB, beam_size=8, cutoff_top_n=5,
                          language_model_path=klm_path)
    assert d.scorer is None and d._native_scorer is None
    _, text = d.decode_beam_search_offline(_ambiguous_probs())
    assert isinstance(text, str)


def test_convert_lm_filter_and_validate(tmp_path, arpa_path):
    vocab_file = tmp_path / "vocabulary.txt"
    vocab_file.write_text("<blank>\t0\n你\t10\n好\t8\n<eos>\t0\n",
                          encoding="utf-8")
    out = tmp_path / "filtered.arpa"
    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "convert_lm.py")
    r = subprocess.run([sys.executable, tool, "--filter", arpa_path,
                        "--vocab", str(vocab_file), "--output", str(out)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    lm = ArpaLM(str(out))
    assert ("你",) in lm.ngrams and ("你", "好") in lm.ngrams
    assert ("天",) not in lm.ngrams and ("你", "天") not in lm.ngrams
    assert ("<unk>",) in lm.ngrams  # specials survive
    # validate mode parses it
    r2 = subprocess.run([sys.executable, tool, "--validate", str(out)],
                        capture_output=True, text=True)
    assert r2.returncode == 0 and "order 2" in r2.stdout


def test_convert_lm_to_trie(tmp_path, arpa_path):
    """--to-trie writes a TRIE .klm the in-repo reader scores == ARPA."""
    out = tmp_path / "lm_trie.klm"
    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "convert_lm.py")
    r = subprocess.run([sys.executable, tool, "--to-trie", arpa_path,
                        "--output", str(out)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert "wrote trie binary" in r.stdout
    from masr_tpu.decoders.klm_trie import TrieModel
    lm = ArpaLM(arpa_path)
    m = TrieModel(str(out))
    for sent in ("你 好", "好 你", "你 你 好"):
        words = sent.split()
        want = sum(lm.log10_cond(words[max(0, i - lm.order + 1):i], w)
                   for i, w in enumerate(words))
        assert abs(m.score(sent, bos=False, eos=False) - want) < 1e-4


def test_convert_lm_inspect(tmp_path, klm_path):
    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "convert_lm.py")
    r = subprocess.run([sys.executable, tool, "--inspect", klm_path],
                       capture_output=True, text=True)
    assert r.returncode == 0
    assert "KenLM binary" in r.stdout
    assert "klm_probing" in r.stdout or "in-repo reader" in r.stdout
