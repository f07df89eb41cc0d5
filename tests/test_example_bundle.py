"""The in-repo example bundle (examples/tiny_zh_synth): the model_tag
one-liner works offline, the bundle transcribes its own corpus exactly
(decode-regression golden), and streaming produces the same text."""
import os

import numpy as np
import pytest

from masr_tpu.infer.model_zoo import BUILTIN_MODELS, get_model_dir

BUNDLE = BUILTIN_MODELS["tiny_zh_synth"]

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(BUNDLE, "inference.json")),
    reason="example bundle not built (tools/make_example_bundle.py)")


@pytest.fixture(scope="module")
def predictor():
    from masr_tpu.infer.predictor import MASRPredictor
    return MASRPredictor(model_tag="tiny_zh_synth")


def _render(text, spk=0):
    from masr_tpu.audio.synth_tts import SyntheticTTS
    return SyntheticTTS(sample_rate=16000).render(text, spk_id=spk)


def test_model_tag_resolves_offline():
    d = get_model_dir("tiny_zh_synth")
    assert os.path.exists(os.path.join(d, "inference.json"))
    assert os.path.exists(os.path.join(d, "vocabulary.txt"))


def test_bundle_transcribes_corpus_sentence(predictor):
    """Held-out-style golden: a corpus sentence rendered by the same TTS
    must come back exactly (the bundle reached ~0 CER on this task)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from head_to_head import make_corpus
    train_s, test_s = make_corpus(240, 24)
    hits = 0
    for i, sent in enumerate(test_s[:3]):
        wav = _render(sent, spk=(240 + i) % 2)
        out = predictor.predict(wav)
        if out["text"] == sent:
            hits += 1
    assert hits >= 2, f"bundle decoded {hits}/3 held-out sentences"


def test_bundle_streaming_matches_offline(predictor):
    sent = "你好世界"
    wav = _render(sent, spk=0)
    offline = predictor.predict(wav)["text"]
    predictor.reset_stream()
    step = 3200
    result = None
    n = (len(wav) + step - 1) // step
    for i in range(n):
        piece = wav[i * step:(i + 1) * step]
        out = predictor.predict_stream(piece, is_end=(i == n - 1))
        if out is not None:
            result = out["text"]
    predictor.reset_stream()
    assert result == offline
