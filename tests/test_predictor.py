import json
import os

import numpy as np
import pytest

import jax

from masr_tpu.infer.bundle import save_inference_bundle, load_inference_bundle

FEAT = 80
VOCAB_TOKENS = ["<blank>", "<unk>", "你", "好", "天", "气", "<space>", "<eos>"]


@pytest.fixture(scope="module")
def bundle_dir(tmp_path_factory):
    """Export a tiny random streaming conformer bundle."""
    import jax.numpy as jnp
    from masr_tpu.models.registry import build_model
    from masr_tpu.models.cmvn import GlobalCMVN
    out = tmp_path_factory.mktemp("bundle")
    enc_conf = dict(output_size=32, attention_heads=2, linear_units=64,
                    num_blocks=2, cnn_module_kernel=7)
    dec_conf = dict(linear_units=32, num_blocks=1, r_num_blocks=0)
    model_conf = dict(ctc_weight=0.5, lsm_weight=0.1)
    model = build_model("conformer", FEAT, len(VOCAB_TOKENS), streaming=True,
                        encoder_conf=enc_conf, decoder_conf=dec_conf,
                        model_conf=model_conf,
                        cmvn=GlobalCMVN(np.zeros(FEAT), np.ones(FEAT)))
    rng = jax.random.PRNGKey(0)
    speech = jnp.zeros((1, 67, FEAT))
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        speech, jnp.asarray([67]), jnp.zeros((1, 4), jnp.int32),
        jnp.asarray([4]), train=False)
    save_inference_bundle(
        str(out), "conformer", True, FEAT, VOCAB_TOKENS,
        np.zeros(FEAT), np.ones(FEAT), enc_conf, dec_conf, model_conf,
        {"feature_method": "fbank", "n_mels": FEAT}, variables)
    return str(out)


def test_bundle_roundtrip(bundle_dir):
    model, variables, meta, vocab = load_inference_bundle(bundle_dir)
    assert meta["use_model"] == "conformer"
    assert vocab == VOCAB_TOKENS
    assert "params" in variables


@pytest.fixture(scope="module")
def predictor(bundle_dir):
    from masr_tpu.infer.predictor import MASRPredictor
    return MASRPredictor(bundle_dir, decoder="ctc_greedy", warmup=False)


def test_predict_returns_result(predictor, test_wav_path):
    result = predictor.predict(test_wav_path)
    assert set(result) == {"text", "score"}
    assert isinstance(result["text"], str)


def test_predict_accepts_ndarray_and_bytes(predictor, test_wav_path):
    from masr_tpu.audio import AudioSegment
    seg = AudioSegment.from_file(test_wav_path)
    r1 = predictor.predict(seg.samples, sample_rate=seg.sample_rate)
    raw = open(test_wav_path, "rb").read()
    r2 = predictor.predict(raw)
    assert r1["text"] == r2["text"]


def test_predict_stream_and_chunking_consistency(predictor, test_wav_path):
    from masr_tpu.audio import AudioSegment
    seg = AudioSegment.from_file(test_wav_path)
    samples = seg.samples

    # feed in one shot
    r_one = predictor.predict_stream(samples, is_end=True,
                                     sample_rate=seg.sample_rate)
    predictor.reset_stream()

    # feed in 0.2 s pieces
    r_inc = None
    step = 3200
    for i in range(0, len(samples), step):
        is_end = i + step >= len(samples)
        out = predictor.predict_stream(samples[i:i + step], is_end=is_end,
                                       sample_rate=seg.sample_rate)
        if out is not None:
            r_inc = out
    predictor.reset_stream()
    assert r_one is not None and r_inc is not None
    assert r_one["text"] == r_inc["text"]


def test_attention_rescoring_decoder(bundle_dir, test_wav_path):
    from masr_tpu.infer.predictor import MASRPredictor
    p = MASRPredictor(bundle_dir, decoder="attention_rescoring",
                      decoder_configs={"beam_size": 8, "rescoring_nbest": 4},
                      warmup=False)
    result = p.predict(test_wav_path)
    assert set(result) == {"text", "score"}
    assert isinstance(result["text"], str)
    # the chosen hypothesis must be one of the CTC n-best
    import numpy as np
    from masr_tpu.audio import AudioSegment
    seg = AudioSegment.from_file(test_wav_path)
    feats = p._audio_featurizer.featurize(seg)
    enc, probs, lens = p.predictor.encode_for_rescoring(
        feats[None], np.asarray([feats.shape[0]]))
    nbest = p.beam_search_decoder.decode_nbest(probs[0][: int(lens[0])], 4)
    texts = {p._text_featurizer.detokenize(ids) for _, ids in nbest}
    assert result["text"] in texts


def test_streaming_two_pass_rescoring(bundle_dir, test_wav_path):
    """U2-style streaming: incremental beam partials, attention rescoring
    of the CTC n-best at utterance end over accumulated encoder states."""
    import numpy as np
    from masr_tpu.infer.predictor import MASRPredictor
    from masr_tpu.audio import AudioSegment
    p = MASRPredictor(bundle_dir, decoder="attention_rescoring",
                      decoder_configs={"beam_size": 8, "rescoring_nbest": 4},
                      warmup=False)
    seg = AudioSegment.from_file(test_wav_path)
    samples = seg.samples
    step = 3200
    final = None
    for i in range(0, len(samples), step):
        is_end = i + step >= len(samples)
        out = p.predict_stream(samples[i:i + step], is_end=is_end,
                               sample_rate=seg.sample_rate)
        if out is not None:
            final = out
    # final text must be one of the stream's CTC n-best prefixes
    nbest = p.beam_search_decoder.nbest_state(4)
    texts = {p._text_featurizer.detokenize(ids) for _, ids in nbest}
    p.reset_stream()
    assert final is not None
    assert final["text"] in texts


def test_predict_long_runs(predictor, test_wav_path):
    result = predictor.predict_long(test_wav_path)
    assert set(result) == {"text", "score"}


def test_reset_stream_isolates_utterances(predictor, test_wav_path):
    from masr_tpu.audio import AudioSegment
    seg = AudioSegment.from_file(test_wav_path)
    r1 = predictor.predict_stream(seg.samples, is_end=True,
                                  sample_rate=seg.sample_rate)
    predictor.reset_stream()
    r2 = predictor.predict_stream(seg.samples, is_end=True,
                                  sample_rate=seg.sample_rate)
    predictor.reset_stream()
    assert r1["text"] == r2["text"]


def test_vad_detects_speech_and_silence():
    from masr_tpu.infer.vad import VADPredictor
    rs = np.random.RandomState(0)
    sr = 16000
    silence = rs.standard_normal(sr) * 0.001
    t = np.arange(sr) / sr
    speech = (np.sin(2 * np.pi * 220 * t) + np.sin(2 * np.pi * 440 * t)) * 0.3 \
        * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))  # modulated tone ≈ voiced
    wav = np.concatenate([silence, speech, silence]).astype(np.float32)
    vad = VADPredictor()
    ts = vad.get_speech_timestamps(wav, sr)
    assert len(ts) >= 1
    s, e = ts[0]["start"], ts[-1]["end"]
    assert abs(s - sr) < sr * 0.25          # starts near 1.0 s
    assert abs(e - 2 * sr) < sr * 0.25      # ends near 2.0 s


def test_itn_numbers():
    from masr_tpu.infer.itn import SimpleInverseNormalizer
    itn = SimpleInverseNormalizer()
    assert itn.normalize("三百二十五") == "325"
    assert itn.normalize("一万零二十") == "10020"
    assert itn.normalize("三点一四") == "3.14"
    assert itn.normalize("你好") == "你好"


def test_predict_segments_batched_equals_sequential(predictor):
    """predict_long's batched segment decode (grouped predict_batch with
    group padding) must reproduce the per-segment predict() results in
    original order."""
    rs = np.random.RandomState(5)
    segs = [rs.standard_normal(int(n * 16000)).astype(np.float32) * 0.1
            for n in (0.9, 0.4, 1.3, 0.6, 1.1)]
    batched = predictor._predict_segments(segs, False, False, 16000,
                                          group=2)
    sequential = [predictor.predict(s, sample_rate=16000) for s in segs]
    assert [r["text"] for r in batched] == [r["text"] for r in sequential]
    for a, b in zip(batched, sequential):
        assert abs(a["score"] - b["score"]) < 1e-3


def test_fused_greedy_route_matches_probs_route(predictor, test_wav_path,
                                                monkeypatch):
    """Plain ctc_greedy predict/predict_batch ride the fused device head
    (argmax on device, ids readback). Pin them against the probs-readback
    route the other decoders use — same text, same score."""
    assert predictor._greedy_full_mode()
    rs = np.random.RandomState(11)
    wavs = [rs.standard_normal(int(n * 16000)).astype(np.float32) * 0.1
            for n in (0.8, 1.2)]
    fast_one = predictor.predict(test_wav_path)
    fast_bat = predictor.predict_batch(wavs, sample_rate=16000)
    monkeypatch.setattr(type(predictor), "_greedy_full_mode",
                        lambda self: False)
    slow_one = predictor.predict(test_wav_path)
    slow_bat = predictor.predict_batch(wavs, sample_rate=16000)
    assert fast_one["text"] == slow_one["text"]
    assert abs(fast_one["score"] - slow_one["score"]) < 1e-3
    assert [r["text"] for r in fast_bat] == [r["text"] for r in slow_bat]
    for a, b in zip(fast_bat, slow_bat):
        assert abs(a["score"] - b["score"]) < 1e-3
