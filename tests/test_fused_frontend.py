"""Fused on-device streaming frontend (VERDICT r1 item 5): the chunk step
that takes RAW SAMPLES and computes fbank + encoder in one compiled
program must numerically match the host path (numpy fbank → feature
window → chunk step)."""
import numpy as np
import pytest

import jax

FEAT = 80
VOCAB = ["<blank>", "<unk>", "你", "好", "天", "气", "<space>", "<eos>"]
SR = 16000


@pytest.fixture(scope="module")
def bundle_dir(tmp_path_factory):
    import jax.numpy as jnp
    from masr_tpu.infer.bundle import save_inference_bundle
    from masr_tpu.models.registry import build_model
    from masr_tpu.models.cmvn import GlobalCMVN
    out = tmp_path_factory.mktemp("fused_bundle")
    enc = dict(output_size=32, attention_heads=2, linear_units=64,
               num_blocks=2, cnn_module_kernel=7)
    dec = dict(linear_units=32, num_blocks=1, r_num_blocks=0)
    mc = dict(ctc_weight=0.5, lsm_weight=0.1)
    model = build_model("conformer", FEAT, len(VOCAB), streaming=True,
                        encoder_conf=enc, decoder_conf=dec, model_conf=mc,
                        cmvn=GlobalCMVN(np.zeros(FEAT), np.ones(FEAT)))
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        jnp.zeros((1, 67, FEAT)), jnp.asarray([67]),
        jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]), train=False)
    # use_dB_normalization off → fused and host paths are exactly
    # equivalent (with it on, gain cadence differs; see design deviations)
    save_inference_bundle(
        str(out), "conformer", True, FEAT, VOCAB, np.zeros(FEAT),
        np.ones(FEAT), enc, dec, mc,
        {"feature_method": "fbank", "n_mels": FEAT,
         "use_dB_normalization": False}, variables)
    return str(out)


def _speech(n, seed=0):
    rs = np.random.RandomState(seed)
    t = np.arange(n) / SR
    f0 = 140 + 30 * np.sin(2 * np.pi * 2.5 * t)
    phase = np.cumsum(2 * np.pi * f0 / SR)
    sig = sum((0.3 / k) * np.sin(k * phase) for k in range(1, 4))
    return (sig + 0.01 * rs.standard_normal(n)).astype(np.float32)


def test_fused_chunk_matches_host_chunk(bundle_dir):
    """One 67-frame window: predict_chunk_samples(raw samples) ==
    host fbank → predict_chunk(features), fresh streaming state both."""
    from masr_tpu.infer.inference_model import InferencePredictor
    from masr_tpu.ops.fbank import fbank_numpy
    hop, wlen = 160, 400
    window_samples = 66 * hop + wlen
    wav = _speech(window_samples)

    p1 = InferencePredictor(model_dir=bundle_dir)
    i16 = np.clip(wav * 32768.0, -32768, 32767).astype(np.int16)
    feats = fbank_numpy(i16.astype(np.float32), num_mel_bins=FEAT,
                        sample_rate=SR)
    assert feats.shape[0] == 67
    probs_host = p1.predict_chunk(feats[None])

    p2 = InferencePredictor(model_dir=bundle_dir)
    probs_fused = p2.predict_chunk_samples(wav[None])
    np.testing.assert_allclose(probs_fused, probs_host, atol=2e-3, rtol=1e-3)


def test_fused_stream_equals_host_stream(bundle_dir):
    """Full predict_stream: fused vs host path give the same text and
    scores on identical audio, fed in 0.25 s pieces (dB norm off →
    bitwise-equivalent features up to f32 rounding)."""
    from masr_tpu.infer.predictor import MASRPredictor
    wav = _speech(int(2.37 * SR))  # odd length → partial final window
    pf = MASRPredictor(bundle_dir, decoder="ctc_greedy", warmup=False,
                       fused_frontend=True)
    ph = MASRPredictor(bundle_dir, decoder="ctc_greedy", warmup=False,
                       fused_frontend=False)
    assert pf.fused_frontend and not ph.fused_frontend

    step = SR // 4
    rf = rh = None
    for i in range(0, len(wav), step):
        end = i + step >= len(wav)
        a = pf.predict_stream(wav[i:i + step], is_end=end, sample_rate=SR)
        b = ph.predict_stream(wav[i:i + step], is_end=end, sample_rate=SR)
        assert (a is None) == (b is None)
        if a is not None:
            rf, rh = a, b
            assert a["text"] == b["text"]
    pf.reset_stream()
    ph.reset_stream()
    assert rf is not None and rf["text"] == rh["text"]
    if rf["score"] is not None and rh["score"] is not None:
        assert abs(rf["score"] - rh["score"]) < 1e-2


def test_fused_stream_chunking_invariance(bundle_dir):
    """Fused path fed all-at-once vs small pieces → identical text
    (the key streaming invariant, dB norm off)."""
    from masr_tpu.infer.predictor import MASRPredictor
    wav = _speech(int(1.9 * SR), seed=3)
    p = MASRPredictor(bundle_dir, decoder="ctc_greedy", warmup=False)
    r_one = p.predict_stream(wav, is_end=True, sample_rate=SR)
    p.reset_stream()
    r_piece = None
    step = int(0.2 * SR)
    for i in range(0, len(wav), step):
        r = p.predict_stream(wav[i:i + step],
                             is_end=i + step >= len(wav), sample_rate=SR)
        if r is not None:
            r_piece = r
    p.reset_stream()
    assert r_one["text"] == r_piece["text"]


def test_fused_rescoring_mode_runs(bundle_dir):
    """attention_rescoring over the fused path: hidden chunks accumulate
    and the two-pass rescore executes at utterance end."""
    from masr_tpu.infer.predictor import MASRPredictor
    p = MASRPredictor(bundle_dir, decoder="attention_rescoring",
                      decoder_configs={"beam_size": 4, "cutoff_top_n": 4},
                      warmup=False)
    if p.decoder != "attention_rescoring":
        pytest.skip("beam decoder unavailable")
    wav = _speech(int(1.5 * SR), seed=5)
    r = p.predict_stream(wav, is_end=True, sample_rate=SR)
    p.reset_stream()
    assert r is not None and isinstance(r["text"], str)


def test_fused_stream_deepspeech2(bundle_dir, tmp_path):
    """The fused frontend also serves DS2's h/c-state streaming: fused vs
    host path give identical text."""
    import jax.numpy as jnp
    from masr_tpu.infer.bundle import save_inference_bundle
    from masr_tpu.infer.predictor import MASRPredictor
    from masr_tpu.models.cmvn import GlobalCMVN
    from masr_tpu.models.registry import build_model
    enc = dict(rnn_size=48, num_rnn_layers=2, use_gru=False)
    model = build_model("deepspeech2", FEAT, len(VOCAB), streaming=True,
                        encoder_conf=enc, decoder_conf={}, model_conf={},
                        cmvn=GlobalCMVN(np.zeros(FEAT), np.ones(FEAT)))
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        jnp.zeros((1, 67, FEAT)), jnp.asarray([67]),
        jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]), train=False)
    out = tmp_path / "ds2b"
    save_inference_bundle(str(out), "deepspeech2", True, FEAT, VOCAB,
                          np.zeros(FEAT), np.ones(FEAT), enc, {}, {},
                          {"feature_method": "fbank", "n_mels": FEAT,
                           "use_dB_normalization": False}, variables)
    wav = _speech(int(1.7 * SR), seed=9)
    pf = MASRPredictor(str(out), decoder="ctc_greedy", warmup=False,
                       fused_frontend=True)
    ph = MASRPredictor(str(out), decoder="ctc_greedy", warmup=False,
                       fused_frontend=False)
    assert pf.fused_frontend
    rf = pf.predict_stream(wav, is_end=True, sample_rate=SR)
    rh = ph.predict_stream(wav, is_end=True, sample_rate=SR)
    pf.reset_stream()
    ph.reset_stream()
    assert rf["text"] == rh["text"]
