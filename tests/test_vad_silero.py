"""Silero-VAD port: the in-repo numpy ONNX executor runs the actual
silero_vad.onnx (the model the reference drives via onnxruntime,
vad_predictor.py:36-104). Op kernels are validated against torch;
model behavior is validated on speech-like vs tone/noise signals —
exactly the adversaries the old heuristic failed (VERDICT r1)."""
import numpy as np
import pytest

from masr_tpu.infer.onnx_runtime import OnnxModel, _conv, _lstm
from masr_tpu.infer.vad import _SILERO_PATH, SileroVAD, VADPredictor

SR = 16000


def speech_like(duration_s=1.0, seed=0, level=0.3):
    """Synthetic voiced signal: swept f0 with 5 harmonics + syllable-rate
    AM — scores >0.9 with silero while pure tones score <0.05."""
    rs = np.random.RandomState(seed)
    t = np.arange(int(duration_s * SR)) / SR
    f0 = 120 + 40 * np.sin(2 * np.pi * 3 * t)
    phase = np.cumsum(2 * np.pi * f0 / SR)
    voiced = sum((0.4 / k) * np.sin(k * phase) for k in range(1, 6))
    env = np.clip(np.sin(2 * np.pi * 4 * t), 0, 1)
    return (level * voiced * env
            + 0.01 * rs.standard_normal(len(t))).astype(np.float32)


# --------------------------------------------------------------------- #
# op kernels vs torch
# --------------------------------------------------------------------- #
class _A:
    """Minimal attr stub for _conv."""
    def __init__(self, ints=None, i=None):
        self.ints = ints or []
        self.i = i


@pytest.mark.parametrize("cin,cout,groups,k,stride,pad", [
    (6, 8, 1, 5, 1, 2),
    (8, 8, 8, 5, 1, 2),     # depthwise
    (1, 258, 1, 256, 64, 0),  # STFT-like
    (6, 4, 2, 3, 2, 1),     # grouped strided
])
def test_conv1d_matches_torch(cin, cout, groups, k, stride, pad):
    import torch
    import torch.nn.functional as F
    rs = np.random.RandomState(0)
    x = rs.standard_normal((2, cin, 40 + k)).astype(np.float32)
    w = rs.standard_normal((cout, cin // groups, k)).astype(np.float32)
    b = rs.standard_normal(cout).astype(np.float32)
    ref = F.conv1d(torch.from_numpy(x), torch.from_numpy(w),
                   torch.from_numpy(b), stride=stride, padding=pad,
                   groups=groups).numpy()
    attrs = {"strides": _A(ints=[stride]), "pads": _A(ints=[pad, pad]),
             "group": _A(i=groups)}
    got = _conv(x, w, b, attrs)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_lstm_matches_torch():
    import torch
    T, B, I, H = 7, 2, 10, 16
    rs = np.random.RandomState(1)
    lstm = torch.nn.LSTM(I, H)
    x = rs.standard_normal((T, B, I)).astype(np.float32)
    h0 = rs.standard_normal((1, B, H)).astype(np.float32)
    c0 = rs.standard_normal((1, B, H)).astype(np.float32)
    with torch.no_grad():
        y_ref, (h_ref, c_ref) = lstm(torch.from_numpy(x),
                                     (torch.from_numpy(h0),
                                      torch.from_numpy(c0)))
    # torch gate order i,f,g,o → ONNX i,o,f,c
    def reorder(w):
        i, f, g, o = np.split(w, 4, axis=0)
        return np.concatenate([i, o, f, g], axis=0)
    W = reorder(lstm.weight_ih_l0.detach().numpy())[None]
    R = reorder(lstm.weight_hh_l0.detach().numpy())[None]
    Bb = np.concatenate([reorder(lstm.bias_ih_l0.detach().numpy()),
                         reorder(lstm.bias_hh_l0.detach().numpy())])[None]
    Y, Yh, Yc = _lstm(x, W, R, Bb, h0, c0, H)
    np.testing.assert_allclose(Y[:, 0], y_ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(Yh, h_ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(Yc, c_ref.numpy(), rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------- #
# the real model
# --------------------------------------------------------------------- #
def test_silero_weights_load_and_shapes():
    m = OnnxModel(_SILERO_PATH)
    assert set(m.input_names) == {"input", "sr", "h", "c"}
    assert m.output_names == ["output", "hn", "cn"]
    inits = m.graph.inits
    # the known silero v3 graph anchors (16 kHz branch weights)
    assert inits["model.feature_extractor.forward_basis_buffer"].shape \
        == (258, 1, 256)
    assert inits["model.adaptive_normalization.filter_"].shape == (1, 1, 7)
    assert inits["model.decoder.decoder.1.weight"].shape[0] == 1


def test_silero_state_and_output_contract():
    vad = SileroVAD()
    rs = np.random.RandomState(0)
    w = (rs.standard_normal(512) * 0.05).astype(np.float32)
    p1 = vad(w)
    assert 0.0 <= p1 <= 1.0
    assert vad._h.shape == (2, 1, 64) and not np.allclose(vad._h, 0)
    # state carries: same window, different prob after state update
    p2 = vad(w)
    assert p1 != p2
    vad.reset_states()
    assert np.allclose(vad._h, 0)
    assert vad(w) == p1  # deterministic from fresh state


def test_silero_discriminates_speech_tone_noise():
    """The trained model accepts speech-like harmonics and rejects the
    adversaries the heuristic could not: pure tones and loud noise."""
    vad = SileroVAD()

    def mean_prob(sig):
        vad.reset_states()
        wins = [sig[i:i + 512] for i in range(0, len(sig) - 511, 512)]
        return float(np.mean([vad(w) for w in wins]))

    t = np.arange(SR) / SR
    tone = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    noise = (0.3 * np.random.RandomState(0).standard_normal(SR)
             ).astype(np.float32)
    speech = speech_like(1.0)
    p_speech, p_tone, p_noise = (mean_prob(speech), mean_prob(tone),
                                 mean_prob(noise))
    assert p_speech > 0.6, f"speech-like rejected: {p_speech:.3f}"
    assert p_tone < 0.2, f"tone accepted: {p_tone:.3f}"
    assert p_noise < 0.2, f"noise accepted: {p_noise:.3f}"


def test_silero_segmentation_boundaries():
    """silence | speech | silence | speech | silence → two segments at the
    right sample positions through the reference's hysteresis logic."""
    sil = np.zeros(SR, np.float32)
    wav = np.concatenate([sil, speech_like(1.2, seed=1), sil,
                          speech_like(0.8, seed=2), sil])
    vad = VADPredictor()
    assert vad.silero is not None
    ts = vad.get_speech_timestamps(wav, SR)
    assert len(ts) == 2, f"expected 2 segments, got {ts}"
    assert abs(ts[0]["start"] - SR) < 0.3 * SR
    assert abs(ts[0]["end"] - 2.2 * SR) < 0.3 * SR
    assert abs(ts[1]["start"] - 3.2 * SR) < 0.3 * SR


def test_silero_stream_vad_events():
    sil = np.zeros(SR, np.float32)
    wav = np.concatenate([sil, speech_like(1.0, seed=3), sil, sil])
    vad = VADPredictor()
    events = []
    for i in range(0, len(wav), 1600):  # 100 ms chunks
        events.extend(vad.stream_vad(wav[i:i + 1600], SR))
    starts = [e["start"] for e in events if "start" in e]
    ends = [e["end"] for e in events if "end" in e]
    assert len(starts) == 1 and len(ends) == 1
    assert abs(starts[0] - SR) < 0.3 * SR
    assert abs(ends[0] - 2 * SR) < 0.4 * SR


def test_run_sequence_matches_per_window_loop():
    """The vectorized offline path (batched frontend + one LSTM pass over
    the window sequence) must reproduce the per-window stateful loop to
    float32 rounding (BLAS picks shape-dependent reduction orders, so
    batched matmuls differ from B=1 in the last ulp) and be block-size
    invariant."""
    vad = SileroVAD()
    assert vad._fast is not None, "silero graph should support the fast path"
    wav = np.concatenate([np.zeros(SR, np.float32), speech_like(1.5, seed=4),
                          np.zeros(SR // 2, np.float32)])
    wins = wav[: (len(wav) // 512) * 512].reshape(-1, 512)
    vad.reset_states()
    ref = np.array([vad(w) for w in wins], np.float32)
    h_ref, c_ref = vad._h.copy(), vad._c.copy()
    vad.reset_states()
    got = vad.run_sequence(wins)
    np.testing.assert_allclose(got, ref, atol=1e-5)
    np.testing.assert_allclose(vad._h, h_ref, atol=1e-5)
    np.testing.assert_allclose(vad._c, c_ref, atol=1e-5)
    # state carries across run_sequence block boundaries
    vad.reset_states()
    got_blocked = vad.run_sequence(wins, block=17)
    np.testing.assert_allclose(got_blocked, got, atol=1e-5)


def test_timestamps_identical_fast_vs_loop():
    """get_speech_timestamps must segment identically whichever silero
    execution path runs underneath."""
    wav = np.concatenate([np.zeros(SR, np.float32), speech_like(1.2, seed=5),
                          np.zeros(SR, np.float32), speech_like(0.9, seed=6),
                          np.zeros(SR, np.float32)])
    vad = VADPredictor()
    assert vad.silero is not None and vad.silero._fast is not None
    ts_fast = vad.get_speech_timestamps(wav, SR)
    vad.silero._fast = None  # force the per-window interpreter loop
    ts_loop = vad.get_speech_timestamps(wav, SR)
    assert ts_fast == ts_loop and len(ts_fast) == 2


def test_heuristic_fallback_still_works():
    vad = VADPredictor(use_model=False)
    assert vad.silero is None
    sil = (np.random.RandomState(0).standard_normal(SR) * 0.001
           ).astype(np.float32)
    t = np.arange(SR) / SR
    loud = (0.4 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    ts = vad.get_speech_timestamps(np.concatenate([sil, loud, sil]), SR)
    assert len(ts) >= 1
