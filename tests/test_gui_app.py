"""GUI controller layer (VERDICT r1 item 8): microphone-style streaming
recognition (capture thread → queue → consumer), recording auto-save,
max-duration cap, file-source streaming — all headless, with an
injectable audio source standing in for the microphone."""
import os
import time

import numpy as np
import pytest

from masr_tpu.infer.gui_app import FileSource, StreamingRecognizer

SR = 16000


class FakePredictor(object):
    """Records predict_stream calls; emits growing partials."""

    def __init__(self):
        self.calls = []
        self.resets = 0

    def predict_stream(self, audio_data, is_end=False, use_pun=False,
                       is_itn=False, sample_rate=16000):
        self.calls.append({"n": len(audio_data), "is_end": is_end,
                           "use_pun": use_pun, "is_itn": is_itn})
        return {"text": "字" * len(self.calls), "score": 1.0}

    def reset_stream(self):
        self.resets += 1


class BlockSource(object):
    """Yields `blocks` fixed blocks then None (mic stand-in)."""

    def __init__(self, blocks, block_size, seed=0, delay=0.0):
        rs = np.random.RandomState(seed)
        self._data = [rs.standard_normal(block_size).astype(np.float32) * 0.1
                      for _ in range(blocks)]
        self._i = 0
        self._delay = delay
        self.closed = False

    def read(self, n):
        if self._i >= len(self._data):
            return None
        if self._delay:
            time.sleep(self._delay)
        b = self._data[self._i]
        self._i += 1
        return b

    def close(self):
        self.closed = True


def test_recording_streams_partials_and_saves(tmp_path):
    pred = FakePredictor()
    partials = []
    logs = []
    rec = StreamingRecognizer(pred, sample_rate=SR, block_seconds=0.5,
                              output_path=str(tmp_path / "rec"),
                              on_partial=lambda t, s: partials.append(t),
                              on_log=logs.append)
    src = BlockSource(4, rec.block_size)
    rec.start(src)
    deadline = time.time() + 10
    while rec.recording and time.time() < deadline:
        time.sleep(0.02)
    path = rec.stop(save=True)
    # all 4 blocks + the final flush went through the predictor
    assert len(pred.calls) == 5
    assert pred.calls[-1]["is_end"] is True
    assert pred.resets == 1
    assert partials and partials[-1] == "字" * len(pred.calls)
    # recording saved: 4 blocks of 0.5 s = 2 s of audio
    assert path and os.path.exists(path)
    from masr_tpu.audio import AudioSegment
    seg = AudioSegment.from_file(path)
    assert abs(seg.num_samples - 4 * rec.block_size) < 4
    assert src.closed
    assert any("保存" in m for m in logs)


def test_stop_mid_recording_cuts_capture(tmp_path):
    pred = FakePredictor()
    rec = StreamingRecognizer(pred, output_path=str(tmp_path),
                              block_seconds=0.05)
    src = BlockSource(1000, rec.block_size, delay=0.02)
    rec.start(src)
    time.sleep(0.15)
    assert rec.recording
    rec.stop(save=False)
    assert not rec.recording
    assert len(pred.calls) < 1000  # stopped long before the source drained
    assert pred.resets == 1


def test_max_record_caps_duration(tmp_path):
    pred = FakePredictor()
    logs = []
    rec = StreamingRecognizer(pred, output_path=str(tmp_path),
                              block_seconds=0.05, max_record=0.1,
                              on_log=logs.append)
    src = BlockSource(1000, rec.block_size, delay=0.05)
    rec.start(src)
    deadline = time.time() + 10
    while rec.recording and time.time() < deadline:
        time.sleep(0.02)
    rec.stop(save=False)
    assert len(pred.calls) < 20
    assert any("最大录音时长" in m for m in logs)


def test_pun_itn_flags_flow_through(tmp_path):
    pred = FakePredictor()
    rec = StreamingRecognizer(pred, output_path=str(tmp_path),
                              use_pun=True, is_itn=True)
    src = BlockSource(2, rec.block_size)
    rec.start(src)
    while rec.recording:
        time.sleep(0.02)
    rec.stop(save=False)
    assert all(c["use_pun"] and c["is_itn"] for c in pred.calls)


def test_file_source_blocks_and_eof():
    samples = np.arange(SR, dtype=np.float32) / SR
    src = FileSource(samples, sample_rate=SR)
    b1 = src.read(6000)
    b2 = src.read(6000)
    b3 = src.read(6000)
    assert len(b1) == 6000 and len(b2) == 6000 and len(b3) == 4000
    assert src.read(6000) is None
    np.testing.assert_array_equal(np.concatenate([b1, b2, b3]), samples)


def test_file_source_via_recognizer_real_predictor(tmp_path, test_wav_path):
    """End to end with a real (tiny random) predictor: file streamed
    through the mic pipeline produces the same text as predict_stream
    fed directly."""
    import jax
    import jax.numpy as jnp
    from masr_tpu.audio import AudioSegment
    from masr_tpu.infer.bundle import save_inference_bundle
    from masr_tpu.infer.predictor import MASRPredictor
    from masr_tpu.models.cmvn import GlobalCMVN
    from masr_tpu.models.registry import build_model
    FEAT = 80
    vocab = ["<blank>", "<unk>", "你", "好", "<space>", "<eos>"]
    enc = dict(output_size=32, attention_heads=2, linear_units=32,
               num_blocks=1, cnn_module_kernel=7)
    dec = dict(linear_units=32, num_blocks=1, r_num_blocks=0)
    model = build_model("conformer", FEAT, len(vocab), streaming=True,
                        encoder_conf=enc, decoder_conf=dec,
                        model_conf=dict(ctc_weight=0.5),
                        cmvn=GlobalCMVN(np.zeros(FEAT), np.ones(FEAT)))
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        jnp.zeros((1, 67, FEAT)), jnp.asarray([67]),
        jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]), train=False)
    save_inference_bundle(str(tmp_path / "b"), "conformer", True, FEAT,
                          vocab, np.zeros(FEAT), np.ones(FEAT), enc, dec,
                          dict(ctc_weight=0.5),
                          {"feature_method": "fbank", "n_mels": FEAT},
                          variables)
    predictor = MASRPredictor(str(tmp_path / "b"), decoder="ctc_greedy",
                              warmup=False)
    partials = []
    rec = StreamingRecognizer(predictor, output_path=str(tmp_path),
                              on_partial=lambda t, s: partials.append(t))
    rec.start(FileSource(test_wav_path))
    deadline = time.time() + 60
    while rec.recording and time.time() < deadline:
        time.sleep(0.05)
    rec.stop(save=False)
    assert partials  # partials streamed

    seg = AudioSegment.from_file(test_wav_path)
    direct = predictor.predict_stream(seg.samples, is_end=True,
                                      sample_rate=seg.sample_rate)
    predictor.reset_stream()
    assert partials[-1] == direct["text"]
