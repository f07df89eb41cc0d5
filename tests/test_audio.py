import io

import numpy as np
import pytest

from masr_tpu.audio import AudioSegment
from masr_tpu.audio.io import buf_to_float, read_wave, write_wave


def test_wav_roundtrip(tmp_path):
    sr = 16000
    x = (np.sin(np.arange(sr) / 100.0) * 0.5).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wave(p, x, sr)
    y, sr2 = read_wave(str(p))
    assert sr2 == sr
    assert y.shape == x.shape
    assert np.abs(y - x).max() < 1e-3  # 16-bit quantization


def test_read_wave_partial(tmp_path):
    sr = 8000
    x = np.linspace(-0.5, 0.5, sr * 2).astype(np.float32)
    p = tmp_path / "b.wav"
    write_wave(p, x, sr)
    y, _ = read_wave(str(p), start=0.5, duration=1.0)
    assert len(y) == sr
    full, _ = read_wave(str(p))
    np.testing.assert_allclose(y, full[sr // 2: sr // 2 + sr], atol=1e-6)


def test_buf_to_float():
    pcm = np.array([0, 16384, -16384, 32767], dtype="<i2").tobytes()
    f = buf_to_float(pcm)
    np.testing.assert_allclose(f, [0.0, 0.5, -0.5, 32767 / 32768], atol=1e-6)


def test_segment_construction_scaling():
    ints = np.array([0, 16384, -32768], dtype=np.int16)
    seg = AudioSegment(ints, 16000)
    np.testing.assert_allclose(seg.samples, [0.0, 0.5, -1.0], atol=1e-6)


def test_segment_stereo_to_mono():
    data = np.stack([np.ones(100, np.float32), np.zeros(100, np.float32)], axis=1)
    seg = AudioSegment(data, 16000)
    np.testing.assert_allclose(seg.samples, 0.5)


def test_from_bytes_and_pcm(test_wav_path):
    raw = open(test_wav_path, "rb").read()
    seg1 = AudioSegment.from_bytes(raw)
    seg2 = AudioSegment.from_file(test_wav_path)
    assert seg1 == seg2
    pcm = seg2.to("int16").tobytes()
    seg3 = AudioSegment.from_pcm_bytes(pcm, sample_rate=seg2.sample_rate)
    assert np.abs(seg3.samples - seg2.samples).max() < 1e-4


def test_slice_from_file(test_wav_path):
    seg = AudioSegment.slice_from_file(test_wav_path, start=0.25, end=1.25)
    assert abs(seg.duration - 1.0) < 1e-3
    full = AudioSegment.from_file(test_wav_path)
    np.testing.assert_allclose(seg.samples, full.subsegment(0.25, 1.25).samples, atol=1e-6)


def test_normalize_rms():
    rs = np.random.RandomState(3)
    seg = AudioSegment(rs.standard_normal(16000).astype(np.float32) * 0.1, 16000)
    seg.normalize(target_db=-20)
    assert abs(seg.rms_db - (-20)) < 1e-4


def test_gain_and_concat():
    seg = AudioSegment(np.ones(100, np.float32) * 0.1, 8000)
    before = seg.rms_db
    seg.gain_db(6.0)
    assert abs(seg.rms_db - before - 6.0) < 1e-4
    cat = AudioSegment.concatenate(seg, seg)
    assert cat.num_samples == 200


def test_change_speed_length():
    seg = AudioSegment(np.random.RandomState(0).randn(16000).astype(np.float32), 16000)
    seg.change_speed(1.1)
    assert abs(seg.num_samples - int(16000 / 1.1)) <= 1


def test_resample():
    t = np.arange(16000) / 16000
    seg = AudioSegment(np.sin(2 * np.pi * 100 * t).astype(np.float32), 16000)
    seg.resample(8000)
    assert seg.sample_rate == 8000
    assert abs(seg.num_samples - 8000) <= 2
    # tone preserved
    spec = np.abs(np.fft.rfft(seg.samples))
    assert abs(np.argmax(spec) - 100) <= 2


def test_shift_pad_subsegment():
    seg = AudioSegment(np.arange(1000, dtype=np.float32) / 1000, 1000)
    s2 = seg.subsegment(0.1, 0.3)
    assert s2.num_samples == 200
    seg.pad_silence(0.1, sides="end")
    assert seg.num_samples == 1100
    seg.shift(100)  # advance by 100 ms = 100 samples
    assert np.all(seg.samples[-100:] == 0)


def test_add_noise_snr():
    rs = np.random.RandomState(7)
    sig = AudioSegment(rs.standard_normal(8000).astype(np.float32) * 0.3, 8000)
    noise = AudioSegment(rs.standard_normal(16000).astype(np.float32) * 0.3, 8000)
    sig_db = sig.rms_db
    noise_db = noise.rms_db
    sig.add_noise(noise, snr_dB=10.0)
    # mixed signal energy must have grown but by less than 1 dB at 10dB SNR
    assert sig.rms_db > sig_db
    assert sig.rms_db < sig_db + 1.5


def test_make_silence_and_rms():
    s = AudioSegment.make_silence(0.5, 16000)
    assert s.num_samples == 8000
    assert s.rms_db == -np.inf
