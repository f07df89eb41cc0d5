import numpy as np
import pytest

import jax
import jax.numpy as jnp

from masr_tpu.ops import fbank as F


def _wave(n=16000 * 2, seed=0):
    rs = np.random.RandomState(seed)
    t = np.arange(n) / 16000
    x = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.01 * rs.standard_normal(n)
    return (x * 32768.0).astype(np.float32)  # int16 scale


def test_frame_count_formula():
    assert F.num_frames(16000) == 1 + (16000 - 400) // 160
    assert F.num_frames(399) == 0
    assert F.num_frames(400) == 1
    assert F.num_frames(560) == 2


def test_povey_window():
    w = F.povey_window(400)
    assert w.shape == (400,)
    assert w[0] == 0.0
    assert abs(w[199] - ((0.5 - 0.5 * np.cos(2 * np.pi * 199 / 399)) ** 0.85)) < 1e-6


def test_mel_banks_shape_and_partition():
    banks = F.mel_banks(80, 512, 16000.0)
    assert banks.shape == (80, 257)
    assert np.all(banks >= 0)
    assert np.all(banks[:, -1] == 0)  # Nyquist column zero
    # each filter is unimodal with a positive peak
    assert np.all(banks.max(axis=1) > 0)


def test_fbank_numpy_shapes():
    x = _wave()
    feats = F.fbank_numpy(x, num_mel_bins=80)
    assert feats.shape == (F.num_frames(len(x)), 80)
    assert np.isfinite(feats).all()


def test_fbank_tone_peak():
    # a pure 1 kHz tone must peak at the mel bin containing 1 kHz
    t = np.arange(16000) / 16000
    x = (0.5 * np.sin(2 * np.pi * 1000 * t) * 32768).astype(np.float32)
    feats = F.fbank_numpy(x, num_mel_bins=80)
    peak_bin = int(np.argmax(feats.mean(axis=0)))
    # find which filter has max response at 1 kHz
    banks = F.mel_banks(80, 512, 16000.0)
    freq_bin = int(round(1000 / (16000 / 512)))
    expect = int(np.argmax(banks[:, freq_bin]))
    assert abs(peak_bin - expect) <= 1


def test_fbank_jax_matches_numpy():
    x = _wave()
    ref = F.fbank_numpy(x, num_mel_bins=80)
    feats, lens = F.fbank_jax(jnp.asarray(x)[None], num_mel_bins=80)
    got = np.asarray(feats[0])[: int(lens[0])]
    assert got.shape == ref.shape
    # JAX path runs float32 (like torchaudio); numpy golden is float64
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-2)


def test_fbank_jax_batch_masking():
    x1, x2 = _wave(32000, 0), _wave(20000, 1)
    batch = np.zeros((2, 32000), np.float32)
    batch[0] = x1
    batch[1, :20000] = x2
    feats, lens = F.fbank_jax(jnp.asarray(batch),
                              lengths=jnp.asarray([32000, 20000]), num_mel_bins=80)
    assert int(lens[0]) == F.num_frames(32000)
    assert int(lens[1]) == F.num_frames(20000)
    # frames past valid length are zero
    assert np.all(np.asarray(feats[1])[int(lens[1]):] == 0)
    # valid region matches the unbatched numpy result
    ref2 = F.fbank_numpy(x2, num_mel_bins=80)
    np.testing.assert_allclose(np.asarray(feats[1])[: int(lens[1])], ref2,
                               rtol=2e-3, atol=2e-2)


def test_mfcc_numpy_and_jax():
    x = _wave()
    ref = F.mfcc_numpy(x, num_mel_bins=80, num_ceps=40)
    assert ref.shape == (F.num_frames(len(x)), 40)
    feats, lens = F.mfcc_jax(jnp.asarray(x)[None], num_mel_bins=80, num_ceps=40)
    got = np.asarray(feats[0])[: int(lens[0])]
    # DCT + cepstral lifter amplify f32 FFT noise from near-silent mel bins
    # (numpy pocketfft vs XLA FFT); gate on normalized error instead
    value_range = ref.max() - ref.min()
    nrmse = np.sqrt(((got - ref) ** 2).mean()) / value_range
    assert nrmse < 5e-3
    assert np.abs(got - ref).max() < 0.01 * value_range


def test_dct_matrix_orthonormal():
    d = F.dct_matrix(80, 80).astype(np.float64)  # full square
    np.testing.assert_allclose(d.T @ d, np.eye(80), atol=1e-5)


def test_linear_spectrogram():
    rs = np.random.RandomState(0)
    x = rs.standard_normal(16000).astype(np.float32) * 0.1
    feats = F.linear_numpy(x, 16000)
    assert feats.shape[1] == 161
    assert np.isfinite(feats).all()


def test_dither_changes_features():
    x = _wave()
    a = F.fbank_numpy(x, dither=0.0)
    feats, _ = F.fbank_jax(jnp.asarray(x)[None], rng=jax.random.PRNGKey(0), dither=1.0)
    b = np.asarray(feats[0])[: a.shape[0]]
    assert not np.allclose(a, b)
    # but dither is tiny relative to int16-scale speech
    assert np.abs(a - b).mean() < 0.2
