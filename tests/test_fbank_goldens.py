"""fbank/mfcc/linear golden vectors (VERDICT r1 item 9, r3 item 3).

Provenance: regenerated 2026-08-18 by tools/regen_fbank_goldens.py from
the INDEPENDENT float64 torch oracle (tools/kaldi_fbank_torch.py — a
from-scratch second implementation of the Kaldi algorithm behind
torchaudio.compliance.kaldi; torchaudio itself is not installable here).
The round-1 goldens were frozen from this repo's own numpy kernels and
could only catch regressions; these validate correctness against an
external derivation. Waves are the round-1 set (0.5 s noise / 440 Hz
tone / chirp @ 16 kHz, int16 scale). Tolerances are tiered because the
product kernels run float32 while the oracle runs float64: energetic
bins agree ≤ 1e-5; log-of-near-zero-energy bins on NARROWBAND signals
(tone/chirp) carry float32 FFT cancellation noise the log amplifies
(the reference's own float32 torchaudio features have the same noise).
mel_banks and povey_400 match the oracle bit-for-bit in float32. The
analytic checks below additionally pin properties no golden can drift
past (mel-bank row sums, window symmetry, tone peak location).
Cross-validation on random audio + the reference's dataset/test.wav
lives in tests/test_fbank_torch_oracle.py.
"""
import os

import numpy as np
import pytest

from masr_tpu.ops.fbank import (fbank_numpy, linear_numpy, mel_banks,
                                mel_scale, mfcc_numpy, povey_window)

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens",
                       "fbank_goldens.npz")
SR = 16000


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDENS)


@pytest.mark.parametrize("name", ["noise", "tone", "chirp"])
def test_fbank_matches_golden(g, name):
    got = fbank_numpy(g[f"wave_{name}"], num_mel_bins=80, sample_rate=SR)
    want = g[f"fbank_{name}"]
    d = np.abs(got - want)
    loud = want > want.max() - 8.0
    assert d[loud].max() < 1e-5, d[loud].max()
    if name == "noise":                      # broadband: all bins tight
        np.testing.assert_allclose(got, want, atol=1e-4)
    else:                                    # narrowband quiet-bin noise
        assert np.percentile(d, 99) < 0.05, np.percentile(d, 99)
        assert d.max() < 0.5, d.max()


@pytest.mark.parametrize("name", ["noise", "tone", "chirp"])
def test_mfcc_matches_golden(g, name):
    got = mfcc_numpy(g[f"wave_{name}"], num_mel_bins=80, num_ceps=40,
                     sample_rate=SR)
    want = g[f"mfcc_{name}"]
    if name == "noise":
        np.testing.assert_allclose(got, want, atol=2e-4)
    else:
        # the DCT mixes every log-mel bin, so narrowband signals inherit
        # the quiet-bin float32 log noise across all coefficients
        assert np.abs(got - want).max() < 1.0


@pytest.mark.parametrize("name", ["noise", "tone", "chirp"])
def test_linear_matches_golden(g, name):
    got = linear_numpy(g[f"wave_{name}"] / 32768.0, SR)
    np.testing.assert_allclose(got, g[f"linear_{name}"], rtol=1e-6,
                               atol=1e-6)


@pytest.mark.parametrize("name", ["noise", "tone", "chirp"])
def test_fbank_jax_matches_golden(g, name):
    """The device path must reproduce the frozen host goldens too (the
    fused frontend depends on this)."""
    from masr_tpu.ops.fbank import fbank_jax
    wave = g[f"wave_{name}"]
    feats, lens = fbank_jax(wave[None], num_mel_bins=80, sample_rate=SR)
    T = int(lens[0])
    got = np.asarray(feats)[0, :T]
    want = g[f"fbank_{name}"]
    # XLA's float32 FFT vs numpy's float64 FFT: bins ≥60 dB below the
    # peak carry f32 cancellation noise that the log amplifies. Tiered
    # bound: tight where there is energy, bounded tails elsewhere.
    loud = want > want.max() - 8.0  # within ~8 nats of the peak
    np.testing.assert_allclose(got[loud], want[loud], atol=1e-4)
    d = np.abs(got - want)
    assert np.percentile(d, 99) < 0.1, np.percentile(d, 99)
    assert d.max() < 0.5, d.max()


def test_melbank_golden_and_analytic(g):
    banks = mel_banks(80, 512, 16000.0)
    np.testing.assert_allclose(banks, g["mel_banks_80_512"], atol=0)
    # analytic: triangular filters peak at 1 and tile the mel axis —
    # interior FFT bins between filter 1's center and filter 78's center
    # are covered by filters summing to ~1
    centers = np.argmax(banks, axis=1)
    assert (np.diff(centers) >= 0).all()
    col_sums = banks.sum(axis=0)
    lo, hi = centers[1], centers[-2]
    np.testing.assert_allclose(col_sums[lo:hi], 1.0, atol=0.02)
    # Kaldi convention: Nyquist column is zero
    assert banks[:, -1].sum() == 0.0


def test_povey_window_golden_and_analytic(g):
    w = povey_window(400)
    np.testing.assert_allclose(w, g["povey_400"], atol=0)
    np.testing.assert_allclose(w, w[::-1], atol=1e-7)  # symmetric
    # even-length window: the true center falls between samples, so the
    # max is slightly below 1
    assert w[0] == 0.0 and 0.9999 < w.max() <= 1.0
    # povey = hann ** 0.85 exactly
    n = np.arange(400)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * n / 399)
    np.testing.assert_allclose(w, hann ** 0.85, atol=1e-6)


def test_tone_energy_lands_in_correct_mel_bin(g):
    """440 Hz tone: the hottest mel bin's filter must peak at the FFT bin
    nearest 440 Hz — an analytic anchor independent of any golden."""
    feats = g["fbank_tone"]
    hot = int(np.argmax(feats.mean(axis=0)))
    banks = mel_banks(80, 512, 16000.0)
    peak_bin = int(np.argmax(banks[hot]))
    peak_hz = peak_bin * SR / 512
    assert abs(peak_hz - 440) < 80, f"tone landed at {peak_hz:.0f} Hz"
    # and the mel scale itself: mel(700 Hz) = 1127*ln(2)
    np.testing.assert_allclose(mel_scale(700.0), 1127.0 * np.log(2.0),
                               rtol=1e-9)
