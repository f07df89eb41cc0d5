"""Independent Kaldi-compatible feature oracle in pure torch.

VERDICT r3 item 3: the repo's fbank goldens were frozen from its own
numpy kernels, so they caught regressions but could never catch a
mismatch against the reference's frontend
(/root/reference/masr/data_utils/featurizer/audio_featurizer.py:119-138,
which calls torchaudio.compliance.kaldi.fbank — torchaudio itself is not
installable in this image). This module is a SECOND implementation of
the same Kaldi algorithm, written independently against the published
Kaldi/torchaudio-compliance semantics using torch ops only:

- snip-edges framing (m = 1 + (n - window) // shift), as_strided
- optional dither (unused by the cross-checks: determinism)
- per-frame DC-offset removal
- pre-emphasis 0.97 with replicate-padded first sample
  (torch.nn.functional.pad(..., mode="replicate"))
- povey window = hann(periodic=False) ** 0.85
  via torch.hann_window
- zero-pad to the next power of two, torch.fft.rfft power spectrum
- Kaldi mel banks: num_fft_bins = padded // 2, mel(f) = 1127·ln(1+f/700),
  low 20 Hz, high = Nyquist, triangular up/down slopes clamped at 0,
  Nyquist column zero-padded before the matmul
- log with float32-eps floor
- MFCC: orthonormal DCT-II (num_ceps rows) + cepstral lifter
  1 + 0.5·L·sin(pi·i/L)

All math runs in float64, so this oracle is strictly higher-precision
than both the numpy host path and the JAX device path it validates —
agreement bounds in tests/test_fbank_torch_oracle.py are therefore real
accuracy statements, not shared-rounding coincidences. No code is
shared with masr_tpu.ops.fbank.
"""
import math

import numpy as np
import torch

_EPS_F32 = float(torch.finfo(torch.float32).eps)


def _mel(freq):
    return 1127.0 * torch.log1p(freq / 700.0)


def _next_pow2(n):
    return 2 ** math.ceil(math.log2(n)) if n > 1 else 1


def _frames(waveform, window_size, window_shift):
    n = waveform.numel()
    m = 0 if n < window_size else 1 + (n - window_size) // window_shift
    return waveform.as_strided((m, window_size), (window_shift, 1))


def _windowed(waveform, window_size, window_shift, dither,
              remove_dc_offset, preemphasis):
    strided = _frames(waveform, window_size, window_shift).clone()
    if strided.shape[0] == 0:
        return strided
    if dither:
        strided = strided + dither * torch.randn_like(strided)
    if remove_dc_offset:
        strided = strided - strided.mean(dim=1, keepdim=True)
    if preemphasis:
        prev = torch.nn.functional.pad(
            strided.unsqueeze(0), (1, 0), mode="replicate").squeeze(0)
        strided = strided - preemphasis * prev[:, :-1]
    window = torch.hann_window(window_size, periodic=False,
                               dtype=torch.float64).pow(0.85)
    return strided * window


def mel_banks_torch(num_bins, padded_window_size, sample_rate,
                    low_freq=20.0, high_freq=0.0):
    """(num_bins, padded_window_size // 2 + 1) float64, Nyquist col 0."""
    num_fft_bins = padded_window_size // 2
    nyquist = 0.5 * sample_rate
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    fft_bin_width = sample_rate / padded_window_size
    mel_low = _mel(torch.tensor(low_freq, dtype=torch.float64))
    mel_high = _mel(torch.tensor(high_freq, dtype=torch.float64))
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    b = torch.arange(num_bins, dtype=torch.float64).unsqueeze(1)
    left = mel_low + b * mel_delta
    center = mel_low + (b + 1) * mel_delta
    right = mel_low + (b + 2) * mel_delta
    mel = _mel(fft_bin_width
               * torch.arange(num_fft_bins, dtype=torch.float64)
               ).unsqueeze(0)
    up = (mel - left) / (center - left)
    down = (right - mel) / (right - center)
    banks = torch.clamp(torch.minimum(up, down), min=0.0)
    return torch.nn.functional.pad(banks, (0, 1), value=0.0)


def fbank_torch(waveform, num_mel_bins=80, frame_length_ms=25.0,
                frame_shift_ms=10.0, sample_rate=16000, dither=0.0,
                preemphasis=0.97, remove_dc_offset=True, low_freq=20.0,
                high_freq=0.0):
    """Log-mel fbank (T, num_mel_bins) float64. Input at int16 scale
    (the reference multiplies float samples by 2**15 before torchaudio,
    audio_featurizer.py:63)."""
    waveform = torch.as_tensor(np.asarray(waveform), dtype=torch.float64)
    window_size = int(sample_rate * frame_length_ms * 0.001)
    window_shift = int(sample_rate * frame_shift_ms * 0.001)
    padded = _next_pow2(window_size)
    frames = _windowed(waveform, window_size, window_shift, dither,
                       remove_dc_offset, preemphasis)
    if frames.shape[0] == 0:
        return np.zeros((0, num_mel_bins), dtype=np.float64)
    frames = torch.nn.functional.pad(frames, (0, padded - window_size))
    power = torch.fft.rfft(frames, dim=1).abs().pow(2.0)
    banks = mel_banks_torch(num_mel_bins, padded, float(sample_rate),
                            low_freq, high_freq)
    mel_e = power @ banks.T
    return torch.clamp(mel_e, min=_EPS_F32).log().numpy()


def _dct_matrix(num_ceps, num_mel_bins):
    """Orthonormal DCT-II, (num_mel_bins, num_ceps) float64."""
    n = torch.arange(num_mel_bins, dtype=torch.float64)
    k = torch.arange(num_ceps, dtype=torch.float64).unsqueeze(1)
    dct = torch.cos(math.pi / num_mel_bins * (n + 0.5) * k)
    dct[0] *= math.sqrt(1.0 / num_mel_bins)
    dct[1:] *= math.sqrt(2.0 / num_mel_bins)
    return dct.T


def mfcc_torch(waveform, num_mel_bins=80, num_ceps=40,
               frame_length_ms=25.0, frame_shift_ms=10.0,
               sample_rate=16000, dither=0.0, cepstral_lifter=22.0):
    """MFCC (T, num_ceps) float64 (no energy)."""
    logmel = torch.from_numpy(
        fbank_torch(waveform, num_mel_bins, frame_length_ms,
                    frame_shift_ms, sample_rate, dither))
    feats = logmel @ _dct_matrix(num_ceps, num_mel_bins)
    if cepstral_lifter:
        i = torch.arange(num_ceps, dtype=torch.float64)
        feats = feats * (1.0 + 0.5 * cepstral_lifter
                         * torch.sin(math.pi * i / cepstral_lifter))
    return feats.numpy()


def linear_torch(samples, sample_rate=16000, frame_shift_ms=10.0,
                 frame_length_ms=20.0, eps=1e-14):
    """Log-power linear spectrogram (T, 161 @ 16 kHz) float64 — an
    independent re-derivation of the reference's hand-rolled numpy STFT
    (audio_featurizer.py:72-94): hanning window, PSD scaling with 2× on
    interior bins, truncate-to-stride framing. Input float in [-1, 1]."""
    samples = torch.as_tensor(np.asarray(samples), dtype=torch.float64)
    stride = int(0.001 * sample_rate * frame_shift_ms)
    window_size = int(0.001 * sample_rate * frame_length_ms)
    trunc = (samples.numel() - window_size) % stride
    if trunc:
        samples = samples[:-trunc]
    frames = samples.as_strided(
        ((samples.numel() - window_size) // stride + 1, window_size),
        (stride, 1))
    # numpy.hanning(N) == hann_window(N, periodic=False)
    weight = torch.hann_window(window_size, periodic=False,
                               dtype=torch.float64)
    fft = torch.fft.rfft(frames * weight, dim=1).abs().pow(2.0)
    scale = weight.pow(2.0).sum() * sample_rate
    fft[:, 1:-1] *= 2.0 / scale
    fft[:, 0] /= scale
    fft[:, -1] /= scale
    freqs = sample_rate / window_size * torch.arange(fft.shape[1])
    ind = int(torch.where(freqs <= sample_rate / 2)[0][-1]) + 1
    return torch.log(fft[:, :ind] + eps).numpy()
