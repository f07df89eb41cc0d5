"""AudioSegment — monaural float32 audio abstraction.

Behavioral parity with the reference's masr/data_utils/audio.py:14-574:
int→[-1,1] scaling and stereo→mono at construction, in-place DSP ops
(gain_db / change_speed / normalize / resample / pad_silence / shift /
subsegment / random_subsegment / convolve / add_noise), defensive-copy
`samples` property, RMS in dB. Implementation is numpy/scipy only.
"""
import io as _io
import random

import numpy as np

from masr_tpu.audio import io as audio_io


class AudioSegment(object):
    """Monaural audio segment: float32 samples in [-1, 1] + sample rate."""

    def __init__(self, samples, sample_rate):
        samples = np.asarray(samples)
        self._samples = self._convert_samples_to_float32(samples)
        self._sample_rate = int(sample_rate)
        if self._samples.ndim >= 2:
            self._samples = np.mean(self._samples, axis=1)

    def __eq__(self, other):
        if type(other) is not type(self):
            return False
        if self._sample_rate != other._sample_rate:
            return False
        if self._samples.shape != other._samples.shape:
            return False
        return np.allclose(self._samples, other._samples)

    def __ne__(self, other):
        return not self == other

    def __str__(self):
        return (f"AudioSegment(num_samples={self.num_samples}, "
                f"sample_rate={self.sample_rate}, duration={self.duration:.2f}s, "
                f"rms={self.rms_db:.2f}dB)")

    # ------------------------------------------------------------------ #
    # constructors
    # ------------------------------------------------------------------ #
    @classmethod
    def from_file(cls, file):
        """Create from an audio file path / file-like object."""
        samples, sample_rate = audio_io.read_wave(file)
        return cls(samples, sample_rate)

    @classmethod
    def slice_from_file(cls, file, start=None, end=None):
        """Partial, seek-based read of [start, end) seconds. Negative
        values count from the end (parity: audio.py:73-107)."""
        # duration probe: cheap for WAV
        probe = cls.from_file(file) if not isinstance(file, (str, bytes)) else None
        if probe is not None:
            duration = probe.duration
        else:
            samples, sr = audio_io.read_wave(file)
            duration = len(samples) / sr
        start = 0.0 if start is None else round(start, 3)
        end = duration if end is None else round(end, 3)
        if start < 0.0:
            start += duration
        if end < 0.0:
            end += duration
        if start < 0.0:
            raise ValueError(f"slice start ({start} s) is out of bounds")
        if end < 0.0:
            raise ValueError(f"slice end ({end} s) is out of bounds")
        if start > end:
            raise ValueError(f"slice start ({start} s) is after slice end ({end} s)")
        if end > duration:
            raise ValueError(f"slice end ({end} s) is out of bounds (> {duration} s)")
        if probe is not None:
            return probe.subsegment(start, end)
        samples, sr = audio_io.read_wave(file, start=start, duration=end - start)
        return cls(samples, sr)

    @classmethod
    def from_bytes(cls, data: bytes):
        """Create from the bytes of an encoded audio file."""
        samples, sample_rate = audio_io.read_wave(_io.BytesIO(data))
        return cls(samples, sample_rate)

    @classmethod
    def from_pcm_bytes(cls, data: bytes, channels=1, samp_width=2, sample_rate=16000):
        """Create from raw little-endian integer PCM bytes
        (parity: audio.py:121-139)."""
        samples = audio_io.buf_to_float(data, n_bytes=samp_width)
        if channels > 1:
            samples = samples.reshape(-1, channels).mean(axis=1)
        return cls(samples, sample_rate)

    @classmethod
    def from_ndarray(cls, data: np.ndarray, sample_rate=16000):
        return cls(data, sample_rate)

    @classmethod
    def concatenate(cls, *segments):
        """Concatenate segments of identical sample rate."""
        if len(segments) == 0:
            raise ValueError("no audio segments to concatenate")
        sample_rate = segments[0]._sample_rate
        for seg in segments:
            if sample_rate != seg._sample_rate:
                raise ValueError("sample rates must match to concatenate")
            if type(seg) is not cls:
                raise TypeError("only AudioSegment instances can be concatenated")
        samples = np.concatenate([seg.samples for seg in segments])
        return cls(samples, sample_rate)

    @classmethod
    def make_silence(cls, duration, sample_rate):
        samples = np.zeros(int(duration * sample_rate), dtype=np.float32)
        return cls(samples, sample_rate)

    # ------------------------------------------------------------------ #
    # serialization
    # ------------------------------------------------------------------ #
    def to_wav_file(self, filepath, dtype="int16"):
        audio_io.write_wave(filepath, self._samples, self._sample_rate)

    def superimpose(self, other):
        """Add another segment's samples to this one (in place)."""
        if not isinstance(other, type(self)):
            raise TypeError("cannot add segments of different types")
        if self._sample_rate != other._sample_rate:
            raise ValueError("sample rates must match to superimpose")
        if len(self._samples) != len(other._samples):
            raise ValueError("segment lengths must match to superimpose")
        self._samples += other._samples

    def to_bytes(self, dtype="float32"):
        return self._convert_samples_from_float32(self._samples, dtype).tobytes()

    def to(self, dtype="int16"):
        """Samples converted to the given integer/float dtype scale
        (parity: audio.py:231-240; fbank input uses int16 scaling)."""
        return self._convert_samples_from_float32(self._samples, dtype)

    # ------------------------------------------------------------------ #
    # in-place DSP ops
    # ------------------------------------------------------------------ #
    def gain_db(self, gain):
        self._samples *= 10.0 ** (gain / 20.0)

    def change_speed(self, speed_rate):
        """Time-stretch via linear interpolation (parity: audio.py:266-285)."""
        if speed_rate == 1.0:
            return
        if speed_rate <= 0:
            raise ValueError("speed rate must be greater than zero")
        old_length = self._samples.shape[0]
        new_length = int(old_length / speed_rate)
        old_indices = np.arange(old_length)
        new_indices = np.linspace(start=0, stop=old_length, num=new_length)
        self._samples = np.interp(new_indices, old_indices, self._samples).astype(np.float32)

    def normalize(self, target_db=-20, max_gain_db=300.0):
        """Normalize RMS energy to target_db."""
        gain = target_db - self.rms_db
        if gain > max_gain_db:
            raise ValueError(
                f"cannot normalize to {target_db} dB: gain needed ({gain} dB) "
                f"exceeds max_gain_db ({max_gain_db} dB)")
        self.gain_db(min(max_gain_db, target_db - self.rms_db))

    def resample(self, target_sample_rate, filter="kaiser_best"):
        self._samples = audio_io.resample(self._samples, self._sample_rate, target_sample_rate)
        self._sample_rate = target_sample_rate

    def pad_silence(self, duration, sides="both"):
        if duration == 0.0:
            return
        cls = type(self)
        silence = cls.make_silence(duration, self._sample_rate)
        if sides == "beginning":
            padded = cls.concatenate(silence, self)
        elif sides == "end":
            padded = cls.concatenate(self, silence)
        elif sides == "both":
            padded = cls.concatenate(silence, self, silence)
        else:
            raise ValueError(f"unknown value for sides: {sides}")
        self._samples = padded._samples

    def shift(self, shift_ms):
        """Shift samples left/right by shift_ms milliseconds, zero-filling."""
        if abs(shift_ms) / 1000.0 > self.duration:
            raise ValueError("absolute value of shift_ms should be less than duration")
        shift_samples = int(shift_ms * self._sample_rate / 1000)
        if shift_samples > 0:  # advance
            self._samples[:-shift_samples] = self._samples[shift_samples:]
            self._samples[-shift_samples:] = 0
        elif shift_samples < 0:  # delay
            self._samples[-shift_samples:] = self._samples[:shift_samples]
            self._samples[:-shift_samples] = 0

    def subsegment(self, start_sec=None, end_sec=None):
        """Return a new segment of [start_sec, end_sec); negatives from end."""
        start_sec = 0.0 if start_sec is None else start_sec
        end_sec = self.duration if end_sec is None else end_sec
        if start_sec < 0.0:
            start_sec = self.duration + start_sec
        if end_sec < 0.0:
            end_sec = self.duration + end_sec
        if start_sec < 0.0:
            raise ValueError(f"slice start ({start_sec} s) is out of bounds")
        if end_sec < 0.0:
            raise ValueError(f"slice end ({end_sec} s) is out of bounds")
        if start_sec > end_sec:
            raise ValueError(f"slice start ({start_sec} s) is after end ({end_sec} s)")
        if end_sec > self.duration:
            raise ValueError(f"slice end ({end_sec} s) is out of bounds (> {self.duration} s)")
        start_sample = int(round(start_sec * self._sample_rate))
        end_sample = int(round(end_sec * self._sample_rate))
        return type(self)(self._samples[start_sample:end_sample], self._sample_rate)

    def random_subsegment(self, subsegment_length):
        if subsegment_length > self.duration:
            raise ValueError("subsegment length is longer than segment duration")
        start_time = random.uniform(0.0, self.duration - subsegment_length)
        return self.subsegment(start_time, start_time + subsegment_length)

    def convolve(self, impulse_segment, allow_resample=False):
        """Convolve with an impulse response segment (reverb)."""
        from scipy.signal import fftconvolve
        if allow_resample and self.sample_rate != impulse_segment.sample_rate:
            impulse_segment.resample(self.sample_rate)
        if self.sample_rate != impulse_segment.sample_rate:
            raise ValueError("impulse and audio sample rates do not match")
        samples = fftconvolve(self.samples, impulse_segment.samples, "full")
        self._samples = samples[:self.num_samples].astype(np.float32)

    def convolve_and_normalize(self, impulse_segment, allow_resample=False):
        target_db = self.rms_db
        self.convolve(impulse_segment, allow_resample=allow_resample)
        self.normalize(target_db)

    def add_noise(self, noise, snr_dB, max_gain_db=300.0):
        """Mix in a random subsegment of `noise` at the given SNR
        (parity: audio.py:452-480)."""
        if noise.sample_rate != self.sample_rate:
            raise ValueError("noise sample rate must match segment sample rate")
        if noise.duration < self.duration:
            raise ValueError("noise duration is shorter than segment duration")
        noise_gain_db = min(self.rms_db - noise.rms_db - snr_dB, max_gain_db)
        noise_new = noise.random_subsegment(self.duration)
        noise_new.gain_db(noise_gain_db)
        self.superimpose(noise_new)

    # ------------------------------------------------------------------ #
    # properties
    # ------------------------------------------------------------------ #
    @property
    def samples(self):
        return self._samples.copy()

    @property
    def sample_rate(self):
        return self._sample_rate

    @property
    def num_samples(self):
        return self._samples.shape[0]

    @property
    def duration(self):
        return self._samples.shape[0] / float(self._sample_rate)

    @property
    def rms_db(self):
        mean_square = np.mean(self._samples ** 2)
        if mean_square == 0:
            return -np.inf
        return 10 * np.log10(mean_square)

    # ------------------------------------------------------------------ #
    # dtype helpers
    # ------------------------------------------------------------------ #
    @staticmethod
    def _convert_samples_to_float32(samples):
        out = samples.astype(np.float32)
        if samples.dtype in (np.int8, np.int16, np.int32, np.int64):
            bits = np.iinfo(samples.dtype).bits
            out *= 1.0 / 2 ** (bits - 1)
        elif samples.dtype.kind not in ("f",):
            raise TypeError(f"unsupported sample type: {samples.dtype}")
        return out

    @staticmethod
    def _convert_samples_from_float32(samples, dtype):
        """Scale float32 [-1,1] samples to the integer range of `dtype` and
        cast (truncating, like the reference's astype at audio.py:570-574)."""
        dtype = np.dtype(dtype)
        out = samples.copy()
        if dtype.kind == "i":
            bits = np.iinfo(dtype).bits
            out = out * (2.0 ** (bits - 1))
            out = np.clip(out, np.iinfo(dtype).min, np.iinfo(dtype).max)
            return out.astype(dtype)
        if dtype.kind == "f":
            return out.astype(dtype)
        raise TypeError(f"unsupported target dtype: {dtype}")
