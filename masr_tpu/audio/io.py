"""Host-side audio I/O (no heavyweight deps).

The reference uses soundfile/resampy/PyAV (masr/data_utils/audio.py,
masr/data_utils/utils.py:314-413); this image ships none of them, so WAV
I/O is implemented on the stdlib `wave` module (with a scipy fallback for
float/extensible WAVs) and resampling uses scipy's kaiser-windowed
polyphase `resample_poly` — numerically comparable to resampy's
kaiser_best for speech. Other containers (flac/mp3/opus) are handled via
`soundfile`/`av` if present, otherwise a clear error is raised.
"""
import io as _io
import os
import wave

import numpy as np


def buf_to_float(x: bytes, n_bytes: int = 2, dtype=np.float32) -> np.ndarray:
    """Convert an integer PCM byte buffer to floats in [-1, 1)
    (parity: masr/data_utils/utils.py:382-411)."""
    scale = 1.0 / float(1 << ((8 * n_bytes) - 1))
    fmt = f"<i{n_bytes}"
    return scale * np.frombuffer(x, fmt).astype(dtype)


def _int_samples_to_float(data: np.ndarray) -> np.ndarray:
    """Scale integer PCM to float32 in [-1, 1] and mix channels to mono."""
    if data.dtype == np.int16:
        samples = data.astype(np.float32) / 2 ** 15
    elif data.dtype == np.int32:
        samples = data.astype(np.float32) / 2 ** 31
    elif data.dtype == np.uint8:
        samples = (data.astype(np.float32) - 128.0) / 128.0
    elif data.dtype in (np.float32, np.float64):
        samples = data.astype(np.float32)
    else:
        raise TypeError(f"unsupported sample dtype {data.dtype}")
    if samples.ndim == 2:
        samples = samples.mean(axis=-1)
    return np.ascontiguousarray(samples, dtype=np.float32)


def _read_wave_stdlib(f, start_frame=0, num_frames=None):
    with wave.open(f, "rb") as wf:
        sr = wf.getframerate()
        sampwidth = wf.getsampwidth()
        nchannels = wf.getnchannels()
        total = wf.getnframes()
        if start_frame:
            wf.setpos(min(start_frame, total))
        if num_frames is None:
            num_frames = total - start_frame
        raw = wf.readframes(max(num_frames, 0))
    if sampwidth == 2:
        data = np.frombuffer(raw, dtype=np.int16)
    elif sampwidth == 4:
        data = np.frombuffer(raw, dtype=np.int32)
    elif sampwidth == 1:
        data = np.frombuffer(raw, dtype=np.uint8)
    elif sampwidth == 3:  # 24-bit packed
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        data = ((b[:, 2].astype(np.int32) << 24) |
                (b[:, 1].astype(np.int32) << 16) |
                (b[:, 0].astype(np.int32) << 8)) >> 8
        data = (data.astype(np.float64) / 2 ** 23).astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV sample width {sampwidth}")
    if nchannels > 1:
        data = data.reshape(-1, nchannels)
    return _int_samples_to_float(data), sr


def read_wave(file, start=None, duration=None):
    """Read an audio file → (float32 mono samples in [-1,1], sample_rate).

    `file` may be a path, bytes, or a file-like object. `start`/`duration`
    are in seconds and use seek-based partial reads for WAV files
    (parity: AudioSegment.slice_from_file, audio.py:73-107).
    """
    if isinstance(file, bytes):
        file = _io.BytesIO(file)
    # stdlib wave handles plain PCM WAV, the overwhelmingly common case
    try:
        if isinstance(file, (str, os.PathLike)) or hasattr(file, "read"):
            if start is not None or duration is not None:
                sr = _wave_samplerate(file)
                start_frame = int((start or 0) * sr)
                num = int(duration * sr) if duration is not None else None
                return _read_wave_stdlib(file, start_frame, num)
            return _read_wave_stdlib(file)
    except (wave.Error, EOFError):
        if hasattr(file, "seek"):
            file.seek(0)
    # scipy fallback (float WAVs, WAVE_FORMAT_EXTENSIBLE)
    try:
        from scipy.io import wavfile
        sr, data = wavfile.read(file)
        samples = _int_samples_to_float(data)
        if start is not None or duration is not None:
            s = int((start or 0) * sr)
            e = s + int(duration * sr) if duration is not None else len(samples)
            samples = samples[s:e]
        return samples, sr
    except Exception:
        if hasattr(file, "seek"):
            file.seek(0)
    # optional heavyweight decoders for non-WAV containers
    for loader in (_try_soundfile, _try_av):
        out = loader(file)
        if out is not None:
            samples, sr = out
            if start is not None or duration is not None:
                s = int((start or 0) * sr)
                e = s + int(duration * sr) if duration is not None else len(samples)
                samples = samples[s:e]
            return samples, sr
    raise ValueError(
        "unable to decode audio: only WAV is supported natively; install "
        "soundfile or av for flac/mp3/opus containers")


def _wave_samplerate(f):
    if hasattr(f, "read"):
        pos = f.tell()
        with wave.open(f, "rb") as wf:
            sr = wf.getframerate()
        f.seek(pos)
        return sr
    with wave.open(f, "rb") as wf:
        return wf.getframerate()


def _try_soundfile(file):
    try:
        import soundfile
    except ImportError:
        return None
    data, sr = soundfile.read(file, dtype="float32")
    return _int_samples_to_float(data), sr


def _try_av(file):
    try:
        import av
    except ImportError:
        return None
    container = av.open(file)
    stream = container.streams.audio[0]
    sr = stream.rate
    chunks = [frame.to_ndarray() for frame in container.decode(stream)]
    data = np.concatenate(chunks, axis=-1)
    if data.ndim == 2:
        data = data.mean(axis=0)
    return _int_samples_to_float(data), sr


def write_wave(path, samples: np.ndarray, sample_rate: int):
    """Write float32 [-1,1] mono samples as a 16-bit PCM WAV file."""
    pcm = (np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2")
    with wave.open(str(path), "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(int(sample_rate))
        wf.writeframes(pcm.tobytes())


def resample(samples: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling with a kaiser window (replaces resampy,
    audio.py:306-317 in the reference)."""
    if orig_sr == target_sr:
        return samples.astype(np.float32)
    from math import gcd
    from scipy.signal import resample_poly
    g = gcd(int(orig_sr), int(target_sr))
    up, down = target_sr // g, orig_sr // g
    return resample_poly(samples.astype(np.float64), up, down).astype(np.float32)
