"""Zero-dependency deterministic speech synthesizer for corpus building.

The reference's generate_audio tool drives paddlespeech's TTSExecutor
(reference tools/generate_audio/generate_audio.py:11-40) — a heavyweight
external stack that is not installable here. This backend fills the same
role for the in-repo tool: given text it renders a speech-*like*
waveform — per-character diphthong glides with a speaker-dependent pitch
contour, amplitude envelope, and gentle noise floor — deterministic in
(text, spk_id), so generated corpora are reproducible and the ASR data
pipeline (VAD, fbank, duration bookkeeping) exercises real structure.

It is NOT intelligible speech; for that, plug a real TTS engine into
tools/generate_audio.py via --backend "module:factory" (any callable
object with .num_speakers and .synthesize(text, spk_id, out_path)).
"""
import hashlib

import numpy as np

from masr_tpu.audio.io import write_wave


class SyntheticTTS(object):
    """Deterministic formant-glide synthesizer.

    Parameters mirror what the tool needs from a backend:
    `num_speakers` (for random speaker picks) and
    `synthesize(text, spk_id, out_path) -> None`.
    """

    def __init__(self, sample_rate=16000, num_speakers=174,
                 char_dur=0.18, gap_dur=0.02):
        self.sample_rate = sample_rate
        self.num_speakers = num_speakers
        self.char_dur = char_dur
        self.gap_dur = gap_dur

    def _char_params(self, ch, spk_id):
        h = hashlib.md5(f"{ch}|{spk_id}".encode("utf-8")).digest()
        f0 = 90.0 + (h[0] / 255.0) * 160.0 + (spk_id % 7) * 12.0
        f1 = 300.0 + (h[1] / 255.0) * 700.0
        f2 = 900.0 + (h[2] / 255.0) * 1600.0
        glide = (h[3] / 255.0 - 0.5) * 0.4
        return f0, f1, f2, glide

    def render(self, text, spk_id=0):
        """→ float32 waveform in [-1, 1]."""
        sr = self.sample_rate
        n_char = int(self.char_dur * sr)
        n_gap = int(self.gap_dur * sr)
        env_t = np.linspace(0, np.pi, n_char)
        envelope = np.sin(env_t) ** 0.5
        pieces = []
        rs = np.random.RandomState(
            int.from_bytes(hashlib.md5(
                f"{text}|{spk_id}".encode("utf-8")).digest()[:4], "little"))
        for i, ch in enumerate(text):
            if ch.isspace():
                pieces.append(np.zeros(n_char // 2, np.float32))
                continue
            f0, f1, f2, glide = self._char_params(ch, spk_id)
            t = np.arange(n_char) / sr
            sweep = 1.0 + glide * (t / t[-1] if t[-1] else t)
            # voiced source: fundamental + two formant partials
            w = (0.6 * np.sin(2 * np.pi * f0 * sweep * t)
                 + 0.3 * np.sin(2 * np.pi * f1 * sweep * t)
                 + 0.15 * np.sin(2 * np.pi * f2 * sweep * t))
            w = w * envelope
            w += 0.01 * rs.standard_normal(n_char)
            pieces.append(w.astype(np.float32))
            pieces.append(np.zeros(n_gap, np.float32))
        if not pieces:
            pieces = [np.zeros(n_char, np.float32)]
        # lead-in / lead-out silence so VAD sees clean boundaries
        pad = np.zeros(int(0.05 * sr), np.float32)
        wav = np.concatenate([pad] + pieces + [pad])
        peak = np.abs(wav).max()
        return (wav / peak * 0.7).astype(np.float32) if peak else wav

    def synthesize(self, text, spk_id, out_path):
        write_wave(out_path, self.render(text, spk_id), self.sample_rate)
