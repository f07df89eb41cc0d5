"""GUI application logic, separated from tkinter
(parity: reference infer_gui.py:40-320 — microphone recording on a
capture thread feeding a queue, a streaming-consumer thread calling
predict_stream with live partial display, recording saved to
dataset/record/<ts>.wav, playback, long-audio and file-streaming modes).

The view (infer_gui.py) is a thin tkinter shell over this controller, so
every behavior here is testable headless: audio sources are injectable
(`MicSource` gates on sounddevice/pyaudio; tests use any object with
`read(n) -> ndarray | None`)."""
import os
import queue
import threading
import time

import numpy as np

from masr_tpu.utils.logger import setup_logger

logger = setup_logger()


class MicSource(object):
    """Microphone blocks via sounddevice or pyaudio (whichever imports).

    read(n) → float32 ndarray of n samples, or None when the device
    closes. Gated: raises RuntimeError with guidance when no audio
    backend is installed (the reference hard-depends on soundcard;
    infer_gui.py:188-203)."""

    def __init__(self, sample_rate=16000):
        self.sample_rate = sample_rate
        self._backend = None
        try:
            import sounddevice as sd
            self._sd = sd
            self._stream = sd.InputStream(samplerate=sample_rate,
                                          channels=1, dtype="float32")
            self._stream.start()
            self._backend = "sounddevice"
            return
        except ImportError:
            pass
        try:
            import pyaudio
            pa = pyaudio.PyAudio()
            self._pa_stream = pa.open(format=pyaudio.paFloat32, channels=1,
                                      rate=sample_rate, input=True)
            self._backend = "pyaudio"
            return
        except ImportError:
            raise RuntimeError(
                "no audio backend: install `sounddevice` or `pyaudio` "
                "for microphone recording")

    def read(self, n):
        if self._backend == "sounddevice":
            data, _ = self._stream.read(n)
            return data[:, 0].copy()
        data = self._pa_stream.read(n, exception_on_overflow=False)
        return np.frombuffer(data, np.float32).copy()

    def close(self):
        if self._backend == "sounddevice":
            self._stream.stop()
            self._stream.close()
        elif self._backend == "pyaudio":
            self._pa_stream.stop_stream()
            self._pa_stream.close()


class FileSource(object):
    """Feed a file's samples in blocks — the 模拟流式 (simulated streaming)
    mode and the test double for MicSource."""

    def __init__(self, path_or_samples, sample_rate=16000, realtime=False):
        if isinstance(path_or_samples, str):
            from masr_tpu.audio import AudioSegment
            seg = AudioSegment.from_file(path_or_samples)
            if seg.sample_rate != sample_rate:
                seg.resample(sample_rate)
            self._samples = seg.samples
        else:
            self._samples = np.asarray(path_or_samples, np.float32)
        self.sample_rate = sample_rate
        self._pos = 0
        self._realtime = realtime

    def read(self, n):
        if self._pos >= len(self._samples):
            return None
        block = self._samples[self._pos: self._pos + n]
        self._pos += n
        if self._realtime:
            time.sleep(len(block) / self.sample_rate)
        return block

    def close(self):
        pass


class StreamingRecognizer(object):
    """Capture thread → queue → streaming-consumer thread
    (reference infer_gui.py:188-217 semantics): partials stream through
    `on_partial(text, score)`, the recording is saved to
    `<output_path>/<timestamp>.wav` on stop, capped at `max_record` s."""

    def __init__(self, predictor, sample_rate=16000, block_seconds=0.5,
                 max_record=600, output_path="dataset/record",
                 on_partial=None, on_log=None, use_pun=False, is_itn=False):
        self.predictor = predictor
        self.sample_rate = sample_rate
        self.block_size = int(sample_rate * block_seconds)
        self.max_record = max_record
        self.output_path = output_path
        self.on_partial = on_partial or (lambda text, score: None)
        self.on_log = on_log or (lambda msg: None)
        self.use_pun = use_pun
        self.is_itn = is_itn
        self.recording = False
        self.saved_path = None
        self._threads = []

    def start(self, source):
        if self.recording:
            raise RuntimeError("already recording")
        self.recording = True
        self.saved_path = None
        self._frames = []
        self._queue = queue.Queue()
        self._source = source
        self._threads = [
            threading.Thread(target=self._capture, daemon=True),
            threading.Thread(target=self._consume, daemon=True)]
        for t in self._threads:
            t.start()

    def _capture(self):
        start = time.time()
        try:
            while self.recording:
                if time.time() - start > self.max_record:
                    self.on_log(f"已达到最大录音时长 {self.max_record}s，停止录音")
                    break
                block = self._source.read(self.block_size)
                if block is None or len(block) == 0:
                    break
                self._frames.append(np.asarray(block, np.float32))
                self._queue.put(block)
        finally:
            self.recording = False
            self._queue.put(None)  # end-of-stream sentinel

    def _consume(self):
        saw_audio = False
        while True:
            block = self._queue.get()
            if block is None:
                break
            saw_audio = True
            try:
                result = self.predictor.predict_stream(
                    np.asarray(block, np.float32), is_end=False,
                    use_pun=self.use_pun, is_itn=self.is_itn,
                    sample_rate=self.sample_rate)
            except Exception as e:  # surface errors in the UI, keep going
                self.on_log(f"识别出错: {e}")
                continue
            if result is not None:
                self.on_partial(result["text"], result["score"])
        # empty flush: the stream sees is_end=True exactly once, with no
        # extra audio — streamed text == one-shot predict_stream text
        if saw_audio:
            try:
                result = self.predictor.predict_stream(
                    np.zeros(0, np.float32), is_end=True,
                    use_pun=self.use_pun, is_itn=self.is_itn,
                    sample_rate=self.sample_rate)
                if result is not None:
                    self.on_partial(result["text"], result["score"])
            except Exception as e:
                self.on_log(f"识别出错: {e}")
        self.predictor.reset_stream()

    def stop(self, save=True):
        """→ saved wav path (or None). Blocks until both threads drain."""
        self.recording = False
        for t in self._threads:
            t.join(timeout=30)
        self._source.close()
        if save and self._frames:
            from masr_tpu.audio.io import write_wave
            os.makedirs(self.output_path, exist_ok=True)
            self.saved_path = os.path.join(
                self.output_path, f"{int(time.time())}.wav")
            write_wave(self.saved_path, np.concatenate(self._frames),
                       self.sample_rate)
            self.on_log(f"录音已结束，录音文件保存在：{self.saved_path}")
        return self.saved_path


def play_audio(path, blocking=True):
    """Playback via sounddevice (gated; reference uses soundcard,
    infer_gui.py:176-187)."""
    try:
        import sounddevice as sd
    except ImportError:
        raise RuntimeError("install `sounddevice` for audio playback")
    from masr_tpu.audio import AudioSegment
    seg = AudioSegment.from_file(path)
    sd.play(seg.samples, seg.sample_rate, blocking=blocking)
