"""Tkinter GUI for recognition (parity: reference infer_gui.py:40-322 —
short/long audio file recognition, MICROPHONE streaming recognition with
live partials and recording auto-save, audio playback, simulated file
streaming, punctuation + inverse-text-normalization toggles).

All behavior lives in masr_tpu/infer/gui_app.py (headless-testable);
this file is the tkinter shell."""
import argparse
import functools
import threading
import time
import tkinter as tk
import tkinter.messagebox
from tkinter import filedialog

from masr_tpu.infer.gui_app import (FileSource, MicSource,
                                    StreamingRecognizer, play_audio)
from masr_tpu.infer.predictor import MASRPredictor
from masr_tpu.utils.config import add_arguments, print_arguments

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg('model_dir',     str,  'models/conformer_streaming_fbank/inference_model/', "导出的预测模型文件夹路径")
add_arg("use_gpu",       bool, True,  "是否使用加速器预测(兼容参数)")
add_arg('use_pun',       bool, False, "是否给识别结果加标点符号")
add_arg('decoder',       str,  'ctc_greedy', "解码器")
add_arg('pun_model_dir', str,  None,  "标点符号模型文件夹")
add_arg('record_dir',    str,  'dataset/record', "录音保存的目录")
add_arg('max_record',    int,  600,   "最大录音时长(秒)")


class SpeechRecognitionApp:
    def __init__(self, window, args):
        self.window = window
        self.running = False
        self.playing = False
        self.last_audio = None
        window.title("masr_tpu 夜雨飘零语音识别")
        window.geometry("870x500")

        self.short_button = tk.Button(window, text="选择短语音识别",
                                      command=self.choose_short, width=18)
        self.short_button.place(x=10, y=10)
        self.long_button = tk.Button(window, text="选择长语音识别",
                                     command=self.choose_long, width=18)
        self.long_button.place(x=170, y=10)
        self.record_button = tk.Button(window, text="录音识别",
                                       command=self.toggle_record, width=18)
        self.record_button.place(x=330, y=10)
        self.play_button = tk.Button(window, text="播放音频",
                                     command=self.toggle_play, width=18)
        self.play_button.place(x=490, y=10)
        self.stream_button = tk.Button(window, text="模拟流式识别",
                                       command=self.choose_stream, width=18)
        self.stream_button.place(x=650, y=10)
        self.an_frame = tk.Frame(window)
        self.pun_var = tk.BooleanVar(value=False)
        tk.Checkbutton(self.an_frame, text="加标点符号",
                       variable=self.pun_var).grid(row=0)
        self.itn_var = tk.BooleanVar(value=False)
        tk.Checkbutton(self.an_frame, text="反文本标准化",
                       variable=self.itn_var).grid(row=1)
        self.an_frame.place(x=10, y=44)

        self.result_label = tk.Label(window, text="输出日志：")
        self.result_label.place(x=10, y=100)
        self.result_text = tk.Text(window, width=120, height=22)
        self.result_text.place(x=10, y=125)

        self.predictor = MASRPredictor(
            model_dir=args.model_dir, decoder=args.decoder,
            use_pun=args.use_pun, pun_model_dir=args.pun_model_dir)
        self.recognizer = StreamingRecognizer(
            self.predictor, max_record=args.max_record,
            output_path=args.record_dir,
            on_partial=self._show_partial, on_log=self._log)

    # ------------------------------------------------------------------ #
    def _log(self, msg):
        self.result_text.insert("end", msg + "\n")
        self.window.update()

    def _show_partial(self, text, score):
        self.result_text.delete("1.0", "end")
        self.result_text.insert("end", f"【实时结果】：{text}\n")
        self.window.update()

    def _run_async(self, fn, *fn_args):
        if self.running:
            tkinter.messagebox.showwarning("警告", "正在预测，请等待上一轮预测结束！")
            return
        self.running = True
        threading.Thread(target=fn, args=fn_args, daemon=True).start()

    def _pick_file(self):
        return filedialog.askopenfilename(
            filetypes=[("音频文件", "*.wav *.flac *.mp3")],
            initialdir="./dataset")

    # ------------------------------------------------------------------ #
    def choose_short(self):
        path = self._pick_file()
        if path:
            self.last_audio = path
            self._log(f"已选择音频文件：{path}\n正在识别中...")
            self._run_async(self._recognize_short, path)

    def choose_long(self):
        path = self._pick_file()
        if path:
            self.last_audio = path
            self._log(f"已选择音频文件：{path}\n正在识别中...")
            self._run_async(self._recognize_long, path)

    def choose_stream(self):
        path = self._pick_file()
        if path:
            self.last_audio = path
            self._run_async(self._recognize_stream, path)

    def _recognize_short(self, path):
        try:
            start = time.time()
            result = self.predictor.predict(path, use_pun=self.pun_var.get(),
                                            is_itn=self.itn_var.get())
            ms = int((time.time() - start) * 1000)
            self._log(f"消耗时间：{ms}ms, 识别结果: {result['text']}, "
                      f"得分: {result['score']}")
        except Exception as e:
            self._log(str(e))
        finally:
            self.running = False

    def _recognize_long(self, path):
        try:
            start = time.time()
            result = self.predictor.predict_long(
                path, use_pun=self.pun_var.get(), is_itn=self.itn_var.get())
            ms = int((time.time() - start) * 1000)
            self._log(f"消耗时间：{ms}ms, 识别结果: {result['text']}, "
                      f"得分: {result['score']}")
        except Exception as e:
            self._log(str(e))
        finally:
            self.running = False

    def _recognize_stream(self, path):
        """Simulated streaming: feed the file in real-time 0.5 s blocks
        through the same recognizer used for the microphone."""
        try:
            self.recognizer.use_pun = self.pun_var.get()
            self.recognizer.is_itn = self.itn_var.get()
            src = FileSource(path, realtime=True)
            self.recognizer.start(src)
            while self.recognizer.recording:
                time.sleep(0.1)
            self.recognizer.stop(save=False)
        except Exception as e:
            self._log(str(e))
        finally:
            self.running = False

    # ------------------------------------------------------------------ #
    def toggle_record(self):
        if self.recognizer.recording:
            path = self.recognizer.stop(save=True)
            if path:
                self.last_audio = path
            self.record_button.configure(text="录音识别")
            self.running = False
            return
        if self.running:
            tkinter.messagebox.showwarning("警告", "正在预测，请等待上一轮预测结束！")
            return
        try:
            src = MicSource()
        except RuntimeError as e:
            self._log(str(e))
            return
        self.running = True
        self.recognizer.use_pun = self.pun_var.get()
        self.recognizer.is_itn = self.itn_var.get()
        self.recognizer.start(src)
        self.record_button.configure(text="停止录音")

    def toggle_play(self):
        if self.playing:
            return
        if not self.last_audio:
            path = self._pick_file()
            if not path:
                return
            self.last_audio = path

        def _play():
            self.playing = True
            self.play_button.configure(text="播放中...")
            try:
                play_audio(self.last_audio)
            except Exception as e:
                self._log(str(e))
            finally:
                self.playing = False
                self.play_button.configure(text="播放音频")
        threading.Thread(target=_play, daemon=True).start()


if __name__ == "__main__":
    args = parser.parse_args()
    print_arguments(args=args)
    root = tk.Tk()
    app = SpeechRecognitionApp(root, args)
    root.mainloop()
