"""Recognize a single audio file (parity: reference infer_path.py).

Supports short-audio, long-audio (VAD-segmented) and simulated streaming
modes against an exported inference bundle.
"""
import argparse
import functools
import time

import numpy as np

from masr_tpu.infer.predictor import MASRPredictor
from masr_tpu.utils.config import add_arguments, print_arguments
from masr_tpu.utils.logger import setup_logger

logger = setup_logger()

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg('wav_path',        str,  'dataset/test.wav',       "预测音频的路径")
add_arg('model_dir',       str,  'models/conformer_streaming_fbank/inference_model/', "导出的预测模型文件夹路径")
add_arg("use_gpu",         bool, True,   "是否使用加速器预测(兼容参数)")
add_arg('is_long_audio',   bool, False,  "是否为长语音")
add_arg('real_time_demo',  bool, False,  "是否使用实时语音识别演示")
add_arg('use_pun',         bool, False,  "是否给识别结果加标点符号")
add_arg('is_itn',          bool, False,  "是否对文本进行反标准化")
add_arg('decoder',         str,  'ctc_greedy',  "解码器: ctc_greedy | ctc_beam_search | attention_rescoring | ctc_beam_search_device")
add_arg('pun_model_dir',   str,  None,   "标点符号的模型文件夹路径")
args = parser.parse_args()
print_arguments(args=args)

predictor = MASRPredictor(model_dir=args.model_dir, decoder=args.decoder,
                          use_pun=args.use_pun,
                          pun_model_dir=args.pun_model_dir)


def predict_audio():
    start = time.time()
    result = predictor.predict(audio_data=args.wav_path, use_pun=args.use_pun,
                               is_itn=args.is_itn)
    logger.info(f"消耗时间：{int(round((time.time() - start) * 1000))}ms, "
                f"识别结果: {result['text']}, 得分: {result['score']}")


def predict_long_audio():
    start = time.time()
    result = predictor.predict_long(audio_data=args.wav_path,
                                    use_pun=args.use_pun, is_itn=args.is_itn)
    logger.info(f"长语音识别结果，消耗时间：{int(round((time.time() - start) * 1000))}ms, "
                f"识别结果: {result['text']}, 得分: {result['score']}")


def real_time_predict_demo():
    """Simulated streaming: feed 0.5 s chunks (docs/infer.md demo)."""
    from masr_tpu.audio import AudioSegment
    seg = AudioSegment.from_file(args.wav_path)
    samples = seg.samples
    sr = seg.sample_rate
    interval = int(0.5 * sr)
    for i in range(0, len(samples), interval):
        chunk = samples[i:i + interval]
        is_end = i + interval >= len(samples)
        start = time.time()
        result = predictor.predict_stream(audio_data=chunk, is_end=is_end,
                                          use_pun=args.use_pun,
                                          is_itn=args.is_itn, sample_rate=sr)
        if result is None:
            continue
        logger.info(f"【实时结果】：消耗时间：{int((time.time() - start) * 1000)}ms, "
                    f"识别结果: {result['text']}")
    predictor.reset_stream()


if __name__ == "__main__":
    if args.real_time_demo:
        real_time_predict_demo()
    elif args.is_long_audio:
        predict_long_audio()
    else:
        predict_audio()
