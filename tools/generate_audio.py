"""Generate a speech corpus from a text file via TTS
(parity surface: reference tools/generate_audio/generate_audio.py).

Input: one `utt_id sentence` pair per line (the output of
tools/generate_corpus.py). Each sentence is synthesized by a pluggable
TTS backend with a randomly-picked speaker and appended to a
dataset/annotation file as `<wav_path>\t<text>` — the format
create_data.py consumes. The run is RESUMABLE: on restart, sentences
already present in the annotation file are skipped (reference
generate_audio.py:26-31).

Backends: any importable `module:attr` whose instance/callable result
exposes `.num_speakers` and `.synthesize(text, spk_id, out_path)`.
The default is the in-repo deterministic synthesizer
(masr_tpu/audio/synth_tts.py); to use a real engine, e.g. wrap
paddlespeech's TTSExecutor in such an object and pass its import spec.
"""
import argparse
import functools
import importlib
import os
import random
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from masr_tpu.utils.config import add_arguments, print_arguments
from masr_tpu.utils.logger import setup_logger

logger = setup_logger(__name__)

_PUNCT_RE = re.compile(r"[。，！？]")


def load_backend(spec, sample_rate):
    """'module:attr' → backend instance (attr may be a class/factory)."""
    module_name, _, attr = spec.partition(":")
    obj = getattr(importlib.import_module(module_name), attr or "SyntheticTTS")
    if isinstance(obj, type) or callable(obj):
        try:
            return obj(sample_rate=sample_rate)
        except TypeError:
            return obj()
    return obj


def read_sentences(text_path):
    sentences = []
    with open(text_path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            utt_id, _, sentence = line.partition(" ")
            if sentence:
                sentences.append((utt_id, sentence))
    return sentences


def generate(text_path, output_dir, annotation_path,
             backend="masr_tpu.audio.synth_tts:SyntheticTTS",
             sample_rate=16000, seed=None):
    """→ number of newly generated utterances."""
    tts = load_backend(backend, sample_rate)
    sentences = read_sentences(text_path)
    os.makedirs(output_dir, exist_ok=True)
    ann_dir = os.path.dirname(annotation_path)
    if ann_dir:
        os.makedirs(ann_dir, exist_ok=True)
    start_num = 0
    if os.path.exists(annotation_path):
        with open(annotation_path, "r", encoding="utf-8") as f:
            start_num = sum(1 for _ in f)
    rng = random.Random(seed)
    num_speakers = getattr(tts, "num_speakers", 1)
    generated = 0
    with open(annotation_path, "a", encoding="utf-8") as f_ann:
        for i in range(start_num, len(sentences)):
            utt_id, sentence = sentences[i]
            spk_id = rng.randrange(num_speakers)
            save_path = os.path.join(output_dir, f"{utt_id}.wav")
            tts.synthesize(sentence, spk_id, save_path)
            text = _PUNCT_RE.sub("", sentence)
            f_ann.write("%s\t%s\n" % (save_path.replace("\\", "/"), text))
            f_ann.flush()
            generated += 1
            if generated % 100 == 0:
                logger.info(f"generated {generated} utterances "
                            f"({i + 1}/{len(sentences)})")
    logger.info(f"done: {generated} new utterances, annotation at "
                f"{annotation_path}")
    return generated


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    add_arg = functools.partial(add_arguments, argparser=parser)
    add_arg('text',            str, 'corpus.txt',
            "输入语料，每行 `utt_id sentence`")
    add_arg('output_dir',      str, 'dataset/audio/generate', "输出音频目录")
    add_arg('annotation_path', str, 'dataset/annotation/generate.txt',
            "标注文件路径（追加，支持断点续跑）")
    add_arg('backend',         str, 'masr_tpu.audio.synth_tts:SyntheticTTS',
            "TTS 后端 import spec（module:attr）")
    add_arg('sample_rate',     int, 16000, "合成采样率")
    args = parser.parse_args()
    print_arguments(args=args)
    generate(args.text, args.output_dir, args.annotation_path,
             backend=args.backend, sample_rate=args.sample_rate)


if __name__ == "__main__":
    main()
