"""Clean a raw Chinese chat/text corpus into TTS input lines
(parity surface: reference tools/generate_audio/generate_corpus.py).

Walks a corpus directory, normalizes each line — strip markup, unify
punctuation (half→full width, collapse doubles), convert Arabic numbers
to Chinese (native an2cn, masr_tpu/utils/textnorm.py — the reference
shells out to the cn2an package), keep pure-Chinese sentences only —
and writes `utt_id sentence` pairs ready for tools/generate_audio.py.

Supported inputs: `.conv` dialog files (dgk_lost_conv format: lines
prefixed `M `/`E `, '/'-separated tokens) and plain `.txt` files (one
sentence per line).
"""
import argparse
import functools
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from masr_tpu.utils.config import add_arguments, print_arguments
from masr_tpu.utils.textnorm import an2cn

_ASCII_RE = re.compile(r"[A-Za-z0-9]")
_KEPT_PUNCT = "，。？！"


def is_uchar(s):
    """True iff every char is a CJK unified ideograph
    (reference generate_corpus.py:8-15)."""
    return all("一" <= ch <= "龥" for ch in s)


def clean_line(line):
    """One raw line → cleaned sentence or None if rejected."""
    line = line.replace("/", "").replace("\n", "")
    # half-width → full-width sentence punctuation, drop connectors
    for a, b in (("?", "？"), (" ", ""), (".", ""), ("～", "！"),
                 (",", "，"), ("、", "，"), ("!", "！"), ('"', "")):
        line = line.replace(a, b)
    line = an2cn(line)
    for _ in range(2):
        for d, s in (("，，", "，"), ("。。", "。"), ("！！", "！"),
                     ("？？", "？")):
            line = line.replace(d, s)
    if len(line) < 2:
        return None
    bare = line
    for p in _KEPT_PUNCT:
        bare = bare.replace(p, "")
    if not bare or not is_uchar(bare):
        return None
    if _ASCII_RE.search(line):
        return None
    return line


def iter_corpus_lines(corpus_dir):
    for name in sorted(os.listdir(corpus_dir)):
        path = os.path.join(corpus_dir, name)
        if name.endswith(".conv"):
            with open(path, "r", encoding="utf-8", errors="ignore") as f:
                for line in f:
                    # dialog lines carry a 2-char role prefix ("M ")
                    yield line[2:]
        elif name.endswith(".txt"):
            with open(path, "r", encoding="utf-8", errors="ignore") as f:
                for line in f:
                    yield line


def build_corpus(corpus_dir, output_path, max_sentences=None):
    """→ number of sentences written."""
    utt_id = 0
    with open(output_path, "w", encoding="utf-8") as f_write:
        for raw in iter_corpus_lines(corpus_dir):
            line = clean_line(raw)
            if line is None:
                continue
            f_write.write("%d %s\n" % (utt_id, line))
            utt_id += 1
            if max_sentences and utt_id >= max_sentences:
                break
    return utt_id


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    add_arg = functools.partial(add_arguments, argparser=parser)
    add_arg('corpus_dir',  str, 'dgk_lost_conv/results/',
            "原始语料目录（.conv 或 .txt 文件）")
    add_arg('output_path', str, 'corpus.txt', "输出语料路径")
    add_arg('max_sentences', int, 0, "最多保留句子数（0 = 不限）")
    args = parser.parse_args()
    print_arguments(args=args)
    n = build_corpus(args.corpus_dir, args.output_path,
                     max_sentences=args.max_sentences or None)
    print(f"wrote {n} sentences to {args.output_path}")


if __name__ == "__main__":
    main()
