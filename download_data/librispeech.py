"""Download + prepare LibriSpeech (960 h English)
(parity: reference download_data/librispeech.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from utility import download, unpack, write_annotation

URL_ROOT = "https://openslr.trmal.net/resources/12"
SUBSETS = {  # name: (url, md5, is_test)
    "train-clean-100": (f"{URL_ROOT}/train-clean-100.tar.gz",
                        "2a93770f6d5c6c964bc36631d331a522", False),
    "train-clean-360": (f"{URL_ROOT}/train-clean-360.tar.gz",
                        "c0e676e450a7ff2f54aeade5171606fa", False),
    "train-other-500": (f"{URL_ROOT}/train-other-500.tar.gz",
                        "d1a0fd59409fead2d42a348e1551d6da", False),
    "dev-clean": (f"{URL_ROOT}/dev-clean.tar.gz",
                  "42e2234ba48799c1f50f24a7926300a1", False),
    "test-clean": (f"{URL_ROOT}/test-clean.tar.gz",
                   "32fa31d27d2e1cad72775fee3f4849a9", True),
}

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--target_dir", default="dataset/audio/")
parser.add_argument("--annotation_text", default="dataset/annotation/")
parser.add_argument("--subsets", default="train-clean-100,dev-clean,test-clean",
                    help="逗号分隔的子集")
args = parser.parse_args()


def collect(split_dir):
    """LibriSpeech layout: <spk>/<chap>/<spk>-<chap>.trans.txt + .flac files."""
    lines = []
    for sub, _, files in sorted(os.walk(split_dir)):
        for fname in files:
            if not fname.endswith(".trans.txt"):
                continue
            with open(os.path.join(sub, fname), "r", encoding="utf-8") as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    utt_id, text = line.split(" ", 1)
                    audio = os.path.join(sub, utt_id + ".flac").replace(
                        "\\", "/")
                    if os.path.exists(audio):
                        lines.append(f"{audio}\t{text.lower()}")
    return lines


def main():
    root = os.path.join(args.target_dir, "LibriSpeech")
    train, test = [], []
    for name in args.subsets.split(","):
        name = name.strip()
        url, md5, is_test = SUBSETS[name]
        split_dir = os.path.join(root, name)
        if not os.path.exists(split_dir):
            filepath = download(url, md5, args.target_dir)
            unpack(filepath, args.target_dir, rm_archive=True)
        lines = collect(split_dir)
        (test if is_test else train).extend(lines)
        print(f"{name}: {len(lines)} utterances")
    write_annotation(args.annotation_text, "librispeech", train, test)


if __name__ == "__main__":
    main()
