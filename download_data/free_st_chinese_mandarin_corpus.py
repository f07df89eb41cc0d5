"""Download + prepare Free ST Chinese Mandarin Corpus (102 h)
(parity: reference download_data/free_st_chinese_mandarin_corpus.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from utility import download, unpack, write_annotation

DATA_URL = "https://openslr.trmal.net/resources/38/ST-CMDS-20170001_1-OS.tar.gz"

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--target_dir", default="dataset/audio/")
parser.add_argument("--annotation_text", default="dataset/annotation/")
args = parser.parse_args()


def main():
    data_dir = os.path.join(args.target_dir, "ST-CMDS-20170001_1-OS")
    if not os.path.exists(data_dir):
        filepath = download(DATA_URL, None, args.target_dir)
        unpack(filepath, args.target_dir, rm_archive=True)
    lines = []
    for fname in sorted(os.listdir(data_dir)):
        if not fname.endswith(".wav"):
            continue
        txt = os.path.join(data_dir, fname[:-4] + ".txt")
        if not os.path.exists(txt):
            continue
        with open(txt, "r", encoding="utf-8") as f:
            text = f.read().strip()
        audio = os.path.join(data_dir, fname).replace("\\", "/")
        lines.append(f"{audio}\t{text}")
    write_annotation(args.annotation_text, "free_st_chinese_mandarin_corpus",
                     lines)
    print(f"free_st: {len(lines)} utterances")


if __name__ == "__main__":
    main()
