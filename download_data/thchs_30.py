"""Download + prepare THCHS-30 (30 h Mandarin)
(parity: reference download_data/thchs_30.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from utility import download, unpack, write_annotation

DATA_URL = "https://openslr.trmal.net/resources/18/data_thchs30.tgz"
MD5_DATA = "2d2252bde5c8429929e1841d4cb95e90"

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--target_dir", default="dataset/audio/")
parser.add_argument("--annotation_text", default="dataset/annotation/")
args = parser.parse_args()


def main():
    data_dir = os.path.join(args.target_dir, "data_thchs30")
    if not os.path.exists(data_dir):
        filepath = download(DATA_URL, MD5_DATA, args.target_dir)
        unpack(filepath, args.target_dir, rm_archive=True)
    lines = []
    wav_dir = os.path.join(data_dir, "data")
    for fname in sorted(os.listdir(wav_dir)):
        if not fname.endswith(".wav.trn"):
            continue
        with open(os.path.join(wav_dir, fname), "r", encoding="utf-8") as f:
            text = "".join(f.readline().split())
        audio = os.path.join(wav_dir, fname[:-4]).replace("\\", "/")
        if os.path.exists(audio):
            lines.append(f"{audio}\t{text}")
    write_annotation(args.annotation_text, "thchs_30", lines)
    print(f"thchs_30: {len(lines)} utterances")


if __name__ == "__main__":
    main()
