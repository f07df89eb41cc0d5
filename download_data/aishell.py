"""Download + prepare AIShell-1 (178 h Mandarin)
(parity: reference download_data/aishell.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from utility import download, unpack, write_annotation

DATA_URL = "https://openslr.trmal.net/resources/33/data_aishell.tgz"
MD5_DATA = "2f494334227864a8a8fec932999db9d8"

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--target_dir", default="dataset/audio/",
                    help="存放音频文件的目录")
parser.add_argument("--annotation_text", default="dataset/annotation/",
                    help="存放音频标注文件的目录")
args = parser.parse_args()


def create_annotation(data_dir, annotation_path):
    transcript_path = os.path.join(data_dir, "transcript",
                                   "aishell_transcript_v0.8.txt")
    transcripts = {}
    with open(transcript_path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            audio_id, text = line.split(" ", 1)
            transcripts[audio_id] = "".join(text.split())

    def walk(split):
        lines = []
        audio_dir = os.path.join(data_dir, "wav", split)
        for sub, _, files in sorted(os.walk(audio_dir)):
            for fname in files:
                audio_id = fname[:-4]
                if audio_id not in transcripts:
                    continue
                path = os.path.join(sub, fname).replace("\\", "/")
                lines.append(f"{path}\t{transcripts[audio_id]}")
        return lines

    train = walk("train") + walk("dev")
    test = walk("test")
    write_annotation(annotation_path, "aishell", train, test)
    print(f"aishell: {len(train)} train / {len(test)} test utterances")


def main():
    data_dir = os.path.join(args.target_dir, "data_aishell")
    if not os.path.exists(data_dir):
        filepath = download(DATA_URL, MD5_DATA, args.target_dir)
        unpack(filepath, args.target_dir)
        audio_dir = os.path.join(data_dir, "wav")
        for sub, _, files in sorted(os.walk(audio_dir)):
            for ftar in files:
                if ftar.endswith(".tar.gz"):
                    unpack(os.path.join(sub, ftar), sub, rm_archive=True)
        os.remove(filepath)
    else:
        print(f"AIShell data already exists in {args.target_dir}")
    create_annotation(data_dir, args.annotation_text)


if __name__ == "__main__":
    main()
