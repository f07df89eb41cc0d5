"""Download noise audio for augmentation (MUSAN-style; parity:
reference download_data/noise.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from utility import download, unpack

DATA_URL = "https://openslr.trmal.net/resources/17/musan.tar.gz"
MD5_DATA = "0c472d4fc0c5141eca47ad1ffeb2a7df"

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--target_dir", default="dataset/audio/noise/")
args = parser.parse_args()


def main():
    os.makedirs(args.target_dir, exist_ok=True)
    filepath = download(DATA_URL, MD5_DATA, args.target_dir)
    unpack(filepath, args.target_dir, rm_archive=True)
    # flatten musan/noise/*/*.wav into the noise dir for create_data
    musan = os.path.join(args.target_dir, "musan", "noise")
    count = 0
    for sub, _, files in os.walk(musan):
        for fname in files:
            if fname.endswith(".wav"):
                src = os.path.join(sub, fname)
                dst = os.path.join(args.target_dir, fname)
                if not os.path.exists(dst):
                    os.replace(src, dst)
                count += 1
    print(f"prepared {count} noise files in {args.target_dir}")


if __name__ == "__main__":
    main()
