"""Shared download/verify/unpack helpers for the dataset preparers
(parity surface: reference download_data/utility.py)."""
import hashlib
import os
import tarfile
import urllib.request
import zipfile

from tqdm import tqdm


def md5file(fname, chunk=1 << 20):
    h = hashlib.md5()
    with open(fname, "rb") as f:
        for block in iter(lambda: f.read(chunk), b""):
            h.update(block)
    return h.hexdigest()


def download(url, md5sum, target_dir):
    """Download url into target_dir and verify its md5; resumable-skip if
    the file already exists with the right checksum."""
    os.makedirs(target_dir, exist_ok=True)
    filepath = os.path.join(target_dir, url.split("/")[-1])
    if os.path.exists(filepath) and (md5sum is None or
                                     md5file(filepath) == md5sum):
        print(f"File exists, skip downloading. ({filepath})")
        return filepath
    print(f"Downloading {url} -> {filepath}")
    with urllib.request.urlopen(url) as src, open(filepath, "wb") as out:
        total = int(src.info().get("Content-Length") or 0)
        with tqdm(total=total, ncols=80, unit="iB", unit_scale=True,
                  unit_divisor=1024) as bar:
            while True:
                buf = src.read(1 << 15)
                if not buf:
                    break
                out.write(buf)
                bar.update(len(buf))
    if md5sum is not None and md5file(filepath) != md5sum:
        raise RuntimeError(f"MD5 checksum failed for {filepath}")
    return filepath


def unpack(filepath, target_dir, rm_archive=False):
    print(f"Unpacking {filepath} ...")
    with tarfile.open(filepath) as tar:
        tar.extractall(target_dir)
    if rm_archive:
        os.remove(filepath)


def unzip(filepath, target_dir, rm_archive=False):
    print(f"Unpacking {filepath} ...")
    with zipfile.ZipFile(filepath, "r") as z:
        z.extractall(target_dir)
    if rm_archive:
        os.remove(filepath)


def write_annotation(annotation_path, name, train_lines, test_lines=()):
    """Write `<name>.txt` (train) and append to test.txt."""
    os.makedirs(annotation_path, exist_ok=True)
    with open(os.path.join(annotation_path, f"{name}.txt"), "w",
              encoding="utf-8") as f:
        f.write("\n".join(train_lines) + ("\n" if train_lines else ""))
    if test_lines:
        with open(os.path.join(annotation_path, "test.txt"), "a",
                  encoding="utf-8") as f:
            f.write("\n".join(test_lines) + "\n")
