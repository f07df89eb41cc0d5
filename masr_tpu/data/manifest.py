"""Manifest utilities (parity: masr/data_utils/utils.py:23-311).

Manifests are JSONL files, one utterance per line:
  {"audio_filepath": ..., "duration": ..., "text": ...}
optionally with start_time/end_time (sliced long audio) or
start_frame/end_frame (precomputed feature slabs).
"""
import json
import os

import numpy as np

from masr_tpu.audio import AudioSegment
from masr_tpu.utils.logger import setup_logger

logger = setup_logger()


def read_manifest(manifest_path, max_duration=float("inf"), min_duration=0.0):
    """Load a JSONL manifest, filtering by duration (utils.py:23-45)."""
    manifest = []
    with open(manifest_path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            entry = json.loads(line)
            if max_duration >= entry["duration"] >= min_duration:
                manifest.append(entry)
    return manifest


def _is_cjk(ch):
    return "一" <= ch <= "鿿"


def is_ustr(text):
    """Keep only CJK and ASCII-alnum/space/apostrophe characters
    (parity: utils.py:226-247)."""
    out = ""
    for ch in text:
        if _is_cjk(ch) or ch.isascii() and (ch.isalnum() or ch in " '"):
            out += ch
    return out


def _normalize_text(text, to_simplified=True):
    text = text.lower().strip()
    if to_simplified:
        try:
            import zhconv
            text = zhconv.convert(text, "zh-cn")
        except ImportError:
            pass  # optional: traditional→simplified conversion
    return is_ustr(text)


def create_manifest(annotation_path, train_manifest_path, test_manifest_path,
                    is_change_frame_rate=True, target_sr=16000,
                    only_keep_zh_en=True, max_test_manifest=10000):
    """Walk dataset/annotation/*.txt|json and emit duration-sorted
    (sortagrad) train/test manifests (parity: utils.py:49-145).

    Annotation .txt lines: `<audio_path>\t<text>`; .json lines are JSONL
    entries with audio_filepath/text (+ optional start_time/end_time).
    A file named test.txt/test.json goes entirely to the test manifest.
    """
    data_list = []
    test_list = []
    durations = []
    for annotation_text in sorted(os.listdir(annotation_path)):
        path = os.path.join(annotation_path, annotation_text)
        is_test = annotation_text.startswith("test.")
        with open(path, "r", encoding="utf-8") as f:
            lines = f.readlines()
        for line in lines:
            line = line.strip()
            if not line:
                continue
            try:
                if annotation_text.endswith(".json"):
                    entry = json.loads(line)
                    audio_path, text = entry["audio_filepath"], entry["text"]
                    start_time = entry.get("start_time")
                    end_time = entry.get("end_time")
                else:
                    audio_path, text = line.split("\t", 1)
                    start_time = end_time = None
                if is_change_frame_rate:
                    change_rate(audio_path, target_sr)
                if start_time is not None:
                    duration = round(float(end_time) - float(start_time), 3)
                else:
                    seg = AudioSegment.from_file(audio_path)
                    duration = round(seg.duration, 3)
                text = _normalize_text(text) if only_keep_zh_en else text.lower().strip()
                if len(text) == 0:
                    continue
                entry = {"audio_filepath": audio_path.replace("\\", "/"),
                         "duration": duration, "text": text}
                if start_time is not None:
                    entry["start_time"] = float(start_time)
                    entry["end_time"] = float(end_time)
                durations.append(duration)
                (test_list if is_test else data_list).append(entry)
            except Exception as e:
                logger.warning(f"skipping bad annotation line ({e}): {line[:120]}")
    # sortagrad prep: ascending duration
    data_list.sort(key=lambda e: e["duration"])
    test_list.sort(key=lambda e: e["duration"])
    if not test_list and data_list:
        n_test = max(1, min(max_test_manifest, len(data_list) // 20))
        test_list = data_list[:n_test]
        data_list = data_list[n_test:]
    _write_jsonl(train_manifest_path, data_list)
    _write_jsonl(test_manifest_path, test_list)
    logger.info(f"created manifests: {len(data_list)} train / {len(test_list)} test "
                f"utterances, total {sum(durations) / 3600:.2f} h")


def _write_jsonl(path, entries):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        for e in entries:
            f.write(json.dumps(e, ensure_ascii=False) + "\n")


def merge_audio(annotation_path, save_audio_path, max_duration=600,
                target_sr=16000, remove_original=False):
    """Pack many short wavs into ≤max_duration-second files; annotation
    lines are rewritten as JSONL with start_time/end_time into
    `<name>.merge.json` (parity: utils.py:149-205). Reduces small-file I/O
    pressure for large corpora. remove_original=True deletes the source
    .txt annotation afterwards so create_manifest doesn't double-count
    (the reference always deletes — here opt-in; source AUDIO files are
    never deleted, unlike the reference)."""
    import numpy as np
    os.makedirs(save_audio_path, exist_ok=True)
    for annotation_text in sorted(os.listdir(annotation_path)):
        if not annotation_text.endswith(".txt") or \
                annotation_text.startswith("test"):
            continue
        path = os.path.join(annotation_path, annotation_text)
        out_entries = []
        buf, buf_dur, file_idx = [], 0.0, 0
        pending = []

        def flush():
            nonlocal buf, buf_dur, file_idx, pending
            if not buf:
                return
            samples = np.concatenate(buf)
            name = f"{os.path.splitext(annotation_text)[0]}_{file_idx}.wav"
            merged_path = os.path.join(save_audio_path, name).replace("\\", "/")
            AudioSegment(samples, target_sr).to_wav_file(merged_path)
            t = 0.0
            for dur, text in pending:
                out_entries.append({"audio_filepath": merged_path,
                                    "duration": round(dur, 3),
                                    "text": text,
                                    "start_time": round(t, 3),
                                    "end_time": round(t + dur, 3)})
                t += dur
            buf, buf_dur, pending = [], 0.0, []
            file_idx += 1

        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                audio_path, text = line.split("\t", 1)
                try:
                    seg = AudioSegment.from_file(audio_path)
                except Exception as e:
                    logger.warning(f"merge_audio: skipping {audio_path}: {e}")
                    continue
                if seg.sample_rate != target_sr:
                    seg.resample(target_sr)
                buf.append(seg.samples)
                pending.append((seg.duration, text))
                buf_dur += seg.duration
                if buf_dur >= max_duration:
                    flush()
        flush()
        out = os.path.join(annotation_path,
                           os.path.splitext(annotation_text)[0] + ".merge.json")
        _write_jsonl(out, out_entries)
        if remove_original:
            os.remove(path)
        logger.info(f"merged {annotation_text}: {len(out_entries)} utterances "
                    f"into {file_idx} files")


def change_rate(audio_path, target_sr=16000):
    """Re-write an audio file at the target sample rate if needed
    (parity: utils.py:209-222)."""
    seg = AudioSegment.from_file(audio_path)
    if seg.sample_rate != target_sr:
        seg.resample(target_sr)
        seg.to_wav_file(audio_path)


def create_noise_manifest(noise_dir, noise_manifest_path):
    """List noise wavs into a manifest (parity: utils.py:251-279)."""
    entries = []
    if os.path.isdir(noise_dir):
        for name in sorted(os.listdir(noise_dir)):
            if not name.lower().endswith((".wav", ".flac")):
                continue
            path = os.path.join(noise_dir, name)
            try:
                seg = AudioSegment.from_file(path)
                entries.append({"audio_filepath": path.replace("\\", "/"),
                                "duration": round(seg.duration, 3), "text": ""})
            except Exception as e:
                logger.warning(f"skipping noise file {path}: {e}")
    _write_jsonl(noise_manifest_path, entries)
    logger.info(f"created noise manifest with {len(entries)} files")


def count_manifest(counter, manifest_path):
    """Accumulate character counts from a manifest's texts
    (parity: utils.py:283-294)."""
    for entry in read_manifest(manifest_path):
        for ch in entry["text"]:
            counter[ch] = counter.get(ch, 0) + 1


def build_vocab(vocab_path, manifest_paths, count_threshold=2):
    """Write the vocabulary file: <blank>, <unk>, chars by frequency, <eos>
    (parity: trainer.py:463-488)."""
    counter = {}
    for p in manifest_paths:
        count_manifest(counter, p)
    items = sorted(counter.items(), key=lambda kv: kv[1], reverse=True)
    os.makedirs(os.path.dirname(vocab_path) or ".", exist_ok=True)
    with open(vocab_path, "w", encoding="utf-8") as f:
        f.write("<blank>\t-1\n<unk>\t-1\n")
        for ch, count in items:
            if count < count_threshold:
                continue
            if ch == " ":
                ch = "<space>"
            f.write(f"{ch}\t{count}\n")
        f.write("<eos>\t-1\n")
    logger.info(f"wrote vocabulary to {vocab_path}")
