"""Convert WenetSpeech (10k h) metadata to annotation files
(parity surface: reference tools/create_wenetspeech_data.py).

Reads WenetSpeech.json, converts the referenced opus files to 16 kHz WAV
(requires PyAV or ffmpeg on PATH — gated), and emits JSONL annotation
entries with start_time/end_time so training slices segments from the
long recordings without re-cutting audio.
"""
import argparse
import functools
import json
import os
import shutil
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from masr_tpu.utils.config import add_arguments, print_arguments
from masr_tpu.utils.logger import setup_logger

logger = setup_logger()

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg('wenetspeech_json', str, 'dataset/WenetSpeech.json', "WenetSpeech元数据json路径")
add_arg('annotation_dir',   str, 'dataset/annotation/',      "存放标注文件的目录")
add_arg('num_workers',      int, 8,                          "opus转wav并发数")
add_arg('subsets',          str, 'M',                        "训练子集（S/M/L），逗号分隔")
args = parser.parse_args()
print_arguments(args=args)


def opus_to_wav(opus_path, wav_path, sr=16000):
    if os.path.exists(wav_path):
        return True
    try:
        import av  # noqa: F401
        from masr_tpu.audio.io import read_wave, write_wave
        from masr_tpu.audio.io import _try_av
        out = _try_av(opus_path)
        if out is not None:
            samples, in_sr = out
            from masr_tpu.audio.io import resample
            if in_sr != sr:
                samples = resample(samples, in_sr, sr)
            write_wave(wav_path, samples, sr)
            return True
    except ImportError:
        pass
    if shutil.which("ffmpeg"):
        r = subprocess.run(["ffmpeg", "-y", "-loglevel", "error", "-i",
                            opus_path, "-ar", str(sr), "-ac", "1", wav_path])
        return r.returncode == 0
    raise RuntimeError("opus decoding requires PyAV or ffmpeg")


def main():
    with open(args.wenetspeech_json, "r", encoding="utf-8") as f:
        meta = json.load(f)
    root = os.path.dirname(os.path.abspath(args.wenetspeech_json))
    subsets = set(args.subsets.split(","))
    os.makedirs(args.annotation_dir, exist_ok=True)
    train_f = open(os.path.join(args.annotation_dir, "wenetspeech.json"), "w",
                   encoding="utf-8")
    test_f = open(os.path.join(args.annotation_dir, "test.json"), "a",
                  encoding="utf-8")
    jobs = []
    entries = []
    for audio in meta.get("audios", []):
        opus_path = os.path.join(root, audio["path"])
        wav_path = os.path.splitext(opus_path)[0] + ".wav"
        want = any(s in subsets for s in audio.get("subsets", [])) or \
            any(s.startswith("TEST") for s in audio.get("subsets", []))
        if not want:
            continue
        jobs.append((opus_path, wav_path))
        for seg in audio.get("segments", []):
            if seg.get("confidence", 1.0) < 0.95:
                continue
            is_test = any(s.startswith("TEST")
                          for s in seg.get("subsets", audio.get("subsets", [])))
            entries.append((is_test, {
                "audio_filepath": wav_path.replace("\\", "/"),
                "duration": round(seg["end_time"] - seg["begin_time"], 3),
                "text": seg["text"],
                "start_time": round(seg["begin_time"], 3),
                "end_time": round(seg["end_time"], 3)}))
    with ThreadPoolExecutor(args.num_workers) as pool:
        list(pool.map(lambda j: opus_to_wav(*j), jobs))
    n_train = n_test = 0
    for is_test, e in entries:
        line = json.dumps(e, ensure_ascii=False) + "\n"
        if is_test:
            test_f.write(line)
            n_test += 1
        else:
            train_f.write(line)
            n_train += 1
    train_f.close()
    test_f.close()
    logger.info(f"wenetspeech: {n_train} train / {n_test} test segments")


if __name__ == "__main__":
    main()
