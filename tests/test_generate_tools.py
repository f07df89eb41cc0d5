"""TTS corpus-generation tools (parity: reference tools/generate_audio/).

Covers the native an2cn text normalization (the reference shells out to
the cn2an package), the corpus cleaner, the pluggable-TTS corpus
builder with its resume semantics, and the chain into create_manifest.
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

from masr_tpu.audio.segment import AudioSegment
from masr_tpu.audio.synth_tts import SyntheticTTS
from masr_tpu.utils.textnorm import an2cn, num_to_cn

_TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_TOOLS, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("arabic,chinese", [
    ("0", "零"), ("7", "七"), ("10", "十"), ("12", "十二"),
    ("110", "一百一十"), ("1001", "一千零一"), ("10000", "一万"),
    ("100001", "十万零一"), ("120000", "十二万"),
    ("1002345", "一百万零二千三百四十五"),
    ("12345678", "一千二百三十四万五千六百七十八"),
    ("100000001", "一亿零一"), ("3.14", "三点一四"),
    ("0.5", "零点五"), ("007", "零零七"),
])
def test_num_to_cn(arabic, chinese):
    assert num_to_cn(arabic) == chinese


def test_an2cn_in_running_text():
    assert an2cn("我有2个苹果和3.5元") == "我有二个苹果和三点五元"
    assert an2cn("无数字") == "无数字"


def test_an2cn_negative_percent_fraction():
    assert an2cn("-3度") == "负三度"
    assert an2cn("温度−3.5度") == "温度负三点五度"
    assert an2cn("占50%") == "占百分之五十"
    assert an2cn("用了3/4的时间") == "用了四分之三的时间"
    assert an2cn("-12.5%") == "负百分之十二点五"


def test_clean_line_filters_and_normalizes():
    gc = _load_tool("generate_corpus")
    # markup stripped, numbers converted, half-width punct unified
    assert gc.clean_line("你/好,今天是1号!\n") == "你好，今天是一号！"
    # doubled punctuation collapsed
    assert gc.clean_line("真的吗??好。。\n") == "真的吗？好。"
    # residual latin → rejected; too short → rejected
    assert gc.clean_line("hello世界\n") is None
    assert gc.clean_line("好\n") is None
    # non-CJK symbols → rejected
    assert gc.clean_line("你好★世界\n") is None


def test_build_corpus_conv_and_txt(tmp_path):
    gc = _load_tool("generate_corpus")
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "a.conv").write_text(
        "M 你/好/吗?\nM hi\nE \nM 我有100元\n", encoding="utf-8")
    (raw / "b.txt").write_text("今天天气真好。\n", encoding="utf-8")
    out = tmp_path / "corpus.txt"
    n = gc.build_corpus(str(raw), str(out))
    lines = out.read_text(encoding="utf-8").splitlines()
    assert n == len(lines) == 3
    assert lines[0] == "0 你好吗？"
    assert lines[1] == "1 我有一百元"
    assert lines[2] == "2 今天天气真好。"


def test_synth_tts_deterministic_and_speechlike(tmp_path):
    tts = SyntheticTTS()
    w1 = tts.render("你好", spk_id=3)
    w2 = tts.render("你好", spk_id=3)
    w3 = tts.render("你好", spk_id=4)
    np.testing.assert_array_equal(w1, w2)
    assert not np.array_equal(w1, w3)  # speaker changes the voice
    assert np.abs(w1).max() <= 0.71 and np.abs(w1).max() > 0.3
    # duration scales with text length
    assert len(tts.render("你好世界")) > len(w1)
    p = tmp_path / "x.wav"
    tts.synthesize("你好", 0, str(p))
    seg = AudioSegment.from_file(str(p))
    assert seg.sample_rate == 16000 and seg.duration > 0.3


def test_generate_audio_resume_and_annotation(tmp_path):
    ga = _load_tool("generate_audio")
    text = tmp_path / "corpus.txt"
    text.write_text("0 你好吗？\n1 我有一百元。\n2 今天天气真好，出去玩！\n",
                    encoding="utf-8")
    wav_dir = tmp_path / "audio"
    ann = tmp_path / "annotation" / "generate.txt"
    n = ga.generate(str(text), str(wav_dir), str(ann), seed=0)
    assert n == 3
    lines = ann.read_text(encoding="utf-8").splitlines()
    assert len(lines) == 3
    for i, line in enumerate(lines):
        path, txt = line.split("\t")
        assert path.endswith(f"{i}.wav") and os.path.exists(path)
        # TTS punctuation stripped from the transcript
        assert not set(txt) & set("。，！？")
    assert lines[0].split("\t")[1] == "你好吗"
    # resume: nothing regenerated, then new sentences appended
    assert ga.generate(str(text), str(wav_dir), str(ann), seed=0) == 0
    text.write_text(text.read_text(encoding="utf-8") + "3 再来一句。\n",
                    encoding="utf-8")
    assert ga.generate(str(text), str(wav_dir), str(ann), seed=0) == 1
    assert len(ann.read_text(encoding="utf-8").splitlines()) == 4


def test_generated_corpus_feeds_create_manifest(tmp_path, monkeypatch):
    from masr_tpu.data.manifest import create_manifest, read_manifest
    ga = _load_tool("generate_audio")
    text = tmp_path / "corpus.txt"
    text.write_text("0 你好吗？\n1 今天天气真好。\n", encoding="utf-8")
    ann_dir = tmp_path / "annotation"
    ga.generate(str(text), str(tmp_path / "audio"),
                str(ann_dir / "generate.txt"), seed=0)
    train = tmp_path / "manifest.train"
    test = tmp_path / "manifest.test"
    create_manifest(str(ann_dir), str(train), str(test),
                    is_change_frame_rate=False)
    # no test.* annotation → create_manifest carves a test slice itself
    entries = read_manifest(str(train)) + read_manifest(str(test))
    assert len(entries) == 2
    assert all(e["duration"] > 0 for e in entries)
    assert {e["text"] for e in entries} == {"你好吗", "今天天气真好"}


def test_generate_audio_custom_backend_spec(tmp_path):
    ga = _load_tool("generate_audio")
    b = ga.load_backend("masr_tpu.audio.synth_tts:SyntheticTTS", 8000)
    assert isinstance(b, SyntheticTTS) and b.sample_rate == 8000
    assert b.num_speakers == 174  # aishell3-style speaker pool
