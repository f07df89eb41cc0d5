import json
import os

import numpy as np
import pytest

from masr_tpu.audio import AudioSegment
from masr_tpu.audio.io import write_wave
from masr_tpu.data.binary import DatasetReader, DatasetWriter, create_manifest_binary
from masr_tpu.data.collate import collate_fn
from masr_tpu.data.dataset import MASRDataset
from masr_tpu.data.loader import DataLoader
from masr_tpu.data.manifest import build_vocab, is_ustr, read_manifest
from masr_tpu.data.normalizer import FeatureNormalizer
from masr_tpu.data.sampler import BatchShuffleSampler, ShardedBatchSampler
from masr_tpu.data.text_featurizer import TextFeaturizer
from masr_tpu.data.audio_featurizer import AudioFeaturizer


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Synthetic mini-corpus: 8 wavs + manifest + vocab."""
    root = tmp_path_factory.mktemp("corpus")
    rs = np.random.RandomState(0)
    entries = []
    texts = ["你好", "你好 吗", "今天 天气", "好", "天 气 好", "你", "吗", "今天 好"]
    for i, text in enumerate(texts):
        dur = 0.6 + 0.15 * i
        n = int(16000 * dur)
        sig = (0.2 * np.sin(2 * np.pi * (200 + 50 * i) * np.arange(n) / 16000)
               + 0.02 * rs.standard_normal(n)).astype(np.float32)
        p = root / f"utt{i}.wav"
        write_wave(p, sig, 16000)
        entries.append({"audio_filepath": str(p), "duration": round(dur, 3),
                        "text": text})
    manifest = root / "manifest.train"
    with open(manifest, "w", encoding="utf-8") as f:
        for e in sorted(entries, key=lambda x: x["duration"]):
            f.write(json.dumps(e, ensure_ascii=False) + "\n")
    vocab = root / "vocabulary.txt"
    build_vocab(str(vocab), [str(manifest)], count_threshold=1)
    return {"root": root, "manifest": str(manifest), "vocab": str(vocab)}


def test_is_ustr():
    assert is_ustr("你好hello 123!@#") == "你好hello 123"


def test_vocab_layout(corpus):
    tf = TextFeaturizer(corpus["vocab"])
    assert tf.vocab_list[0] == "<blank>"
    assert tf.vocab_list[1] == "<unk>"
    assert tf.vocab_list[-1] == "<eos>"
    assert tf.blank_id == 0
    assert tf.eos_id == tf.vocab_size - 1
    ids = tf.featurize("你好 吗")
    assert len(ids) == 4  # 你 好 <space> 吗
    assert tf.detokenize(ids) == "你好 吗"
    # OOV maps to <unk>
    assert tf.featurize("Z")[0] == 1


def test_read_manifest_duration_filter(corpus):
    all_entries = read_manifest(corpus["manifest"])
    assert len(all_entries) == 8
    filtered = read_manifest(corpus["manifest"], min_duration=1.0)
    assert all(e["duration"] >= 1.0 for e in filtered)


def test_audio_featurizer_dims(corpus):
    for method, dim in [("fbank", 80), ("mfcc", 40), ("linear", 161)]:
        af = AudioFeaturizer(feature_method=method)
        assert af.feature_dim == dim
        seg = AudioSegment.from_file(
            read_manifest(corpus["manifest"])[0]["audio_filepath"])
        feats = af.featurize(seg)
        assert feats.shape[1] == dim
        assert np.isfinite(feats).all()


def test_dataset_getitem(corpus):
    ds = MASRDataset({"feature_method": "fbank", "n_mels": 80},
                     corpus["manifest"], corpus["vocab"])
    assert len(ds) == 8
    feats, ids = ds[0]
    assert feats.shape[1] == 80
    assert ids.dtype == np.int32
    assert len(ids) > 0
    assert ds.feature_dim == 80
    assert ds.vocab_size == TextFeaturizer(corpus["vocab"]).vocab_size


def test_dataset_with_augmentation(corpus):
    aug_conf = json.dumps([
        {"type": "volume", "aug_type": "audio",
         "params": {"min_gain_dBFS": -5, "max_gain_dBFS": 5}, "prob": 1.0},
        {"type": "specaug", "aug_type": "feature",
         "params": {"F": 5, "T": 10, "n_freq_masks": 1, "n_time_masks": 1},
         "prob": 1.0},
    ])
    ds = MASRDataset({"feature_method": "fbank", "n_mels": 80},
                     corpus["manifest"], corpus["vocab"],
                     augmentation_config=aug_conf, train=True, seed=7)
    feats, ids = ds[3]
    assert feats.shape[1] == 80


def test_collate_shapes(corpus):
    ds = MASRDataset({"feature_method": "fbank", "n_mels": 80},
                     corpus["manifest"], corpus["vocab"])
    batch = [ds[i] for i in range(4)]
    out = collate_fn(batch, feature_bucket=16, label_bucket=8, shuffle=False)
    B, T, F = out["inputs"].shape
    assert B == 4 and F == 80 and T % 16 == 0
    assert out["labels"].shape[1] % 8 == 0
    for i in range(4):
        L = out["label_lens"][i]
        assert (out["labels"][i, L:] == -1).all()
        assert (out["inputs"][i, out["input_lens"][i]:] == 0).all()


def test_sampler_sortagrad_epoch0():
    s = BatchShuffleSampler(100, 10, sortagrad=True, seed=1)
    s.set_epoch(0)
    batches = list(s)
    assert batches[0] == list(range(10))  # curriculum order on epoch 0
    s.set_epoch(1)
    batches1 = list(s)
    assert batches1 != batches  # shuffled afterwards
    # every index within a batch stays contiguous-ish (batch shuffle only)
    flat = sorted(i for b in batches1 for i in b)
    assert len(flat) <= 100


def test_sharded_sampler_partition():
    all_idx = []
    for rank in range(4):
        s = ShardedBatchSampler(64, 4, rank=rank, num_replicas=4,
                                sortagrad=False, seed=3)
        s.set_epoch(2)
        idx = [i for b in s for i in b]
        assert len(idx) == 16
        all_idx += idx
    assert sorted(all_idx) == list(range(64))  # exact partition, no overlap


def test_binary_manifest_roundtrip(corpus, tmp_path):
    src = corpus["manifest"]
    dst = str(tmp_path / "manifest.train")
    import shutil
    shutil.copy(src, dst)
    create_manifest_binary(dst, dst)
    reader = DatasetReader(dst + ".data")
    assert len(reader) == 8
    entry = reader.get_data(0)
    assert "audio_filepath" in entry and "text" in entry
    reader.close()


def test_normalizer_stats(corpus, tmp_path):
    af = AudioFeaturizer(feature_method="fbank", n_mels=80)
    norm = FeatureNormalizer()
    out = str(tmp_path / "mean_istd.json")
    norm.compute_mean_istd(corpus["manifest"], af, out, num_samples=-1)
    assert norm.mean.shape == (80,)
    assert norm.istd.shape == (80,)
    loaded = FeatureNormalizer(out)
    np.testing.assert_allclose(loaded.mean, norm.mean, rtol=1e-6)
    # applying normalization roughly whitens
    seg = AudioSegment.from_file(read_manifest(corpus["manifest"])[0]["audio_filepath"])
    feats = norm.apply(af.featurize(seg))
    assert abs(feats.mean()) < 3.0


def test_dataloader_iterates(corpus):
    ds = MASRDataset({"feature_method": "fbank", "n_mels": 80},
                     corpus["manifest"], corpus["vocab"])
    sampler = BatchShuffleSampler(len(ds), 4, sortagrad=False, seed=0)
    loader = DataLoader(ds, sampler, num_workers=2, prefetch=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["inputs"].shape[0] == 4


def test_merge_audio_roundtrip(tmp_path):
    """merge_audio packs shorts into long files with start/end_time JSONL;
    the dataset slices them back to the original samples; the source
    annotation is replaced when remove_original=True."""
    import json
    from masr_tpu.audio import AudioSegment
    from masr_tpu.audio.io import write_wave
    from masr_tpu.data.manifest import merge_audio
    ann = tmp_path / "annotation"
    ann.mkdir()
    rs = np.random.RandomState(0)
    sigs = []
    lines = []
    for i in range(5):
        sig = (rs.standard_normal(int(16000 * (0.5 + 0.1 * i))) * 0.1
               ).astype(np.float32)
        sigs.append(sig)
        p = tmp_path / f"s{i}.wav"
        write_wave(p, sig, 16000)
        lines.append(f"{p}\t句子{i}")
    (ann / "train.txt").write_text("\n".join(lines), encoding="utf-8")
    merge_audio(str(ann), str(tmp_path / "merged"), max_duration=2,
                remove_original=True)
    assert not (ann / "train.txt").exists()
    merged_json = ann / "train.merge.json"
    assert merged_json.exists()
    entries = [json.loads(l) for l in
               merged_json.read_text(encoding="utf-8").splitlines()]
    assert len(entries) == 5
    # sliced reads reproduce the original samples
    for i, e in enumerate(entries):
        assert e["text"] == f"句子{i}"
        seg = AudioSegment.slice_from_file(e["audio_filepath"],
                                           e["start_time"], e["end_time"])
        n = min(len(seg.samples), len(sigs[i]))
        assert n >= len(sigs[i]) - 32  # boundary rounding only
        np.testing.assert_allclose(seg.samples[:n], sigs[i][:n], atol=2e-4)
    # packing actually merged: fewer files than utterances
    import os
    assert len(os.listdir(tmp_path / "merged")) < 5
