"""MASRDataset (parity: masr/data_utils/reader.py:17-110).

Map-style dataset over a JSONL or binary manifest. __getitem__ handles three
source kinds: precomputed .npy feature slabs (start_frame/end_frame), sliced
long audio (start_time/end_time), and plain audio files. Per-item order:
audio augment → featurize → text featurize → feature augment (reader.py:52-77).

Pure numpy — no framework DataLoader. Batching/parallelism live in
masr_tpu.data.loader.
"""
import numpy as np

from masr_tpu.audio import AudioSegment
from masr_tpu.data.audio_featurizer import AudioFeaturizer
from masr_tpu.data.augmentation import AugmentationPipeline
from masr_tpu.data.manifest import read_manifest
from masr_tpu.data.text_featurizer import TextFeaturizer


class MASRDataset(object):
    def __init__(self, preprocess_configs, data_manifest, vocab_filepath,
                 manifest_type="txt", min_duration=0.0, max_duration=20.0,
                 augmentation_config="{}", train=False, seed=None,
                 return_waveform=False):
        """return_waveform=True: __getitem__ yields (samples (S,), ids) —
        dB-normalized int16-scale float32 audio with HOST augmentation
        applied but NO featurize; fbank + SpecAugment then run inside the
        compiled train step (the on-device frontend,
        dataset_conf.on_device_frontend)."""
        cfg = dict(preprocess_configs)
        self.return_waveform = bool(return_waveform)
        self._audio_featurizer = AudioFeaturizer(train=train, **cfg)
        self._text_featurizer = TextFeaturizer(vocab_filepath) if vocab_filepath else None
        self._augmentation_pipeline = AugmentationPipeline(
            augmentation_config=augmentation_config, seed=seed) if train else None
        self.manifest_type = manifest_type
        max_duration = float("inf") if max_duration == -1 else max_duration
        if manifest_type == "txt":
            self.entries = read_manifest(data_manifest,
                                         min_duration=min_duration,
                                         max_duration=max_duration)
            self._reader = None
        elif manifest_type == "binary":
            from masr_tpu.data.binary import DatasetReader
            self._reader = DatasetReader(data_manifest,
                                         min_duration=min_duration,
                                         max_duration=max_duration)
            self.entries = None
        else:
            raise ValueError(f"unknown manifest_type: {manifest_type}")

    def _entry(self, idx):
        if self.entries is not None:
            return self.entries[idx]
        return self._reader.get_data(idx)

    def __len__(self):
        return len(self.entries) if self.entries is not None else len(self._reader)

    def __getitem__(self, idx):
        """→ (features (T, F) float32, token_ids int32 ndarray); raw mode
        returns (samples (S,) float32 at int16 scale, token_ids)."""
        entry = self._entry(idx)
        if "start_frame" in entry:  # precomputed feature slab
            if self.return_waveform:
                raise ValueError("on-device frontend cannot consume "
                                 "precomputed feature manifests")
            slab = np.load(entry["audio_filepath"], mmap_mode="r")
            feature = np.array(slab[entry["start_frame"]:entry["end_frame"]],
                               dtype=np.float32)
            text = entry["text"]
        else:
            if "start_time" in entry:
                segment = AudioSegment.slice_from_file(
                    entry["audio_filepath"], entry["start_time"], entry["end_time"])
            else:
                segment = AudioSegment.from_file(entry["audio_filepath"])
            text = entry["text"]
            if self._augmentation_pipeline is not None:
                self._augmentation_pipeline.transform_audio(segment)
            if self.return_waveform:
                feature = self._audio_featurizer.prepare_waveform(segment)
            else:
                feature = self._audio_featurizer.featurize(segment)
        if self._augmentation_pipeline is not None and not self.return_waveform:
            feature = self._augmentation_pipeline.transform_feature(feature)
        if self._text_featurizer is not None:
            ids = np.asarray(self._text_featurizer.featurize(text), dtype=np.int32)
        else:
            ids = np.asarray([], dtype=np.int32)
        return feature, ids

    @property
    def durations(self):
        if self.entries is not None:
            return [e["duration"] for e in self.entries]
        return [self._reader.get_data(i)["duration"] for i in range(len(self._reader))]

    @property
    def feature_dim(self):
        return self._audio_featurizer.feature_dim

    @property
    def vocab_size(self):
        return self._text_featurizer.vocab_size

    @property
    def vocab_list(self):
        return self._text_featurizer.vocab_list
