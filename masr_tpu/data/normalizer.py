"""Global feature normalization (parity: masr/data_utils/normalizer.py).

Stats are per-dimension mean and inverse-stddev over up to num_samples
utterances, stored as JSON; applied inside the model via GlobalCMVN so
exported inference bundles are self-contained.
"""
import json
import random

import numpy as np

from masr_tpu.utils.logger import setup_logger

logger = setup_logger()


class FeatureNormalizer(object):
    def __init__(self, mean_istd_filepath=None):
        self.mean = None
        self.istd = None
        if mean_istd_filepath is not None:
            self.mean, self.istd = self._read_mean_istd(mean_istd_filepath)

    @staticmethod
    def _read_mean_istd(path):
        with open(path, "r", encoding="utf-8") as f:
            d = json.load(f)
        return (np.asarray(d["mean"], dtype=np.float32),
                np.asarray(d["istd"], dtype=np.float32))

    def apply(self, features, eps=1e-20):
        return (features - self.mean) * self.istd

    def compute_mean_istd(self, manifest_path, featurizer, mean_istd_filepath,
                          num_samples=5000, num_workers=8, eps=1e-20):
        """Stream per-utterance features, accumulate Σx and Σx²
        (parity: normalizer.py:43-92)."""
        from masr_tpu.audio import AudioSegment
        from masr_tpu.data.manifest import read_manifest
        manifest = read_manifest(manifest_path)
        if num_samples > 0 and len(manifest) > num_samples:
            manifest = random.sample(manifest, num_samples)
        dim = featurizer.feature_dim
        sum_x = np.zeros(dim, dtype=np.float64)
        sum_x2 = np.zeros(dim, dtype=np.float64)
        n_frames = 0
        for i, entry in enumerate(manifest):
            if "start_time" in entry:
                seg = AudioSegment.slice_from_file(
                    entry["audio_filepath"], entry["start_time"], entry["end_time"])
            else:
                seg = AudioSegment.from_file(entry["audio_filepath"])
            feats = featurizer.featurize(seg)
            sum_x += feats.sum(axis=0)
            sum_x2 += (feats.astype(np.float64) ** 2).sum(axis=0)
            n_frames += feats.shape[0]
            if (i + 1) % 1000 == 0:
                logger.info(f"normalizer: {i + 1}/{len(manifest)} utterances")
        mean = sum_x / n_frames
        var = np.maximum(sum_x2 / n_frames - mean ** 2, 0.0)
        istd = 1.0 / np.sqrt(var + eps)
        with open(mean_istd_filepath, "w", encoding="utf-8") as f:
            json.dump({"mean": mean.tolist(), "istd": istd.tolist(),
                       "frame_num": int(n_frames)}, f)
        self.mean = mean.astype(np.float32)
        self.istd = istd.astype(np.float32)
        logger.info(f"wrote mean/istd over {n_frames} frames to {mean_istd_filepath}")
