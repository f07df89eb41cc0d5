"""AugmentationPipeline (parity: masr/data_utils/augmentor/augmentation.py:19-129).

Config is a JSON list; each item: {"type": ..., "aug_type": "audio"|"feature",
"params": {...}, "prob": p}. Each augmentor fires independently with
probability p. A noise augmentor whose manifest is missing is dropped with a
warning (augmentation.py:126-129).
"""
import json
import os
import random

from masr_tpu.data.augmentation import augmentors as A
from masr_tpu.utils.logger import setup_logger

logger = setup_logger()

_AUDIO_TYPES = {
    "noise": A.NoisePerturbAugmentor,
    "speed": A.SpeedPerturbAugmentor,
    "volume": A.VolumePerturbAugmentor,
    "shift": A.ShiftPerturbAugmentor,
    "resample": A.ResampleAugmentor,
}
_FEATURE_TYPES = {
    "specaug": A.SpecAugmentor,
    "specsub": A.SpecSubAugmentor,
}


class AugmentationPipeline(object):
    def __init__(self, augmentation_config="{}", seed=None):
        self._rng = random.Random(seed)
        if os.path.isfile(str(augmentation_config)):
            with open(augmentation_config, "r", encoding="utf-8") as f:
                augmentation_config = f.read()
        try:
            configs = json.loads(augmentation_config) if augmentation_config else []
        except json.JSONDecodeError as e:
            raise ValueError(f"bad augmentation config: {e}")
        if not isinstance(configs, list):
            configs = []
        self._audio_augmentors = []   # (augmentor, prob)
        self._feature_augmentors = []
        for cfg in configs:
            kind = cfg.get("type")
            prob = float(cfg.get("prob", 0.0))
            params = dict(cfg.get("params", {}))
            if prob <= 0.0:
                continue
            if kind == "noise":
                manifest = params.get("noise_manifest_path")
                if not (manifest and os.path.exists(manifest)):
                    logger.warning(f"noise augmentor dropped: manifest missing ({manifest})")
                    continue
            if kind in _AUDIO_TYPES:
                aug = _AUDIO_TYPES[kind](self._rng, **params)
                self._audio_augmentors.append((aug, prob))
            elif kind in _FEATURE_TYPES:
                aug = _FEATURE_TYPES[kind](self._rng, **params)
                self._feature_augmentors.append((aug, prob))
            else:
                raise ValueError(f"unknown augmentor type: {kind}")

    def transform_audio(self, audio_segment):
        """Apply audio-domain augmentors in place."""
        for aug, prob in self._audio_augmentors:
            if self._rng.random() < prob:
                aug.transform_audio(audio_segment)

    def transform_feature(self, feature):
        for aug, prob in self._feature_augmentors:
            if self._rng.random() < prob:
                feature = aug.transform_feature(feature)
        return feature
