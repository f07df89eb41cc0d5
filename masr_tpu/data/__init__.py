from masr_tpu.data.text_featurizer import TextFeaturizer
from masr_tpu.data.audio_featurizer import AudioFeaturizer
from masr_tpu.data.normalizer import FeatureNormalizer
from masr_tpu.data.dataset import MASRDataset
from masr_tpu.data.collate import collate_fn
