"""Model registry (parity: trainer.py:167-203 — `use_model` string selects
the family; encoder_conf/decoder_conf are splatted into constructors)."""
from typing import Optional

import jax.numpy as jnp

from masr_tpu.models.cmvn import GlobalCMVN


def build_model(use_model: str, input_dim: int, vocab_size: int,
                mean_istd_path: Optional[str] = None, streaming: bool = True,
                encoder_conf=None, decoder_conf=None, model_conf=None,
                dtype=jnp.float32, cmvn=None):
    """Construct a model module by name. model_conf carries
    ctc_weight/lsm_weight/reverse_weight/length_normalized_loss."""
    if cmvn is None and mean_istd_path is not None:
        from masr_tpu.data.normalizer import FeatureNormalizer
        norm = FeatureNormalizer(mean_istd_path)
        cmvn = GlobalCMVN(norm.mean, norm.istd)
    encoder_conf = dict(encoder_conf or {})
    decoder_conf = dict(decoder_conf or {})
    model_conf = dict(model_conf or {})

    if use_model == "deepspeech2":
        from masr_tpu.models.deepspeech2 import DeepSpeech2Model
        return DeepSpeech2Model(input_dim=input_dim, vocab_size=vocab_size,
                                cmvn=cmvn, streaming=streaming,
                                encoder_conf=encoder_conf,
                                decoder_conf=decoder_conf, dtype=dtype)
    if use_model == "conformer":
        from masr_tpu.models.conformer import ConformerModel
        return ConformerModel(input_dim=input_dim, vocab_size=vocab_size,
                              cmvn=cmvn, streaming=streaming,
                              encoder_conf=encoder_conf,
                              decoder_conf=decoder_conf, dtype=dtype,
                              **model_conf)
    if use_model == "squeezeformer":
        from masr_tpu.models.squeezeformer import SqueezeformerModel
        return SqueezeformerModel(input_dim=input_dim, vocab_size=vocab_size,
                                  cmvn=cmvn, streaming=streaming,
                                  encoder_conf=encoder_conf,
                                  decoder_conf=decoder_conf, dtype=dtype,
                                  **model_conf)
    if use_model == "efficient_conformer":
        from masr_tpu.models.efficient_conformer import EfficientConformerModel
        return EfficientConformerModel(input_dim=input_dim,
                                       vocab_size=vocab_size, cmvn=cmvn,
                                       streaming=streaming,
                                       encoder_conf=encoder_conf,
                                       decoder_conf=decoder_conf, dtype=dtype,
                                       **model_conf)
    raise ValueError(f"unknown use_model: {use_model}")
