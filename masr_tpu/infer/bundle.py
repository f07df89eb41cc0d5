"""Inference bundle: the deployment artifact
(replaces the reference's TorchScript `inference.pt`, trainer.py:653-697).

A bundle directory contains:
  inference.json  — model + preprocess config (self-contained)
  model.msgpack   — flax params (+ batch_stats if any)
  vocabulary.txt  — token list
The CMVN stats live inside inference.json so the bundle needs no external
mean_istd file (mirroring GlobalCMVN being baked into the TorchScript).
"""
import json
import os

import numpy as np
from flax import serialization

from masr_tpu.models.registry import build_model
from masr_tpu.models.cmvn import GlobalCMVN


def save_inference_bundle(out_dir, use_model, streaming, input_dim,
                          vocab_list, mean, istd, encoder_conf, decoder_conf,
                          model_conf, preprocess_conf, variables,
                          half: bool = False):
    """half=True stores params as bfloat16 — the TPU analogue of the
    reference's dynamic-quantized export variant (trainer.py:691-697):
    halves the artifact and HBM footprint; CTC softmax still runs f32."""
    if half:
        import jax
        import jax.numpy as jnp
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            variables)
    os.makedirs(out_dir, exist_ok=True)
    meta = {
        "framework": "masr_tpu",
        "use_model": use_model,
        "streaming": bool(streaming),
        "input_dim": int(input_dim),
        "vocab_size": len(vocab_list),
        "mean": np.asarray(mean, dtype=np.float64).tolist(),
        "istd": np.asarray(istd, dtype=np.float64).tolist(),
        "encoder_conf": dict(encoder_conf or {}),
        "decoder_conf": dict(decoder_conf or {}),
        "model_conf": dict(model_conf or {}),
        "preprocess_conf": dict(preprocess_conf or {}),
    }
    with open(os.path.join(out_dir, "inference.json"), "w",
              encoding="utf-8") as f:
        json.dump(meta, f, ensure_ascii=False)
    with open(os.path.join(out_dir, "vocabulary.txt"), "w",
              encoding="utf-8") as f:
        for tok in vocab_list:
            f.write(tok + "\t-1\n")
    with open(os.path.join(out_dir, "model.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(variables))


def load_inference_bundle(bundle_dir, dtype=None):
    """→ (model module, variables, meta dict, vocab_list)."""
    import jax.numpy as jnp
    from masr_tpu.data.text_featurizer import TextFeaturizer
    with open(os.path.join(bundle_dir, "inference.json"), "r",
              encoding="utf-8") as f:
        meta = json.load(f)
    tf = TextFeaturizer(os.path.join(bundle_dir, "vocabulary.txt"))
    vocab_list = tf.vocab_list
    model = build_model(
        meta["use_model"], meta["input_dim"], meta["vocab_size"],
        streaming=meta["streaming"], encoder_conf=meta["encoder_conf"],
        decoder_conf=meta["decoder_conf"], model_conf=meta["model_conf"],
        dtype=dtype or jnp.float32,
        cmvn=GlobalCMVN(meta["mean"], meta["istd"]))
    with open(os.path.join(bundle_dir, "model.msgpack"), "rb") as f:
        raw = f.read()
    # template-free deserialization: msgpack restores the pytree structure
    variables = serialization.msgpack_restore(bytearray(raw))
    return model, variables, meta, vocab_list
