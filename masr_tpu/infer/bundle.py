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


def _quantize_int8(variables):
    """Weight-only int8: each float matrix/conv kernel (ndim ≥ 2) becomes
    {'q': int8, 'scale': f32 per-output-channel (last axis)}; 1-D params
    (biases, norms) stay f32. The analogue of the reference's dynamic
    quantization (torch.quantization.quantize_dynamic over Linears,
    trainer.py:691-697): 4× smaller artifact, dequantized to f32 at load
    so runtime matmuls keep full-precision accumulate."""
    def q(x):
        x = np.asarray(x)
        if x.dtype != np.float32 or x.ndim < 2:
            return x
        amax = np.max(np.abs(x), axis=tuple(range(x.ndim - 1)))
        scale = np.maximum(amax, 1e-8).astype(np.float32) / 127.0
        return {"q": np.clip(np.round(x / scale), -127, 127).astype(np.int8),
                "scale": scale}
    import jax
    return jax.tree.map(q, variables)


def _dequantize_int8(variables):
    def is_q(x):
        return isinstance(x, dict) and set(x.keys()) == {"q", "scale"}

    def dq(x):
        if is_q(x):
            return (np.asarray(x["q"], np.float32)
                    * np.asarray(x["scale"], np.float32))
        return x
    import jax
    return jax.tree.map(dq, variables, is_leaf=is_q)


def save_inference_bundle(out_dir, use_model, streaming, input_dim,
                          vocab_list, mean, istd, encoder_conf, decoder_conf,
                          model_conf, preprocess_conf, variables,
                          half: bool = False, quant: str = None):
    """quant: None | 'bf16' (params stored bfloat16 — half artifact/HBM) |
    'int8' (weight-only per-channel int8 — quarter artifact, dequantized
    at load). `half=True` is kept as an alias for quant='bf16'
    (reference's quantized-export variant, trainer.py:691-697)."""
    quant = quant or ("bf16" if half else None)
    if quant == "bf16":
        import jax
        import jax.numpy as jnp
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            variables)
    elif quant == "int8":
        variables = _quantize_int8(variables)
    elif quant is not None:
        raise ValueError(f"unknown quant mode: {quant}")
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
        "quantization": quant,
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
    if meta.get("quantization") == "int8":
        variables = _dequantize_int8(variables)
    return model, variables, meta, vocab_list
