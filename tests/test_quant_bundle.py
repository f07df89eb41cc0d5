"""Weight-only int8 quantized export (the reference's dynamic-quantization
analogue, trainer.py:691-697): quarter-size artifact, near-identical
recognition output after dequantized load."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from masr_tpu.infer.bundle import (load_inference_bundle,
                                   save_inference_bundle)
from masr_tpu.models.cmvn import GlobalCMVN
from masr_tpu.models.registry import build_model

FEAT = 80
VOCAB = ["<blank>", "<unk>", "你", "好", "天", "气", "<space>", "<eos>"]


@pytest.fixture(scope="module")
def model_and_vars():
    enc = dict(output_size=32, attention_heads=2, linear_units=64,
               num_blocks=2, cnn_module_kernel=7)
    dec = dict(linear_units=32, num_blocks=1, r_num_blocks=0)
    model = build_model("conformer", FEAT, len(VOCAB), streaming=True,
                        encoder_conf=enc, decoder_conf=dec,
                        model_conf=dict(ctc_weight=0.5),
                        cmvn=GlobalCMVN(np.zeros(FEAT), np.ones(FEAT)))
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        jnp.zeros((1, 67, FEAT)), jnp.asarray([67]),
        jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]), train=False)
    return enc, dec, model, jax.device_get(variables)


def _save(tmp_path, enc, dec, variables, name, **kw):
    out = str(tmp_path / name)
    save_inference_bundle(out, "conformer", True, FEAT, VOCAB,
                          np.zeros(FEAT), np.ones(FEAT), enc, dec,
                          dict(ctc_weight=0.5),
                          {"feature_method": "fbank", "n_mels": FEAT},
                          variables, **kw)
    return out


def test_int8_bundle_size_and_roundtrip(tmp_path, model_and_vars):
    enc, dec, model, variables = model_and_vars
    d_f32 = _save(tmp_path, enc, dec, variables, "f32")
    d_int8 = _save(tmp_path, enc, dec, variables, "int8", quant="int8")
    s_f32 = os.path.getsize(os.path.join(d_f32, "model.msgpack"))
    s_int8 = os.path.getsize(os.path.join(d_int8, "model.msgpack"))
    assert s_int8 < 0.45 * s_f32, f"int8 {s_int8} vs f32 {s_f32}"

    _, v_f32, meta_f32, _ = load_inference_bundle(d_f32)
    _, v_int8, meta_int8, _ = load_inference_bundle(d_int8)
    assert meta_int8["quantization"] == "int8"
    assert not meta_f32.get("quantization")
    # dequantized tree has the SAME structure and dtypes as the original
    assert jax.tree_util.tree_structure(v_f32) \
        == jax.tree_util.tree_structure(v_int8)
    # per-channel error bounded by the scale step
    for a, b in zip(jax.tree.leaves(v_f32), jax.tree.leaves(v_int8)):
        a, b = np.asarray(a), np.asarray(b)
        if a.ndim >= 2 and a.dtype == np.float32:
            amax = np.max(np.abs(a), axis=tuple(range(a.ndim - 1)),
                          keepdims=True)
            assert np.all(np.abs(a - b) <= amax / 127.0 * 0.51 + 1e-8)
        else:
            np.testing.assert_array_equal(a, b)


def test_int8_predictions_close_to_f32(tmp_path, model_and_vars):
    enc, dec, model, variables = model_and_vars
    d_f32 = _save(tmp_path, enc, dec, variables, "f32b")
    d_int8 = _save(tmp_path, enc, dec, variables, "int8b", quant="int8")
    from masr_tpu.infer.predictor import MASRPredictor
    p1 = MASRPredictor(d_f32, decoder="ctc_greedy", warmup=False)
    p2 = MASRPredictor(d_int8, decoder="ctc_greedy", warmup=False)
    rs = np.random.RandomState(0)
    t = np.arange(16000) / 16000
    wav = (0.3 * np.sin(2 * np.pi * 400 * t)
           + 0.02 * rs.standard_normal(16000)).astype(np.float32)
    feats = p1._audio_featurizer.featurize_waveform(wav, 16000)
    probs1, lens1 = p1.predictor.predict(feats[None],
                                         np.asarray([feats.shape[0]]))
    probs2, lens2 = p2.predictor.predict(feats[None],
                                         np.asarray([feats.shape[0]]))
    assert int(lens1[0]) == int(lens2[0])
    # weight-only int8 on a 2-layer model: probs stay close
    diff = np.abs(probs1 - probs2)[:, : int(lens1[0])]
    assert diff.max() < 0.05, diff.max()
    r1 = p1.predict(wav, sample_rate=16000)
    r2 = p2.predict(wav, sample_rate=16000)
    assert r1["text"] == r2["text"]


def test_bf16_alias_still_works(tmp_path, model_and_vars):
    enc, dec, model, variables = model_and_vars
    d = _save(tmp_path, enc, dec, variables, "bf16", half=True)
    _, v, meta, _ = load_inference_bundle(d)
    assert meta["quantization"] == "bf16"
    import jax.numpy as jnp
    kernels = [x for x in jax.tree.leaves(v)
               if hasattr(x, "dtype") and x.ndim >= 2]
    assert any(x.dtype == jnp.bfloat16 for x in kernels)
