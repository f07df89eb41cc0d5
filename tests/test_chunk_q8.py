"""int8-KV-cache fused chunk kernel (ops/pallas/chunk_layer.py:
fused_chunk_layer_q8): must reproduce the bf16 kernel given identically
dequantized caches, bound the quantization error of freshly rolled rows,
and — through the batch engine's kv_cache='int8' knob — keep transcripts
equal to the exact path end-to-end."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from masr_tpu.ops.pallas.chunk_layer import (
    dequantize_kv_cache, fused_chunk_layer, fused_chunk_layer_q8,
    quantize_kv_cache)

B, c, D, F, H, C, KS = 4, 16, 64, 96, 2, 64, 7
d_k = D // H
L = C + c


def _params(rs):
    f32 = jnp.float32
    return {
        "lnw": jnp.asarray(
            rs.standard_normal((6, 2, D)) * 0.1
            + (np.arange(2)[None, :, None] == 0), f32),
        "ffw1": jnp.asarray(rs.standard_normal((2, D, F)) * 0.1, f32),
        "ffb1": jnp.asarray(rs.standard_normal((2, F)) * 0.05, f32),
        "ffw2": jnp.asarray(rs.standard_normal((2, F, D)) * 0.1, f32),
        "vecb": jnp.asarray(rs.standard_normal((8, D)) * 0.05, f32),
        "attw": jnp.asarray(rs.standard_normal((4, D, D)) * 0.1, f32),
        "posb": jnp.asarray(rs.standard_normal((2, D)) * 0.05, f32),
        "pw1w": jnp.asarray(rs.standard_normal((D, 2 * D)) * 0.1, f32),
        "pw1b": jnp.asarray(rs.standard_normal((1, 2 * D)) * 0.05, f32),
        "pw2w": jnp.asarray(rs.standard_normal((D, D)) * 0.1, f32),
        "dww": jnp.asarray(rs.standard_normal((KS, D)) * 0.1, f32),
    }


def test_quantize_roundtrip_bound():
    rs = np.random.RandomState(3)
    cache = jnp.asarray(rs.standard_normal((B, H, C, 2 * d_k)) * 0.7,
                        jnp.float32)
    q, s = quantize_kv_cache(cache)
    assert q.dtype == jnp.int8 and s.shape == (B, 2 * H, C)
    deq = dequantize_kv_cache(q, s)
    # round-to-nearest error ≤ scale/2 = per-row absmax / 254
    rowmax = np.max(np.abs(np.asarray(cache)), axis=-1, keepdims=True)
    err = np.abs(np.asarray(deq) - np.asarray(cache))
    assert np.all(err <= rowmax / 254.0 + 1e-7)


@pytest.mark.parametrize("nslots", [B, 3])
def test_q8_kernel_matches_bf16_on_dequantized_cache(nslots):
    rs = np.random.RandomState(0)
    p = _params(rs)
    x = jnp.asarray(rs.standard_normal((nslots, c, D)) * 0.3, jnp.float32)
    posp = jnp.asarray(rs.standard_normal((nslots, L, D)) * 0.3,
                       jnp.float32)
    cache = jnp.asarray(rs.standard_normal((nslots, H, C, 2 * d_k)) * 0.5,
                        jnp.float32)
    cc = jnp.asarray(rs.standard_normal((nslots, KS - 1, D)) * 0.2,
                     jnp.float32)
    clens = jnp.asarray([0, 16, C, 33][:nslots], jnp.int32)

    q, s = quantize_kv_cache(cache)
    deq = dequantize_kv_cache(q, s)

    y0, nac0, ncc0 = fused_chunk_layer(
        x, posp, deq, cc, clens, p, n_head=H, ksize=KS, interpret=True)
    y8, nac8, nsc8, ncc8 = fused_chunk_layer_q8(
        x, posp, q, s, cc, clens, p, n_head=H, ksize=KS, interpret=True)

    # identical dequantized cache values → outputs match to fp tolerance
    np.testing.assert_allclose(np.asarray(y8), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ncc8), np.asarray(ncc0),
                               rtol=1e-5, atol=1e-5)
    # rolled-forward old rows dequantize exactly; the fresh chunk rows
    # carry one round of per-row absmax quantization error
    deq_new = np.asarray(dequantize_kv_cache(nac8, nsc8))
    ref_new = np.asarray(nac0)
    np.testing.assert_allclose(deq_new[:, :, :C - c], ref_new[:, :, :C - c],
                               rtol=1e-6, atol=1e-6)
    fresh_err = np.abs(deq_new[:, :, C - c:] - ref_new[:, :, C - c:])
    rowmax = np.max(np.abs(ref_new[:, :, C - c:]), axis=-1, keepdims=True)
    assert np.all(fresh_err <= rowmax / 200.0 + 1e-5)
    # rolled scale lanes shift left by c
    np.testing.assert_allclose(np.asarray(nsc8)[:, :, :C - c],
                               np.asarray(s)[:, :, c:], rtol=0, atol=0)


def test_engine_int8_kv_cache_matches_exact_transcripts(tmp_path):
    """BatchStreamSession(kv_cache='int8') must produce the same
    transcripts as the exact vmapped engine on multi-chunk streams."""
    import masr_tpu.ops.pallas.conformer_layer as cl
    from masr_tpu.infer.batch_stream import BatchStreamSession
    from masr_tpu.infer.bundle import save_inference_bundle
    from masr_tpu.infer.predictor import MASRPredictor
    from masr_tpu.models.cmvn import GlobalCMVN
    from masr_tpu.models.registry import build_model

    FEAT = 80
    vocab = ["<blank>", "<unk>", "你", "好", "天", "<space>", "<eos>"]
    enc = dict(output_size=32, attention_heads=2, linear_units=32,
               num_blocks=2, cnn_module_kernel=7)
    dec = dict(attention_heads=2, linear_units=32, num_blocks=1,
               r_num_blocks=0)
    model = build_model("conformer", FEAT, len(vocab), streaming=True,
                        encoder_conf=enc, decoder_conf=dec,
                        model_conf=dict(ctc_weight=0.5),
                        cmvn=GlobalCMVN(np.zeros(FEAT), np.ones(FEAT)))
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        jnp.zeros((1, 67, FEAT)), jnp.asarray([67]),
        jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]), train=False)
    save_inference_bundle(str(tmp_path), "conformer", True, FEAT, vocab,
                          np.zeros(FEAT), np.ones(FEAT), enc, dec,
                          dict(ctc_weight=0.5),
                          {"feature_method": "fbank", "n_mels": FEAT},
                          variables)
    predictor = MASRPredictor(str(tmp_path), decoder="ctc_greedy",
                              warmup=False)
    kw = dict(preprocess_conf=predictor.predictor.meta["preprocess_conf"],
              max_streams=4)
    base = BatchStreamSession(predictor.predictor,
                              predictor._text_featurizer.vocab_list, **kw)
    assert base.kv_cache == "bf16"      # no fused path → int8 unavailable
    cl.FORCE_ON_CPU = True
    try:
        q8 = BatchStreamSession(
            predictor.predictor, predictor._text_featurizer.vocab_list,
            kv_cache="int8", **kw)
        assert q8.kv_cache == "int8" and q8._use_fused_chunk
        assert "att_scale" in q8._template

        def wave(seed, seconds=1.5):
            rs = np.random.RandomState(seed)
            n = int(16000 * seconds)
            t = np.arange(n) / 16000
            return (0.3 * np.sin(2 * np.pi * (200 + 100 * seed) * t)
                    + 0.02 * rs.standard_normal(n)).astype(np.float32)

        waves = [wave(s + 40) for s in range(2)]
        texts = {}
        for name, sess in (("base", base), ("q8", q8)):
            slots = [sess.open() for _ in range(2)]
            res = [None, None]
            step = 4000
            for i in range(max(len(w) for w in waves) // step + 1):
                for k, slot in enumerate(slots):
                    piece = waves[k][i * step:(i + 1) * step]
                    if len(piece) == 0:
                        continue
                    out = sess.feed(slot, piece,
                                    is_end=(i + 1) * step >= len(waves[k]))
                    if out is not None:
                        res[k] = out["text"]
            for slot in slots:
                sess.close(slot)
            texts[name] = res
    finally:
        cl.FORCE_ON_CPU = False
    assert texts["q8"] == texts["base"], texts
