"""Squeezeformer + Efficient-Conformer: loss forward, encoder output, and
the cache-rescaling streaming equivalence (SURVEY.md §7 hard parts)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from masr_tpu.models.cmvn import GlobalCMVN
from masr_tpu.models.squeezeformer import SqueezeformerModel
from masr_tpu.models.efficient_conformer import EfficientConformerModel

FEAT = 80
VOCAB = 50


def _cmvn():
    return GlobalCMVN(np.zeros(FEAT), np.ones(FEAT))


def _batch(rs, B=2, T=131, L=4):
    speech = jnp.asarray(rs.standard_normal((B, T, FEAT)), jnp.float32)
    lens = jnp.asarray([T, T - 17])
    text = jnp.asarray(rs.randint(2, VOCAB - 2, (B, L)), jnp.int32)
    tlens = jnp.asarray([L, L - 1])
    return speech, lens, text, tlens


@pytest.fixture(scope="module")
def squeezeformer():
    model = SqueezeformerModel(
        input_dim=FEAT, vocab_size=VOCAB, cmvn=_cmvn(), streaming=True,
        encoder_conf=dict(encoder_dim=32, output_size=32, attention_heads=2,
                          num_blocks=4, reduce_idx=1, recover_idx=3,
                          feed_forward_expansion_factor=2,
                          cnn_module_kernel=7),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                          r_num_blocks=0),
        ctc_weight=0.5, lsm_weight=0.1)
    rs = np.random.RandomState(0)
    speech, lens, text, tlens = _batch(rs)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        speech, lens, text, tlens, train=True)
    return model, variables


def test_squeezeformer_loss(squeezeformer):
    model, variables = squeezeformer
    rs = np.random.RandomState(1)
    speech, lens, text, tlens = _batch(rs)
    rng = jax.random.PRNGKey(1)
    out, updates = jax.jit(model.apply,
                           static_argnames=("train", "mutable"))(
        variables, speech, lens, text, tlens, train=True,
        rngs={"dropout": rng, "chunk": rng}, mutable=("batch_stats",))
    assert np.isfinite(float(out["loss"]))
    assert "batch_stats" in updates  # squeezeformer conv uses BatchNorm


def test_squeezeformer_encoder_out_recovers_length(squeezeformer):
    model, variables = squeezeformer
    rs = np.random.RandomState(2)
    speech, lens, _, _ = _batch(rs)
    probs, elens = jax.jit(
        lambda v, s, l: model.apply(
            v, s, l, method=SqueezeformerModel.get_encoder_out))(
        variables, speech, lens)
    # reduce/recover must restore full encoder frame rate
    assert probs.shape[1] == (( (131 - 1) // 2 - 1) // 2)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-4)


def test_squeezeformer_streaming_equivalence(squeezeformer):
    """Chained forward_chunk (with cache de-dup/re-inflate across the
    reduce/recover U-Net) must match full-context forward with the same
    static chunk mask."""
    model, variables = squeezeformer
    rs = np.random.RandomState(3)
    chunk, left_chunks, sub, ctx = 4, 2, 4, 7
    n_chunks = 4
    stride = chunk * sub
    window = (chunk - 1) * sub + ctx
    T = stride * n_chunks + (ctx - sub)
    speech = jnp.asarray(rs.standard_normal((1, T, FEAT)), jnp.float32)
    lens = jnp.asarray([T])

    full, _ = model.apply(
        variables, speech, lens, decoding_chunk_size=chunk,
        num_decoding_left_chunks=left_chunks,
        method=lambda m, s, l, **kw: m.encoder(s, l, **kw))

    C = chunk * left_chunks
    state = model.apply(variables,
                        method=lambda m: m.encoder.init_cache(
                            batch=1, cache_size=C))
    step = jax.jit(lambda v, x, st: model.apply(
        v, x, st, method=lambda m, x_, st_: m.encoder.forward_chunk(
            x_, st_["offset"], st_["att_cache"], st_["cnn_cache"],
            st_["cache_len"])))
    outs = []
    for i in range(n_chunks):
        x = speech[:, i * stride: i * stride + window]
        ys, att, cnn = step(variables, x, state)
        state = {"att_cache": att, "cnn_cache": cnn,
                 "offset": state["offset"] + ys.shape[1],
                 "cache_len": jnp.minimum(state["cache_len"] + ys.shape[1], C)}
        outs.append(np.asarray(ys))
    stream = np.concatenate(outs, axis=1)
    full_np = np.asarray(full)[:, : stream.shape[1]]
    np.testing.assert_allclose(stream, full_np, rtol=2e-3, atol=2e-3)


@pytest.fixture(scope="module")
def eff_conformer():
    model = EfficientConformerModel(
        input_dim=FEAT, vocab_size=VOCAB, cmvn=_cmvn(), streaming=True,
        encoder_conf=dict(output_size=32, attention_heads=2, linear_units=32,
                          num_blocks=4, cnn_module_kernel=8,
                          cnn_module_norm="layer_norm",
                          efficient_conf=dict(stride_layer_idx=[1],
                                              stride=[2],
                                              group_layer_idx=[0, 1],
                                              group_size=3,
                                              stride_kernel=True)),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                          r_num_blocks=0),
        ctc_weight=0.5, lsm_weight=0.1)
    rs = np.random.RandomState(0)
    speech, lens, text, tlens = _batch(rs)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        speech, lens, text, tlens, train=True)
    return model, variables


def test_eff_conformer_loss(eff_conformer):
    model, variables = eff_conformer
    rs = np.random.RandomState(4)
    speech, lens, text, tlens = _batch(rs)
    rng = jax.random.PRNGKey(1)
    out = jax.jit(model.apply, static_argnames=("train",))(
        variables, speech, lens, text, tlens, train=True,
        rngs={"dropout": rng, "chunk": rng})
    assert np.isfinite(float(out["loss"]))


def test_eff_conformer_output_is_strided(eff_conformer):
    model, variables = eff_conformer
    rs = np.random.RandomState(5)
    speech, lens, _, _ = _batch(rs)
    probs, elens = jax.jit(
        lambda v, s, l: model.apply(
            v, s, l, method=EfficientConformerModel.get_encoder_out))(
        variables, speech, lens)
    T2 = ((131 - 1) // 2 - 1) // 2
    assert probs.shape[1] == -(-T2 // 2)  # halved by the stride layer
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-4)


@pytest.fixture(scope="module")
def eff_conformer_g1():
    """group_size=1 exercises the grouped-attention code path exactly
    (grouped attention with g>1 is only approximately streaming-consistent,
    in the reference too — group boundaries shift with the key window)."""
    model = EfficientConformerModel(
        input_dim=FEAT, vocab_size=VOCAB, cmvn=_cmvn(), streaming=True,
        encoder_conf=dict(output_size=32, attention_heads=2, linear_units=32,
                          num_blocks=4, cnn_module_kernel=8,
                          cnn_module_norm="layer_norm",
                          efficient_conf=dict(stride_layer_idx=[1],
                                              stride=[2],
                                              group_layer_idx=[0, 1],
                                              group_size=1,
                                              stride_kernel=True)),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                          r_num_blocks=0),
        ctc_weight=0.5, lsm_weight=0.1)
    rs = np.random.RandomState(0)
    speech, lens, text, tlens = _batch(rs)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        speech, lens, text, tlens, train=True)
    return model, variables


def test_eff_conformer_streaming_equivalence(eff_conformer_g1):
    model, variables = eff_conformer_g1
    rs = np.random.RandomState(6)
    chunk, left_chunks, sub, ctx = 4, 2, 4, 7
    n_chunks = 4
    stride = chunk * sub
    window = (chunk - 1) * sub + ctx
    T = stride * n_chunks + (ctx - sub)
    speech = jnp.asarray(rs.standard_normal((1, T, FEAT)), jnp.float32)
    lens = jnp.asarray([T])

    full, _ = model.apply(
        variables, speech, lens, decoding_chunk_size=chunk,
        num_decoding_left_chunks=left_chunks,
        method=lambda m, s, l, **kw: m.encoder(s, l, **kw))

    C = chunk * left_chunks
    state = model.apply(variables,
                        method=lambda m: m.encoder.init_cache(
                            batch=1, cache_size=C))
    outs = []
    for i in range(n_chunks):
        x = speech[:, i * stride: i * stride + window]
        probs, state = model.apply(
            variables, x, state,
            method=EfficientConformerModel.get_encoder_out_chunk)
        outs.append(np.asarray(probs))
    stream = np.concatenate(outs, axis=1)
    # compare CTC probs of full-context (same mask) vs streamed
    full_probs = np.asarray(model.apply(
        variables, full, method=lambda m, e: m.ctc.softmax(e)))
    np.testing.assert_allclose(stream, full_probs[:, : stream.shape[1]],
                               rtol=2e-3, atol=2e-3)


def test_eff_conformer_grouped_streaming_runs(eff_conformer):
    """g=3 grouped streaming: exact equivalence is impossible (see module
    docstring) — assert the chunk step runs, emits sane probs, and the
    stream stays numerically close to full context."""
    model, variables = eff_conformer
    rs = np.random.RandomState(7)
    chunk, sub, ctx = 4, 4, 7
    stride = chunk * sub
    window = (chunk - 1) * sub + ctx
    T = stride * 3 + (ctx - sub)
    speech = jnp.asarray(rs.standard_normal((1, T, FEAT)), jnp.float32)
    state = model.apply(variables,
                        method=lambda m: m.encoder.init_cache(
                            batch=1, cache_size=8))
    outs = []
    for i in range(3):
        x = speech[:, i * stride: i * stride + window]
        probs, state = model.apply(
            variables, x, state,
            method=EfficientConformerModel.get_encoder_out_chunk)
        outs.append(np.asarray(probs))
    stream = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(stream.sum(-1), 1.0, atol=1e-4)
    full, _ = model.apply(
        variables, speech, jnp.asarray([T]), decoding_chunk_size=chunk,
        num_decoding_left_chunks=2,
        method=lambda m, s, l, **kw: m.encoder(s, l, **kw))
    full_probs = np.asarray(model.apply(
        variables, full, method=lambda m, e: m.ctc.softmax(e)))
    # random-weight probs are near-uniform so argmax is meaningless; bound
    # the average probability drift from group-boundary quantization instead
    diff = np.abs(stream - full_probs[:, : stream.shape[1]])
    assert diff.mean() < 0.02


def test_registry_builds_sq_eff(tmp_path):
    import json
    from masr_tpu.models import build_model
    p = tmp_path / "mean_istd.json"
    p.write_text(json.dumps({"mean": [0.0] * FEAT, "istd": [1.0] * FEAT}))
    for name in ["squeezeformer", "efficient_conformer"]:
        m = build_model(name, FEAT, VOCAB, str(p), streaming=True,
                        encoder_conf=(dict(encoder_dim=16, output_size=16,
                                           attention_heads=2, num_blocks=2,
                                           reduce_idx=0, recover_idx=1,
                                           feed_forward_expansion_factor=2)
                                      if name == "squeezeformer" else
                                      dict(output_size=16, attention_heads=2,
                                           linear_units=16, num_blocks=2)),
                        decoder_conf=dict(attention_heads=2, linear_units=16,
                                          num_blocks=1, r_num_blocks=0))
        assert m is not None


def test_squeezeformer_streaming_soak_many_rollovers(squeezeformer):
    """24 chained chunk steps through the reduce/recover U-Net (the
    fixed-shape caches with per-layer time-scaling roll over ~12×) keep
    matching full context — long-session pin for the trickiest cache
    machinery (SURVEY.md §7 hard parts)."""
    model, variables = squeezeformer
    rs = np.random.RandomState(17)
    chunk, left_chunks, sub, ctx = 4, 2, 4, 7
    n_chunks = 24
    stride = chunk * sub
    window = (chunk - 1) * sub + ctx
    T = stride * n_chunks + (ctx - sub)
    speech = jnp.asarray(rs.standard_normal((1, T, FEAT)), jnp.float32)
    lens = jnp.asarray([T])
    full, _ = model.apply(
        variables, speech, lens, decoding_chunk_size=chunk,
        num_decoding_left_chunks=left_chunks,
        method=lambda m, s, l, **kw: m.encoder(s, l, **kw))
    C = chunk * left_chunks
    state = model.apply(variables,
                        method=lambda m: m.encoder.init_cache(
                            batch=1, cache_size=C))
    step = jax.jit(lambda v, x, st: model.apply(
        v, x, st, method=lambda m, x_, st_: m.encoder.forward_chunk(
            x_, st_["offset"], st_["att_cache"], st_["cnn_cache"],
            st_["cache_len"])))
    outs = []
    for i in range(n_chunks):
        x = speech[:, i * stride: i * stride + window]
        ys, att, cnn = step(variables, x, state)
        state = {"att_cache": att, "cnn_cache": cnn,
                 "offset": state["offset"] + ys.shape[1],
                 "cache_len": jnp.minimum(state["cache_len"] + ys.shape[1],
                                          C)}
        outs.append(np.asarray(ys))
    stream = np.concatenate(outs, axis=1)
    full_np = np.asarray(full)[:, : stream.shape[1]]
    np.testing.assert_allclose(stream, full_np, rtol=2e-3, atol=2e-3)
    tail_err = np.abs(stream[:, -stride:] - full_np[:, -stride:]).max()
    assert tail_err < 2e-3


def test_eff_conformer_streaming_soak_many_rollovers(eff_conformer_g1):
    """24 chunk steps across the stride layer (caches sliced [::2] then
    re-inflated, rolling over many times) keep matching full context —
    long-session pin for the stride-cache reconciliation."""
    model, variables = eff_conformer_g1
    rs = np.random.RandomState(23)
    chunk, left_chunks, sub, ctx = 4, 2, 4, 7
    n_chunks = 24
    stride = chunk * sub
    window = (chunk - 1) * sub + ctx
    T = stride * n_chunks + (ctx - sub)
    speech = jnp.asarray(rs.standard_normal((1, T, FEAT)), jnp.float32)
    lens = jnp.asarray([T])
    full, _ = model.apply(
        variables, speech, lens, decoding_chunk_size=chunk,
        num_decoding_left_chunks=left_chunks,
        method=lambda m, s, l, **kw: m.encoder(s, l, **kw))
    C = chunk * left_chunks
    state = model.apply(variables,
                        method=lambda m: m.encoder.init_cache(
                            batch=1, cache_size=C))
    step = jax.jit(lambda v, x, st: model.apply(
        v, x, st, method=EfficientConformerModel.get_encoder_out_chunk))
    outs = []
    for i in range(n_chunks):
        x = speech[:, i * stride: i * stride + window]
        probs, state = step(variables, x, state)
        outs.append(np.asarray(probs))
    stream = np.concatenate(outs, axis=1)
    full_probs = np.asarray(model.apply(
        variables, full, method=lambda m, e: m.ctc.softmax(e)))
    full_np = full_probs[:, : stream.shape[1]]
    np.testing.assert_allclose(stream, full_np, rtol=2e-3, atol=2e-3)
    tail_err = np.abs(stream[:, -4:] - full_np[:, -4:]).max()
    assert tail_err < 2e-3  # no drift accumulation at the stream tail
