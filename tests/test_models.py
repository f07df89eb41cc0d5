import numpy as np
import pytest

import jax
import jax.numpy as jnp

from masr_tpu.models.cmvn import GlobalCMVN
from masr_tpu.models.conformer import ConformerModel
from masr_tpu.models.deepspeech2 import DeepSpeech2Model

FEAT = 80
VOCAB = 50


def _cmvn():
    return GlobalCMVN(np.zeros(FEAT), np.ones(FEAT))


def _batch(rs, B=2, T=67, L=4):
    speech = jnp.asarray(rs.standard_normal((B, T, FEAT)), jnp.float32)
    lens = jnp.asarray([T, T - 17])
    text = jnp.asarray(rs.randint(2, VOCAB - 2, (B, L)), jnp.int32)
    text = text.at[1, 2:].set(-1)
    tlens = jnp.asarray([L, 2])
    return speech, lens, text, tlens


@pytest.fixture(scope="module")
def conformer():
    model = ConformerModel(
        input_dim=FEAT, vocab_size=VOCAB, cmvn=_cmvn(), streaming=True,
        encoder_conf=dict(output_size=32, attention_heads=2, linear_units=64,
                          num_blocks=2, cnn_module_kernel=7),
        decoder_conf=dict(linear_units=32, num_blocks=1, r_num_blocks=1),
        ctc_weight=0.3, reverse_weight=0.3, lsm_weight=0.1)
    rs = np.random.RandomState(0)
    speech, lens, text, tlens = _batch(rs)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        speech, lens, text, tlens, train=True)
    return model, variables


def test_conformer_loss(conformer):
    model, variables = conformer
    rs = np.random.RandomState(1)
    speech, lens, text, tlens = _batch(rs)
    rng = jax.random.PRNGKey(1)
    out = jax.jit(model.apply, static_argnames=("train",))(
        variables, speech, lens, text, tlens, train=True,
        rngs={"dropout": rng, "chunk": rng})
    assert np.isfinite(float(out["loss"]))
    expect = 0.3 * float(out["loss_ctc"]) + 0.7 * float(out["loss_att"])
    assert abs(float(out["loss"]) - expect) < 1e-3


def test_conformer_encoder_out(conformer):
    model, variables = conformer
    rs = np.random.RandomState(2)
    speech, lens, _, _ = _batch(rs)
    probs, elens = jax.jit(
        lambda v, s, l: model.apply(v, s, l,
                                    method=ConformerModel.get_encoder_out))(
        variables, speech, lens)
    assert probs.shape[-1] == VOCAB
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-4)
    assert int(elens[0]) == probs.shape[1]


def test_conformer_streaming_equivalence(conformer):
    """THE key invariant (SURVEY.md §4): chained forward_chunk must match
    full-context forward with the matching static chunk mask."""
    model, variables = conformer
    rs = np.random.RandomState(3)
    chunk, left_chunks, sub, ctx = 4, 2, 4, 7
    n_chunks = 4
    stride = chunk * sub  # 16 input frames per chunk
    window = (chunk - 1) * sub + ctx  # 19 frames fed per chunk step
    T = stride * n_chunks + (ctx - sub)  # enough frames for n_chunks windows
    speech = jnp.asarray(rs.standard_normal((1, T, FEAT)), jnp.float32)
    lens = jnp.asarray([T])

    # full-context with the same chunk mask the stream sees
    full, _ = model.apply(
        variables, speech, lens, decoding_chunk_size=chunk,
        num_decoding_left_chunks=left_chunks,
        method=lambda m, s, l, **kw: m.encoder(s, l, **kw))

    # chained chunk steps
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

    full_np = np.asarray(full)[:, :stream.shape[1]]
    np.testing.assert_allclose(stream, full_np, rtol=1e-3, atol=1e-3)


def test_conformer_chunk_probs_state(conformer):
    model, variables = conformer
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.standard_normal((1, 19, FEAT)), jnp.float32)
    state = model.apply(variables,
                        method=lambda m: m.encoder.init_cache(
                            batch=1, cache_size=8))
    probs, new_state = model.apply(
        variables, x, state, method=ConformerModel.get_encoder_out_chunk)
    assert probs.shape == (1, 4, VOCAB)
    assert int(new_state["offset"]) == 4
    assert int(new_state["cache_len"]) == 4
    assert new_state["att_cache"].shape == state["att_cache"].shape


@pytest.fixture(scope="module")
def ds2():
    model = DeepSpeech2Model(
        input_dim=FEAT, vocab_size=VOCAB, cmvn=_cmvn(), streaming=True,
        encoder_conf=dict(num_rnn_layers=2, rnn_size=32))
    rs = np.random.RandomState(0)
    speech, lens, text, tlens = _batch(rs)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng}, speech, lens, text, tlens, train=True)
    return model, variables


def test_ds2_loss_and_softmax(ds2):
    model, variables = ds2
    rs = np.random.RandomState(5)
    speech, lens, text, tlens = _batch(rs)
    out = jax.jit(model.apply, static_argnames=("train",))(
        variables, speech, lens, text, tlens, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(float(out["loss"]))
    probs, elens = model.apply(variables, speech, lens,
                               method=DeepSpeech2Model.get_encoder_out)
    np.testing.assert_allclose(
        np.asarray(probs)[0, : int(elens[0])].sum(-1), 1.0, atol=1e-4)


def test_ds2_streaming_equivalence(ds2):
    """Chunked h/c-threaded encode must equal full-context encode (the DS2
    analogue of forward_chunk chaining, deepspeech2/model.py:70-77)."""
    model, variables = ds2
    rs = np.random.RandomState(6)
    sub, ctx = 4, 7
    chunk_in = 16 + (ctx - sub)  # one extra window overlap handled below
    n_chunks = 3
    stride = 16
    window = stride + ctx - sub  # 19
    T = stride * n_chunks + (ctx - sub)
    speech = jnp.asarray(rs.standard_normal((1, T, FEAT)), jnp.float32)
    full_probs, full_lens = model.apply(
        variables, speech, jnp.asarray([T]),
        method=DeepSpeech2Model.get_encoder_out)
    state = model.apply(variables, method=lambda m: m.init_cache(batch=1))
    outs = []
    for i in range(n_chunks):
        x = speech[:, i * stride: i * stride + window]
        probs, state = model.apply(variables, x, state,
                                   method=DeepSpeech2Model.get_encoder_out_chunk)
        outs.append(np.asarray(probs))
    stream = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(stream,
                               np.asarray(full_probs)[:, : stream.shape[1]],
                               rtol=1e-3, atol=1e-3)


def test_registry_builds_all(tmp_path):
    import json
    from masr_tpu.models import build_model
    p = tmp_path / "mean_istd.json"
    p.write_text(json.dumps({"mean": [0.0] * FEAT, "istd": [1.0] * FEAT}))
    for name in ["deepspeech2", "conformer"]:
        m = build_model(name, FEAT, VOCAB, str(p), streaming=True,
                        encoder_conf=(dict(num_rnn_layers=1, rnn_size=16)
                                      if name == "deepspeech2" else
                                      dict(output_size=16, attention_heads=2,
                                           linear_units=16, num_blocks=1)),
                        decoder_conf=(None if name == "deepspeech2" else
                                      dict(linear_units=16, num_blocks=1)))
        assert m is not None


def test_conformer_streaming_soak_many_rollovers(conformer):
    """Long-session invariant: 24 chained chunk steps (the fixed-shape
    right-aligned cache rolls over ~12×) still match full-context with
    the same chunk mask — pins cache rollover + offset pos-enc across a
    long stream, not just the first few windows."""
    import jax.numpy as jnp
    model, variables = conformer
    rs = np.random.RandomState(11)
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
    full_np = np.asarray(full)[:, :stream.shape[1]]
    np.testing.assert_allclose(stream, full_np, rtol=1e-3, atol=1e-3)
    # the tail of a long stream is as accurate as the head (no drift)
    tail_err = np.abs(stream[:, -stride:] - full_np[:, -stride:]).max()
    head_err = np.abs(stream[:, :stride] - full_np[:, :stride]).max()
    assert tail_err < max(10 * max(head_err, 1e-6), 1e-3)
