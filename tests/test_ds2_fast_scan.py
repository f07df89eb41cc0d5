"""DS2 fast-scan recurrence (hoisted input projection) == flax nn.RNN.

The fast route (models/deepspeech2.py RNNLayer._fast) must reproduce the
nn.RNN(OptimizedLSTMCell|GRUCell) route bit-for-tolerance on the SAME
params: outputs over every timestep (including the garbage-past-length
region both routes leave unmasked) AND the final (h, c) selected at each
example's true length — flax's `_select_last_carry` semantics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masr_tpu.models.deepspeech2 import CRNNEncoder, DeepSpeech2Model


def _build(use_gru, direction, fast, unroll=1):
    return CRNNEncoder(input_dim=16, num_rnn_layers=2, rnn_size=24,
                       rnn_direction=direction, use_gru=use_gru,
                       fast_scan=fast, scan_unroll=unroll)


def _data(B=4, T=21, F=16, seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.standard_normal((B, T, F)), jnp.float32)
    lens = jnp.asarray([T, T - 3, 9, 14], jnp.int32)[:B]
    return x, lens


@pytest.mark.parametrize("use_gru", [False, True])
@pytest.mark.parametrize("direction", ["forward", "bidirect"])
def test_fast_scan_matches_rnn(use_gru, direction):
    x, lens = _data()
    slow = _build(use_gru, direction, fast=False)
    fast = _build(use_gru, direction, fast=True)
    variables = slow.init(jax.random.PRNGKey(0), x, lens)
    out_s = slow.apply(variables, x, lens)
    out_f = fast.apply(variables, x, lens)  # identical param tree
    for a, b, name in zip(out_s, out_f, ["y", "lens", "h", "c"]):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=0, atol=2e-5, err_msg=name)


def test_fast_scan_unroll_invariant():
    x, lens = _data(seed=3)
    variables = _build(False, "forward", fast=False).init(
        jax.random.PRNGKey(1), x, lens)
    y1 = _build(False, "forward", fast=True, unroll=1).apply(
        variables, x, lens)
    y4 = _build(False, "forward", fast=True, unroll=4).apply(
        variables, x, lens)
    np.testing.assert_allclose(np.asarray(y1[0]), np.asarray(y4[0]),
                               atol=2e-6)


def test_fast_scan_threads_streaming_state():
    """Chunked h/c chaining through the fast route == the nn.RNN route ==
    full-context forward on the valid prefix (the DS2 streaming
    invariant)."""
    F, T = 16, 24
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.standard_normal((1, T, F)), jnp.float32)
    outs = {}
    for fast in (False, True):
        model = DeepSpeech2Model(
            input_dim=F, vocab_size=12, streaming=True,
            encoder_conf=dict(num_rnn_layers=2, rnn_size=24,
                              fast_scan=fast))
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, x, jnp.asarray([T]),
            jnp.ones((1, 3), jnp.int32), jnp.asarray([3]))
        full, lens = model.apply(variables, x, jnp.asarray([T]),
                                 method=DeepSpeech2Model.get_encoder_out)
        state = model.apply(variables, method=DeepSpeech2Model.init_cache)
        chunks = []
        for t0 in range(0, T, 8):
            probs, state = model.apply(
                variables, x[:, t0:t0 + 8], state,
                method=DeepSpeech2Model.get_encoder_out_chunk)
            chunks.append(probs)
        outs[fast] = (np.asarray(full), np.asarray(
            jnp.concatenate(chunks, axis=1)))
    # fast == slow on the full-context path AND on the identically
    # chunked h/c-threaded path (chunk==full windowing itself is pinned
    # with the proper conv-aligned windows in test_streaming.py)
    np.testing.assert_allclose(outs[True][0], outs[False][0], atol=2e-5)
    np.testing.assert_allclose(outs[True][1], outs[False][1], atol=2e-5)
