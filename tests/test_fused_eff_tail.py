"""Efficient-Conformer fused tail: the plain conformer layers after the
last stride/grouped layer route through the fused whole-layer serving
kernel (models/efficient_conformer.py _fused_tail_split); parity against
the all-XLA path in interpret mode on CPU."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from masr_tpu.models.cmvn import GlobalCMVN
from masr_tpu.models.efficient_conformer import EfficientConformerEncoder

import masr_tpu.ops.pallas.conformer_layer as cl

KW = dict(input_size=80, output_size=64, attention_heads=2,
          linear_units=96, num_blocks=4, cnn_module_kernel=7,
          dropout_rate=0.0, attention_dropout_rate=0.0,
          positional_dropout_rate=0.0, cnn_module_norm="layer_norm",
          efficient_conf=dict(stride_layer_idx=[1], stride=[2],
                              group_layer_idx=[0, 1], group_size=3))


@pytest.fixture(autouse=True)
def _route_fused_on_cpu():
    # a Trainer constructed by an earlier test leaves its mesh registered
    # (trainer.py set_active_mesh) — clear it so the B=3 batches here
    # route single-device instead of failing the divisibility check
    from masr_tpu.parallel.mesh import set_active_mesh
    prev = set_active_mesh(None)
    cl.FORCE_ON_CPU = True
    yield
    cl.FORCE_ON_CPU = False
    set_active_mesh(prev)


def _build_pair(causal):
    cmvn = GlobalCMVN(np.zeros(80), np.ones(80))
    enc0 = EfficientConformerEncoder(causal=causal, cmvn=cmvn,
                                     use_fused_layer=False, **KW)
    enc1 = EfficientConformerEncoder(causal=causal, cmvn=cmvn,
                                     use_fused_layer=True, **KW)
    rs = np.random.RandomState(5)
    speech = jnp.asarray(rs.standard_normal((3, 131, 80)), jnp.float32)
    lens = jnp.asarray([131, 100, 52])
    v = enc0.init({"params": jax.random.PRNGKey(0)}, speech, lens)
    leaves, treedef = jax.tree.flatten(v)
    v = jax.tree.unflatten(treedef, [
        l + jnp.asarray(rs.standard_normal(l.shape) * 0.05, l.dtype)
        for l in leaves])
    return enc0, enc1, v, speech, lens


def test_tail_split_picks_plain_suffix():
    enc1 = EfficientConformerEncoder(causal=False,
                                     cmvn=GlobalCMVN(np.zeros(80),
                                                     np.ones(80)),
                                     use_fused_layer=True, **KW)
    rs = np.random.RandomState(5)
    speech = jnp.asarray(rs.standard_normal((3, 131, 80)), jnp.float32)
    lens = jnp.asarray([131, 100, 52])
    v = enc1.init({"params": jax.random.PRNGKey(0)}, speech, lens)
    split = enc1.apply(
        v, method=lambda m: m._fused_tail_split(-1, False, 32, 3))
    assert split == 2          # layers 2,3 are the plain tail
    # the train tail routes through the fused TRAIN kernels
    assert enc1.apply(
        v, method=lambda m: m._fused_tail_split(-1, True, 32, 3)) == 2
    # chunked decode must keep the XLA path
    assert enc1.apply(
        v, method=lambda m: m._fused_tail_split(8, False, 32, 3)) == 4


@pytest.mark.parametrize("causal", [True, False])
def test_fused_tail_matches_xla(causal):
    enc0, enc1, v, speech, lens = _build_pair(causal)
    out0, m0 = enc0.apply(v, speech, lens, decoding_chunk_size=-1,
                          num_decoding_left_chunks=-1)
    out1, m1 = enc1.apply(v, speech, lens, decoding_chunk_size=-1,
                          num_decoding_left_chunks=-1)
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
    T = int(m0[0, 0].sum())
    np.testing.assert_allclose(np.asarray(out1)[:, :T],
                               np.asarray(out0)[:, :T],
                               rtol=2e-4, atol=2e-5)


def test_fused_train_tail_matches_xla_grads():
    """Train-mode tail (fused custom-VJP layers, dropout 0): loss and
    parameter grads match the all-XLA path."""
    enc0, enc1, v, speech, lens = _build_pair(causal=True)

    def loss(enc):
        def f(params):
            out, m = enc.apply(
                {"params": params}, speech, lens, train=True,
                rngs={"dropout": jax.random.PRNGKey(1),
                      "chunk": jax.random.PRNGKey(2)})
            ok = m[:, 0, :, None]
            return jnp.sum((out * ok).astype(jnp.float32) ** 2) * 1e-3
        return f

    l0, g0 = jax.value_and_grad(loss(enc0))(v["params"])
    l1, g1 = jax.value_and_grad(loss(enc1))(v["params"])
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-4)
    f0 = jax.tree.leaves(g0)
    f1 = jax.tree.leaves(g1)
    for a, b in zip(f1, f0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=3e-4)
