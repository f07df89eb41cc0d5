"""Fused whole-layer Pallas kernel (ops/pallas/conformer_layer.py):
equivalence with the XLA layer path (interpret mode on CPU) and the
eligibility guards."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from masr_tpu.models.cmvn import GlobalCMVN
from masr_tpu.models.conformer import ConformerEncoder

import masr_tpu.ops.pallas.conformer_layer as cl

KW = dict(input_size=80, output_size=64, attention_heads=2,
          linear_units=96, num_blocks=2, cnn_module_kernel=7,
          dropout_rate=0.0, attention_dropout_rate=0.0,
          positional_dropout_rate=0.0)


@pytest.fixture(autouse=True)
def _route_fused_on_cpu():
    """Eligibility requires a TPU backend; force the interpret-mode route
    so these CPU tests actually exercise the kernel."""
    cl.FORCE_ON_CPU = True
    yield
    cl.FORCE_ON_CPU = False


def _build_pair(causal, **extra):
    cmvn = GlobalCMVN(np.zeros(80), np.ones(80))
    enc0 = ConformerEncoder(causal=causal, cmvn=cmvn, use_fused_layer=False,
                            **KW, **extra)
    enc1 = ConformerEncoder(causal=causal, cmvn=cmvn, use_fused_layer=True,
                            **KW, **extra)
    rs = np.random.RandomState(3)
    speech = jnp.asarray(rs.standard_normal((3, 131, 80)), jnp.float32)
    lens = jnp.asarray([131, 100, 52])
    v = enc0.init({"params": jax.random.PRNGKey(0)}, speech, lens)
    # nonzero biases everywhere: fresh-init zeros once masked a parity bug
    # in the conv module's pre-pointwise time padding
    leaves, treedef = jax.tree.flatten(v)
    v = jax.tree.unflatten(treedef, [
        l + jnp.asarray(rs.standard_normal(l.shape) * 0.05, l.dtype)
        for l in leaves])
    return enc0, enc1, v, speech, lens


@pytest.mark.parametrize("causal", [True, False])
def test_fused_matches_xla_full_context(causal):
    enc0, enc1, v, speech, lens = _build_pair(causal)
    out0, m0 = enc0.apply(v, speech, lens, decoding_chunk_size=-1,
                          num_decoding_left_chunks=-1)
    out1, m1 = enc1.apply(v, speech, lens, decoding_chunk_size=-1,
                          num_decoding_left_chunks=-1)
    assert bool(jnp.all(m0 == m1))
    valid = np.asarray(m0[:, 0, :])
    np.testing.assert_allclose(np.asarray(out0)[valid],
                               np.asarray(out1)[valid],
                               rtol=1e-4, atol=1e-4)


def test_fused_falls_back_for_chunked_decode():
    """decoding_chunk_size != -1 must take the XLA path → bit-identical."""
    enc0, enc1, v, speech, lens = _build_pair(True)
    out0, _ = enc0.apply(v, speech, lens, decoding_chunk_size=8,
                         num_decoding_left_chunks=2)
    out1, _ = enc1.apply(v, speech, lens, decoding_chunk_size=8,
                         num_decoding_left_chunks=2)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))


def test_fused_falls_back_in_train_mode():
    """train=True must take the XLA path (dropout etc.) → identical with
    the same rngs."""
    enc0, enc1, v, speech, lens = _build_pair(True)
    rngs = {"dropout": jax.random.PRNGKey(1), "chunk": jax.random.PRNGKey(2)}
    out0, _ = enc0.apply(v, speech, lens, train=True, rngs=rngs)
    out1, _ = enc1.apply(v, speech, lens, train=True, rngs=rngs)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))


def test_fused_vmem_guard():
    from masr_tpu.ops.pallas.conformer_layer import fused_layer_supported
    assert fused_layer_supported(300, 256, 2048, jnp.bfloat16)
    # long-form T blows the scores budget → must fall back
    assert not fused_layer_supported(4800, 256, 2048, jnp.bfloat16)


def test_fused_requires_tpu_backend_by_default():
    """Without FORCE_ON_CPU, a CPU backend must fall back to XLA even with
    use_fused_layer=True (the session default)."""
    cl.FORCE_ON_CPU = False
    enc0, enc1, v, speech, lens = _build_pair(True)
    out0, _ = enc0.apply(v, speech, lens, decoding_chunk_size=-1,
                         num_decoding_left_chunks=-1)
    out1, _ = enc1.apply(v, speech, lens, decoding_chunk_size=-1,
                         num_decoding_left_chunks=-1)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))


def test_fused_bf16_smoke():
    cmvn = GlobalCMVN(np.zeros(80), np.ones(80))
    enc1 = ConformerEncoder(causal=True, cmvn=cmvn, use_fused_layer=True,
                            dtype=jnp.bfloat16, **KW)
    rs = np.random.RandomState(4)
    speech = jnp.asarray(rs.standard_normal((2, 67, 80)), jnp.float32)
    lens = jnp.asarray([67, 50])
    v = enc1.init({"params": jax.random.PRNGKey(0)}, speech, lens)
    out, m = enc1.apply(v, speech, lens, decoding_chunk_size=-1,
                        num_decoding_left_chunks=-1)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()


@pytest.mark.parametrize("causal", [True, False])
def test_fused_matches_xla_unaligned_T(causal):
    """T2=35 (pad_t=13): the tile-alignment rows must behave like
    nn.Conv zero padding, not in-array masked rows (review finding:
    6.9e-3..4.5e-2 divergence before the t_real guard)."""
    cmvn = GlobalCMVN(np.zeros(80), np.ones(80))
    rs = np.random.RandomState(9)
    enc0 = ConformerEncoder(causal=causal, cmvn=cmvn, use_fused_layer=False,
                            **KW)
    enc1 = ConformerEncoder(causal=causal, cmvn=cmvn, use_fused_layer=True,
                            **KW)
    speech = jnp.asarray(rs.standard_normal((2, 143, 80)), jnp.float32)
    lens = jnp.asarray([143, 101])
    v = enc0.init({"params": jax.random.PRNGKey(1)}, speech, lens)
    leaves, td = jax.tree.flatten(v)
    v = jax.tree.unflatten(td, [
        l + jnp.asarray(rs.standard_normal(l.shape) * 0.05, l.dtype)
        for l in leaves])
    out0, m0 = enc0.apply(v, speech, lens, decoding_chunk_size=-1,
                          num_decoding_left_chunks=-1)
    out1, _ = enc1.apply(v, speech, lens, decoding_chunk_size=-1,
                         num_decoding_left_chunks=-1)
    valid = np.asarray(m0[:, 0, :])
    np.testing.assert_allclose(np.asarray(out0)[valid],
                               np.asarray(out1)[valid],
                               rtol=1e-4, atol=1e-4)


def test_fused_falls_back_for_static_chunk_models():
    """static_chunk_size > 0 keeps its block mask even at decode -1
    (masks.py:87) — the fused full-context path must NOT engage
    (review finding: 0.104 divergence before the guard)."""
    cmvn = GlobalCMVN(np.zeros(80), np.ones(80))
    kw = dict(KW, use_dynamic_chunk=False, static_chunk_size=8)
    enc0 = ConformerEncoder(causal=True, cmvn=cmvn, use_fused_layer=False,
                            **kw)
    enc1 = ConformerEncoder(causal=True, cmvn=cmvn, use_fused_layer=True,
                            **kw)
    rs = np.random.RandomState(2)
    speech = jnp.asarray(rs.standard_normal((2, 131, 80)), jnp.float32)
    lens = jnp.asarray([131, 90])
    v = enc0.init({"params": jax.random.PRNGKey(0)}, speech, lens)
    out0, _ = enc0.apply(v, speech, lens, decoding_chunk_size=-1,
                         num_decoding_left_chunks=-1)
    out1, _ = enc1.apply(v, speech, lens, decoding_chunk_size=-1,
                         num_decoding_left_chunks=-1)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))
