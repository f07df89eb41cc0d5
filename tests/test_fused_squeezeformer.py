"""Fused whole-layer Squeezeformer serving kernel
(ops/pallas/squeezeformer_layer.py): equivalence with the XLA layer path
(interpret mode on CPU) across post-norm, AdaptiveScale, BatchNorm
folding, causal/non-causal conv, and the reduce/recover resolution
changes — mirroring tests/test_fused_layer.py (VERDICT r2 item 6)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from masr_tpu.models.cmvn import GlobalCMVN
from masr_tpu.models.squeezeformer import SqueezeformerEncoder

import masr_tpu.ops.pallas.conformer_layer as cl

KW = dict(input_size=80, encoder_dim=64, output_size=64,
          attention_heads=2, num_blocks=3, reduce_idx=1, recover_idx=2,
          feed_forward_expansion_factor=2, cnn_module_kernel=7,
          dropout=0.0, attention_dropout_rate=0.0,
          feed_forward_dropout_rate=0.0, input_dropout_rate=0.0)


@pytest.fixture(autouse=True)
def _route_fused_on_cpu():
    cl.FORCE_ON_CPU = True
    yield
    cl.FORCE_ON_CPU = False


def _build_pair(causal, cnn_norm="batch_norm", adaptive_scale=True,
                **extra):
    cmvn = GlobalCMVN(np.zeros(80), np.ones(80))
    kw = dict(KW, causal=causal, cnn_norm_type=cnn_norm,
              adaptive_scale=adaptive_scale,
              time_reduction_layer_type="stream" if causal else "conv1d",
              cmvn=cmvn, **extra)
    enc0 = SqueezeformerEncoder(use_fused_layer=False, **kw)
    enc1 = SqueezeformerEncoder(use_fused_layer=True, **kw)
    rs = np.random.RandomState(3)
    speech = jnp.asarray(rs.standard_normal((3, 131, 80)), jnp.float32)
    lens = jnp.asarray([131, 100, 52])
    v = enc0.init({"params": jax.random.PRNGKey(0)}, speech, lens)
    # nonzero biases/stats everywhere: fresh-init zeros once masked a
    # parity bug (CLAUDE.md); BatchNorm var must stay positive
    leaves, treedef = jax.tree.flatten(v)
    v = jax.tree.unflatten(treedef, [
        l + jnp.asarray(np.abs(rs.standard_normal(l.shape)) * 0.05
                        if l.size and float(np.asarray(l).min()) >= 0.9
                        else rs.standard_normal(l.shape) * 0.05, l.dtype)
        for l in leaves])
    return enc0, enc1, v, speech, lens


@pytest.mark.parametrize("causal,cnn_norm", [
    (True, "batch_norm"), (False, "batch_norm"), (True, "layer_norm")])
def test_fused_matches_xla_full_context(causal, cnn_norm):
    enc0, enc1, v, speech, lens = _build_pair(causal, cnn_norm)
    out0, m0 = enc0.apply(v, speech, lens, decoding_chunk_size=-1,
                          num_decoding_left_chunks=-1)
    out1, m1 = enc1.apply(v, speech, lens, decoding_chunk_size=-1,
                          num_decoding_left_chunks=-1)
    assert bool(jnp.all(m0 == m1))
    valid = np.asarray(m0[:, 0, :])
    np.testing.assert_allclose(np.asarray(out0)[valid],
                               np.asarray(out1)[valid],
                               rtol=2e-4, atol=2e-4)


def test_fused_no_adaptive_scale():
    enc0, enc1, v, speech, lens = _build_pair(True, adaptive_scale=False)
    out0, m0 = enc0.apply(v, speech, lens, decoding_chunk_size=-1,
                          num_decoding_left_chunks=-1)
    out1, _ = enc1.apply(v, speech, lens, decoding_chunk_size=-1,
                         num_decoding_left_chunks=-1)
    valid = np.asarray(m0[:, 0, :])
    np.testing.assert_allclose(np.asarray(out0)[valid],
                               np.asarray(out1)[valid],
                               rtol=2e-4, atol=2e-4)


def test_fused_ineligible_paths_fall_back():
    """Training mode and chunked decoding must keep the XLA path (the
    fused kernel is serving/full-context only): outputs equal the
    use_fused_layer=False encoder bit for bit."""
    enc0, enc1, v, speech, lens = _build_pair(True)
    for kwargs in ({"decoding_chunk_size": 8,
                    "num_decoding_left_chunks": 2},):
        a, _ = enc0.apply(v, speech, lens, **kwargs)
        b, _ = enc1.apply(v, speech, lens, **kwargs)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_under_mesh_matches_direct():
    """shard_map route over the 8-device CPU mesh (slots divide) equals
    the direct fused call."""
    from masr_tpu.parallel.mesh import active_mesh, make_mesh
    enc0, enc1, v, speech, lens = _build_pair(False)
    rs = np.random.RandomState(5)
    speech8 = jnp.asarray(rs.standard_normal((8, 67, 80)), jnp.float32)
    lens8 = jnp.asarray([67, 50, 40, 67, 33, 61, 67, 45])
    ref, m = enc1.apply(v, speech8, lens8, decoding_chunk_size=-1,
                        num_decoding_left_chunks=-1)
    with active_mesh(make_mesh()):
        out, _ = enc1.apply(v, speech8, lens8, decoding_chunk_size=-1,
                            num_decoding_left_chunks=-1)
    valid = np.asarray(m[:, 0, :])
    np.testing.assert_allclose(np.asarray(ref)[valid],
                               np.asarray(out)[valid],
                               rtol=1e-5, atol=1e-5)
