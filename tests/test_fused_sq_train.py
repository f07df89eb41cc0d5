"""Fused Squeezeformer TRAIN layer (ops/pallas/squeezeformer_layer_train):
forward/backward parity against jax.grad of the REAL flax
SqueezeformerEncoderLayer with PERTURBED biases (fresh-init zero biases
mask real parity bugs — the conv pre-pointwise padding bug was invisible
until biases were perturbed), dropout determinism, and encoder-level
routing equivalence through reduce/recover (VERDICT r3 item 6)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from masr_tpu.models.squeezeformer import SqueezeformerEncoderLayer
from masr_tpu.ops.pallas.squeezeformer_layer import pack_sq_layer_params
from masr_tpu.ops.pallas.squeezeformer_layer_train import (
    fused_squeezeformer_layer_train)

T, D, F, H, K = 24, 16, 32, 2, 7
B = 2


def _layer():
    return SqueezeformerEncoderLayer(
        size=D, attention_heads=H, ffn_units=F, dropout_rate=0.0,
        attention_dropout_rate=0.0, cnn_module_kernel=K,
        cnn_norm="layer_norm", causal=True, adaptive_scale=True,
        normalize_before=False)


def _perturb(tree, rs, scale=0.15):
    """Perturb EVERY param (incl. biases and LN/ada params)."""
    return jax.tree.map(
        lambda a: a + scale * jnp.asarray(
            rs.standard_normal(a.shape), a.dtype), tree)


@pytest.fixture
def data():
    rs = np.random.RandomState(0)
    layer = _layer()
    x = jnp.asarray(rs.standard_normal((B, T, D)) * 0.5, jnp.float32)
    pos = jnp.asarray(rs.standard_normal((1, T, D)) * 0.3, jnp.float32)
    lens = jnp.asarray([T, T - 7], jnp.int32)
    chunk = (jnp.arange(T)[:, None] // 8 >= jnp.arange(T)[None, :] // 8)
    key_ok = jnp.arange(T)[None, :] < lens[:, None]
    mask = chunk[None] & key_ok[:, None, :]
    mask_pad = key_ok[:, None, :]
    v = layer.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)},
                   x, mask, pos, mask_pad)
    params = _perturb(v["params"], np.random.RandomState(5))
    seeds = jnp.asarray([11, 22], jnp.int32)
    return layer, x, pos, mask, mask_pad, lens, params, seeds


def _fused_from_tree(params, x, pos, mask, lens, seeds, rate=0.0,
                     att_rate=0.0, train=True):
    """flax param tree → differentiable pack → fused train op (the same
    chain the encoder routing uses)."""
    packed = pack_sq_layer_params(params, None, jnp.float32,
                                  adaptive_scale=True, conv_ln=True)
    packed["posp"] = jnp.einsum(
        "td,de->te", pos[0], packed.pop("linear_pos"),
        preferred_element_type=jnp.float32)[None]
    return fused_squeezeformer_layer_train(
        x, mask, seeds, lens, packed, H, K, True, 1e-6, 1e-5, rate,
        att_rate, train, True)


def _flax_out(layer, params, x, pos, mask, mask_pad):
    y, _, _ = layer.apply({"params": params}, x, mask, pos, mask_pad,
                          train=False)
    return y


def test_forward_matches_flax_layer(data):
    layer, x, pos, mask, mask_pad, lens, params, seeds = data
    got = _fused_from_tree(params, x, pos, mask, lens, seeds)
    want = _flax_out(layer, params, x, pos, mask, mask_pad)
    # valid rows only: the flax layer propagates pad-row garbage the
    # kernel zero-masks (both are don't-care downstream)
    for b in range(B):
        n = int(lens[b])
        np.testing.assert_allclose(np.asarray(got)[b, :n],
                                   np.asarray(want)[b, :n],
                                   rtol=2e-4, atol=2e-5)


def test_backward_matches_flax_autodiff(data):
    layer, x, pos, mask, mask_pad, lens, params, seeds = data
    row_ok = (jnp.arange(T)[None, :, None] < lens[:, None, None])

    def loss_fused(x, params):
        y = _fused_from_tree(params, x, pos, mask, lens, seeds)
        return jnp.sum(jnp.where(row_ok, jnp.sin(y), 0.0))

    def loss_flax(x, params):
        y = _flax_out(layer, params, x, pos, mask, mask_pad)
        return jnp.sum(jnp.where(row_ok, jnp.sin(y), 0.0))

    gx, gp = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    rx, rp = jax.grad(loss_flax, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=2e-3, atol=3e-4)
    flat_g = jax.tree_util.tree_flatten_with_path(gp)[0]
    flat_r = dict(jax.tree_util.tree_flatten_with_path(rp)[0])
    for path, g in flat_g:
        r = flat_r[path]
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-3, atol=4e-4,
            err_msg=f"param grad mismatch: {jax.tree_util.keystr(path)}")


def test_dropout_deterministic(data):
    layer, x, pos, mask, mask_pad, lens, params, seeds = data
    y1 = _fused_from_tree(params, x, pos, mask, lens, seeds, rate=0.4,
                          att_rate=0.2)
    y2 = _fused_from_tree(params, x, pos, mask, lens, seeds, rate=0.4,
                          att_rate=0.2)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # eval mode ignores dropout entirely
    y3 = _fused_from_tree(params, x, pos, mask, lens, seeds, rate=0.4,
                          att_rate=0.2, train=False)
    want = _flax_out(layer, params, x, pos, mask, mask_pad)
    n = int(lens[1])
    np.testing.assert_allclose(np.asarray(y3)[1, :n],
                               np.asarray(want)[1, :n], rtol=2e-4,
                               atol=2e-5)


def test_encoder_routes_fused_train_through_reduce_recover():
    """Full SqueezeformerEncoder (reduce@1, recover@3) at train=True,
    dropout 0: the fused-train route must equal the XLA layer route —
    outputs AND input grads — through the U-Net plumbing."""
    import masr_tpu.ops.pallas.conformer_layer as cl
    from masr_tpu.models.squeezeformer import SqueezeformerEncoder

    KW = dict(input_size=80, encoder_dim=D, output_size=D,
              attention_heads=H, num_blocks=4, reduce_idx=1, recover_idx=3,
              feed_forward_expansion_factor=2, cnn_module_kernel=K,
              cnn_norm_type="layer_norm", causal=True,
              time_reduction_layer_type="stream", dropout=0.0,
              input_dropout_rate=0.0, feed_forward_dropout_rate=0.0,
              attention_dropout_rate=0.0, use_dynamic_chunk=True)
    rs = np.random.RandomState(3)
    xs = jnp.asarray(rs.standard_normal((B, 67, 80)), jnp.float32)
    lens = jnp.asarray([67, 51], jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "chunk": jax.random.PRNGKey(2)}

    def run(fused_train):
        enc = SqueezeformerEncoder(use_fused_layer_train=fused_train,
                                   use_fused_layer=False, **KW)
        v = enc.init(rngs, xs, lens, decoding_chunk_size=-1,
                     num_decoding_left_chunks=-1, train=False)
        v = {"params": _perturb(v["params"], np.random.RandomState(9))}

        def loss(x):
            y, masks = enc.apply(
                v, x, lens, decoding_chunk_size=-1,
                num_decoding_left_chunks=-1, train=True,
                rngs={"dropout": jax.random.PRNGKey(7),
                      "chunk": jax.random.PRNGKey(8)})
            return jnp.sum(jnp.where(masks.transpose(0, 2, 1),
                                     jnp.sin(y), 0.0)), y
        (l, y), g = jax.value_and_grad(loss, has_aux=True)(xs)
        return l, y, g

    cl.FORCE_ON_CPU = True
    try:
        l1, y1, g1 = run(True)
        l0, y0, g0 = run(False)
    finally:
        cl.FORCE_ON_CPU = False
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=2e-3,
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=2e-3,
                               atol=3e-4)
