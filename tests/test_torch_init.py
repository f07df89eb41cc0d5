"""torch-default init parity (models/initializers.py): redrawn trees
must carry torch's per-layer distributions — U(±1/√fan_in) kernels AND
biases (vs flax's lecun_normal + zeros) — leave normalization/special
params untouched, and be reachable from the trainer config."""
import numpy as np
import jax
import jax.numpy as jnp

from masr_tpu.models.initializers import torch_default_reinit


def _tiny_conformer_params():
    from masr_tpu.models.registry import build_model
    from masr_tpu.models.cmvn import GlobalCMVN
    FEAT = 80
    enc = dict(output_size=64, attention_heads=2, linear_units=128,
               num_blocks=1, cnn_module_kernel=7)
    dec = dict(attention_heads=2, linear_units=64, num_blocks=1,
               r_num_blocks=0)
    model = build_model("conformer", FEAT, 50, streaming=True,
                        encoder_conf=enc, decoder_conf=dec,
                        model_conf=dict(ctc_weight=0.3),
                        cmvn=GlobalCMVN(np.zeros(FEAT), np.ones(FEAT)))
    rng = jax.random.PRNGKey(0)
    v = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        jnp.zeros((2, 67, FEAT)), jnp.asarray([67, 67]),
        jnp.ones((2, 4), jnp.int32), jnp.asarray([4, 4]), train=False)
    return v["params"]


def test_kernel_and_bias_distributions():
    params = _tiny_conformer_params()
    out = torch_default_reinit(params, jax.random.PRNGKey(3))
    flat = dict(jax.tree_util.tree_flatten_with_path(out)[0])
    orig = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    n_kernel = n_bias = 0
    for path, arr in flat.items():
        name = getattr(path[-1], "key", None)
        a = np.asarray(arr, np.float64)
        if name == "kernel" and a.ndim >= 2 and a.size >= 256:
            fan_in = int(np.prod(a.shape[:-1]))
            bound = 1.0 / np.sqrt(fan_in)
            assert np.abs(a).max() <= bound + 1e-6, path
            # uniform variance b²/3, sanity ±40%
            assert 0.6 * bound**2 / 3 < a.var() < 1.4 * bound**2 / 3, path
            n_kernel += 1
        if name == "bias" and a.size >= 64:
            sib = path[:-1] + (jax.tree_util.DictKey("kernel"),)
            if sib in flat:
                fan_in = int(np.prod(np.asarray(flat[sib]).shape[:-1]))
                bound = 1.0 / np.sqrt(fan_in)
                assert np.abs(a).max() <= bound + 1e-6, path
                assert np.abs(a).max() > 0, path      # NOT zeros anymore
                n_bias += 1
        # normalization params untouched
        if name in ("scale",) or "norm" in str(path).lower():
            np.testing.assert_array_equal(a, np.asarray(orig[path]))
    assert n_kernel >= 10 and n_bias >= 10


def test_deterministic_and_structure_preserving():
    params = _tiny_conformer_params()
    a = torch_default_reinit(params, jax.random.PRNGKey(1))
    b = torch_default_reinit(params, jax.random.PRNGKey(1))
    c = torch_default_reinit(params, jax.random.PRNGKey(2))
    ja, jb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    for x, y in zip(ja, jb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert any(not np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(ja, jax.tree_util.tree_leaves(c)))
    assert jax.tree_util.tree_structure(a) == \
        jax.tree_util.tree_structure(params)


def test_lstm_tree_reinit_covers_rnn_kernels():
    """DS2's LSTM/GRU param trees go through the same kernel/bias rules
    (torch RNNs draw U(±1/√hidden) — the per-matrix fan_in rule is the
    documented approximation)."""
    from masr_tpu.models.registry import build_model
    from masr_tpu.models.cmvn import GlobalCMVN
    FEAT = 80
    model = build_model(
        "deepspeech2", FEAT, 30, streaming=True,
        encoder_conf=dict(rnn_size=64, num_rnn_layers=2),
        model_conf=dict(ctc_weight=1.0),
        cmvn=GlobalCMVN(np.zeros(FEAT), np.ones(FEAT)))
    rng = jax.random.PRNGKey(0)
    v = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        jnp.zeros((2, 67, FEAT)), jnp.asarray([67, 67]),
        jnp.ones((2, 4), jnp.int32), jnp.asarray([4, 4]), train=False)
    out = torch_default_reinit(v["params"], jax.random.PRNGKey(5))
    flat = jax.tree_util.tree_flatten_with_path(out)[0]
    rnn_kernels = [(p, a) for p, a in flat
                   if getattr(p[-1], "key", None) == "kernel"
                   and "rnn" in str(p).lower()]
    assert rnn_kernels
    for p, a in rnn_kernels:
        arr = np.asarray(a, np.float64)
        bound = 1.0 / np.sqrt(int(np.prod(arr.shape[:-1])))
        assert np.abs(arr).max() <= bound + 1e-6, p
