import numpy as np
import jax
import jax.numpy as jnp

from masr_tpu.ops.specaug import fbank_specaug, specaug_jax


def test_specaug_masks_regions():
    rs = np.random.RandomState(0)
    feats = jnp.asarray(rs.standard_normal((2, 100, 80)) + 5.0, jnp.float32)
    lens = jnp.asarray([100, 60])
    out = specaug_jax(feats, lens, jax.random.PRNGKey(0), max_f=20, max_t=30,
                      replace_with_zero=True)
    out = np.asarray(out)
    # something was masked, most survived
    changed = (out != np.asarray(feats))
    assert changed.any()
    assert changed.mean() < 0.9
    # zero fill where masked
    assert np.abs(out[changed]).max() == 0.0


def test_specaug_mean_fill():
    rs = np.random.RandomState(1)
    feats = jnp.asarray(rs.standard_normal((1, 80, 80)) + 3.0, jnp.float32)
    lens = jnp.asarray([80])
    out = np.asarray(specaug_jax(feats, lens, jax.random.PRNGKey(1),
                                 replace_with_zero=False))
    changed = out != np.asarray(feats)
    if changed.any():
        mean = float(np.asarray(feats).mean())
        np.testing.assert_allclose(out[changed], mean, atol=1e-3)


def test_specaug_one_program_many_draws():
    """Different rng draws must reuse the same compiled program."""
    feats = jnp.ones((2, 50, 80))
    lens = jnp.asarray([50, 50])
    # (with constant features, mean-fill would be invisible — use zero fill)
    a = specaug_jax(feats, lens, jax.random.PRNGKey(0),
                    replace_with_zero=True)
    b = specaug_jax(feats, lens, jax.random.PRNGKey(1),
                    replace_with_zero=True)
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_fused_fbank_specaug():
    rs = np.random.RandomState(2)
    wav = jnp.asarray(rs.standard_normal((2, 16000)) * 3000, jnp.float32)
    lens = jnp.asarray([16000, 12000])
    feats, feat_lens = fbank_specaug(wav, lens, jax.random.PRNGKey(0))
    assert feats.shape[-1] == 80
    assert int(feat_lens[0]) == 1 + (16000 - 400) // 160
    assert np.isfinite(np.asarray(feats)).all()
