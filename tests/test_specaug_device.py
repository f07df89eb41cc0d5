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


def test_specsub_sources_are_earlier_original_frames():
    """Every frame of the output equals some ORIGINAL frame at an index
    ≤ its own (SpecSub reads from the pristine input, pos ≥ 0) — and at
    least one frame actually changed."""
    from masr_tpu.ops.specaug import specsub_jax
    rs = np.random.RandomState(0)
    B, T, F = 4, 60, 8
    # make every frame unique so source indices are identifiable
    feats = jnp.asarray(np.arange(B * T)[:, None].reshape(B, T, 1)
                        * np.ones((1, F)), jnp.float32)
    lens = jnp.asarray([60, 50, 41, 60], jnp.int32)
    out = specsub_jax(feats, lens, jax.random.PRNGKey(3), max_t=20,
                      num_t_sub=3)
    out = np.asarray(out)
    src = (out[:, :, 0] - np.arange(B)[:, None] * T).round().astype(int)
    assert (src <= np.arange(T)[None, :]).all()
    assert (src >= 0).all()
    assert (src != np.arange(T)[None, :]).any()  # something substituted
    # frames at/after the valid length are never substitution targets
    for b, L in enumerate([60, 50, 41, 60]):
        np.testing.assert_array_equal(src[b, L:], np.arange(L, T))


def test_specsub_reference_draw_distributions():
    """Reference (spec_sub.py:36-39) draws length ∈ [1, max_t] — never 0 —
    and pos ∈ [0, start] inclusive. With max_t=1 every substitution has
    width exactly 1, so across a few keys at least one frame must change
    (a [0, max_t-1] draw would make max_t=1 a no-op forever)."""
    from masr_tpu.ops.specaug import specsub_jax
    B, T, F = 2, 30, 4
    feats = jnp.asarray(np.arange(B * T).reshape(B, T, 1)
                        * np.ones((1, F)), jnp.float32)
    lens = jnp.asarray([30, 30], jnp.int32)
    changed = False
    for k in range(8):
        out = np.asarray(specsub_jax(feats, lens, jax.random.PRNGKey(k),
                                     max_t=1, num_t_sub=4))
        diff = out[:, :, 0] != np.asarray(feats)[:, :, 0]
        # each substitution span is exactly one frame wide: changed frames
        # never form runs longer than num_t_sub isolated picks would allow
        changed = changed or diff.any()
    assert changed


def test_specsub_deterministic_per_rng():
    from masr_tpu.ops.specaug import specsub_jax
    rs = np.random.RandomState(1)
    feats = jnp.asarray(rs.standard_normal((2, 40, 6)), jnp.float32)
    lens = jnp.asarray([40, 33], jnp.int32)
    a = specsub_jax(feats, lens, jax.random.PRNGKey(0))
    b = specsub_jax(feats, lens, jax.random.PRNGKey(0))
    c = specsub_jax(feats, lens, jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_device_frontend_applies_specsub():
    """make_device_frontend with a specsub conf substitutes frames in
    train mode and stays deterministic (no specsub) in eval mode."""
    from masr_tpu.ops.specaug import make_device_frontend
    pre = {"feature_method": "fbank", "n_mels": 20, "sample_rate": 16000}
    rs = np.random.RandomState(2)
    wav = jnp.asarray(rs.standard_normal((2, 16000)) * 3000, jnp.float32)
    lens = jnp.asarray([16000, 12000], jnp.int32)
    plain = make_device_frontend(pre, {"F": 0, "T": 0, "n_freq_masks": 0,
                                       "n_time_masks": 0})
    withsub = make_device_frontend(pre, {"F": 0, "T": 0, "n_freq_masks": 0,
                                         "n_time_masks": 0},
                                   {"max_t": 15, "num_t_sub": 3})
    rng = jax.random.PRNGKey(0)
    f_plain, l1 = plain(wav, lens, rng, True)
    f_sub, l2 = withsub(wav, lens, rng, True)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert not np.array_equal(np.asarray(f_plain), np.asarray(f_sub))
    # eval path ignores augmentation entirely
    e1, _ = plain(wav, lens, rng, False)
    e2, _ = withsub(wav, lens, rng, False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
