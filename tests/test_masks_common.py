import numpy as np
import jax
import jax.numpy as jnp

from masr_tpu.ops import masks as M
from masr_tpu.ops import common as C


def test_make_pad_mask():
    m = M.make_pad_mask(jnp.asarray([2, 4, 1]), 4)
    expect = np.array([[0, 0, 1, 1], [0, 0, 0, 0], [0, 1, 1, 1]], bool)
    np.testing.assert_array_equal(np.asarray(m), expect)


def test_subsequent_mask():
    m = np.asarray(M.subsequent_mask(3))
    np.testing.assert_array_equal(m, np.tril(np.ones((3, 3), bool)))


def test_subsequent_chunk_mask():
    m = np.asarray(M.subsequent_chunk_mask(4, 2, -1))
    expect = np.array([
        [1, 1, 0, 0],
        [1, 1, 0, 0],
        [1, 1, 1, 1],
        [1, 1, 1, 1]], bool)
    np.testing.assert_array_equal(m, expect)


def test_subsequent_chunk_mask_left_limit():
    m = np.asarray(M.subsequent_chunk_mask(6, 2, 1))
    # row 4 (chunk 2) sees chunks 1..2 → cols 2..5
    np.testing.assert_array_equal(m[4], np.array([0, 0, 1, 1, 1, 1], bool))
    np.testing.assert_array_equal(m[0], np.array([1, 1, 0, 0, 0, 0], bool))


def test_chunk_mask_traced_chunk_size():
    # chunk size may be a traced scalar — one compile serves all sizes
    f = jax.jit(lambda c: M.subsequent_chunk_mask(6, c, -1))
    np.testing.assert_array_equal(np.asarray(f(2)), np.asarray(M.subsequent_chunk_mask(6, 2, -1)))
    np.testing.assert_array_equal(np.asarray(f(3)), np.asarray(M.subsequent_chunk_mask(6, 3, -1)))


def test_add_optional_chunk_mask_static():
    lens = jnp.asarray([4, 6])
    pad = M.make_non_pad_mask(lens, 6)[:, None, :]
    out = M.add_optional_chunk_mask(6, pad, False, False, 0, 2, -1)
    assert out.shape == (2, 6, 6)
    # padded cols masked
    assert not np.asarray(out)[0, 0, 4:].any()


def test_add_optional_chunk_mask_dynamic_draws():
    lens = jnp.asarray([8])
    pad = M.make_non_pad_mask(lens, 8)[:, None, :]
    out = M.add_optional_chunk_mask(8, pad, True, False, 0, 0, -1,
                                    rng=jax.random.PRNGKey(0))
    assert out.shape == (1, 8, 8)
    # causal-ish: no row sees a *later* chunk than allowed — first position
    # never attends the final position unless full-context was drawn
    m = np.asarray(out)[0]
    assert m[7, 7]  # diagonal always visible


def test_add_optional_chunk_mask_dynamic_left():
    # reference mask.py:126-133: for a non-full draw, num_left_chunks is
    # drawn from randint(0, (max_len - 1) // chunk_size) — high-exclusive,
    # NOT a ceil-div over max_len. Replicate the draw with the same key
    # split and pin the mask exactly + the bound over many keys.
    T = 32
    pad = M.make_non_pad_mask(jnp.asarray([T]), T)[:, None, :]
    for seed in range(40):
        rng = jax.random.PRNGKey(seed)
        out = M.add_optional_chunk_mask(T, pad, True, True, 0, 0, -1, rng=rng)
        k1, k2 = jax.random.split(rng)
        draw = int(jax.random.randint(k1, (), 1, T))
        full = draw > T // 2
        chunk = T if full else draw % 25 + 1
        if full:
            left = -1
        else:
            max_left = (T - 1) // chunk
            left = int(jax.random.randint(k2, (), 0, max(max_left, 1)))
            assert 0 <= left < max(max_left, 1)
        expect = np.asarray(M.subsequent_chunk_mask(T, chunk, left))
        np.testing.assert_array_equal(np.asarray(out)[0], expect,
                                      err_msg=f"seed={seed} chunk={chunk} "
                                              f"left={left}")


def test_add_sos_eos():
    ys = jnp.asarray([[1, 2, 3, -1], [4, 5, -1, -1]])
    lens = jnp.asarray([3, 2])
    ys_in, ys_out = C.add_sos_eos(ys, lens, sos=9, eos=9)
    np.testing.assert_array_equal(np.asarray(ys_in),
                                  [[9, 1, 2, 3, 9], [9, 4, 5, 9, 9]])
    np.testing.assert_array_equal(np.asarray(ys_out),
                                  [[1, 2, 3, 9, -1], [4, 5, 9, -1, -1]])


def test_reverse_pad_list():
    ys = jnp.asarray([[1, 2, 3, -1], [4, 5, -1, -1]])
    lens = jnp.asarray([3, 2])
    r = C.reverse_pad_list(ys, lens, -1.0)
    np.testing.assert_array_equal(np.asarray(r), [[3, 2, 1, -1], [5, 4, -1, -1]])


def test_th_accuracy():
    logits = jnp.asarray(np.eye(4)[[1, 2, 3, 0]]).astype(jnp.float32)  # preds 1,2,3,0
    targets = jnp.asarray([[1, 2], [0, -1]])
    acc = C.th_accuracy(logits, targets)
    assert abs(float(acc) - 2 / 3) < 1e-6


def test_activations():
    x = jnp.asarray([-1.0, 0.0, 1.0])
    swish = C.get_activation("swish")(x)
    np.testing.assert_allclose(np.asarray(swish),
                               np.asarray(x) / (1 + np.exp(-np.asarray(x))), atol=1e-6)
