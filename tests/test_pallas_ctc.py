"""One-kernel Pallas CTC loss == optax.ctc_loss (values AND grads)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from masr_tpu.ops.pallas import ctc_loss as M


def _case(seed, B, T, V, L, repeats=False):
    rs = np.random.RandomState(seed)
    logits = jnp.asarray(rs.standard_normal((B, T, V)) * 2.0, jnp.float32)
    if repeats:
        labels = rs.randint(1, 4, (B, L))        # few symbols -> repeats
    else:
        labels = rs.randint(1, V, (B, L))
    label_lens = rs.randint(1, L + 1, (B,))
    logit_lens = rs.randint(2 * L + 1, T + 1, (B,))
    lab_pad = (np.arange(L)[None] >= label_lens[:, None]).astype(np.float32)
    log_pad = (np.arange(T)[None] >= logit_lens[:, None]).astype(np.float32)
    return (logits, jnp.asarray(log_pad), jnp.asarray(labels),
            jnp.asarray(lab_pad))


@pytest.mark.parametrize("seed,B,T,V,L,repeats", [
    (0, 4, 37, 23, 9, False),
    (1, 4, 37, 23, 9, True),      # repeated labels exercise the skip rule
    (2, 16, 50, 40, 12, False),   # full block
    (3, 3, 25, 17, 5, False),     # batch not divisible by the block
    (4, 2, 21, 11, 10, True),     # T close to the 2L+1 minimum
])
def test_matches_optax(seed, B, T, V, L, repeats):
    args = _case(seed, B, T, V, L, repeats)
    ref = optax.ctc_loss(*args, blank_id=0)
    got = M.ctc_loss_pallas(*args, blank_id=0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    w = jnp.asarray(np.random.RandomState(seed + 100)
                    .standard_normal(B), jnp.float32)

    def mean_ref(lg):
        return jnp.sum(optax.ctc_loss(lg, *args[1:], blank_id=0) * w)

    def mean_got(lg):
        return jnp.sum(M.ctc_loss_pallas(lg, *args[1:], blank_id=0,
                                         interpret=True) * w)

    g_ref = jax.grad(mean_ref)(args[0])
    g_got = jax.grad(mean_got)(args[0])
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-5)


def test_full_length_no_padding():
    args = _case(7, 8, 40, 30, 8)
    args = (args[0], jnp.zeros_like(args[1]), args[2],
            jnp.zeros_like(args[3]))
    ref = optax.ctc_loss(*args, blank_id=0)
    got = M.ctc_loss_pallas(*args, blank_id=0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_routing_falls_back_when_unsupported():
    # label length 70 -> S = 141 > 128 lanes: must route to optax
    assert not M.supported(T=200, S=141, B=4)
    args = _case(9, 2, 150, 20, 70)
    got = M.ctc_loss(*args, blank_id=0)   # CPU, FORCE_ON_CPU False -> optax
    ref = optax.ctc_loss(*args, blank_id=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_auto_route_uses_kernel_under_force(monkeypatch):
    monkeypatch.setattr(M, "FORCE_ON_CPU", True)
    args = _case(11, 4, 30, 15, 6)
    got = M.ctc_loss(*args, blank_id=0)
    ref = optax.ctc_loss(*args, blank_id=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sharded_route_matches_optax(monkeypatch):
    """With a registered active mesh the router shard_maps the kernel
    over the batch (same discipline as the fused encoder layers);
    values AND grads must still match optax."""
    from masr_tpu.parallel.mesh import active_mesh, make_mesh
    monkeypatch.setattr(M, "FORCE_ON_CPU", True)
    args = _case(13, 8, 40, 21, 8)
    w = jnp.asarray(np.random.RandomState(113).standard_normal(8),
                    jnp.float32)

    def loss(fn, lg):
        return jnp.sum(fn(lg, *args[1:], blank_id=0) * w)

    ref = optax.ctc_loss(*args, blank_id=0)
    g_ref = jax.grad(lambda lg: loss(optax.ctc_loss, lg))(args[0])
    with active_mesh(make_mesh()):            # dp over all 8 CPU devices
        got = M.ctc_loss(*args, blank_id=0)
        g_got = jax.grad(lambda lg: loss(M.ctc_loss, lg))(args[0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-5)
