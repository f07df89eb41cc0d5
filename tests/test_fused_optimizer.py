"""fused_adam == the optax chain it replaces, leaf-for-leaf over steps."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from masr_tpu.optimizer.fused import fused_adam
from masr_tpu.optimizer.schedulers import build_optimizer, warmup_lr


def _tree(seed=0):
    rs = np.random.RandomState(seed)
    return {
        "dense": {"kernel": jnp.asarray(rs.standard_normal((64, 128)),
                                        jnp.float32),
                  "bias": jnp.asarray(rs.standard_normal((128,)),
                                      jnp.float32)},
        "scale": jnp.asarray(rs.standard_normal((7,)), jnp.float32),
    }


def _grads(seed):
    rs = np.random.RandomState(seed)
    return jax.tree.map(
        lambda p: jnp.asarray(rs.standard_normal(p.shape) * 3.0, p.dtype),
        _tree())


def _run(tx, params, n=5):
    state = tx.init(params)
    outs = []
    for i in range(n):
        updates, state = tx.update(_grads(i + 1), state, params)
        params = optax.apply_updates(params, updates)
        outs.append(params)
    return outs


@pytest.mark.parametrize("decoupled", [False, True])
@pytest.mark.parametrize("clip", [None, 0.5, 5.0])
def test_matches_optax_chain(decoupled, clip):
    sched = warmup_lr(1e-3, warmup_steps=3)
    wd = 1e-2
    if decoupled:
        base = optax.adamw(sched, weight_decay=wd)
    else:
        base = optax.chain(optax.add_decayed_weights(wd), optax.adam(sched))
    ref_tx = optax.chain(optax.clip_by_global_norm(clip), base) \
        if clip else base
    fused_tx = fused_adam(sched, weight_decay=wd, decoupled=decoupled,
                          grad_clip=clip)
    p0 = _tree()
    for ref, fused in zip(_run(ref_tx, p0), _run(fused_tx, p0)):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-6,
                                                    atol=2e-7),
            ref, fused)


def test_no_weight_decay_matches_plain_adam():
    sched = warmup_lr(1e-3, warmup_steps=2)
    ref_tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(sched))
    fused_tx = fused_adam(sched, grad_clip=5.0)
    p0 = _tree(1)
    for ref, fused in zip(_run(ref_tx, p0), _run(fused_tx, p0)):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-6,
                                                    atol=2e-7),
            ref, fused)


def test_build_optimizer_routes_fused_and_multisteps():
    conf = {"optimizer": "Adam", "learning_rate": 1e-3,
            "weight_decay": 1e-6, "scheduler": "WarmupLR",
            "scheduler_conf": {"warmup_steps": 10}, "fused": True}
    tx, _ = build_optimizer(conf, grad_clip=5.0, accum_grad=1)
    from masr_tpu.optimizer.fused import FusedAdamState
    assert isinstance(tx.init(_tree()), FusedAdamState)
    # chain is the default (fused measured perf-neutral on TPU)
    tx2, _ = build_optimizer(dict(conf, fused=False), grad_clip=5.0)
    assert not isinstance(tx2.init(_tree()), FusedAdamState)
    tx_default, _ = build_optimizer({k: v for k, v in conf.items()
                                     if k != "fused"}, grad_clip=5.0)
    assert not isinstance(tx_default.init(_tree()), FusedAdamState)
    # accumulation wraps the fused transform
    tx3, _ = build_optimizer(conf, grad_clip=5.0, accum_grad=2)
    p0 = _tree()
    s = tx3.init(p0)
    u1, s = tx3.update(_grads(1), s, p0)
    # first micro-step: no optimizer step yet → zero updates
    assert all(float(jnp.abs(u).max()) == 0.0 for u in jax.tree.leaves(u1))
    u2, s = tx3.update(_grads(2), s, p0)
    assert any(float(jnp.abs(u).max()) > 0.0 for u in jax.tree.leaves(u2))
    # fused(mean of 2 grads) == chain(mean of 2 grads)
    tx_ref, _ = build_optimizer(dict(conf, fused=False), grad_clip=5.0)
    sref = tx_ref.init(p0)
    gmean = jax.tree.map(lambda a, b: (a + b) / 2, _grads(1), _grads(2))
    uref, _ = tx_ref.update(gmean, sref, p0)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-7),
        uref, u2)
