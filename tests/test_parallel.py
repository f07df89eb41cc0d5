"""Data-parallel correctness over the 8-device virtual CPU mesh: the
sharded training step must produce the same update as single-device
(XLA inserts the gradient all-reduce, SURVEY.md §5.8)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from masr_tpu.models.cmvn import GlobalCMVN
from masr_tpu.models.conformer import ConformerModel
from masr_tpu.optimizer.schedulers import build_optimizer
from masr_tpu.parallel.mesh import (data_parallel_shardings, make_mesh,
                                    replicate, shard_batch)
from masr_tpu.training.train_state import TrainState, make_train_step

FEAT = 80
VOCAB = 30


def _model():
    return ConformerModel(
        input_dim=FEAT, vocab_size=VOCAB,
        cmvn=GlobalCMVN(np.zeros(FEAT), np.ones(FEAT)), streaming=False,
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=16,
                          num_blocks=1, cnn_module_kernel=7),
        decoder_conf=dict(attention_heads=2, linear_units=16, num_blocks=1,
                          r_num_blocks=0),
        ctc_weight=0.5, lsm_weight=0.1)


def _batch(rs, B):
    return {
        "inputs": rs.standard_normal((B, 39, FEAT)).astype(np.float32),
        "input_lens": np.full((B,), 39, np.int32),
        "labels": rs.randint(1, VOCAB - 2, (B, 3)).astype(np.int32),
        "label_lens": np.full((B,), 3, np.int32),
    }


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_partitions_leading_axis():
    mesh = make_mesh()
    rs = np.random.RandomState(0)
    batch = _batch(rs, 8)
    sharded = shard_batch(batch, mesh)
    shard_shapes = [s.data.shape for s in sharded["inputs"].addressable_shards]
    assert len(shard_shapes) == 8
    assert all(s[0] == 1 for s in shard_shapes)


def test_shard_batch_pads_to_mesh():
    mesh = make_mesh()
    rs = np.random.RandomState(0)
    batch = _batch(rs, 6)  # not divisible by 8
    sharded = shard_batch(batch, mesh)
    assert sharded["inputs"].shape[0] == 8
    assert int(sharded["input_lens"][6]) == 0  # padded rows are empty


def test_data_parallel_step_matches_single_device():
    model = _model()
    rs = np.random.RandomState(1)
    batch = _batch(rs, 8)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        jnp.asarray(batch["inputs"][:2]), jnp.asarray(batch["input_lens"][:2]),
        jnp.asarray(batch["labels"][:2]), jnp.asarray(batch["label_lens"][:2]),
        train=True)
    # SGD is linear in the gradients, so single-device and all-reduced
    # updates must agree to float32 rounding (Adam's rsqrt at step 1 would
    # amplify benign reduction-order noise)
    tx, _ = build_optimizer({"optimizer": "SGD", "momentum": 0.9,
                             "learning_rate": 1e-3,
                             "scheduler": "WarmupLR",
                             "scheduler_conf": {"warmup_steps": 5}},
                            grad_clip=5.0, accum_grad=1)
    step_fn = make_train_step(model, tx)

    # single device
    state1 = TrainState.create(model.apply, variables["params"], tx)
    single = {k: jnp.asarray(v) for k, v in batch.items()}
    state1, m1 = jax.jit(step_fn)(state1, single, rng)

    # 8-device mesh
    mesh = make_mesh()
    state8 = TrainState.create(model.apply, variables["params"], tx)
    state8 = replicate(state8, mesh)
    sharded = shard_batch(batch, mesh)
    state8, m8 = jax.jit(step_fn)(state8, sharded, rng)

    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-3
    p1 = jax.tree.leaves(jax.device_get(state1.params))
    p8 = jax.tree.leaves(jax.device_get(state8.params))
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_grad_accumulation_multisteps():
    """accum_grad=2: params change only at accumulation boundaries
    (reference accum_grad + no_sync semantics, trainer.py:372-384)."""
    model = _model()
    rs = np.random.RandomState(2)
    rng = jax.random.PRNGKey(0)
    batch = _batch(rs, 2)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        jnp.asarray(batch["inputs"]), jnp.asarray(batch["input_lens"]),
        jnp.asarray(batch["labels"]), jnp.asarray(batch["label_lens"]),
        train=True)
    tx, _ = build_optimizer({"optimizer": "Adam", "learning_rate": 1e-3,
                             "scheduler": "WarmupLR",
                             "scheduler_conf": {"warmup_steps": 5}},
                            grad_clip=5.0, accum_grad=2)
    state = TrainState.create(model.apply, variables["params"], tx)
    step_fn = jax.jit(make_train_step(model, tx))
    p0 = jax.device_get(state.params)
    single = {k: jnp.asarray(v) for k, v in batch.items()}
    state, _ = step_fn(state, single, rng)
    p_mid = jax.device_get(state.params)
    # first micro-step: no optimizer update yet
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p_mid)):
        np.testing.assert_array_equal(a, b)
    state, _ = step_fn(state, single, rng)
    p_end = jax.device_get(state.params)
    changed = any(not np.array_equal(a, b) for a, b in
                  zip(jax.tree.leaves(p0), jax.tree.leaves(p_end)))
    assert changed  # boundary applies the accumulated update
