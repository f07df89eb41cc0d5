"""On-device training frontend (dataset_conf.on_device_frontend): raw
waveforms flow to the device and fbank + SpecAugment run INSIDE the
compiled train step. Host featurize was measured ~12× slower than the
TPU train step (596 ms vs 50 ms per B=16×12 s batch), so this path is
how the chip stays fed. Equivalence: eval-mode device features must
match the host featurizer."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from masr_tpu.audio.io import write_wave
from masr_tpu.data.audio_featurizer import AudioFeaturizer
from masr_tpu.data.collate import collate_waveforms
from masr_tpu.ops.specaug import make_device_frontend

SR = 16000


def _tone(text_len, seed):
    rs = np.random.RandomState(seed)
    n = int(SR * (0.35 * text_len))
    t = np.arange(n) / SR
    f = 200 + 150 * (seed % 6)
    return (0.25 * np.sin(2 * np.pi * f * t)
            + 0.01 * rs.standard_normal(n)).astype(np.float32)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("devfront")
    os.makedirs(root / "dataset" / "annotation", exist_ok=True)
    texts = ["一二", "三四", "五六", "一三", "二五", "四六"] * 2
    lines = []
    for i, text in enumerate(texts):
        p = root / f"u{i}.wav"
        write_wave(p, _tone(len(text), i), SR)
        lines.append(f"{p}\t{text}")
    (root / "dataset" / "annotation" / "train.txt").write_text(
        "\n".join(lines), encoding="utf-8")
    (root / "dataset" / "annotation" / "test.txt").write_text(
        "\n".join(lines[:4]), encoding="utf-8")
    return root


def _configs(root):
    d = str(root)
    return {
        "use_model": "conformer", "streaming": False,
        "decoder": "ctc_greedy", "metrics_type": "cer",
        "encoder_conf": {"output_size": 48, "attention_heads": 2,
                         "linear_units": 64, "num_blocks": 2,
                         "cnn_module_kernel": 7, "dropout_rate": 0.0,
                         "positional_dropout_rate": 0.0,
                         "attention_dropout_rate": 0.0},
        "decoder_conf": {"attention_heads": 2, "linear_units": 64,
                         "num_blocks": 1, "r_num_blocks": 0,
                         "dropout_rate": 0.0,
                         "positional_dropout_rate": 0.0,
                         "self_attention_dropout_rate": 0.0,
                         "src_attention_dropout_rate": 0.0},
        "model_conf": {"ctc_weight": 0.5, "lsm_weight": 0.1},
        "dataset_conf": {
            "batch_size": 12, "num_workers": 0, "min_duration": 0,
            "max_duration": 20, "on_device_frontend": True,
            "sample_bucket": 8000,
            "train_manifest": f"{d}/dataset/manifest.train",
            "test_manifest": f"{d}/dataset/manifest.test",
            "dataset_vocab": f"{d}/dataset/vocabulary.txt",
            "mean_istd_path": f"{d}/dataset/mean_istd.json",
            "manifest_type": "txt", "init_label_len": 4},
        "preprocess_conf": {"feature_method": "fbank", "n_mels": 80,
                            "sample_rate": SR,
                            "use_dB_normalization": True, "target_dB": -20},
        "optimizer_conf": {"optimizer": "Adam", "weight_decay": 1e-6,
                           "learning_rate": 2e-3, "scheduler": "WarmupLR",
                           "scheduler_conf": {"warmup_steps": 25,
                                              "min_lr": 1e-5}},
        "train_conf": {"enable_amp": False, "grad_clip": 5.0,
                       "accum_grad": 1, "max_epoch": 1, "log_interval": 50},
        "log_dir": f"{d}/log",
    }


def test_raw_dataset_matches_host_features(corpus):
    """Raw-mode item + numpy fbank == feature-mode item (no augment)."""
    from masr_tpu.data.dataset import MASRDataset
    from masr_tpu.ops.fbank import fbank_numpy
    from masr_tpu.training.trainer import MASRTrainer
    cfg = _configs(corpus)
    trainer = MASRTrainer(configs=dict(cfg))
    trainer.create_data(annotation_path=str(corpus / "dataset/annotation"),
                        noise_dir=None, num_samples=-1, count_threshold=1)
    pre = cfg["preprocess_conf"]
    vocab = cfg["dataset_conf"]["dataset_vocab"]
    man = cfg["dataset_conf"]["train_manifest"]
    ds_raw = MASRDataset(pre, man, vocab, train=False, return_waveform=True)
    ds_feat = MASRDataset(pre, man, vocab, train=False)
    wav, ids1 = ds_raw[0]
    feat, ids2 = ds_feat[0]
    assert wav.ndim == 1 and np.abs(wav).max() > 1.0  # int16 scale
    np.testing.assert_array_equal(ids1, ids2)
    np.testing.assert_allclose(fbank_numpy(wav, num_mel_bins=80,
                                           sample_rate=SR),
                               feat, atol=1e-5)


def test_device_frontend_eval_matches_host(corpus):
    from masr_tpu.data.dataset import MASRDataset
    cfg = _configs(corpus)
    pre = cfg["preprocess_conf"]
    vocab = cfg["dataset_conf"]["dataset_vocab"]
    man = cfg["dataset_conf"]["train_manifest"]
    ds_raw = MASRDataset(pre, man, vocab, train=False, return_waveform=True)
    ds_feat = MASRDataset(pre, man, vocab, train=False)
    batch = collate_waveforms([ds_raw[i] for i in range(4)], shuffle=False)
    frontend = make_device_frontend(pre)
    feats, lens = jax.jit(
        lambda w, l: frontend(w, l, None, False))(
        jnp.asarray(batch["inputs"]), jnp.asarray(batch["input_lens"]))
    feats, lens = np.asarray(feats), np.asarray(lens)
    for i in range(4):
        want, _ = ds_feat[i]
        assert lens[i] == want.shape[0]
        got = feats[i, : lens[i]]
        loud = want > want.max() - 8.0
        np.testing.assert_allclose(got[loud], want[loud], atol=1e-3)
        assert np.abs(got - want).max() < 0.5


def test_device_frontend_train_applies_specaug(corpus):
    from masr_tpu.data.dataset import MASRDataset
    cfg = _configs(corpus)
    pre = cfg["preprocess_conf"]
    ds_raw = MASRDataset(pre, cfg["dataset_conf"]["train_manifest"],
                         cfg["dataset_conf"]["dataset_vocab"],
                         train=False, return_waveform=True)
    batch = collate_waveforms([ds_raw[0]], shuffle=False)
    frontend = make_device_frontend(pre, {"F": 10, "T": 20,
                                          "n_freq_masks": 2,
                                          "n_time_masks": 2})
    w = jnp.asarray(batch["inputs"])
    ln = jnp.asarray(batch["input_lens"])
    ev, _ = frontend(w, ln, None, False)
    tr, _ = frontend(w, ln, jax.random.PRNGKey(3), True)
    ev, tr = np.asarray(ev), np.asarray(tr)
    # masked region: whole frequency rows replaced by the utterance mean
    diff_cols = np.abs(ev[0] - tr[0]).max(axis=0) > 0.5
    assert diff_cols.sum() >= 1, "no freq mask applied"


def test_trainer_learns_with_device_frontend(corpus):
    """The full train loop over raw-waveform batches: loss halves in 120
    steps and greedy eval runs through the on-device eval frontend."""
    from masr_tpu.parallel.mesh import replicate, shard_batch
    from masr_tpu.training.trainer import MASRTrainer
    from masr_tpu.training.train_state import make_train_step
    cfg = _configs(corpus)
    trainer = MASRTrainer(configs=dict(cfg))
    dataset, sampler, loader = trainer._setup_dataloader(True, None)
    trainer._setup_model(dataset.feature_dim, dataset.vocab_size,
                         is_train=True)
    trainer.state = replicate(trainer.state, trainer.mesh)
    step = jax.jit(make_train_step(trainer.model, trainer.state.tx,
                                   frontend=trainer._device_frontend()),
                   donate_argnums=(0,))
    rng = jax.random.PRNGKey(0)
    losses = []
    n = 0
    while n < 120:
        sampler.set_epoch(n)
        for batch in loader:
            assert batch["inputs"].ndim == 2  # raw waveforms, not features
            trainer.state, m = step(trainer.state,
                                    shard_batch(batch, trainer.mesh), rng)
            losses.append(float(m["loss"]))
            n += 1
            if n >= 120:
                break
    assert np.isfinite(losses[-1])
    assert np.mean(losses[-5:]) < 0.5 * np.mean(losses[:3]), \
        f"{np.mean(losses[:3]):.2f} → {np.mean(losses[-5:]):.2f}"
    ds_t, _, loader_t = trainer._setup_dataloader(False)
    err, loss = trainer._evaluate_loader(loader_t, ds_t,
                                         decoder="ctc_greedy")
    assert np.isfinite(err) and np.isfinite(loss)
