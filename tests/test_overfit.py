"""Proof that training LEARNS (VERDICT r1 item 2) + configured eval
decoders (item 1).

A frequency-coded toy corpus (each char ↔ a distinct tone) is overfit with
the real train step / optimizer / scheduler stack; we assert the loss
collapses AND greedy decoding reproduces the training transcripts
(train-set CER < 0.2). A deliberately injected mask or lr bug fails this.
Then trainer.evaluate is exercised with ctc_greedy / ctc_beam_search /
attention_rescoring (reference trainer.py:323-345 dispatch) and through
the eval.py CLI with --decoder.
"""
import json
import os
import runpy
import shutil
import sys

import numpy as np
import pytest

from masr_tpu.audio.io import write_wave

# char → tone frequency (Hz); widely spaced so fbank separates them easily
CHAR_FREQ = {"一": 200.0, "二": 420.0, "三": 700.0,
             "四": 1100.0, "五": 1650.0, "六": 2400.0}
TRAIN_TEXTS = ["一二", "三四", "五六", "一三五", "二四六", "六五",
               "四二", "三一", "五二六", "一六", "二三", "四五一"]
SR = 16000
TONE_SEC = 0.35


def _synth(text, rs):
    sig = []
    for ch in text:
        n = int(SR * TONE_SEC)
        t = np.arange(n) / SR
        tone = 0.25 * np.sin(2 * np.pi * CHAR_FREQ[ch] * t)
        # fade in/out to avoid clicks; tiny noise for realism
        ramp = np.minimum(1.0, np.minimum(t, TONE_SEC - t) / 0.02)
        sig.append(tone * ramp + 0.005 * rs.standard_normal(n))
    return np.concatenate(sig).astype(np.float32)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("overfit")
    os.makedirs(root / "dataset" / "annotation", exist_ok=True)
    rs = np.random.RandomState(7)
    lines = []
    for i, text in enumerate(TRAIN_TEXTS):
        p = root / f"utt{i}.wav"
        write_wave(p, _synth(text, rs), SR)
        lines.append(f"{p}\t{text}")
    with open(root / "dataset" / "annotation" / "train.txt", "w",
              encoding="utf-8") as f:
        f.write("\n".join(lines))
    # test annotation = first 4 train utterances (same files): eval IS the
    # training set, per the overfit-test contract
    with open(root / "dataset" / "annotation" / "test.txt", "w",
              encoding="utf-8") as f:
        f.write("\n".join(lines[:4]))
    return root


def _configs(root, use_model):
    d = str(root)
    cfg = {
        "use_model": use_model, "streaming": use_model == "deepspeech2",
        "decoder": "ctc_greedy", "metrics_type": "cer",
        "dataset_conf": {
            "batch_size": len(TRAIN_TEXTS), "num_workers": 0,
            "min_duration": 0, "max_duration": 20,
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
        "ctc_beam_search_decoder_conf": {
            "alpha": 2.2, "beta": 4.3, "beam_size": 12,
            "num_processes": 2, "cutoff_prob": 0.99, "cutoff_top_n": 8},
        "log_dir": f"{d}/log",
    }
    if use_model == "conformer":
        cfg["encoder_conf"] = {"output_size": 48, "attention_heads": 2,
                               "linear_units": 64, "num_blocks": 2,
                               "cnn_module_kernel": 7,
                               "dropout_rate": 0.0,
                               "positional_dropout_rate": 0.0,
                               "attention_dropout_rate": 0.0}
        cfg["decoder_conf"] = {"attention_heads": 2, "linear_units": 64,
                               "num_blocks": 1, "r_num_blocks": 0,
                               "dropout_rate": 0.0,
                               "positional_dropout_rate": 0.0,
                               "self_attention_dropout_rate": 0.0,
                               "src_attention_dropout_rate": 0.0}
        cfg["model_conf"] = {"ctc_weight": 0.5, "lsm_weight": 0.1,
                             "reverse_weight": 0.0}
    else:  # deepspeech2: pure-CTC path
        cfg["encoder_conf"] = {"rnn_size": 96, "num_rnn_layers": 2,
                               "use_gru": True}
        cfg["model_conf"] = {}
    return cfg


def _overfit(trainer, steps, seed=0):
    """Run the REAL train-step stack (make_train_step + mesh sharding +
    optax chain, trainer.py:347-427 analogue) for `steps` steps; return
    per-step losses and the (dataset, loader) used."""
    import jax
    from masr_tpu.parallel.mesh import replicate, shard_batch
    from masr_tpu.training.train_state import make_train_step

    dataset, sampler, loader = trainer._setup_dataloader(True, None)
    trainer._setup_model(dataset.feature_dim, dataset.vocab_size,
                         is_train=True)
    trainer.state = replicate(trainer.state, trainer.mesh)
    train_step = jax.jit(make_train_step(trainer.model, trainer.state.tx),
                         donate_argnums=(0,))
    rng = jax.random.PRNGKey(seed)
    losses = []
    step = 0
    epoch = 0
    while step < steps:
        sampler.set_epoch(epoch)
        for batch in loader:
            sharded = shard_batch(batch, trainer.mesh)
            trainer.state, metrics = train_step(trainer.state, sharded, rng)
            losses.append(float(metrics["loss"]))
            step += 1
            if step >= steps:
                break
        epoch += 1
    return losses


@pytest.fixture(scope="module")
def conformer_trained(corpus):
    from masr_tpu.training.trainer import MASRTrainer
    cfg = _configs(corpus, "conformer")
    trainer = MASRTrainer(configs=dict(cfg))
    trainer.create_data(annotation_path=str(corpus / "dataset/annotation"),
                        noise_dir=None, num_samples=-1, count_threshold=1)
    losses = _overfit(trainer, steps=300)
    return trainer, cfg, losses


def test_conformer_training_learns(conformer_trained):
    trainer, cfg, losses = conformer_trained
    initial = np.mean(losses[:3])
    final = np.mean(losses[-10:])
    assert np.isfinite(final)
    assert final < 0.3 * initial, \
        f"loss did not collapse: {initial:.3f} → {final:.3f}"
    # greedy decode must reproduce the training transcripts
    dataset, _, loader = trainer._setup_dataloader(False)
    error, loss = trainer._evaluate_loader(loader, dataset,
                                           decoder="ctc_greedy")
    assert error < 0.2, f"train-set CER {error:.3f} after overfit"


def test_eval_decoder_dispatch(conformer_trained):
    """evaluate honors the configured decoder: beam search and attention
    rescoring both run and also solve the overfit set; the beam engine is
    actually constructed (not silently greedy)."""
    trainer, cfg, _ = conformer_trained
    dataset, _, loader = trainer._setup_dataloader(False)
    greedy_err, _ = trainer._evaluate_loader(loader, dataset,
                                             decoder="ctc_greedy")
    beam_err, _ = trainer._evaluate_loader(loader, dataset,
                                           decoder="ctc_beam_search")
    assert trainer._eval_beam_decoder is not None
    assert np.isfinite(beam_err) and beam_err < 0.3
    resc_err, _ = trainer._evaluate_loader(loader, dataset,
                                           decoder="attention_rescoring")
    assert np.isfinite(resc_err) and resc_err < 0.3
    # all decoders agree on a solved corpus
    assert abs(beam_err - greedy_err) < 0.2


def test_eval_decoders_differ_on_untrained_model(corpus):
    """On random weights the decoders genuinely dispatch to different
    engines — beam search's CER path must be computed by the beam engine
    (spied), not fall through to greedy."""
    from masr_tpu.training.trainer import MASRTrainer
    cfg = _configs(corpus, "conformer")
    trainer = MASRTrainer(configs=dict(cfg))
    dataset, _, loader = trainer._setup_dataloader(False)
    trainer._setup_model(dataset.feature_dim, dataset.vocab_size,
                         is_train=True)
    calls = []
    g_err, _ = trainer._evaluate_loader(loader, dataset,
                                        decoder="ctc_greedy")
    b_err, _ = trainer._evaluate_loader(loader, dataset,
                                        decoder="ctc_beam_search")
    orig = trainer._eval_beam_decoder.decode_batch_beam_search_offline

    def spy(probs_split):
        calls.append(len(probs_split))
        return orig(probs_split)

    trainer._eval_beam_decoder.decode_batch_beam_search_offline = spy
    trainer._evaluate_loader(loader, dataset, decoder="ctc_beam_search")
    assert calls, "beam engine was not used for ctc_beam_search eval"
    assert np.isfinite(g_err) and np.isfinite(b_err)


def test_eval_cli_with_decoder_flag(conformer_trained, corpus, monkeypatch,
                                    capsys):
    """eval.py --decoder ctc_beam_search runs end-to-end through the CLI
    (VERDICT item 1 done-criterion)."""
    import yaml
    import jax
    from masr_tpu.training import checkpoints as ckpt
    trainer, cfg, _ = conformer_trained
    save_dir = str(corpus / "cli_model")
    ckpt.save_checkpoint(save_dir, 1, jax.device_get(trainer._state_pytree()),
                         metrics={"last_epoch": 1, "test_cer": 0.0})
    cfg_path = str(corpus / "overfit.yml")
    with open(cfg_path, "w", encoding="utf-8") as f:
        yaml.safe_dump(dict(cfg), f, allow_unicode=True)
    eval_py = os.path.join(os.path.dirname(__file__), "..", "eval.py")
    monkeypatch.setattr(sys, "argv", [
        "eval.py", "--configs", cfg_path,
        "--resume_model", os.path.join(save_dir, "best_model"),
        "--decoder", "ctc_beam_search"])
    runpy.run_path(eval_py, run_name="__main__")


@pytest.fixture(scope="module")
def ds2_trained(corpus):
    from masr_tpu.training.trainer import MASRTrainer
    cfg = _configs(corpus, "deepspeech2")
    trainer = MASRTrainer(configs=dict(cfg))
    # corpus fixture may already have built manifests/vocab/stats
    if not os.path.exists(cfg["dataset_conf"]["train_manifest"]):
        trainer.create_data(
            annotation_path=str(corpus / "dataset/annotation"),
            noise_dir=None, num_samples=-1, count_threshold=1)
    losses = _overfit(trainer, steps=300)
    return trainer, cfg, losses


def test_deepspeech2_training_learns(ds2_trained):
    trainer, cfg, losses = ds2_trained
    initial = np.mean(losses[:3])
    final = np.mean(losses[-10:])
    assert np.isfinite(final)
    assert final < 0.3 * initial, \
        f"loss did not collapse: {initial:.3f} → {final:.3f}"
    dataset, _, loader = trainer._setup_dataloader(False)
    error, _ = trainer._evaluate_loader(loader, dataset,
                                        decoder="ctc_greedy")
    assert error < 0.2, f"train-set CER {error:.3f} after overfit"


# --------------------------------------------------------------------- #
# learning proofs for the remaining families (conformer + deepspeech2
# above prove decode-to-CER-0; these prove the squeezeformer and
# efficient-conformer training stacks optimize, incl. squeezeformer's
# BatchNorm batch_stats threading)
# --------------------------------------------------------------------- #
def _family_cfg(corpus, use_model):
    cfg = _configs(corpus, "conformer")
    cfg["use_model"] = use_model
    # efficient_conformer uses even conv kernels → causal (streaming)
    # mode, like every published reference checkpoint
    cfg["streaming"] = use_model == "efficient_conformer"
    if use_model == "squeezeformer":
        cfg["encoder_conf"] = {
            "encoder_dim": 48, "output_size": 48, "attention_heads": 2,
            "num_blocks": 4, "reduce_idx": 1, "recover_idx": 3,
            "feed_forward_expansion_factor": 2, "cnn_module_kernel": 7,
            "input_dropout_rate": 0.0, "feed_forward_dropout_rate": 0.0,
            "attention_dropout_rate": 0.0}
    elif use_model == "efficient_conformer":
        cfg["encoder_conf"] = {
            "output_size": 48, "attention_heads": 2, "linear_units": 64,
            "num_blocks": 4, "cnn_module_kernel": 8,
            "cnn_module_norm": "layer_norm", "dropout_rate": 0.0,
            "positional_dropout_rate": 0.0, "attention_dropout_rate": 0.0,
            "efficient_conf": {"stride_layer_idx": [1], "stride": [2],
                               "group_layer_idx": [0, 1], "group_size": 3,
                               "stride_kernel": True}}
    return cfg


@pytest.mark.parametrize("family", ["squeezeformer", "efficient_conformer"])
def test_family_training_learns(corpus, family):
    from masr_tpu.training.trainer import MASRTrainer
    cfg = _family_cfg(corpus, family)
    trainer = MASRTrainer(configs=dict(cfg))
    if not os.path.exists(cfg["dataset_conf"]["train_manifest"]):
        trainer.create_data(
            annotation_path=str(corpus / "dataset/annotation"),
            noise_dir=None, num_samples=-1, count_threshold=1)
    losses = _overfit(trainer, steps=150)
    initial = np.mean(losses[:3])
    final = np.mean(losses[-10:])
    assert np.isfinite(final)
    assert final < 0.5 * initial, \
        f"{family} loss did not drop: {initial:.3f} → {final:.3f}"


def test_eval_device_beam_decoder(conformer_trained):
    """ctc_beam_search_device: the batched on-device prefix beam search
    also solves the overfit corpus through trainer.evaluate."""
    trainer, cfg, _ = conformer_trained
    dataset, _, loader = trainer._setup_dataloader(False)
    err, loss = trainer._evaluate_loader(loader, dataset,
                                         decoder="ctc_beam_search_device")
    assert np.isfinite(err) and err < 0.3, err


def test_eval_device_beam_with_lm(conformer_trained, corpus):
    """ctc_beam_search_device + an ARPA char LM over the corpus: the
    trainer builds the dense bigram table (cached) and the fused decode
    still solves the overfit set."""
    trainer, cfg, _ = conformer_trained
    # tiny char LM over the training texts
    chars = sorted(set("".join(TRAIN_TEXTS)))
    lines = [f"-0.9\t{c}" for c in chars] + ["-3.0\t<unk>"]
    arpa = ("\\data\\\nngram 1=%d\n\n\\1-grams:\n%s\n\n\\end\\\n"
            % (len(chars) + 1, "\n".join(lines)))
    lm_path = str(corpus / "toy.arpa")
    with open(lm_path, "w", encoding="utf-8") as f:
        f.write(arpa)
    trainer.configs["ctc_beam_search_decoder_conf"]["language_model_path"] \
        = lm_path
    trainer.configs["ctc_beam_search_decoder_conf"]["alpha"] = 0.5
    trainer.configs["ctc_beam_search_decoder_conf"]["beta"] = 0.0
    if hasattr(trainer, "_device_lm_table"):
        del trainer._device_lm_table
    dataset, _, loader = trainer._setup_dataloader(False)
    err, _ = trainer._evaluate_loader(loader, dataset,
                                      decoder="ctc_beam_search_device")
    assert trainer._device_lm_table is not None
    assert np.isfinite(err) and err < 0.3, err
