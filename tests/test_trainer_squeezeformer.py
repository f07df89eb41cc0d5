"""Squeezeformer through the full trainer: BatchNorm batch_stats must flow
through train step → checkpoint → export → predict."""
import json
import os

import numpy as np
import pytest

from masr_tpu.audio.io import write_wave


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("sq_e2e")
    os.makedirs(root / "dataset" / "annotation", exist_ok=True)
    rs = np.random.RandomState(0)
    lines = []
    for i, text in enumerate(["你好", "天气", "你好天气", "好天", "气你",
                              "天天好"]):
        n = int(16000 * (0.8 + 0.05 * i))
        sig = (0.2 * np.sin(2 * np.pi * (180 + 40 * i) *
                            np.arange(n) / 16000)
               + 0.02 * rs.standard_normal(n)).astype(np.float32)
        p = root / f"utt{i}.wav"
        write_wave(p, sig, 16000)
        lines.append(f"{p}\t{text}")
    with open(root / "dataset" / "annotation" / "train.txt", "w",
              encoding="utf-8") as f:
        f.write("\n".join(lines[:-1]))
    with open(root / "dataset" / "annotation" / "test.txt", "w",
              encoding="utf-8") as f:
        f.write(lines[-1])
    return root


def test_squeezeformer_train_export_predict(workdir):
    from masr_tpu.training.trainer import MASRTrainer
    from masr_tpu.infer.predictor import MASRPredictor
    d = str(workdir)
    configs = {
        "use_model": "squeezeformer", "streaming": True,
        "decoder": "ctc_greedy", "metrics_type": "cer",
        "encoder_conf": {"encoder_dim": 32, "output_size": 32,
                         "attention_heads": 2, "num_blocks": 2,
                         "reduce_idx": 0, "recover_idx": 1,
                         "feed_forward_expansion_factor": 2,
                         "cnn_module_kernel": 7},
        "decoder_conf": {"attention_heads": 2, "linear_units": 32,
                         "num_blocks": 1, "r_num_blocks": 0},
        "model_conf": {"ctc_weight": 0.5, "lsm_weight": 0.1,
                       "reverse_weight": 0.0},
        "dataset_conf": {
            "batch_size": 4, "num_workers": 2, "min_duration": 0,
            "max_duration": 20,
            "train_manifest": f"{d}/dataset/manifest.train",
            "test_manifest": f"{d}/dataset/manifest.test",
            "dataset_vocab": f"{d}/dataset/vocabulary.txt",
            "mean_istd_path": f"{d}/dataset/mean_istd.json",
            "noise_manifest_path": f"{d}/dataset/manifest.noise",
            "manifest_type": "txt", "init_label_len": 4},
        "preprocess_conf": {"feature_method": "fbank", "n_mels": 80,
                            "sample_rate": 16000,
                            "use_dB_normalization": True, "target_dB": -20},
        "optimizer_conf": {"optimizer": "AdamW", "weight_decay": 1e-5,
                           "learning_rate": 0.001,
                           "scheduler": "NoamHoldAnnealing",
                           "scheduler_conf": {"max_steps": 100,
                                              "warmup_steps": 10,
                                              "hold_steps": 20,
                                              "min_lr": 1e-5}},
        "train_conf": {"enable_amp": False, "grad_clip": 5.0,
                       "accum_grad": 1, "max_epoch": 1, "log_interval": 1},
        "log_dir": f"{d}/log",
    }
    trainer = MASRTrainer(configs=dict(configs))
    trainer.create_data(annotation_path=f"{d}/dataset/annotation",
                        noise_dir=None, num_samples=-1, count_threshold=1)
    trainer.train(save_model_path=f"{d}/models", augment_conf_path=None)
    ckpt_dir = f"{d}/models/squeezeformer_streaming_fbank"
    assert os.path.exists(os.path.join(ckpt_dir, "best_model", "model.state"))
    bundle = trainer.export(save_model_path=f"{d}/models",
                            resume_model=os.path.join(ckpt_dir, "best_model"))
    # batch_stats must be inside the exported bundle
    from masr_tpu.infer.bundle import load_inference_bundle
    _, variables, meta, _ = load_inference_bundle(bundle)
    assert "batch_stats" in variables
    predictor = MASRPredictor(bundle, decoder="ctc_greedy", warmup=False)
    wav = sorted(workdir.glob("utt*.wav"))[0]
    result = predictor.predict(str(wav))
    assert isinstance(result["text"], str)
    # streaming path with batch_stats
    r = predictor.predict_stream(
        np.asarray(np.random.randn(16000) * 0.05, np.float32), is_end=True)
    predictor.reset_stream()
    assert r is None or "text" in r
