"""Regenerate the in-repo example bundle (examples/tiny_zh_synth).

Runs the REAL CLI pipeline end to end on the deterministic synthetic-TTS
corpus (the same generator the parity harness uses —
tools/head_to_head.py make_corpus): create_data → train → export, then
copies the exported inference bundle into examples/tiny_zh_synth/.

Usage (TPU recommended; CPU works but this box has one core):
  python tools/make_example_bundle.py [--work /tmp/bundle] [--epochs 60]
"""
import argparse
import os
import shutil
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CONFIG_TMPL = """use_model: 'conformer'
streaming: True
decoder: 'ctc_greedy'
metrics_type: 'cer'

encoder_conf:
  output_size: 48
  attention_heads: 2
  linear_units: 96
  num_blocks: 2
  dropout_rate: 0.1
  positional_dropout_rate: 0.1
  attention_dropout_rate: 0.1
  input_layer: 'conv2d'
  normalize_before: True
  cnn_module_kernel: 7
  use_cnn_module: True
  activation_type: 'swish'
  pos_enc_layer_type: 'rel_pos'

decoder_conf:
  attention_heads: 2
  linear_units: 96
  num_blocks: 2
  r_num_blocks: 0
  dropout_rate: 0.1
  positional_dropout_rate: 0.1
  self_attention_dropout_rate: 0.1
  src_attention_dropout_rate: 0.1

model_conf:
  ctc_weight: 0.3
  lsm_weight: 0.1
  reverse_weight: 0.0
  length_normalized_loss: false

dataset_conf:
  batch_size: 16
  num_workers: 0
  min_duration: 0.1
  max_duration: 20
  init_label_len: 4
  train_manifest: '{work}/dataset/manifest.train'
  test_manifest: '{work}/dataset/manifest.test'
  dataset_vocab: '{work}/dataset/vocabulary.txt'
  mean_istd_path: '{work}/dataset/mean_istd.json'
  noise_manifest_path: '{work}/dataset/manifest.noise'
  manifest_type: 'txt'

preprocess_conf:
  feature_method: 'fbank'
  n_mels: 80
  n_mfcc: 40
  sample_rate: 16000
  use_dB_normalization: True
  target_dB: -20

ctc_beam_search_decoder_conf:
  alpha: 2.2
  beta: 4.3
  beam_size: 10
  num_processes: 2
  cutoff_prob: 0.99
  cutoff_top_n: 40
  language_model_path: ''

optimizer_conf:
  optimizer: 'Adam'
  weight_decay: 1.e-6
  learning_rate: 0.002
  scheduler: 'WarmupLR'
  scheduler_conf:
    warmup_steps: 300
    min_lr: 1.e-5

train_conf:
  enable_amp: False
  grad_clip: 5.0
  accum_grad: 1
  max_epoch: {epochs}
  log_interval: 10
"""


def make_corpus_wavs(work):
    from head_to_head import make_corpus
    from masr_tpu.audio.synth_tts import SyntheticTTS
    tts = SyntheticTTS(sample_rate=16000)
    train_s, test_s = make_corpus(240, 24)
    wav_dir = os.path.join(work, "wavs")
    ann_dir = os.path.join(work, "dataset", "annotation")
    os.makedirs(wav_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)
    lines = {"train": [], "test": []}
    for i, s in enumerate(train_s + test_s):
        p = os.path.join(wav_dir, f"{i}.wav")
        tts.synthesize(s, spk_id=i % 2, out_path=p)
        lines["train" if i < len(train_s) else "test"].append(f"{p}\t{s}")
    for split, ls in lines.items():
        with open(os.path.join(ann_dir, f"{split}.txt"), "w",
                  encoding="utf-8") as f:
            f.write("\n".join(ls) + "\n")
    return train_s, test_s


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/bundle")
    ap.add_argument("--epochs", type=int, default=60)
    args = ap.parse_args()
    work = os.path.abspath(args.work)
    os.makedirs(work, exist_ok=True)
    make_corpus_wavs(work)
    cfg = os.path.join(work, "bundle.yml")
    with open(cfg, "w", encoding="utf-8") as f:
        f.write(CONFIG_TMPL.format(work=work, epochs=args.epochs))
    py = sys.executable
    run([py, "create_data.py", "--configs", cfg, "--annotation_path",
         os.path.join(work, "dataset", "annotation"), "--noise_dir", "",
         "--num_samples", "-1", "--count_threshold", "1"])
    run([py, "train.py", "--configs", cfg, "--save_model_path",
         os.path.join(work, "models")])
    run([py, "export_model.py", "--configs", cfg, "--save_model_path",
         os.path.join(work, "models"), "--resume_model",
         os.path.join(work, "models", "conformer_streaming_fbank",
                      "best_model")])
    src = os.path.join(work, "models", "conformer_streaming_fbank",
                       "inference_model")
    dst = os.path.join(REPO, "examples", "tiny_zh_synth",
                       "inference_model")
    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(src, dst)
    print("bundle installed at", dst)


if __name__ == "__main__":
    main()
