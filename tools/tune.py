"""Grid-search beam-search alpha/beta on cached encoder outputs
(parity surface: reference tools/tune.py — which had drifted against the
V2 API and no longer ran, SURVEY.md §2.11; this version works against the
current classes).

Runs the encoder once over the test manifest, caches the CTC probs, then
decodes the cache under each (alpha, beta) pair — tuning never re-runs the
TPU model.
"""
import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from masr_tpu.data.audio_featurizer import AudioFeaturizer
from masr_tpu.data.manifest import read_manifest
from masr_tpu.data.text_featurizer import TextFeaturizer
from masr_tpu.decoders.beam_search import BeamSearchDecoder
from masr_tpu.infer.inference_model import InferencePredictor
from masr_tpu.utils.config import add_arguments, load_config, print_arguments
from masr_tpu.utils.logger import setup_logger
from masr_tpu.utils.metrics import cer, wer
from masr_tpu.audio import AudioSegment

logger = setup_logger()

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg('configs',        str,    'configs/conformer.yml', "配置文件")
add_arg('model_dir',      str,    'models/conformer_streaming_fbank/inference_model/', "导出的推理模型")
add_arg('num_utts',       int,    200,    "用于调参的音频数量")
add_arg('num_alphas',     int,    5,      "alpha候选个数")
add_arg('num_betas',      int,    5,      "beta候选个数")
add_arg('alpha_from',     float,  1.0,    "alpha起点")
add_arg('alpha_to',       float,  3.2,    "alpha终点")
add_arg('beta_from',      float,  0.1,    "beta起点")
add_arg('beta_to',        float,  4.5,    "beta终点")
add_arg('use_device',     bool,   False,  "用片上批量集束搜索调参(整个batch一次解码，alpha/beta为跟踪标量，整个网格只编译一次；需ARPA语言模型)")
args = parser.parse_args()
print_arguments(args=args)


def main():
    configs = load_config(args.configs)
    predictor = InferencePredictor(model_dir=args.model_dir)
    tf = TextFeaturizer(os.path.join(args.model_dir, "vocabulary.txt"))
    featurizer = AudioFeaturizer(train=False, **configs.preprocess_conf)
    entries = read_manifest(configs.dataset_conf.test_manifest)[: args.num_utts]
    metric = configs.get("metrics_type", "cer")
    err_fn = cer if metric == "cer" else wer

    # 1. cache encoder outputs
    cached = []
    for entry in entries:
        seg = AudioSegment.from_file(entry["audio_filepath"])
        feats = featurizer.featurize(seg)
        probs, lens = predictor.predict(feats[None],
                                        np.asarray([feats.shape[0]]))
        cached.append((probs[0][: int(lens[0])], entry["text"]))
    logger.info(f"cached encoder outputs for {len(cached)} utterances")

    # 2. grid search
    bs_conf = dict(configs.get("ctc_beam_search_decoder_conf") or {})
    lm_path = bs_conf.get("language_model_path")
    best = (None, None, float("inf"))
    device_decode = None
    if args.use_device:
        # one batched on-device beam per grid point; alpha/beta enter as
        # TRACED scalars so the whole grid reuses a single compiled
        # program (masr_tpu/decoders/device_beam.py)
        import jax.numpy as jnp
        from masr_tpu.decoders.device_beam import (build_dense_bigram,
                                                   decode_batch_device)
        if not (lm_path and os.path.exists(lm_path)):
            raise SystemExit("--use_device tuning needs an ARPA LM at "
                             "ctc_beam_search_decoder_conf."
                             "language_model_path (without an LM, "
                             "alpha/beta have no effect)")
        logger.info("building dense bigram table for device fusion")
        lm_table = build_dense_bigram(lm_path, tf.vocab_list)
        T = max(p.shape[0] for p, _ in cached)
        V = cached[0][0].shape[1]
        probs_pad = np.zeros((len(cached), T, V), np.float32)
        lens_pad = np.zeros(len(cached), np.int32)
        for i, (p, _) in enumerate(cached):
            probs_pad[i, : p.shape[0]] = p
            lens_pad[i] = p.shape[0]

        def device_decode(alpha, beta):
            return decode_batch_device(
                probs_pad, lens_pad, tf.vocab_list,
                beam_size=min(int(bs_conf.get("beam_size", 300)), 32),
                cutoff_top_n=int(bs_conf.get("cutoff_top_n", 40)),
                lm_table=lm_table, alpha=jnp.float32(alpha),
                beta=jnp.float32(beta))

    for alpha in np.linspace(args.alpha_from, args.alpha_to, args.num_alphas):
        for beta in np.linspace(args.beta_from, args.beta_to, args.num_betas):
            if device_decode is not None:
                results = device_decode(float(alpha), float(beta))
            else:
                decoder = BeamSearchDecoder(
                    tf.vocab_list, alpha=float(alpha), beta=float(beta),
                    beam_size=bs_conf.get("beam_size", 300),
                    cutoff_prob=bs_conf.get("cutoff_prob", 0.99),
                    cutoff_top_n=bs_conf.get("cutoff_top_n", 40),
                    num_processes=bs_conf.get("num_processes", 10),
                    language_model_path=lm_path)
                results = decoder.decode_batch_beam_search_offline(
                    [p for p, _ in cached])
            errors = [err_fn(t, hyp) for (_, t), (_, hyp) in
                      zip(cached, results) if t]
            e = float(np.mean(errors))
            logger.info(f"alpha={alpha:.2f} beta={beta:.2f} {metric}={e:.5f}")
            if e < best[2]:
                best = (float(alpha), float(beta), e)
    logger.info(f"BEST: alpha={best[0]:.2f}, beta={best[1]:.2f}, "
                f"{metric}={best[2]:.5f}")


if __name__ == "__main__":
    main()
