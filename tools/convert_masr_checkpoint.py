"""Convert a reference-MASR PyTorch checkpoint (`model.pt` state dict) to a
masr_tpu inference bundle — users of the reference migrate their trained
conformer / deepspeech2 models directly (parity verified by
tests/test_convert_parity.py: identical encoder outputs and losses).

    python tools/convert_masr_checkpoint.py --configs configs/conformer.yml \
        --torch_model path/to/best_model/model.pt \
        --save_model_path models/
"""
import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from masr_tpu.utils.config import add_arguments, load_config, print_arguments
from masr_tpu.utils.logger import setup_logger

logger = setup_logger()

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg('configs',         str,  'configs/conformer.yml', "配置文件（需与torch模型结构一致）")
add_arg('torch_model',     str,  None,                    "PyTorch模型state_dict路径(model.pt)")
add_arg('save_model_path', str,  'models/',               "输出目录")
args = parser.parse_args()
print_arguments(args=args)


def main():
    import jax
    import jax.numpy as jnp
    import torch
    from masr_tpu.data.text_featurizer import TextFeaturizer
    from masr_tpu.data.normalizer import FeatureNormalizer
    from masr_tpu.infer.bundle import save_inference_bundle
    from masr_tpu.models.cmvn import GlobalCMVN
    from masr_tpu.models.convert import (apply_converted,
                                         convert_conformer_family,
                                         convert_deepspeech2,
                                         convert_efficient_conformer,
                                         convert_squeezeformer)
    from masr_tpu.models.registry import build_model

    configs = load_config(args.configs)
    use_model = configs.use_model
    if use_model not in ("conformer", "deepspeech2", "squeezeformer",
                         "efficient_conformer"):
        raise ValueError(f"unknown use_model: {use_model}")
    d = configs.dataset_conf
    tf = TextFeaturizer(d.dataset_vocab)
    norm = FeatureNormalizer(d.mean_istd_path)
    input_dim = configs.preprocess_conf.get("n_mels", 80) \
        if configs.preprocess_conf.feature_method == "fbank" else \
        (configs.preprocess_conf.get("n_mfcc", 40)
         if configs.preprocess_conf.feature_method == "mfcc" else 161)

    sd = torch.load(args.torch_model, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items() if "global_cmvn" not in k}

    model = build_model(use_model, input_dim, tf.vocab_size,
                        streaming=bool(configs.get("streaming", True)),
                        encoder_conf=configs.get("encoder_conf"),
                        decoder_conf=configs.get("decoder_conf"),
                        model_conf=configs.get("model_conf"),
                        cmvn=GlobalCMVN(norm.mean, norm.istd))
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        jnp.zeros((1, 67, input_dim)), jnp.asarray([67]),
        jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]), train=False)

    enc_conf = dict(configs.get("encoder_conf") or {})
    bstats = {}
    if use_model == "conformer":
        converted, misses = convert_conformer_family(
            sd, input_dim, enc_conf.get("output_size", 256))
    elif use_model == "deepspeech2":
        converted, misses = convert_deepspeech2(sd, input_dim)
    elif use_model == "squeezeformer":
        converted, bstats, misses = convert_squeezeformer(
            sd, input_dim, enc_conf.get("encoder_dim", 256))
    else:
        converted, bstats, misses = convert_efficient_conformer(
            sd, input_dim, enc_conf.get("output_size", 256))
    if misses:
        logger.warning(f"{len(misses)} torch params not mapped "
                       f"(first: {misses[:5]})")
    params = apply_converted(variables["params"], converted,
                             strict=not misses, allow_extra=True)
    new_vars = dict(variables)
    new_vars["params"] = params
    if bstats:
        new_vars["batch_stats"] = apply_converted(
            variables["batch_stats"], bstats, strict=not misses,
            allow_extra=True)

    out_dir = os.path.join(
        args.save_model_path,
        f"{use_model}_{'streaming' if configs.get('streaming', True) else 'non-streaming'}"
        f"_{configs.preprocess_conf.feature_method}", "inference_model")
    save_inference_bundle(
        out_dir, use_model, bool(configs.get("streaming", True)), input_dim,
        tf.vocab_list, norm.mean, norm.istd, configs.get("encoder_conf"),
        configs.get("decoder_conf"), configs.get("model_conf"),
        configs.preprocess_conf, jax.device_get(new_vars))
    logger.info(f"converted bundle written to {out_dir}")


if __name__ == "__main__":
    main()
