"""Pre-extract features to .npy slabs (parity: reference extract_features.py)."""
import argparse
import functools

from masr_tpu.training.trainer import MASRTrainer
from masr_tpu.utils.config import add_arguments, print_arguments

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg('configs',      str,  'configs/conformer.yml',  "配置文件")
add_arg('save_dir',     str,  'dataset/features',       "特征保存路径")
add_arg('max_duration', int,  100,                      "提取特征的最大时长，单位秒")
args = parser.parse_args()
print_arguments(args=args)

trainer = MASRTrainer(configs=args.configs)
trainer.extract_features(save_dir=args.save_dir,
                         max_duration=args.max_duration)
