"""Export an inference bundle (parity: reference export_model.py)."""
import argparse
import functools

from masr_tpu.training.trainer import MASRTrainer
from masr_tpu.utils.config import add_arguments, print_arguments

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg('configs',          str,  'configs/conformer.yml',    "配置文件")
add_arg("use_gpu",          bool, True,                       "是否使用加速器(兼容参数)")
add_arg('save_model_path',  str,  'models/',                  "模型保存的路径")
add_arg('resume_model',     str,  'models/conformer_streaming_fbank/best_model/', "准备导出的模型路径")
add_arg('save_quant',       bool, False,                      "是否导出半精度(bf16)模型，对应参考实现的量化导出")
add_arg('overwrites',       str,  None,                       '覆盖配置文件中的参数，多个用逗号隔开')
args = parser.parse_args()
print_arguments(args=args)

trainer = MASRTrainer(configs=args.configs, use_gpu=args.use_gpu,
                      overwrites=args.overwrites)
trainer.export(save_model_path=args.save_model_path,
               resume_model=args.resume_model, half=args.save_quant)
