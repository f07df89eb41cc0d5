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
add_arg('save_quant',       str,  None,                       "量化导出: bf16(半精度) 或 int8(仅权重逐通道量化，产物约1/4大小)")
add_arg('overwrites',       str,  None,                       '覆盖配置文件中的参数，多个用逗号隔开')
args = parser.parse_args()
print_arguments(args=args)

trainer = MASRTrainer(configs=args.configs, use_gpu=args.use_gpu,
                      overwrites=args.overwrites)
# --save_quant accepts bf16 | int8 (and True as a legacy alias for bf16)
quant = (args.save_quant or "").strip().lower() or None
if quant in ("true", "1"):
    quant = "bf16"
elif quant in ("false", "0"):
    quant = None
trainer.export(save_model_path=args.save_model_path,
               resume_model=args.resume_model, quant=quant)
