from masr_tpu.training.trainer import MASRTrainer
