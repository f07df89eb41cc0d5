from masr_tpu.models.registry import build_model
