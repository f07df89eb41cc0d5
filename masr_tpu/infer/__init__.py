from masr_tpu.infer.predictor import MASRPredictor
