from masr_tpu.ops import fbank, masks, common
