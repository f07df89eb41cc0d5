from masr_tpu.ops.pallas.attention import rel_pos_flash_attention
