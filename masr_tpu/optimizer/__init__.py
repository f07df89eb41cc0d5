from masr_tpu.optimizer.schedulers import (warmup_lr, noam_hold_annealing,
                                           cosine_with_warmup, build_optimizer,
                                           build_lr_schedule)
