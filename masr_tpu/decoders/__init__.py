from masr_tpu.decoders.greedy import (greedy_decoder, greedy_decoder_batch,
                                      GreedyChunkDecoder)
