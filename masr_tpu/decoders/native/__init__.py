"""Native (C++) CTC beam search extension loader.

Built by `python -m masr_tpu.decoders.native.build` (see ctc_decoders.cc).
`beam_search.py` falls back to the pure-Python engine when the shared
library is absent.
"""
