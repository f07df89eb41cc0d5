from masr_tpu.audio.segment import AudioSegment
from masr_tpu.audio.io import read_wave, write_wave, buf_to_float, resample as resample_audio
