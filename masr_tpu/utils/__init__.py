from masr_tpu.utils.logger import setup_logger
from masr_tpu.utils.config import AttrDict, dict_to_object, load_config, print_arguments, add_arguments
from masr_tpu.utils.metrics import cer, wer
