"""Config loading: YAML → attribute dict (parity: masr/utils/utils.py:45-56,
trainer.py:52-56). Config keys mirror module constructor kwargs — encoder_conf /
decoder_conf are splatted directly into model constructors, same as the reference.
"""
import distutils.util
import os

import yaml


class AttrDict(dict):
    """dict with attribute access, recursively applied by dict_to_object."""

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key, value):
        self[key] = value

    def __deepcopy__(self, memo):
        import copy
        return AttrDict({k: copy.deepcopy(v, memo) for k, v in self.items()})


def dict_to_object(d):
    if isinstance(d, dict):
        return AttrDict({k: dict_to_object(v) for k, v in d.items()})
    if isinstance(d, (list, tuple)):
        return type(d)(dict_to_object(v) for v in d)
    return d


def load_config(path):
    """Load a YAML config file into a nested AttrDict."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"config file not found: {path}")
    with open(path, "r", encoding="utf-8") as f:
        cfg = yaml.safe_load(f)
    return dict_to_object(cfg)


def add_arguments(argname, type, default, help, argparser, **kwargs):
    """argparse helper matching the reference CLI convention
    (masr/utils/utils.py:36-42)."""
    type = distutils.util.strtobool if type == bool else type
    argparser.add_argument("--" + argname,
                           default=default,
                           type=type,
                           help=help + f" 默认: %(default)s.",
                           **kwargs)


def print_arguments(args=None, configs=None, title=None):
    from masr_tpu.utils.logger import setup_logger
    logger = setup_logger()
    if args is not None:
        logger.info("----------- 额外配置参数 -----------")
        for arg, value in sorted(vars(args).items()):
            logger.info(f"{arg}: {value}")
        logger.info("------------------------------------------------")
    if configs is not None:
        title = title or "配置文件参数"
        logger.info(f"----------- {title} -----------")
        _print_dict(configs, logger)
        logger.info("------------------------------------------------")


def _print_dict(d, logger, indent=0):
    for k, v in d.items():
        if isinstance(v, dict):
            logger.info("  " * indent + f"{k}:")
            _print_dict(v, logger, indent + 1)
        else:
            logger.info("  " * indent + f"{k}: {v}")
