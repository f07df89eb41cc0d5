"""Colored console logger (parity: masr/utils/logger.py in the reference)."""
import logging
import os
import sys

_COLORS = {
    "DEBUG": "\033[36m",     # cyan
    "INFO": "\033[32m",      # green
    "WARNING": "\033[33m",   # yellow
    "ERROR": "\033[31m",     # red
    "CRITICAL": "\033[35m",  # magenta
}
_RESET = "\033[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        msg = super().format(record)
        if sys.stdout.isatty() and record.levelname in _COLORS:
            return f"{_COLORS[record.levelname]}{msg}{_RESET}"
        return msg


def setup_logger(name="masr_tpu", level=None):
    """Create (or fetch) a configured logger.

    Level can be overridden with the MASR_TPU_LOG_LEVEL env var.
    """
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    level = level or os.environ.get("MASR_TPU_LOG_LEVEL", "INFO")
    logger.setLevel(level)
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(_ColorFormatter(
        fmt="[%(asctime)s %(levelname)s] %(message)s", datefmt="%Y-%m-%d %H:%M:%S"))
    logger.addHandler(handler)
    logger.propagate = False
    return logger
