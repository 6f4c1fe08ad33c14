"""Root logger named 'radet_tpu' (mirrors radet/utils/logger.py:6-19)."""

from __future__ import annotations

import logging

_INITIALIZED = False


def get_root_logger(log_file: str | None = None, log_level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger("radet_tpu")
    global _INITIALIZED
    if not _INITIALIZED:
        fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        logger.setLevel(log_level)
        logger.propagate = False
        _INITIALIZED = True
    if log_file is not None:
        if not any(
            isinstance(h, logging.FileHandler) and h.baseFilename == log_file
            for h in logger.handlers
        ):
            fh = logging.FileHandler(log_file)
            fh.setFormatter(logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s"))
            logger.addHandler(fh)
    return logger
