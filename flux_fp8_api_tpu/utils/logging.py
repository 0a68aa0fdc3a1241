"""Structured logging for the pipeline (reference uses loguru — flux_pipeline.py:594,
lora_loading.py:642 — which isn't in the TPU image; this wraps stdlib logging with the
same call surface: ``logger.info/warning/success/debug``).
"""

from __future__ import annotations

import logging
import sys

_FORMAT = "%(asctime)s | %(levelname)-7s | %(name)s - %(message)s"


class _SuccessLogger(logging.Logger):
    """loguru-compatible ``success`` level (between INFO and WARNING)."""

    SUCCESS = 25

    def success(self, msg, *args, **kwargs):
        if self.isEnabledFor(self.SUCCESS):
            self._log(self.SUCCESS, msg, args, **kwargs)


logging.addLevelName(_SuccessLogger.SUCCESS, "SUCCESS")
logging.setLoggerClass(_SuccessLogger)


def get_logger(name: str = "flux_fp8_api_tpu") -> _SuccessLogger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger  # type: ignore[return-value]


logger = get_logger()
