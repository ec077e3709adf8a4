"""Logging: file + console Python logging, and a scalar summary writer.

Mirrors the reference observability surface (/root/reference/src/utils/
loggers.py:5-30): a ``log.txt`` appender plus console logging, and a
per-run scalar writer.  The reference uses a TensorBoard SummaryWriter;
here the primary sink is a dependency-free JSONL writer (``scalars.jsonl``
inside ``summary_dir``), with TensorBoard event emission layered on top
when the ``tensorboard`` package happens to be importable.
"""

from __future__ import annotations

import json
import logging
import os
import time
from pathlib import Path


def get_logger(log_dir: Path, name: str = "Root") -> logging.Logger:
    """File (``log_dir/log.txt``, append) + console logger.

    Reference: loggers.py:5-24.
    """
    log_dir = Path(log_dir)
    log_dir.mkdir(exist_ok=True, parents=True)
    log_format = ("Time: %(asctime)s | Logger: %(name)s | "
                  "Level: %(levelname)s | Message: %(message)s")
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    # Re-configurable across runs in one process (unlike basicConfig).
    for h in list(logger.handlers):
        logger.removeHandler(h)
    file_handler = logging.FileHandler(log_dir / "log.txt", mode="a")
    file_handler.setLevel(logging.INFO)
    file_handler.setFormatter(logging.Formatter(log_format))
    logger.addHandler(file_handler)
    console_handler = logging.StreamHandler()
    console_handler.setLevel(logging.INFO)
    console_handler.setFormatter(logging.Formatter(log_format))
    logger.addHandler(console_handler)
    return logger


class SummaryWriter:
    """Scalar writer: JSONL always; TensorBoard events when available.

    Drop-in for the subset of ``torch.utils.tensorboard.SummaryWriter``
    the trainers use (``add_scalar``), reference loggers.py:28-30 and
    e.g. segmentation.py:137-144.
    """

    def __init__(self, summary_dir: Path):
        self.summary_dir = Path(summary_dir)
        self.summary_dir.mkdir(exist_ok=True, parents=True)
        self._file = open(self.summary_dir / "scalars.jsonl", "a")
        # TensorBoard event emission is ON by default, matching the
        # reference's observability surface (loggers.py:28-30) — via the
        # dependency-free writer in tb_events.py (the torch TB stack
        # costs ~25s to import; this one is pure stdlib).  Disable with
        # MIVP_TENSORBOARD=0.
        self._tb = None
        if os.environ.get("MIVP_TENSORBOARD", "1") != "0":
            from .tb_events import EventWriter
            self._tb = EventWriter(self.summary_dir)

    def add_scalar(self, tag: str, value, step: int) -> None:
        self._file.write(json.dumps({
            "tag": tag,
            "value": float(value),
            "step": int(step),
            "wall_time": time.time(),
        }) + "\n")
        self._file.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def close(self) -> None:
        self._file.close()
        if self._tb is not None:
            self._tb.close()


def get_summary_writer(summary_dir: Path) -> SummaryWriter:
    return SummaryWriter(summary_dir)
