"""Misc helpers: LR schedules, palette PNG colorization, dirs."""

from __future__ import annotations

import os

import numpy as np


def step_learning_rate(base_lr, epoch, step_epoch, multiplier=0.1):
    """Base LR decayed by ``multiplier`` every ``step_epoch`` epochs."""
    return base_lr * (multiplier ** (epoch // step_epoch))


def poly_learning_rate(base_lr, curr_iter, max_iter, power=0.9):
    """``base_lr * (1 - iter/max_iter) ** power`` (reference util.py:34)."""
    return base_lr * (1 - float(curr_iter) / max_iter) ** power


def check_mkdir(dir_name):
    if not os.path.exists(dir_name):
        os.mkdir(dir_name)


def check_makedirs(dir_name):
    os.makedirs(dir_name, exist_ok=True)


def find_free_port() -> int:
    """Pick an OS-assigned free TCP port (multi-host coordinator setup)."""
    import socket

    sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    sock.bind(("", 0))
    port = sock.getsockname()[1]
    sock.close()
    return port


def colorize(gray: np.ndarray, palette) -> "object":
    """Palette PNG (PIL 'P' mode) from a uint8 class map.

    ``palette`` is a flat [R0,G0,B0, R1,G1,B1, ...] list or an [N,3] array.
    """
    from PIL import Image

    palette = np.asarray(palette, dtype=np.uint8).reshape(-1).tolist()
    color = Image.fromarray(gray.astype(np.uint8)).convert("P")
    color.putpalette(palette)
    return color


def get_logger(name: str = "main-logger"):
    import logging

    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    logger.propagate = False  # avoid duplicate lines via the root logger
    handler = logging.StreamHandler()
    fmt = "[%(asctime)s %(levelname)s %(filename)s line %(lineno)d %(process)d] %(message)s"
    handler.setFormatter(logging.Formatter(fmt))
    logger.addHandler(handler)
    return logger
