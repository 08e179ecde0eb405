"""File + screen logging (reference: utils.py:133-147)."""

from __future__ import annotations

import datetime
import logging
import os


def get_timestamp() -> str:
    return datetime.datetime.now().strftime("%y%m%d-%H%M%S")


def setup_logger(
    name: str,
    root: str | None = None,
    phase: str = "train",
    level: int = logging.INFO,
    screen: bool = True,
    tofile: bool = False,
) -> logging.Logger:
    lg = logging.getLogger(name)
    lg.setLevel(level)
    fmt = logging.Formatter(
        "%(asctime)s.%(msecs)03d - %(levelname)s: %(message)s",
        datefmt="%y-%m-%d %H:%M:%S",
    )
    if tofile and root is not None:
        os.makedirs(root, exist_ok=True)
        fh = logging.FileHandler(
            os.path.join(root, f"{phase}_{get_timestamp()}.log"), mode="w"
        )
        fh.setFormatter(fmt)
        lg.addHandler(fh)
    if screen:
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        lg.addHandler(sh)
    return lg
