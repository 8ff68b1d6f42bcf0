"""Run loggers.

Two logger flavors, mirroring the reference's pair:
  * :class:`MyLogger` with auto-versioned ``version_N`` run directories
    (ref `/root/reference/src/utils/logger.py:11-91`)
  * :func:`setup_logger` stdout+file training logger
    (ref `/root/reference/src/network/core/utils/logger.py:8-41`)
"""
from __future__ import annotations

import logging
import os
import os.path as osp
import socket
import sys
import time
from typing import Optional

from .file_io import makedirs


class MyLogger:
    """Stdout + file logger that allocates a fresh ``version_N`` run dir."""

    def __init__(
        self,
        name: str,
        save_dir: str = "",
        version: Optional[int] = None,
        use_timestamp: bool = True,
    ):
        logger = logging.getLogger(name)
        logger.setLevel(logging.DEBUG)
        logger.handlers.clear()

        formatter = logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
        ch = logging.StreamHandler(stream=sys.stdout)
        ch.setLevel(logging.DEBUG)
        ch.setFormatter(formatter)
        logger.addHandler(ch)

        if save_dir:
            if version is None:
                version = self._next_version(save_dir)
            save_dir = osp.join(save_dir, f"version_{version}")
            makedirs(save_dir, exist_ok=True)

            filename = "log"
            if use_timestamp:
                stamp = time.strftime("%m-%d_%H-%M-%S")
                filename += f".{stamp}.{socket.gethostname()}"
            fh = logging.FileHandler(osp.join(save_dir, filename + ".txt"))
            fh.setLevel(logging.DEBUG)
            fh.setFormatter(formatter)
            logger.addHandler(fh)

        self.logger = logger
        self.save_dir = save_dir

    def log(self, msg: str, level: str = "info") -> None:
        fn = {
            "info": self.logger.info,
            "debug": self.logger.debug,
            "warning": self.logger.warning,
            "critical": self.logger.critical,
        }.get(level)
        if fn is None:
            raise NotImplementedError(f"Unknown log level {level}")
        fn(msg)

    @staticmethod
    def _next_version(save_dir: str) -> int:
        makedirs(save_dir, exist_ok=True)
        versions = [
            int(d.split("_")[1])
            for d in os.listdir(save_dir)
            if osp.isdir(osp.join(save_dir, d)) and d.startswith("version_")
        ]
        return max(versions) + 1 if versions else 0


def setup_logger(name: str, save_dir: str = "", prefix: str = "") -> logging.Logger:
    """Training logger: stdout + timestamped file in ``save_dir``."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.handlers.clear()
    logger.propagate = False

    formatter = logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
    ch = logging.StreamHandler(stream=sys.stdout)
    ch.setFormatter(formatter)
    logger.addHandler(ch)

    if save_dir:
        makedirs(save_dir, exist_ok=True)
        stamp = time.strftime("%m-%d_%H-%M-%S")
        name_parts = ["log", prefix, stamp, socket.gethostname()]
        filename = ".".join(p for p in name_parts if p) + ".txt"
        fh = logging.FileHandler(osp.join(save_dir, filename))
        fh.setFormatter(formatter)
        logger.addHandler(fh)

    return logger
