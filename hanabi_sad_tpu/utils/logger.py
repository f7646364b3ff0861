"""Stdout tee logger (reference common_utils/logger.py:5-23).

As in the reference, the training log doubles as the persisted config store:
the driver pretty-prints its config dict at startup and loaders can parse it
back (utils.py:87-116)."""

from __future__ import annotations

import sys


class Logger:
    def __init__(self, path: str, mode: str = "w"):
        assert mode in {"w", "a"}
        self.terminal = sys.stdout
        self.log = open(path, mode)

    def write(self, message: str):
        self.terminal.write(message)
        self.log.write(message)
        self.log.flush()

    def flush(self):
        self.terminal.flush()
        self.log.flush()

    def close(self):
        self.log.close()
