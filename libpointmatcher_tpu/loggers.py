"""Loggers (reference: PointMatcher.h:104-120, LoggerImpl.{h,cpp}).

The reference exposes a globally-installed logger with info/warning channels
and source-location capture via macros (PointMatcherPrivate.h:56-78). Here we
bridge the same module names onto Python's ``logging`` so host-side pipeline
events are observable; device-side compute never logs (it is jit-compiled)."""

from __future__ import annotations

import logging
import sys
import threading
from typing import Optional

from .registry import Param, Parametrizable, Registrar

__all__ = [
    "Logger",
    "NullLogger",
    "FileLogger",
    "LoggerRegistrar",
    "set_logger",
    "get_logger",
]

LoggerRegistrar = Registrar("Logger")

_lock = threading.Lock()
_current: Optional["Logger"] = None

_py_logger = logging.getLogger("libpointmatcher_tpu")


class Logger(Parametrizable):
    """Interface (reference: PointMatcher.h:104-120)."""

    def has_info_channel(self) -> bool:
        return False

    def has_warning_channel(self) -> bool:
        return False

    def info(self, msg: str, where: str = "") -> None:
        pass

    def warning(self, msg: str, where: str = "") -> None:
        pass


@LoggerRegistrar.register
class NullLogger(Logger):
    """Swallows everything (reference: LoggerImpl.h:49-53)."""


@LoggerRegistrar.register
class FileLogger(Logger):
    """Routes info to stdout/file and warnings to stderr/file
    (reference: LoggerImpl.h:55-90)."""

    PARAMS = (
        Param("infoFileName", "file for the info channel ('' = stdout)", str, ""),
        Param("warningFileName", "file for the warning channel ('' = stderr)", str, ""),
        Param("displayLocation", "whether to display the source location",
              bool, False),
    )

    def __init__(self, params=None):
        super().__init__(params)
        self._info = open(self.infoFileName, "a") if self.infoFileName else sys.stdout
        self._warn = (
            open(self.warningFileName, "a") if self.warningFileName else sys.stderr
        )

    def has_info_channel(self) -> bool:
        return True

    def has_warning_channel(self) -> bool:
        return True

    def info(self, msg: str, where: str = "") -> None:
        loc = f" [{where}]" if self.displayLocation and where else ""
        print(f"{msg}{loc}", file=self._info)

    def warning(self, msg: str, where: str = "") -> None:
        loc = f" [{where}]" if self.displayLocation and where else ""
        print(f"WARN: {msg}{loc}", file=self._warn)


def set_logger(logger: Optional[Logger]) -> None:
    """Install the global logger (reference: PointMatcher.h:120, mutex-guarded)."""
    global _current
    with _lock:
        _current = logger


def get_logger() -> Logger:
    global _current
    with _lock:
        if _current is None:
            _current = NullLogger()
        return _current


def log_info(msg: str, where: str = "") -> None:
    get_logger().info(msg, where)
    _py_logger.debug(msg)


def log_warning(msg: str, where: str = "") -> None:
    get_logger().warning(msg, where)
    _py_logger.warning(msg)
