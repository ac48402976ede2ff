"""Error funnel — the toolkit/error.{h,cc} equivalent.

Error/Warning/Message printf-style reporting through a pluggable handler
(ref toolkit/error.h:24-61: stderr default, swappable for a GUI handler),
`panic` (abort), and `check`/`check_msg` assertion helpers
(ref error.h:63-90).  For device-side (inside-jit) assertions use
`device_check`, which wraps jax.experimental.checkify.
"""

from __future__ import annotations

import sys
from typing import Callable, Optional

_handler: Optional[Callable[[str, str], None]] = None


def set_error_handler(handler: Optional[Callable[[str, str], None]]) -> None:
    """handler(level, message); None restores the stderr default."""
    global _handler
    _handler = handler


def _emit(level: str, fmt: str, *args) -> None:
    msg = (fmt % args) if args else fmt
    if _handler is not None:
        _handler(level, msg)
    else:
        print(f"{level}: {msg}", file=sys.stderr)


def message(fmt: str, *args) -> None:
    _emit("Message", fmt, *args)


def warning(fmt: str, *args) -> None:
    _emit("Warning", fmt, *args)


def error(fmt: str, *args) -> None:
    _emit("Error", fmt, *args)


class PanicError(RuntimeError):
    pass


def panic(fmt: str, *args) -> None:
    """Report and raise (the reference aborts the process,
    toolkit/error.cc; raising is the Python-appropriate analog)."""
    msg = (fmt % args) if args else fmt
    _emit("Panic", "%s", msg)
    raise PanicError(msg)


def check(condition, msg: str = "CHECK failed") -> None:
    if not condition:
        panic("%s", msg)


def check_msg(condition, fmt: str, *args) -> None:
    if not condition:
        panic(fmt, *args)


def device_check(pred, fmt: str, *args) -> None:
    """checkify.check for use inside jitted code; enable by wrapping the
    function with checkify.checkify (ref: the build's analog of
    DBG_CHECK, SURVEY.md §5.2)."""
    from jax.experimental import checkify

    checkify.check(pred, fmt, *args)
