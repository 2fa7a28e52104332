"""Runtime option access (reference hoomd/option.py:72-266)."""

from __future__ import annotations

from . import context


def get_user():
    return context.current.options.user if context.current else []


def set_notice_level(level):
    if context.current:
        context.current.options.notice_level = int(level)


def set_msg_file(fname):
    if context.current:
        context.current.options.msg_file = fname


def set_autotuner_params(enable=True, period=100000):
    """Reference autotuner control (option.py:266).  XLA performs the
    equivalent tuning at compile time; accepted as a no-op."""
    if context.current:
        context.current.options.autotuner_enable = enable
