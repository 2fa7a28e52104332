"""Small utilities (reference hoomd/util.py)."""

from __future__ import annotations

_status_quiet = 0


def quiet_status():
    global _status_quiet
    _status_quiet += 1


def unquiet_status():
    global _status_quiet
    _status_quiet = max(0, _status_quiet - 1)


def print_status_line():
    pass
