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


def notice(level, msg):
    """Leveled notice on stderr, gated by the context notice level —
    the analog of the reference Messenger's notice streams
    (hoomd/Messenger.h:39-59)."""
    import sys

    from . import context
    lvl = 2
    if context.current is not None:
        lvl = getattr(context.current.options, 'notice_level', 2)
    if lvl >= level:
        print(f"notice({level}): {msg}", file=sys.stderr, flush=True)
