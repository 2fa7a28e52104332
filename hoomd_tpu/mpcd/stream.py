"""MPCD streaming methods (reference mpcd/StreamingMethod.h,
mpcd/stream.py)."""

from __future__ import annotations

from .. import context


class bulk:
    """Ballistic bulk streaming (reference mpcd.stream.bulk): solvent
    drifts every ``period`` MD steps."""

    def __init__(self, period=1):
        sys_ = context.current.system
        mode = sys_.integrator_mode
        if mode is None or not hasattr(mode, '_stream_period'):
            raise RuntimeError("create mpcd.integrator first")
        mode._stream_period = int(period)
        sys_._dirty()
