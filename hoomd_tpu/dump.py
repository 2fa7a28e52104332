"""Trajectory / checkpoint writers (reference hoomd/dump.py).

dump.gsd periodically writes full-system frames including per-operation
restart state (thermostat xi/eta), exactly the reference's checkpoint
protocol (GSDDumpWriter.cc:160, dump.py:492-657); the container format is
the frame store in io/frames.py.  dump.dcd writes standard DCD.
"""

from __future__ import annotations

import numpy as np

from . import context
from .io.dcd import DCDWriter
from .io.frames import FrameWriter, write_single_frame
from .operation import Analyzer


def _sys():
    return context.current.system


def _collect_op_state(system):
    """Serialize integrator-method internal state for restart
    (reference IntegratorVariables via the GSD write signal,
    GSDDumpWriter.h:76)."""
    out = {}
    for m, aux in system._method_aux_by_obj.items():
        name = type(m).__name__
        if isinstance(aux, dict):
            for k, v in aux.items():
                out[f"{name}/{k}"] = np.asarray(v)
    return out


class gsd(Analyzer):
    """Write system frames periodically (reference dump.gsd, dump.py:492).

    ``restart`` usage: dump.gsd('restart.htpf', period=10000, group=all,
    truncate=True) or call write_restart() at the end of the job.
    """

    def __init__(self, filename, period, group=None, overwrite=False,
                 truncate=False, phase=0, dynamic=None, static=None):
        Analyzer.__init__(self, period, phase if phase != -1 else 0)
        self.filename = filename
        self.group = group
        self._writer = FrameWriter(filename, overwrite=overwrite,
                                   truncate=truncate)
        _sys().register_analyzer(self)
        if period is None:
            # write one frame immediately (reference period=None behavior)
            self.analyze(_sys(), _sys().timestep)

    def analyze(self, system, timestep):
        snap = system.take_snapshot()
        self._writer.append(snap, timestep, _collect_op_state(system))

    def write_restart(self):
        """Write a single restart frame now (reference dump.py:646)."""
        system = _sys()
        write_single_frame(self.filename, system.take_snapshot(),
                           system.timestep, _collect_op_state(system))


class dcd(Analyzer):
    """DCD trajectory of positions (reference dump.dcd, DCDDumpWriter.h)."""

    def __init__(self, filename, period, group=None, overwrite=False,
                 unwrap_full=False, unwrap_rigid=False, angle_z=False,
                 phase=0):
        Analyzer.__init__(self, period, phase if phase != -1 else 0)
        system = _sys()
        dt = (system.integrator_mode.dt if system.integrator_mode else 0.0)
        self._writer = DCDWriter(filename, system.state.N,
                                 start_step=system.timestep,
                                 period=int(period), dt=dt,
                                 unwrap_full=unwrap_full)
        system.register_analyzer(self)

    def analyze(self, system, timestep):
        snap = system.take_snapshot()
        self._writer.append(snap.particles.position,
                            snap.particles.image, snap.box, timestep)


class getar(Analyzer):
    """Reference dump.getar (libgetar zip/tar archives,
    GetarDumpWriter.h).  The archival container here is the same frame
    store as dump.gsd; provided for API compatibility."""

    def __init__(self, filename, mode='w', static=None, dynamic=None,
                 _register=True, period=None, **kwargs):
        period = period or (list(dynamic.values())[0]
                            if dynamic else 10000)
        Analyzer.__init__(self, period, 0)
        self._writer = FrameWriter(filename, overwrite=(mode == 'w'))
        _sys().register_analyzer(self)

    @classmethod
    def simple(cls, filename, period, mode='w', static=None, dynamic=None,
               high_precision=False):
        return cls(filename, mode=mode, period=period)

    def analyze(self, system, timestep):
        snap = system.take_snapshot()
        self._writer.append(snap, timestep, _collect_op_state(system))
