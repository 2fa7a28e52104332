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
    """Archival zip dumps (reference dump.getar, GetarDumpWriter.h,
    libgetar).  Writes a genuine zip container using the libgetar path
    schema — static records at the archive root
    (``type_names.json``, ``dimensions.u32.uni``) and per-frame dynamic
    records under ``frames/<timestep>/`` as raw little-endian arrays
    (``position.f32.ind``, ``velocity.f32.ind``, ``image.i32.ind``,
    ``type.u32.ind``, ``box.f32.uni``, ...).  ``init.restore_getar``
    reads the newest frame back."""

    _DYNAMIC = ('position', 'velocity', 'image', 'type', 'box',
                'orientation', 'charge', 'diameter', 'mass')

    def __init__(self, filename, mode='w', static=None, dynamic=None,
                 _register=True, period=None, **kwargs):
        import os
        import zipfile
        period = period or (list(dynamic.values())[0]
                            if dynamic else 10000)
        Analyzer.__init__(self, period, 0)
        self.filename = filename
        if mode == 'w' and os.path.exists(filename):
            os.remove(filename)
        self._wrote_static = False
        # validate the container is writable up front
        with zipfile.ZipFile(filename, 'a',
                             zipfile.ZIP_DEFLATED):
            pass
        if _register:
            _sys().register_analyzer(self)

    @classmethod
    def simple(cls, filename, period, mode='w', static=None, dynamic=None,
               high_precision=False):
        return cls(filename, mode=mode, period=period)

    def analyze(self, system, timestep):
        import json
        import zipfile
        import numpy as np
        snap = system.take_snapshot()
        with zipfile.ZipFile(self.filename, 'a',
                             zipfile.ZIP_DEFLATED) as z:
            if not self._wrote_static:
                z.writestr('type_names.json',
                           json.dumps(list(snap.particles.types)))
                z.writestr('dimensions.u32.uni',
                           np.asarray([snap.box.dimensions],
                                      np.uint32).tobytes())
                self._wrote_static = True
            pre = f'frames/{int(timestep)}/'
            p = snap.particles
            z.writestr(pre + 'position.f32.ind',
                       np.asarray(p.position, '<f4').tobytes())
            z.writestr(pre + 'velocity.f32.ind',
                       np.asarray(p.velocity, '<f4').tobytes())
            z.writestr(pre + 'image.i32.ind',
                       np.asarray(p.image, '<i4').tobytes())
            z.writestr(pre + 'type.u32.ind',
                       np.asarray(p.typeid, '<u4').tobytes())
            z.writestr(pre + 'mass.f32.ind',
                       np.asarray(p.mass, '<f4').tobytes())
            z.writestr(pre + 'charge.f32.ind',
                       np.asarray(p.charge, '<f4').tobytes())
            z.writestr(pre + 'diameter.f32.ind',
                       np.asarray(p.diameter, '<f4').tobytes())
            z.writestr(pre + 'orientation.f32.ind',
                       np.asarray(p.orientation, '<f4').tobytes())
            b = snap.box
            z.writestr(pre + 'box.f32.uni',
                       np.asarray([b.Lx, b.Ly, b.Lz, b.xy, b.xz,
                                   b.yz], '<f4').tobytes())

    def write_restart(self):
        from . import context
        system = context.current.system
        self.analyze(system, system.timestep)

    def close(self):
        pass
