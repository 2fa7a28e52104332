"""Deprecated writers (reference deprecated/HOOMDDumpWriter.h XML,
deprecated/POSDumpWriter.h)."""

from __future__ import annotations

import numpy as np

from .. import context
from ..operation import Analyzer


class xml(Analyzer):
    """HOOMD-1 XML format writer (reference deprecated.dump.xml)."""

    def __init__(self, group=None, filename='dump', period=None,
                 time_step=None, phase=0, restart=False, **flags):
        Analyzer.__init__(self, period, phase if phase != -1 else 0)
        self.filename = filename
        self.flags = flags
        context.current.system.register_analyzer(self)
        if period is None:
            self.analyze(context.current.system,
                         context.current.system.timestep)

    def analyze(self, system, timestep):
        snap = system.take_snapshot()
        p = snap.particles
        b = snap.box
        fn = self.filename
        if self.period:
            fn = f"{self.filename}.{timestep:010d}.xml"
        elif not fn.endswith('.xml'):
            fn = fn + '.xml'
        with open(fn, 'w') as f:
            f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
            f.write(f'<hoomd_xml version="1.7">\n'
                    f'<configuration time_step="{timestep}" '
                    f'dimensions="{b.dimensions}" natoms="{p.N}">\n')
            f.write(f'<box lx="{b.Lx}" ly="{b.Ly}" lz="{b.Lz}" '
                    f'xy="{b.xy}" xz="{b.xz}" yz="{b.yz}"/>\n')
            f.write(f'<position num="{p.N}">\n')
            for r in p.position:
                f.write(f"{r[0]:.9g} {r[1]:.9g} {r[2]:.9g}\n")
            f.write('</position>\n')
            if self.flags.get('velocity'):
                f.write(f'<velocity num="{p.N}">\n')
                for v in p.velocity:
                    f.write(f"{v[0]:.9g} {v[1]:.9g} {v[2]:.9g}\n")
                f.write('</velocity>\n')
            f.write(f'<type num="{p.N}">\n')
            for t in p.typeid:
                f.write(p.types[t] + '\n')
            f.write('</type>\n')
            if snap.bonds.N:
                f.write(f'<bond num="{snap.bonds.N}">\n')
                for t, (a2, b2) in zip(snap.bonds.typeid,
                                       snap.bonds.group):
                    f.write(f"{snap.bonds.types[t]} {a2} {b2}\n")
                f.write('</bond>\n')
            f.write('</configuration>\n</hoomd_xml>\n')


class pos(Analyzer):
    """Injavis .pos trajectory writer (reference deprecated.dump.pos)."""

    def __init__(self, filename, period=None, unwrap_rigid=False,
                 phase=0, addInfo=None):
        Analyzer.__init__(self, period, phase if phase != -1 else 0)
        self.filename = filename
        open(filename, 'w').close()
        context.current.system.register_analyzer(self)

    def analyze(self, system, timestep):
        snap = system.take_snapshot()
        p = snap.particles
        b = snap.box
        with open(self.filename, 'a') as f:
            f.write(f"boxMatrix {b.Lx} 0 0 0 {b.Ly} 0 0 0 {b.Lz}\n")
            for i in range(p.N):
                t = p.types[p.typeid[i]]
                f.write(f"def {t} \"sphere {p.diameter[i]}\"\n")
                break
            for i in range(p.N):
                r = p.position[i]
                f.write(f"{p.types[p.typeid[i]]} {r[0]:.6g} {r[1]:.6g} "
                        f"{r[2]:.6g}\n")
            f.write("eof\n")
