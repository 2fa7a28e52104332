"""Deprecated analyzers (reference deprecated/MSDAnalyzer.h,
deprecated/analyze.py)."""

from __future__ import annotations

import numpy as np

from .. import context
from ..operation import Analyzer


class msd(Analyzer):
    """Mean-squared displacement of groups vs a reference frame
    (reference deprecated.analyze.msd): one TSV column per group,
    unwrapped coordinates via image flags."""

    def __init__(self, filename, groups, period, header_prefix='',
                 r0_file=None, overwrite=False, phase=0):
        Analyzer.__init__(self, period, phase if phase != -1 else 0)
        self.filename = filename
        self.groups = list(groups)
        self._wrote_header = False
        if overwrite and filename:
            open(filename, 'w').close()
        system = context.current.system
        snap = system.take_snapshot()
        self._r0 = self._unwrapped(snap)
        system.register_analyzer(self)

    @staticmethod
    def _unwrapped(snap):
        b = snap.box
        h = np.array([[b.Lx, b.xy * b.Ly, b.xz * b.Lz],
                      [0, b.Ly, b.yz * b.Lz],
                      [0, 0, b.Lz]])
        return snap.particles.position + snap.particles.image @ h.T

    def analyze(self, system, timestep):
        snap = system.take_snapshot()
        r = self._unwrapped(snap)
        row = []
        for g in self.groups:
            d = r[g.member_tags] - self._r0[g.member_tags]
            row.append(float((d ** 2).sum(axis=1).mean()))
        if self.filename:
            with open(self.filename, 'a') as f:
                if not self._wrote_header:
                    f.write('timestep\t'
                            + '\t'.join(g.name for g in self.groups)
                            + '\n')
                    self._wrote_header = True
                f.write(str(timestep) + '\t'
                        + '\t'.join(f"{v:.9g}" for v in row) + '\n')
        self.last = row
