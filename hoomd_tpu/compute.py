"""Thermodynamic computes (reference hoomd/compute.py, ComputeThermo.h).

``thermo(group)`` exposes temperature/pressure/energies of a group; values
are derived from the state's cached per-particle energy/virial (filled by
the fused force pass each step) plus one masked reduction — the reference's
MPI_Allreduce (ComputeThermo.cc:404) becomes a ``psum`` under multi-chip
sharding.
"""

from __future__ import annotations

from . import context


def _sys():
    return context.current.system


class thermo:
    """Group thermodynamics (reference compute.thermo)."""

    def __init__(self, group):
        self.group = group
        _sys()._thermos = getattr(_sys(), '_thermos', [])
        _sys()._thermos.append(self)

    def _q(self):
        return _sys().thermo_quantities(self.group.member_tags)

    @property
    def temperature(self):
        return self._q()['temperature']

    @property
    def pressure(self):
        return self._q()['pressure']

    @property
    def kinetic_energy(self):
        return self._q()['kinetic_energy']

    @property
    def potential_energy(self):
        return self._q()['potential_energy']

    def query(self, name):
        return self._q()[name]

    def disable(self):
        pass

    def enable(self):
        pass


def _get_unique_thermo(group):
    return thermo(group)
