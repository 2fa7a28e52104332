"""Dihedral potentials (reference md/dihedral.py:206-483)."""

from __future__ import annotations

import math as _math

from ..ops import bonded as _ops
from ._bonded import BondedForce
from .angle import _vt_table


class harmonic(BondedForce):
    """V = k/2 [1 + d cos(n phi)] (md/HarmonicDihedralForceCompute.cc).
    dihedral_coeff.set('type', k=..., d=..., n=...)."""
    _topology = 'dihedrals'
    _energy_fn = _ops.dihedral_harmonic_energy
    _coeff_names = ('k', 'd', 'n')
    _log_prefix = 'dihedral_harmonic'

    def __init__(self, name=None):
        BondedForce.__init__(self, name)
        self.dihedral_coeff = self.coeff


class opls(BondedForce):
    """OPLS cosine series (md/OPLSDihedralForceCompute.cc).
    dihedral_coeff.set('type', k1=, k2=, k3=, k4=)."""
    _topology = 'dihedrals'
    _energy_fn = _ops.dihedral_opls_energy
    _coeff_names = ('k1', 'k2', 'k3', 'k4')
    _log_prefix = 'dihedral_opls'

    def __init__(self, name=None):
        BondedForce.__init__(self, name)
        self.dihedral_coeff = self.coeff


class table(_vt_table):
    """Tabulated dihedral potential (reference md/dihedral.py:293 table,
    md/TableDihedralForceCompute.cc): V and T on `width` uniform points
    over phi in [-pi, pi]; dihedral_coeff.set('type', func=f,
    coeff=dict(...)) with f(phi, **coeff) -> (V, T)."""
    _topology = 'dihedrals'
    _log_prefix = 'dihedral_table'
    _xrange = (-_math.pi, _math.pi)

    def __init__(self, width, name=None):
        _vt_table.__init__(self, width, name)
        self.dihedral_coeff = self.coeff

    @staticmethod
    def _coordinate(disps):
        return _ops._dihedral_phi(*disps)
