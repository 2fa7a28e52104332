"""Angle potentials (reference md/angle.py:191-374)."""

from __future__ import annotations

from ..ops import bonded as _ops
from ._bonded import BondedForce


class harmonic(BondedForce):
    """V = k/2 (theta - t0)^2 (md/HarmonicAngleForceCompute.cc).
    angle_coeff.set('type', k=..., t0=...)."""
    _topology = 'angles'
    _energy_fn = _ops.angle_harmonic_energy
    _coeff_names = ('k', 't0')
    _log_prefix = 'angle_harmonic'

    def __init__(self, name=None):
        BondedForce.__init__(self, name)
        self.angle_coeff = self.coeff


class cosinesq(BondedForce):
    """V = k/2 (cos theta - cos t0)^2 (md/CosineSqAngleForceCompute.cc)."""
    _topology = 'angles'
    _energy_fn = _ops.angle_cosinesq_energy
    _coeff_names = ('k', 't0')
    _log_prefix = 'angle_cosinesq'

    def __init__(self, name=None):
        BondedForce.__init__(self, name)
        self.angle_coeff = self.coeff
