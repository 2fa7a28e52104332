"""Improper potentials (reference md/improper.py)."""

from __future__ import annotations

from ..ops import bonded as _ops
from ._bonded import BondedForce


class harmonic(BondedForce):
    """V = k/2 (chi - chi0)^2 (md/HarmonicImproperForceCompute.cc).
    improper_coeff.set('type', k=..., chi=...)."""
    _topology = 'impropers'
    _energy_fn = _ops.improper_harmonic_energy
    _coeff_names = ('k', 'chi0')
    _log_prefix = 'improper_harmonic'

    def __init__(self, name=None):
        BondedForce.__init__(self, name)
        self.improper_coeff = self.coeff

    def _pack_params(self, system):
        # accept the reference's coefficient name 'chi' as an alias
        for t, v in self.coeff.values.items():
            if 'chi' in v and 'chi0' not in v:
                v['chi0'] = v['chi']
        return BondedForce._pack_params(self, system)
