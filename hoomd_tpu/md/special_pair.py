"""Special pair potentials — explicitly listed intramolecular pairs, e.g.
1-4 scaled interactions (reference md/special_pair.py,
EvaluatorSpecialPairLJ.h / EvaluatorSpecialPairCoulomb.h)."""

from __future__ import annotations

from ..ops import bonded as _ops
from ._bonded import BondedForce


class lj(BondedForce):
    """Per-listed-pair LJ: pair_coeff.set('type', epsilon=, sigma=,
    alpha=1.0, r_cut=...)."""
    _topology = 'pairs'
    _energy_fn = _ops.special_lj_energy
    _coeff_names = ('epsilon', 'sigma', 'alpha', 'r_cut')
    _defaults = {'alpha': 1.0}
    _log_prefix = 'special_pair_lj'

    def __init__(self, name=None):
        BondedForce.__init__(self, name)
        self.pair_coeff = self.coeff


class coulomb(BondedForce):
    """Per-listed-pair scaled Coulomb: pair_coeff.set('type', alpha=,
    r_cut=...); energy alpha * q_i q_j / r."""
    _topology = 'pairs'
    _energy_fn = _ops.special_coulomb_energy
    _coeff_names = ('alpha', 'r_cut')
    _needs_charge = True
    _log_prefix = 'special_pair_coul'

    def __init__(self, name=None):
        BondedForce.__init__(self, name)
        self.pair_coeff = self.coeff
