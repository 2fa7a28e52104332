"""CG-CMM angle (reference cgcmm/CGCMMAngleForceCompute.h,
cgcmm/angle.py): harmonic angle plus a repulsive 1-3 term between the
outer particles."""

from __future__ import annotations

import jax.numpy as jnp

from ..md._bonded import BondedForce
from ..ops.bonded import _safe_norm, _cos_angle


def _cgcmm_angle_energy(disps, p):
    d1, d2 = disps
    c = _cos_angle(-d1, d2)
    theta = jnp.arccos(c)
    e = 0.5 * p['k'] * (theta - p['t0']) ** 2
    # 1-3 repulsion between the end particles (LJ-style, cut at sigma*2^(1/6)
    # scaled per the selected exponent family; 12-6 form here)
    d13 = d1 + d2
    r2 = jnp.maximum(jnp.sum(d13 * d13), 1e-12)
    s2 = p['sigma'] ** 2 / r2
    s6 = s2 * s2 * s2
    rep = jnp.where(s2 > 2.0 ** (-1.0 / 3.0),
                    4.0 * p['epsilon'] * (s6 * s6 - s6) + p['epsilon'],
                    0.0)
    return e + jnp.where(p['epsilon'] > 0, rep, 0.0)


class cgcmm(BondedForce):
    """angle_coeff.set('type', k=, t0=, exponents='lj12_6'(unused here),
    epsilon=, sigma=) — the 1-3 WCA repulsion is enabled when epsilon>0."""
    _topology = 'angles'
    _energy_fn = staticmethod(_cgcmm_angle_energy)
    _coeff_names = ('k', 't0', 'epsilon', 'sigma')
    _defaults = {'epsilon': 0.0, 'sigma': 1.0}
    _log_prefix = 'angle_cgcmm'

    def __init__(self, name=None):
        BondedForce.__init__(self, name)
        self.angle_coeff = self.coeff

    def _pack_params(self, system):
        for t, v in self.coeff.values.items():
            v.pop('exponents', None)
        return BondedForce._pack_params(self, system)
