"""CG-CMM pair potentials (reference cgcmm/CGCMMForceCompute.h,
cgcmm/pair.py): LJ-like with per-pair exponent selection among 12-4, 9-6
and 12-6 forms."""

from __future__ import annotations

import jax.numpy as jnp

from ..md.pair import pair as _pair_base


class _cgcmm_evaluator:
    """V = (prefactor) eps [ (sig/r)^n - (sig/r)^m ] with (n,m) chosen per
    pair: 12-4 (3*sqrt(3)/2 prefactor), 9-6 (27/4), 12-6 (4)."""
    coeff_names = ('epsilon', 'sigma', 'exponents')
    defaults = {'exponents': 0.0}   # 0 -> 12-6
    needs_charge = False
    needs_diameter = False

    @staticmethod
    def derive(p):
        # exponents encoding: 0 -> (12,6), 1 -> (12,4), 2 -> (9,6)
        sel = p['exponents']
        n = jnp.where(sel == 2.0, 9.0, 12.0)
        m = jnp.where(sel == 1.0, 4.0, 6.0)
        pref = jnp.where(sel == 1.0, 3.0 * jnp.sqrt(3.0) / 2.0,
                         jnp.where(sel == 2.0, 27.0 / 4.0, 4.0))
        return {'c_n': pref * p['epsilon'] * p['sigma'] ** n,
                'c_m': pref * p['epsilon'] * p['sigma'] ** m,
                'n': n, 'm': m}

    @staticmethod
    def energy_force(r2, p):
        r = jnp.sqrt(r2)
        rn = r ** (-p['n'])
        rm = r ** (-p['m'])
        e = p['c_n'] * rn - p['c_m'] * rm
        fdivr = (p['n'] * p['c_n'] * rn - p['m'] * p['c_m'] * rm) / r2
        return fdivr, e


_EXP_CODE = {'lj12_6': 0.0, 'LJ12-6': 0.0, 'lj12_4': 1.0, 'LJ12-4': 1.0,
             'lj9_6': 2.0, 'LJ9-6': 2.0}


class cgcmm(_pair_base):
    """CG-CMM pair (reference cgcmm.pair.cgcmm):
    pair_coeff.set('A','A', epsilon=, sigma=, exponents='lj9_6')."""
    _evaluator = _cgcmm_evaluator

    def _coeff_tables(self, types):
        # translate the string exponent selector to the numeric code
        for key, vals in self.pair_coeff.values.items():
            ex = vals.get('exponents')
            if isinstance(ex, str):
                if ex not in _EXP_CODE:
                    raise ValueError(f"unknown CGCMM exponents {ex!r}")
                vals['exponents'] = _EXP_CODE[ex]
            alpha = vals.pop('alpha', None)  # accepted, unused
        return _pair_base._coeff_tables(self, types)
