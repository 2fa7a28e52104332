"""Bond potentials (reference md/bond.py:254-382).

harmonic (EvaluatorBondHarmonic.h), fene (EvaluatorBondFENE.h) and a
tabulated bond.  Forces come from autodiff of the bond energy
(ops/bonded.py) — exact and fused by XLA.
"""

from __future__ import annotations

import numpy as np

from .. import context
from ..ops import bonded as _ops
from ._bonded import BondedForce


class harmonic(BondedForce):
    """V = k/2 (r - r0)^2.  bond_coeff.set('type', k=..., r0=...)."""
    _topology = 'bonds'
    _energy_fn = _ops.bond_harmonic_energy
    _coeff_names = ('k', 'r0')
    _log_prefix = 'bond_harmonic'

    def __init__(self, name=None):
        BondedForce.__init__(self, name)
        self.bond_coeff = self.coeff


class fene(BondedForce):
    """FENE + WCA bond (md/bond.py fene).
    bond_coeff.set('type', k=..., r0=..., sigma=..., epsilon=...)."""
    _topology = 'bonds'
    _energy_fn = _ops.bond_fene_energy
    _coeff_names = ('k', 'r0', 'sigma', 'epsilon')
    _log_prefix = 'bond_fene'

    def __init__(self, name=None):
        BondedForce.__init__(self, name)
        self.bond_coeff = self.coeff


class table(BondedForce):
    """Tabulated bond (md/bond.py table, md/BondTablePotential.h):
    bond_coeff.set('type', func=f, rmin=, rmax=, coeff=dict(...))."""
    _topology = 'bonds'
    _coeff_names = ('func', 'rmin', 'rmax')
    _log_prefix = 'bond_table'

    def __init__(self, width, name=None):
        self.width = int(width)
        BondedForce.__init__(self, name)
        self.bond_coeff = self.coeff

    def _pack_params(self, system):
        import jax.numpy as jnp
        data = self._topology_data(system)
        dt = system.real_dtype
        nt = len(data.types)
        V = np.zeros((nt, self.width))
        F = np.zeros((nt, self.width))
        rmin = np.zeros(nt)
        rmax = np.zeros(nt)
        for i, t in enumerate(data.types):
            func = self.coeff.get(t, 'func')
            r0 = self.coeff.get(t, 'rmin')
            r1 = self.coeff.get(t, 'rmax')
            kw = self.coeff.get(t, 'coeff', {}) or {}
            if func is None:
                raise RuntimeError(f"bond.table coefficients missing "
                                   f"for type {t}")
            r = np.linspace(r0, r1, self.width)
            v, f = func(r, r0, r1, **kw)
            V[i], F[i] = v, f
            rmin[i], rmax[i] = r0, r1
        tid = data.typeid
        return {'V': jnp.asarray(V[tid], dtype=dt),
                'F': jnp.asarray(F[tid], dtype=dt),
                'rmin': jnp.asarray(rmin[tid], dtype=dt),
                'rmax': jnp.asarray(rmax[tid], dtype=dt)}

    def _make_compute(self, system):
        import jax.numpy as jnp
        width = self.width
        data = self._topology_data(system)
        group_tags = jnp.asarray(data.group)

        def energy_fn(disps, p):
            r = jnp.sqrt(jnp.maximum(jnp.sum(disps[0] ** 2), 1e-12))
            x = jnp.clip((r - p['rmin']) / (p['rmax'] - p['rmin'])
                         * (width - 1), 0.0, width - 1.000001)
            i0 = x.astype(jnp.int32)
            frac = x - i0
            # interpolate the energy table; grad gives the force
            return p['V'][i0] * (1 - frac) + p['V'][i0 + 1] * frac

        def compute(state, nl, params):
            groups = state.rtag[group_tags]
            return _ops.bonded_force(state.pos, state.box, groups, params,
                                     energy_fn)
        return compute
