"""Shared machinery for fixed-topology (bonded) force APIs.

The reference stores bonds/angles/dihedrals/impropers in BondedGroupData
tables addressed by tag (hoomd/BondedGroupData.h); forces are computed by
per-kind ForceComputes.  Here topology is a static (M, arity) tag table baked
into the compiled step; tags are mapped to current particle slots through
state.rtag at trace time, so spatial re-sorting needs no topology updates.
"""

from __future__ import annotations

import numpy as np

from .. import context
from ..operation import Force
from ..ops.bonded import bonded_force


class type_coeff:
    """Per-bonded-type coefficients (reference md/bond.py coeff class)."""

    def __init__(self):
        self.values = {}

    def set(self, type_name, **coeffs):
        names = (type_name if isinstance(type_name, (list, tuple))
                 else [type_name])
        for t in names:
            self.values.setdefault(t, {}).update(coeffs)

    def get(self, type_name, name, default=None):
        v = self.values.get(type_name, {})
        return v.get(name, default)

    def verify(self, types, names, defaults):
        missing = [(t, n) for t in types for n in names
                   if n not in defaults and self.get(t, n) is None]
        if missing:
            raise RuntimeError(
                "bonded coefficients missing: "
                + ", ".join(f"{t}:{n}" for t, n in missing))


class BondedForce(Force):
    """Base for bond/angle/dihedral/improper/special-pair forces.

    Subclass attributes:
      _topology: snapshot attribute name ('bonds', 'angles', ...)
      _energy_fn: ops.bonded energy function
      _coeff_names / _defaults: per-type parameters
      _log_prefix: logger prefix ('bond_harmonic', ...)
    """

    _topology = 'bonds'
    _energy_fn = None
    _coeff_names = ()
    _defaults = {}
    _needs_charge = False

    def __init__(self, name=None):
        Force.__init__(self, name)
        self._log_base = f"{self._log_prefix}_energy"
        self.coeff = type_coeff()
        context.current.system.add_force(self)

    @property
    def _log_prefix(self):
        return type(self).__name__

    def _rcut_matrix(self, types):  # bonded forces don't use the nlist
        return np.zeros((len(types), len(types)))

    def _topology_data(self, system):
        data = getattr(system.snapshot_template, self._topology)
        if data.N == 0:
            raise RuntimeError(
                f"{type(self).__name__}: the system has no "
                f"{self._topology} defined")
        return data

    def _pack_params(self, system):
        import jax.numpy as jnp
        data = self._topology_data(system)
        types = data.types
        self.coeff.verify(types, self._coeff_names, self._defaults)
        dt = system.real_dtype
        params = {}
        for n in self._coeff_names:
            per_type = np.array(
                [float(self.coeff.get(t, n, self._defaults.get(n)))
                 for t in types])
            params[n] = jnp.asarray(per_type[data.typeid], dtype=dt)
        return params

    def _make_compute(self, system):
        import jax.numpy as jnp
        data = self._topology_data(system)
        group_tags = jnp.asarray(data.group)        # (M, arity) tags
        energy_fn = type(self)._energy_fn
        needs_charge = self._needs_charge

        def compute(state, nl, params):
            groups = state.rtag[group_tags]         # tags -> slots
            if needs_charge:
                q = state.charge[groups]
                params = dict(params, qiqj=q[:, 0] * q[:, 1])
            return bonded_force(state.pos, state.box, groups, params,
                                energy_fn)
        return compute
