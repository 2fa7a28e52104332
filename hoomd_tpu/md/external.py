"""External (one-body) potentials (reference md/external.py:256-308).

Implemented as pure per-particle energy functions whose forces come from
autodiff — the same scheme as bonded forces.
"""

from __future__ import annotations

import numpy as np

from .. import context
from .._bonded_external import ExternalForce
from ._bonded import type_coeff


class e_field(ExternalForce):
    """Uniform electric field: F = q E
    (reference md/EvaluatorExternalElectricField.h; external.py e_field)."""

    def __init__(self, field, name=None):
        ExternalForce.__init__(self, name)
        self._log_base = 'external_e_field_energy'
        self.field = tuple(float(x) for x in field)
        context.current.system.add_force(self)

    def _pack_params(self, system):
        import jax.numpy as jnp
        return {'E': jnp.asarray(self.field, dtype=system.real_dtype)}

    def _make_compute(self, system):
        import jax.numpy as jnp

        def compute(state, nl, params):
            f = state.charge[:, None] * params['E'][None, :]
            e = -jnp.sum(f * state.pos, axis=-1)
            return (f.astype(state.pos.dtype), e.astype(state.pos.dtype),
                    jnp.zeros((state.N, 6), dtype=state.pos.dtype))
        return compute


class periodic(ExternalForce):
    """Lamellar-ordering periodic potential
    (reference md/EvaluatorExternalPeriodic.h; external.py periodic):
    V_i = A tanh[ 1/(2 pi p w) cos(p 2 pi (r . b_i)/|a_i|) ],
    with per-type A, ordering wavevector index i in {0,1,2}, order p,
    interface width w.  force_coeff.set('A', A=, i=, w=, p=)."""

    def __init__(self, name=None):
        ExternalForce.__init__(self, name)
        self._log_base = 'external_periodic_energy'
        self.force_coeff = type_coeff()
        context.current.system.add_force(self)

    def _pack_params(self, system):
        import jax.numpy as jnp
        types = system.particle_types
        self.force_coeff.verify(types, ('A', 'i', 'w', 'p'), {})
        dt = system.real_dtype
        A = np.array([self.force_coeff.get(t, 'A') for t in types])
        axis = np.array([self.force_coeff.get(t, 'i') for t in types],
                        dtype=np.int32)
        w = np.array([self.force_coeff.get(t, 'w') for t in types])
        p = np.array([self.force_coeff.get(t, 'p') for t in types])
        return {'A': jnp.asarray(A, dtype=dt),
                'axis': jnp.asarray(axis),
                'w': jnp.asarray(w, dtype=dt),
                'p': jnp.asarray(p, dtype=dt)}

    def _make_compute(self, system):
        import jax
        import jax.numpy as jnp

        def energy(pos, state_box_L, state_box_tilt, typeid, params):
            from ..box import Box
            box = Box(L=state_box_L, tilt=state_box_tilt,
                      periodic=jnp.ones(3, dtype=bool))
            f = box.make_fraction(pos)            # (N,3) in [0,1)
            A = params['A'][typeid]
            w = params['w'][typeid]
            p = params['p'][typeid]
            ax = params['axis'][typeid]
            frac = jnp.take_along_axis(f, ax[:, None], axis=1)[:, 0]
            arg = 2.0 * jnp.pi * p * frac
            V = A * jnp.tanh(jnp.cos(arg) / (2.0 * jnp.pi * p * w))
            return jnp.sum(V), V

        def compute(state, nl, params):
            grad_fn = jax.grad(lambda pos: energy(
                pos, state.box.L, state.box.tilt, state.typeid, params)[0])
            _, V = energy(state.pos, state.box.L, state.box.tilt,
                          state.typeid, params)
            f = -grad_fn(state.pos)
            return (f.astype(state.pos.dtype), V.astype(state.pos.dtype),
                    jnp.zeros((state.N, 6), dtype=state.pos.dtype))
        return compute
