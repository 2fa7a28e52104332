"""MPCD integrator: interleaves MD integration with solvent streaming and
cell collisions (reference mpcd/__init__.py:107 mpcd.integrator;
mpcd/Integrator.h).

Implemented as a mode_standard subclass plus an internal integration-method
object whose aux pytree carries the solvent state, so the solvent rides the
same jitted step loop as the MD particles.
"""

from __future__ import annotations

import numpy as np

from .. import context
from ..md.integrate import mode_standard
from ..operation import IntegrationMethod


class _mpcd_method(IntegrationMethod):
    """Internal: streams the solvent each step and collides at the
    collision period; updates embedded MD particle velocities."""

    def __init__(self, mode):
        self._mode = mode
        self.enabled = True
        self.group = None
        context.current.system.add_integration_method(self)
        context.current.system._mpcd_method = self

    def _pack_params(self, system):
        import jax.numpy as jnp
        return {'dummy': jnp.zeros(())}

    def _init_aux(self, state):
        import jax.numpy as jnp
        sys_ = context.current.system
        snap = sys_.mpcd.snapshot
        dt = state.pos.dtype
        return {'pos': jnp.asarray(snap.position, dtype=dt),
                'vel': jnp.asarray(snap.velocity, dtype=dt)}

    def _step1(self, state, aux, params, dt, key):
        return state, aux

    def _step2(self, state, aux, params, dt, key):
        import jax
        import jax.numpy as jnp
        mode = self._mode
        coll = mode._collide
        stream_period = mode._stream_period
        box = state.box

        # -- stream: ballistic drift of the solvent each stream period
        def do_stream(aux):
            pos = aux['pos'] + dt * stream_period * aux['vel']
            pos, _ = box.wrap(pos, jnp.zeros(pos.shape, jnp.int32))
            return dict(aux, pos=pos)
        stream_due = (state.timestep % stream_period) == 0
        aux = jax.lax.cond(stream_due, do_stream, lambda a: a, aux)

        if coll is None:
            return state, aux

        # -- collide at the collision period
        def do_collide(args):
            state, aux = args
            return coll._apply(state, aux, key, self._mode)
        due = (state.timestep % coll.period) == 0
        state, aux = jax.lax.cond(due, do_collide,
                                  lambda a: a, (state, aux))
        return state, aux


class integrator(mode_standard):
    """mpcd.integrator(dt): MD + MPCD coupling
    (reference mpcd.integrator)."""

    def __init__(self, dt, aniso=None):
        self._collide = None
        self._stream_period = 1
        mode_standard.__init__(self, dt, aniso)
        sys_ = context.current.system
        if getattr(sys_, 'mpcd', None) is None:
            raise RuntimeError("create the solvent first: "
                               "mpcd.init.make_random(...)")
        self._method = _mpcd_method(self)
