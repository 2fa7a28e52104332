"""MD updaters (reference hoomd/md/update.py:18-211)."""

from __future__ import annotations

import numpy as np

from .. import context, variant
from ..operation import Updater


def _sys():
    return context.current.system


class zero_momentum(Updater):
    """Subtract the center-of-mass momentum
    (reference md/ZeroMomentumUpdater)."""

    def __init__(self, period=1, phase=0):
        Updater.__init__(self, period, phase)
        _sys().register_updater(self)

    def update(self, system, timestep):
        import jax.numpy as jnp
        st = system.state
        p = jnp.sum(st.mass[:, None] * st.vel, axis=0)
        M = jnp.sum(st.mass)
        system.state = st.replace(vel=st.vel - (p / M)[None, :])


class rescale_temp(Updater):
    """Velocity rescale to a target kT
    (reference md/TempRescaleUpdater)."""

    def __init__(self, kT, period=1, phase=0):
        Updater.__init__(self, period, phase)
        self.kT = variant.as_variant(kT)
        _sys().register_updater(self)

    def set_params(self, kT):
        self.kT = variant.as_variant(kT)

    def update(self, system, timestep):
        import jax.numpy as jnp
        st = system.state
        q = system.thermo_quantities()
        T = q['temperature']
        if T <= 0:
            return
        lam = float(np.sqrt(self.kT.value(timestep) / T))
        system.state = st.replace(vel=st.vel * lam)


class enforce2d(Updater):
    """Zero z components each period (reference md/Enforce2DUpdater)."""

    def __init__(self, period=1, phase=0):
        Updater.__init__(self, period, phase)
        _sys().register_updater(self)

    def update(self, system, timestep):
        st = system.state
        system.state = st.replace(
            vel=st.vel.at[:, 2].set(0.0),
            net_force=st.net_force.at[:, 2].set(0.0))


class constraint_ellipsoid(Updater):
    """Project a group onto an ellipsoid surface every step (reference
    md/update.py:142 constraint_ellipsoid, md/ConstraintEllipsoidUpdater):
    positions are re-projected each period (normalized-direction
    projection, the same geometry as md.constrain.ellipsoid)."""

    def __init__(self, group, r=None, rx=None, ry=None, rz=None,
                 P=(0, 0, 0), period=1, phase=0):
        Updater.__init__(self, period, phase)
        if r is not None:
            rx = ry = rz = r
        if rx is None or ry is None or rz is None:
            raise RuntimeError(
                "update.constraint_ellipsoid: specify r or all of "
                "rx, ry, rz")
        self.group = group
        self.P = tuple(float(x) for x in P)
        self.radii = (float(rx), float(ry), float(rz))
        _sys().register_updater(self)

    def update(self, system, timestep):
        import jax.numpy as jnp
        st = system.state
        member = np.zeros(st.N, bool)
        member[np.asarray(self.group.member_tags, dtype=int)] = True
        member = jnp.asarray(member)[st.tag]
        P = jnp.asarray(self.P, st.pos.dtype)
        radii = jnp.asarray(self.radii, st.pos.dtype)
        d = (st.pos - P[None, :]) / radii[None, :]
        n = jnp.linalg.norm(d, axis=-1, keepdims=True)
        d = d / jnp.maximum(n, 1e-12)
        proj = P[None, :] + d * radii[None, :]
        pos = jnp.where(member[:, None], proj, st.pos)
        system.state = st.replace(pos=pos)


class mueller_plathe_flow(Updater):
    """Reverse-NEMD shear flow via momentum swaps
    (reference md/MuellerPlatheFlowUpdater): swaps the fastest/slowest
    particles' momentum components between two slabs each period."""

    X, Y, Z = 0, 1, 2

    def __init__(self, group, flow_target, slab_direction, flow_direction,
                 n_slabs, max_slab=-1, min_slab=-1, period=1, phase=0):
        Updater.__init__(self, period, phase)
        self.group = group
        self.slab_dir = int(slab_direction)
        self.flow_dir = int(flow_direction)
        self.n_slabs = int(n_slabs)
        self.max_slab = max_slab if max_slab >= 0 else n_slabs // 2
        self.min_slab = min_slab if min_slab >= 0 else 0
        self.summed_exchanged_momentum = 0.0
        _sys().register_updater(self)

    def update(self, system, timestep):
        st = system.state
        pos = np.asarray(st.pos)
        vel = np.asarray(st.vel).copy()
        mass = np.asarray(st.mass)
        L = float(np.asarray(st.box.L)[self.slab_dir])
        frac = pos[:, self.slab_dir] / L + 0.5
        slab = np.clip((frac * self.n_slabs).astype(int), 0,
                       self.n_slabs - 1)
        lo = np.nonzero(slab == self.min_slab)[0]
        hi = np.nonzero(slab == self.max_slab)[0]
        if len(lo) == 0 or len(hi) == 0:
            return
        p_lo = mass[lo] * vel[lo, self.flow_dir]
        p_hi = mass[hi] * vel[hi, self.flow_dir]
        i = lo[np.argmax(p_lo)]   # fastest +dir in bottom slab
        j = hi[np.argmin(p_hi)]   # fastest -dir in top slab
        pi, pj = mass[i] * vel[i, self.flow_dir], \
            mass[j] * vel[j, self.flow_dir]
        vel[i, self.flow_dir] = pj / mass[i]
        vel[j, self.flow_dir] = pi / mass[j]
        self.summed_exchanged_momentum += float(pi - pj)
        import jax.numpy as jnp
        system.state = st.replace(vel=jnp.asarray(vel, dtype=st.vel.dtype))

    def get_summed_exchanged_momentum(self):
        return self.summed_exchanged_momentum
