"""Integration modes and two-step methods (reference md/integrate.py:163-1521,
md/IntegratorTwoStep.cc, md/TwoStep*.cc).

Velocity-Verlet split exactly as the reference (md/IntegratorTwoStep.cc:96):
step1 (drift) -> neighbor/force update -> step2 (kick).  Each method operates
on a particle group; group membership is a per-tag mask so it survives
re-sorting.  Stochastic methods reproduce the reference's counter-based
seeding discipline — independent stream per (seed, timestep, particle tag)
(Saru.h:51-58; TwoStepLangevin.cc:40-43) — using threefry instead of Saru.

Thermostat internal state (Nose-Hoover xi/eta — the reference's
IntegratorVariables, hoomd/IntegratorData.h:30-84) lives in a per-method aux
pytree carried through the step loop and checkpointed with frames.
"""

from __future__ import annotations

import numpy as np

from .. import context, rng, variant
from ..operation import IntegrationMethod


class mode_standard:
    """Enables several integration methods with a shared dt
    (reference md/integrate.py mode_standard)."""

    def __init__(self, dt, aniso=None):
        self.dt = float(dt)
        self.aniso = aniso
        context.current.system.set_integrator_mode(self)

    def set_params(self, dt=None, aniso=None):
        if dt is not None:
            self.dt = float(dt)
        if aniso is not None:
            self.aniso = aniso
        # dt is passed as a traced argument: no recompilation needed


class _method(IntegrationMethod):
    """Common packing: group mask + kT variant tables."""

    def __init__(self, group):
        IntegrationMethod.__init__(self, group)
        context.current.system.add_integration_method(self)

    def _base_params(self, system):
        import jax.numpy as jnp
        member = np.zeros(system.state.N, dtype=bool)
        member[self.group.member_tags] = True
        return {'member': jnp.asarray(member)}

    @staticmethod
    def _mask(state, params):
        return params['member'][state.tag]

    def _ndof(self, system):
        """Translational degrees of freedom granted to this group
        (reference Integrator::getNDOF)."""
        dim = system.state.box.dimensions
        return dim * len(self.group.member_tags)

    # pure helpers -----------------------------------------------------------
    @staticmethod
    def _vv_drift(state, params, dt):
        """v += a dt/2 ; x += v dt ; wrap  (TwoStepNVE.cc:89-118)."""
        import jax.numpy as jnp
        mask = _method._mask(state, params)[:, None]
        a = state.net_force / state.mass[:, None]
        v = jnp.where(mask, state.vel + 0.5 * dt * a, state.vel)
        pos = jnp.where(mask, state.pos + dt * v, state.pos)
        pos, image = state.box.wrap(pos, state.image)
        return state.replace(pos=pos, vel=v, image=image)

    @staticmethod
    def _vv_kick(state, params, dt):
        """v += a dt/2  (TwoStepNVE second half)."""
        import jax.numpy as jnp
        mask = _method._mask(state, params)[:, None]
        a = state.net_force / state.mass[:, None]
        v = jnp.where(mask, state.vel + 0.5 * dt * a, state.vel)
        return state.replace(vel=v)

    @staticmethod
    def _group_temperature(state, params, ndof):
        import jax.numpy as jnp
        mask = _method._mask(state, params)
        ke2 = jnp.sum(jnp.where(mask, state.mass
                                * jnp.sum(state.vel ** 2, axis=-1), 0.0))
        return ke2 / ndof

    # interface ---------------------------------------------------------------
    def _pack_params(self, system):
        return self._base_params(system)

    def _step1(self, state, aux, params, dt, key):
        return self._vv_drift(state, params, dt), aux

    def _step2(self, state, aux, params, dt, key):
        return self._vv_kick(state, params, dt), aux


class nve(_method):
    """Constant-energy velocity Verlet (md/TwoStepNVE.cc:76).
    ``limit`` caps per-step displacement; ``zero_force`` integrates with
    forces ignored."""

    def __init__(self, group, limit=None, zero_force=False):
        _method.__init__(self, group)
        self.limit = limit
        self.zero_force = bool(zero_force)

    def set_params(self, limit=None, zero_force=None):
        if limit is not None:
            self.limit = limit
        if zero_force is not None:
            self.zero_force = bool(zero_force)
        context.current.system._dirty()

    def _step1(self, state, aux, params, dt, key):
        import jax.numpy as jnp
        mask = self._mask(state, params)[:, None]
        a = 0.0 if self.zero_force else \
            state.net_force / state.mass[:, None]
        v = jnp.where(mask, state.vel + 0.5 * dt * a, state.vel)
        dx = dt * v
        if self.limit is not None:
            lim = jnp.asarray(self.limit, dtype=state.pos.dtype)
            n = jnp.sqrt(jnp.sum(dx * dx, axis=-1, keepdims=True))
            dx = jnp.where(n > lim, dx * (lim / n), dx)
        pos = jnp.where(mask, state.pos + dx, state.pos)
        pos, image = state.box.wrap(pos, state.image)
        return state.replace(pos=pos, vel=v, image=image), aux

    def _step2(self, state, aux, params, dt, key):
        if self.zero_force:
            return state, aux
        return self._vv_kick(state, params, dt), aux


class langevin(_method):
    """Langevin dynamics (md/TwoStepLangevin.cc): velocity-Verlet with
    drag -gamma*v and random kicks of variance 2 gamma kT / dt, applied in
    the second half-step exactly like the reference.  The reference draws
    uniform(-1,1)*sqrt(6 gamma kT/dt) (same variance); we do the same so
    tallied quantities match."""

    def __init__(self, group, kT, seed, dscale=False, tally=False,
                 noiseless_t=False, noiseless_r=False):
        _method.__init__(self, group)
        self.kT = variant.as_variant(kT)
        self.seed = int(seed)
        self.dscale = dscale
        self.noiseless_t = bool(noiseless_t)
        self.gamma = {}

    def set_gamma(self, type_name, gamma):
        """Per-type friction coefficient (reference set_gamma)."""
        self.gamma[type_name] = float(gamma)
        context.current.system._dirty()

    def set_params(self, kT=None):
        if kT is not None:
            self.kT = variant.as_variant(kT)
            context.current.system._refresh_params()

    def _pack_params(self, system):
        import jax.numpy as jnp
        p = self._base_params(system)
        dt = system.real_dtype
        gam = np.array([self.gamma.get(t, 1.0)
                        for t in system.particle_types])
        p['gamma'] = jnp.asarray(gam, dtype=dt)
        p['kT'] = self.kT.pack(dt)
        return p

    def _step2(self, state, aux, params, dt, key):
        import jax.numpy as jnp
        mask = self._mask(state, params)[:, None]
        kT = variant.eval_packed(params['kT'], state.timestep)
        if self.dscale:
            gamma = (jnp.asarray(float(self.dscale), state.pos.dtype)
                     * state.diameter)[:, None]
        else:
            gamma = params['gamma'][state.typeid][:, None]
        if self.noiseless_t:
            f_rand = 0.0
        else:
            coeff = jnp.sqrt(6.0 * gamma * kT / dt)
            u = rng.uniform_by_tag(key, state.tag, (3,), state.pos.dtype)
            f_rand = coeff * u
        # the BD force joins the stored acceleration so it also drives the
        # next step's first half-kick — exactly the reference's bookkeeping
        # (TwoStepLangevin.cc:299-315 modifies h_accel with the bd forces)
        f_tot = state.net_force + f_rand - gamma * state.vel
        v = jnp.where(mask,
                      state.vel + 0.5 * dt * f_tot / state.mass[:, None],
                      state.vel)
        f_keep = jnp.where(mask, f_tot, state.net_force)
        return state.replace(vel=v, net_force=f_keep), aux


class nvt(_method):
    """Nose-Hoover (MTK) thermostat (md/TwoStepNVTMTK.cc:108): canonical
    sampling with thermostat variables xi (momentum) and eta (position) kept
    in aux and persisted across runs/checkpoints like the reference's
    IntegratorVariables."""

    def __init__(self, group, kT, tau):
        _method.__init__(self, group)
        self.kT = variant.as_variant(kT)
        self.tau = float(tau)

    def set_params(self, kT=None, tau=None):
        if kT is not None:
            self.kT = variant.as_variant(kT)
        if tau is not None:
            self.tau = float(tau)
        context.current.system._refresh_params()

    def _pack_params(self, system):
        import jax.numpy as jnp
        p = self._base_params(system)
        rdt = system.real_dtype
        p['kT'] = self.kT.pack(rdt)
        p['tau'] = jnp.asarray(self.tau, dtype=rdt)
        p['ndof'] = jnp.asarray(self._ndof(system), dtype=rdt)
        return p

    def _init_aux(self, state):
        import jax.numpy as jnp
        z = jnp.zeros((), dtype=state.pos.dtype)
        return {'xi': z, 'eta': z}

    def _step1(self, state, aux, params, dt, key):
        import jax.numpy as jnp
        kT0 = variant.eval_packed(params['kT'], state.timestep)
        T = self._group_temperature(state, params, params['ndof'])
        xi = aux['xi'] + 0.5 * dt * (T / kT0 - 1.0) / params['tau'] ** 2
        s = jnp.exp(-0.5 * dt * xi)
        mask = self._mask(state, params)[:, None]
        v = jnp.where(mask, state.vel * s, state.vel)
        state = state.replace(vel=v)
        state = self._vv_drift(state, params, dt)
        eta = aux['eta'] + dt * xi
        return state, {'xi': xi, 'eta': eta}

    def _step2(self, state, aux, params, dt, key):
        import jax.numpy as jnp
        state = self._vv_kick(state, params, dt)
        kT0 = variant.eval_packed(params['kT'], state.timestep)
        xi = aux['xi']
        s = jnp.exp(-0.5 * dt * xi)
        mask = self._mask(state, params)[:, None]
        v = jnp.where(mask, state.vel * s, state.vel)
        state = state.replace(vel=v)
        T = self._group_temperature(state, params, params['ndof'])
        xi = xi + 0.5 * dt * (T / kT0 - 1.0) / params['tau'] ** 2
        return state, dict(aux, xi=xi)


class brownian(_method):
    """Overdamped Brownian dynamics (md/TwoStepBD.cc): x advances by
    mobility*force plus diffusive noise; velocities are resampled from the
    Maxwell-Boltzmann distribution each step (as the reference does, so
    thermo reports kT)."""

    def __init__(self, group, kT, seed, dscale=False, noiseless_t=False,
                 noiseless_r=False):
        _method.__init__(self, group)
        self.kT = variant.as_variant(kT)
        self.seed = int(seed)
        self.dscale = dscale
        self.noiseless_t = bool(noiseless_t)
        self.gamma = {}

    def set_gamma(self, type_name, gamma):
        self.gamma[type_name] = float(gamma)
        context.current.system._dirty()

    def _pack_params(self, system):
        import jax.numpy as jnp
        p = self._base_params(system)
        dt = system.real_dtype
        gam = np.array([self.gamma.get(t, 1.0)
                        for t in system.particle_types])
        p['gamma'] = jnp.asarray(gam, dtype=dt)
        p['kT'] = self.kT.pack(dt)
        return p

    def _step1(self, state, aux, params, dt, key):
        import jax.numpy as jnp
        mask = self._mask(state, params)[:, None]
        kT = variant.eval_packed(params['kT'], state.timestep)
        if self.dscale:
            gamma = (jnp.asarray(float(self.dscale), state.pos.dtype)
                     * state.diameter)[:, None]
        else:
            gamma = params['gamma'][state.typeid][:, None]
        import jax
        k1, k2 = jax.random.split(key)
        if self.noiseless_t:
            noise = 0.0
        else:
            u = rng.uniform_by_tag(k1, state.tag, (3,), state.pos.dtype)
            noise = jnp.sqrt(6.0 * kT / (gamma * dt)) * u
        dx = dt * (state.net_force / gamma + noise)
        pos = jnp.where(mask, state.pos + dx, state.pos)
        pos, image = state.box.wrap(pos, state.image)
        # resample velocities at kT for thermo reporting
        g = rng.normal_by_tag(k2, state.tag, (3,), state.pos.dtype)
        v_th = jnp.sqrt(kT / state.mass)[:, None] * g
        v = jnp.where(mask, v_th, state.vel)
        if state.box.dimensions == 2:
            v = v.at[:, 2].set(jnp.where(mask[:, 0], 0.0, v[:, 2]))
        return state.replace(pos=pos, image=image, vel=v), aux

    def _step2(self, state, aux, params, dt, key):
        return state, aux


class berendsen(_method):
    """Berendsen weak-coupling thermostat (md/TwoStepBerendsen.cc):
    velocity rescale toward kT with time constant tau, then velocity
    Verlet."""

    def __init__(self, group, kT, tau):
        _method.__init__(self, group)
        self.kT = variant.as_variant(kT)
        self.tau = float(tau)

    def _pack_params(self, system):
        import jax.numpy as jnp
        p = self._base_params(system)
        rdt = system.real_dtype
        p['kT'] = self.kT.pack(rdt)
        p['tau'] = jnp.asarray(self.tau, dtype=rdt)
        p['ndof'] = jnp.asarray(self._ndof(system), dtype=rdt)
        return p

    def _step1(self, state, aux, params, dt, key):
        import jax.numpy as jnp
        kT0 = variant.eval_packed(params['kT'], state.timestep)
        T = self._group_temperature(state, params, params['ndof'])
        lam = jnp.sqrt(jnp.maximum(
            1.0 + dt / params['tau'] * (kT0 / jnp.maximum(T, 1e-12) - 1.0),
            0.0))
        mask = self._mask(state, params)[:, None]
        v = jnp.where(mask, state.vel * lam, state.vel)
        state = state.replace(vel=v)
        return self._vv_drift(state, params, dt), aux
