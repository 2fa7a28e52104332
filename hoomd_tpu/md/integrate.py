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
        # dt is a traced argument: repack only, no recompilation
        if context.current and context.current.system:
            context.current.system._refresh_params()


class _method(IntegrationMethod):
    """Common packing: group mask + kT variant tables."""

    _aniso = False   # set by System when aniso forces are active

    def __init__(self, group):
        IntegrationMethod.__init__(self, group)
        context.current.system.add_integration_method(self)

    # rotational velocity-Verlet halves (reference TwoStepNVE.cc aniso
    # blocks; NO_SQUISH free rotor in ops/quat.py)
    def _rot_step1(self, state, params, dt):
        import jax.numpy as jnp
        from ..ops import quat as Q
        mask = self._mask(state, params)[:, None]
        p = Q.angmom_kick(state.orientation, state.angmom,
                          state.net_torque, state.moment_inertia, dt)
        q, p = Q.free_rotor(state.orientation, p, state.moment_inertia, dt)
        q = jnp.where(mask, q, state.orientation)
        p = jnp.where(mask, p, state.angmom)
        return state.replace(orientation=q, angmom=p)

    def _rot_step2(self, state, params, dt):
        import jax.numpy as jnp
        from ..ops import quat as Q
        mask = self._mask(state, params)[:, None]
        p = Q.angmom_kick(state.orientation, state.angmom,
                          state.net_torque, state.moment_inertia, dt)
        p = jnp.where(mask, p, state.angmom)
        return state.replace(angmom=p)

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
        state = state.replace(pos=pos, vel=v, image=image)
        if self._aniso:
            state = self._rot_step1(state, params, dt)
        return state, aux

    def _step2(self, state, aux, params, dt, key):
        if self.zero_force:
            return state, aux
        state = self._vv_kick(state, params, dt)
        if self._aniso:
            state = self._rot_step2(state, params, dt)
        return state, aux


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
        self.noiseless_r = bool(noiseless_r)
        self.gamma = {}
        self.gamma_r = {}

    def set_gamma(self, type_name, gamma):
        """Per-type friction coefficient (reference set_gamma)."""
        self.gamma[type_name] = float(gamma)
        context.current.system._dirty()

    def set_gamma_r(self, type_name, gamma_r):
        """Per-type rotational friction (reference set_gamma_r)."""
        self.gamma_r[type_name] = float(gamma_r)
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
        gam_r = np.array([self.gamma_r.get(t, 1.0)
                          for t in system.particle_types])
        p['gamma'] = jnp.asarray(gam, dtype=dt)
        p['gamma_r'] = jnp.asarray(gam_r, dtype=dt)
        p['kT'] = self.kT.pack(dt)
        return p

    def _step1(self, state, aux, params, dt, key):
        state = self._vv_drift(state, params, dt)
        if self._aniso:
            state = self._rot_step1(state, params, dt)
        return state, aux

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
        state = state.replace(vel=v, net_force=f_keep)
        if self._aniso:
            import jax
            from ..ops import quat as Q
            # rotational drag + noise in the body frame
            # (TwoStepLangevin.cc rotational block): gamma_r per type
            gam_r = params['gamma_r'][state.typeid][:, None]
            w = Q.angular_velocity_body(state.orientation, state.angmom,
                                        state.moment_inertia)
            krot = jax.random.fold_in(key, 999)
            if self.noiseless_r:
                noise = 0.0
            else:
                u = rng.uniform_by_tag(krot, state.tag, (3,),
                                       state.pos.dtype)
                noise = jnp.sqrt(6.0 * gam_r * kT / dt) * u
            t_bd_body = -gam_r * w + noise
            t_bd = Q.rotate(state.orientation, t_bd_body)
            tq = jnp.where(mask, state.net_torque + t_bd,
                           state.net_torque)
            state = state.replace(net_torque=tq)
            state = self._rot_step2(state, params, dt)
        return state, aux


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


class npt(_method):
    """MTK constant-pressure integration (md/TwoStepNPTMTK.cc, 987 LoC in
    the reference; integrate.py npt).

    Martyna-Tobias-Klein barostat + Nose-Hoover thermostat with per-axis
    barostat velocities nu; ``couple`` ties axes together ('xyz'
    isotropic default, 'xy'/'xz'/'yz' partial, 'none' fully
    anisotropic); x/y/z flags select which box lengths respond and
    xy/xz/yz enable the tilt (shear) degrees of freedom, which relax the
    off-diagonal stress to zero through the upper-triangular barostat
    matrix (first order in the Trotter expansion, reference
    TwoStepNPTMTK.cc anisotropic couplings).

    Internal state (xi, eta, nu, nu_t) persists in aux like the
    reference's IntegratorVariables.
    """

    def __init__(self, group, kT=None, tau=None, P=None, tauP=None,
                 couple='xyz', x=True, y=True, z=True, xy=False, xz=False,
                 yz=False, all=False, nph=False, rescale_all=False,
                 gamma=0.0):
        _method.__init__(self, group)
        if all:
            x = y = z = xy = xz = yz = True
        if P is None or tauP is None:
            raise ValueError("npt requires P and tauP")
        if not nph and (kT is None or tau is None):
            raise ValueError("npt requires kT and tau (or nph=True)")
        self.kT = variant.as_variant(kT if kT is not None else 1.0)
        self.tau = float(tau) if tau is not None else 1.0
        self.P = variant.as_variant(P)
        self.tauP = float(tauP)
        self.couple = couple if couple != 'all' else 'xyz'
        self.axes = (bool(x), bool(y), bool(z))
        self.tilt_axes = (bool(xy), bool(xz), bool(yz))
        self.nph = bool(nph)
        self.rescale_all = bool(rescale_all)

    def set_params(self, kT=None, tau=None, P=None, tauP=None):
        if kT is not None:
            self.kT = variant.as_variant(kT)
        if tau is not None:
            self.tau = float(tau)
        if P is not None:
            self.P = variant.as_variant(P)
        if tauP is not None:
            self.tauP = float(tauP)
        context.current.system._refresh_params()

    def _pack_params(self, system):
        import jax.numpy as jnp
        p = self._base_params(system)
        rdt = system.real_dtype
        p['kT'] = self.kT.pack(rdt)
        p['P'] = self.P.pack(rdt)
        p['tau'] = jnp.asarray(self.tau, dtype=rdt)
        p['tauP'] = jnp.asarray(self.tauP, dtype=rdt)
        p['ndof'] = jnp.asarray(self._ndof(system), dtype=rdt)
        p['axes'] = jnp.asarray(self.axes)
        p['tilt_axes'] = jnp.asarray(self.tilt_axes)
        return p

    def _init_aux(self, state):
        import jax.numpy as jnp
        z = jnp.zeros((), dtype=state.pos.dtype)
        return {'xi': z, 'eta': z,
                'nu': jnp.zeros((3,), dtype=state.pos.dtype),
                'nu_t': jnp.zeros((3,), dtype=state.pos.dtype)}

    def _couple_nu(self, nu):
        import jax.numpy as jnp
        c = self.couple
        if c == 'xyz':
            m = jnp.mean(nu)
            return jnp.stack([m, m, m])
        if c == 'none':
            return nu
        pairs = {'xy': (0, 1), 'xz': (0, 2), 'yz': (1, 2)}
        if c not in pairs:
            raise ValueError(f"invalid couple mode {c!r}")
        a, b = pairs[c]
        m = 0.5 * (nu[a] + nu[b])
        return nu.at[a].set(m).at[b].set(m)

    def _pressure_axes(self, state, params):
        """Diagonal pressure tensor components over the whole system
        (ComputeThermo pressure tensor)."""
        import jax.numpy as jnp
        V = state.box.volume()
        mvv = jnp.sum(state.mass[:, None] * state.vel ** 2, axis=0)
        vir_diag = jnp.stack([jnp.sum(state.net_virial[:, 0]),
                              jnp.sum(state.net_virial[:, 3]),
                              jnp.sum(state.net_virial[:, 5])])
        return (mvv + vir_diag) / V

    def _update_barostat(self, state, aux, params, dt):
        import jax.numpy as jnp
        kT0 = variant.eval_packed(params['kT'], state.timestep)
        P0 = variant.eval_packed(params['P'], state.timestep)
        g = params['ndof']
        d = 3.0
        W = (g + d) * kT0 * params['tauP'] ** 2
        V = state.box.volume()
        P_axes = self._pressure_axes(state, params)
        mask = self._mask(state, params)
        ke2 = jnp.sum(jnp.where(mask, state.mass
                                * jnp.sum(state.vel ** 2, -1), 0.0))
        nu = aux['nu'] + 0.5 * dt * (V * (P_axes - P0) + ke2 / g) / W
        nu = jnp.where(params['axes'], self._couple_nu(nu), 0.0)
        # tilt DOF: off-diagonal stress (xy, xz, yz) drives nu_t toward
        # zero shear stress (no external off-diagonal target)
        mvv = jnp.stack([
            jnp.sum(state.mass * state.vel[:, 0] * state.vel[:, 1]),
            jnp.sum(state.mass * state.vel[:, 0] * state.vel[:, 2]),
            jnp.sum(state.mass * state.vel[:, 1] * state.vel[:, 2])])
        vir_off = jnp.stack([jnp.sum(state.net_virial[:, 1]),
                             jnp.sum(state.net_virial[:, 2]),
                             jnp.sum(state.net_virial[:, 4])])
        P_off = (mvv + vir_off) / V
        nu_t = aux['nu_t'] + 0.5 * dt * (V * P_off) / W
        nu_t = jnp.where(params['tilt_axes'], nu_t, 0.0)
        return nu, nu_t

    def _thermo_half(self, state, aux, params, dt):
        import jax.numpy as jnp
        if self.nph:
            return aux['xi']
        kT0 = variant.eval_packed(params['kT'], state.timestep)
        T = self._group_temperature(state, params, params['ndof'])
        return aux['xi'] + 0.5 * dt * (T / kT0 - 1.0) / params['tau'] ** 2

    @staticmethod
    def _shear_vel(v, nu_t, dt):
        """First-order off-diagonal barostat coupling on velocities."""
        import jax.numpy as jnp
        dvx = -0.5 * dt * (nu_t[0] * v[:, 1] + nu_t[1] * v[:, 2])
        dvy = -0.5 * dt * (nu_t[2] * v[:, 2])
        return v + jnp.stack([dvx, dvy, jnp.zeros_like(dvx)], axis=-1)

    def _step1(self, state, aux, params, dt, key):
        import jax.numpy as jnp
        g = params['ndof']
        nu, nu_t = self._update_barostat(state, aux, params, dt)
        xi = self._thermo_half(state, aux, params, dt)
        mask = self._mask(state, params)[:, None]
        # velocity scale: thermostat + barostat (MTK correction sum(nu)/g)
        fac = jnp.exp(-0.5 * dt * (xi + nu[None, :]
                                   + jnp.sum(nu) / g))
        v = jnp.where(mask, state.vel * fac, state.vel)
        v = jnp.where(mask, self._shear_vel(v, nu_t, dt), v)
        a = state.net_force / state.mass[:, None]
        v = jnp.where(mask, v + 0.5 * dt * a, v)
        # drift with box flow (diagonal exact, tilt first-order)
        ex = jnp.exp(dt * nu)[None, :]
        ex_half = jnp.exp(0.5 * dt * nu)[None, :]
        shear = jnp.stack([
            dt * (nu_t[0] * state.pos[:, 1] + nu_t[1] * state.pos[:, 2]),
            dt * (nu_t[2] * state.pos[:, 2]),
            jnp.zeros_like(state.pos[:, 0])], axis=-1)
        if self.rescale_all:
            pos = state.pos * ex + shear + dt * v * ex_half
        else:
            pos = jnp.where(mask,
                            state.pos * ex + shear + dt * v * ex_half,
                            state.pos)
        L = state.box.L
        newL = L * jnp.exp(dt * nu)
        # box matrix h: h01 = xy*Ly, h02 = xz*Lz, h12 = yz*Lz; the
        # upper-triangular flow h' = (I + dt nu_full) exp(dt diag) h
        t = state.box.tilt
        exv = jnp.exp(dt * nu)
        h01 = exv[0] * t[0] * L[1] + dt * nu_t[0] * L[1]
        h02 = exv[0] * t[1] * L[2] + dt * (nu_t[0] * t[2] * L[2]
                                           + nu_t[1] * L[2])
        h12 = exv[1] * t[2] * L[2] + dt * nu_t[2] * L[2]
        new_tilt = jnp.stack([h01 / newL[1], h02 / newL[2],
                              h12 / newL[2]])
        box = state.box.replace(L=newL, tilt=new_tilt)
        pos, image = box.wrap(pos, state.image)
        eta = aux['eta'] + dt * xi
        return (state.replace(pos=pos, vel=v, image=image, box=box),
                {'xi': xi, 'eta': eta, 'nu': nu, 'nu_t': nu_t})

    def _step2(self, state, aux, params, dt, key):
        import jax.numpy as jnp
        g = params['ndof']
        mask = self._mask(state, params)[:, None]
        a = state.net_force / state.mass[:, None]
        v = jnp.where(mask, state.vel + 0.5 * dt * a, state.vel)
        nu = aux['nu']
        nu_t = aux['nu_t']
        xi = aux['xi']
        fac = jnp.exp(-0.5 * dt * (xi + nu[None, :] + jnp.sum(nu) / g))
        v = jnp.where(mask, v * fac, v)
        v = jnp.where(mask, self._shear_vel(v, nu_t, dt), v)
        state = state.replace(vel=v)
        xi = self._thermo_half(state, dict(aux, xi=xi), params, dt) \
            if not self.nph else xi
        nu, nu_t = self._update_barostat(
            state, dict(aux, nu=nu, nu_t=nu_t), params, dt)
        return state, dict(aux, xi=xi, nu=nu, nu_t=nu_t)


class nph(npt):
    """Constant pressure, constant enthalpy (md/integrate.py nph):
    the NPT barostat without the thermostat."""

    def __init__(self, group, P, tauP, couple='xyz', x=True, y=True,
                 z=True, gamma=0.0):
        npt.__init__(self, group, P=P, tauP=tauP, couple=couple,
                     x=x, y=y, z=z, nph=True)


class mode_minimize_fire(mode_standard):
    """FIRE energy minimization mode (md/FIREEnergyMinimizer.cc;
    integrate.py:1269).  Add an nve method for the group to relax; query
    ``has_converged`` between runs.

    FIRE per step (after forces): P = F.v; if P>0 mix v toward the force
    direction, and after Nmin consecutive downhill steps grow dt; on P<0
    zero velocities, shrink dt, reset the mixing.
    """

    def __init__(self, dt, Nmin=5, finc=1.1, fdec=0.5, alpha_start=0.1,
                 falpha=0.99, ftol=1e-1, Etol=1e-5, wtol=None,
                 min_steps=10, group=None, aniso=None):
        self.dt_max = float(dt)
        self.Nmin = int(Nmin)
        self.finc = float(finc)
        self.fdec = float(fdec)
        self.alpha_start = float(alpha_start)
        self.falpha = float(falpha)
        self.ftol = float(ftol)
        self.Etol = float(Etol)
        self.min_steps = int(min_steps)
        mode_standard.__init__(self, dt, aniso)

    # -- mode hooks consumed by System -------------------------------------
    def _init_mode_aux(self, state):
        import jax.numpy as jnp
        rdt = state.pos.dtype
        return {'dt': jnp.asarray(0.1 * self.dt_max, rdt),
                'alpha': jnp.asarray(self.alpha_start, rdt),
                'n_pos': jnp.zeros((), jnp.int32),
                'nsteps': jnp.zeros((), jnp.int32),
                'e_prev': jnp.asarray(jnp.inf, rdt),
                'converged': jnp.zeros((), bool)}

    def _resolve_dt(self, dyn, mode_aux):
        return mode_aux['dt']

    def _post_force(self, state, mode_aux):
        """FIRE velocity mixing + dt adaptation, applied between the force
        evaluation and step2 (the reference applies it at the same point
        in the Verlet cycle)."""
        import jax.numpy as jnp
        F = state.net_force
        v = state.vel
        P = jnp.sum(F * v)
        fnorm = jnp.sqrt(jnp.sum(F * F))
        vnorm = jnp.sqrt(jnp.sum(v * v))
        alpha = mode_aux['alpha']
        v_mix = ((1.0 - alpha) * v
                 + alpha * vnorm * F / jnp.maximum(fnorm, 1e-12))
        uphill = P <= 0.0
        v_new = jnp.where(uphill, jnp.zeros_like(v), v_mix)
        n_pos = jnp.where(uphill, 0, mode_aux['n_pos'] + 1)
        grow = (~uphill) & (n_pos > self.Nmin)
        dt_new = jnp.where(
            grow, jnp.minimum(mode_aux['dt'] * self.finc, self.dt_max),
            jnp.where(uphill, mode_aux['dt'] * self.fdec, mode_aux['dt']))
        alpha_new = jnp.where(grow, alpha * self.falpha,
                              jnp.where(uphill,
                                        jnp.asarray(self.alpha_start,
                                                    alpha.dtype), alpha))
        e = jnp.sum(state.net_pe)
        N = state.N
        converged = (mode_aux['nsteps'] > self.min_steps) & (
            (fnorm / jnp.sqrt(jnp.asarray(3.0 * N, fnorm.dtype))
             < self.ftol)
            | (jnp.abs(e - mode_aux['e_prev']) < self.Etol))
        new_aux = {'dt': dt_new, 'alpha': alpha_new, 'n_pos': n_pos,
                   'nsteps': mode_aux['nsteps'] + 1, 'e_prev': e,
                   'converged': mode_aux['converged'] | converged}
        return state.replace(vel=v_new), new_aux

    def has_converged(self):
        sys_ = context.current.system
        aux = sys_._mode_aux
        return bool(aux['converged']) if aux else False

    def reset(self):
        sys_ = context.current.system
        if sys_._mode_aux is not None:
            sys_._mode_aux = self._init_mode_aux(sys_.state)


class mode_minimize_rigid_fire(mode_minimize_fire):
    """Alias of FIRE accepting the rigid-specific arguments
    (reference integrate.py mode_minimize_rigid_fire)."""
