"""Standalone forces (reference md/force.py)."""

from __future__ import annotations

import numpy as np

from .. import context
from ..operation import Force


class constant(Force):
    """Constant force on a group (reference md/ConstForceCompute.cc,
    force.py:186)."""

    def __init__(self, fvec=(0.0, 0.0, 0.0), group=None, name=None,
                 fx=None, fy=None, fz=None):
        Force.__init__(self, name)
        self._log_base = 'force_constant_energy'
        if fx is not None:
            fvec = (fx, fy or 0.0, fz or 0.0)
        self.fvec = tuple(float(x) for x in fvec)
        self.group = group
        self.per_tag = None        # (N, 3) per-tag overrides (imd)
        context.current.system.add_force(self)

    def set_force(self, fvec=None, group=None, fx=None, fy=None, fz=None):
        if fx is not None:
            fvec = (fx, fy or 0.0, fz or 0.0)
        if fvec is not None:
            self.fvec = tuple(float(x) for x in fvec)
        if group is not None:
            self.group = group
        context.current.system._refresh_params()

    def set_forces(self, indices, forces):
        """Per-particle force overrides by tag (used by analyze.imd
        steering; reference IMDInterface force feedback).  ``forces``
        replaces the override table rows at ``indices``; rows not listed
        keep their previous override (zero initially)."""
        N = context.current.system.state.N
        if self.per_tag is None:
            self.per_tag = np.zeros((N, 3))
        idx = np.asarray(indices, dtype=int)
        self.per_tag[idx] = np.asarray(forces, dtype=float)
        context.current.system._refresh_params()

    def _rcut_matrix(self, types):
        return np.zeros((len(types), len(types)))

    def _pack_params(self, system):
        import jax.numpy as jnp
        dt = system.real_dtype
        member = np.zeros(system.state.N, dtype=bool)
        if self.group is None:
            member[:] = True
        else:
            member[self.group.member_tags] = True
        pp = (np.zeros((system.state.N, 3)) if self.per_tag is None
              else self.per_tag)
        return {'f': jnp.asarray(self.fvec, dtype=dt),
                'pp': jnp.asarray(pp, dtype=dt),
                'member': jnp.asarray(member)}

    def _make_compute(self, system):
        import jax.numpy as jnp

        def compute(state, nl, params):
            mask = params['member'][state.tag][:, None]
            f = jnp.where(mask, params['f'][None, :], 0.0) \
                + params['pp'][state.tag]
            z = jnp.zeros((state.N,), dtype=state.pos.dtype)
            return f.astype(state.pos.dtype), z, \
                jnp.zeros((state.N, 6), dtype=state.pos.dtype)
        return compute


class active(Force):
    """Self-propulsion force (reference md/ActiveForceCompute.cc,
    force.py:345): constant-magnitude per-particle force.

    NOTE: rotation_diff currently applies a stateless per-step angular
    jitter to the force direction (not a persistent random walk); the
    persistent orientation random walk lands with anisotropic/rotational
    integration."""

    def __init__(self, group, seed, f_lst=None, orientation_link=True,
                 rotation_diff=0.0, constraint=None, name=None):
        Force.__init__(self, name)
        self._log_base = 'force_active_energy'
        self.group = group
        self.seed = int(seed)
        self.f_lst = f_lst
        self.rotation_diff = float(rotation_diff)
        context.current.system.add_force(self)

    def _rcut_matrix(self, types):
        return np.zeros((len(types), len(types)))

    def _pack_params(self, system):
        import jax.numpy as jnp
        dt = system.real_dtype
        N = system.state.N
        member = np.zeros(N, dtype=bool)
        member[self.group.member_tags] = True
        fvec = np.zeros((N, 3))
        if self.f_lst is not None:
            fl = np.asarray(self.f_lst, dtype=float)
            if fl.ndim == 1:
                fvec[self.group.member_tags] = fl
            else:
                fvec[self.group.member_tags] = fl
        return {'member': jnp.asarray(member),
                'f0': jnp.asarray(fvec, dtype=dt)}

    def _make_compute(self, system):
        import jax.numpy as jnp
        from .. import rng
        rot_d = self.rotation_diff
        seed = self.seed
        dt_step = (system.integrator_mode.dt
                   if system.integrator_mode else 0.0)

        def compute(state, nl, params):
            mask = params['member'][state.tag][:, None]
            f0 = params['f0'][state.tag]
            if rot_d > 0.0:
                # random walk of the active direction (per tag, per step)
                key = rng.step_key(seed, state.timestep, salt=77)
                xi = rng.normal_by_tag(key, state.tag, (3,),
                                       state.pos.dtype)
                sigma = jnp.sqrt(jnp.asarray(2.0 * rot_d * dt_step,
                                             state.pos.dtype))
                d = f0 + sigma * jnp.cross(
                    xi, f0 / jnp.maximum(
                        jnp.linalg.norm(f0, axis=-1, keepdims=True), 1e-9))
                norm0 = jnp.linalg.norm(f0, axis=-1, keepdims=True)
                f0 = d / jnp.maximum(
                    jnp.linalg.norm(d, axis=-1, keepdims=True),
                    1e-9) * norm0
            f = jnp.where(mask, f0, 0.0)
            z = jnp.zeros((state.N,), dtype=state.pos.dtype)
            return f.astype(state.pos.dtype), z, \
                jnp.zeros((state.N, 6), dtype=state.pos.dtype)
        return compute


class dipole(Force):
    """Constant external field acting on particle dipoles (reference
    md.force.dipole / ConstExternalFieldDipoleForceCompute.cc:45-95):
    each particle carries a dipole moment of magnitude ``p`` along its
    body z axis; a uniform field exerts zero net force and torque
    tau = p (m_hat x E).  Energy U = -p m_hat . E so rotational work is
    conserved."""
    is_aniso = True

    def __init__(self, field_x, field_y, field_z, p, name=None):
        Force.__init__(self, name)
        self._log_base = 'external_field_dipole_energy'
        self.field = (float(field_x), float(field_y), float(field_z))
        self.p = float(p)
        context.current.system.add_force(self)

    def set_params(self, field_x=None, field_y=None, field_z=None,
                   p=None):
        fx, fy, fz = self.field
        self.field = (float(field_x) if field_x is not None else fx,
                      float(field_y) if field_y is not None else fy,
                      float(field_z) if field_z is not None else fz)
        if p is not None:
            self.p = float(p)
        context.current.system._refresh_params()

    def _rcut_matrix(self, types):
        return np.zeros((len(types), len(types)))

    def _pack_params(self, system):
        import jax.numpy as jnp
        dt = system.real_dtype
        return {'E': jnp.asarray(self.field, dtype=dt),
                'p': jnp.asarray(self.p, dtype=dt)}

    def _make_compute(self, system):
        import jax.numpy as jnp
        from ..ops import quat as Q

        def compute(state, nl, params):
            dt = state.pos.dtype
            zhat = jnp.asarray([0.0, 0.0, 1.0], dt)
            m = params['p'] * Q.rotate(state.orientation, zhat[None, :])
            tq = jnp.cross(m, params['E'][None, :])
            pe = -jnp.sum(m * params['E'][None, :], axis=-1)
            zeros = jnp.zeros((state.N, 3), dt)
            return (zeros, tq.astype(dt), pe.astype(dt),
                    jnp.zeros((state.N, 6), dt))
        return compute


external_field_dipole = dipole
