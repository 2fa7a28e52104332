"""Constraints: rigid-body composites and distance constraints
(reference md/constrain.py:199-481; ForceComposite.h:13-137,
MolecularForceCompute.h:15-45, ForceDistanceConstraint.h:76-79).

rigid: central particle + constituents defined per central type.  Pipeline:
after the drift half-step, constituent positions/orientations/velocities
are recomputed from their central's rigid motion (ForceComposite::
updateCompositeParticles analog); after force evaluation, constituent
forces are reduced onto the central as force + torque (segment-sum, the
scatter-free TPU formulation).  Integration methods act only on central
particles; constituents carry body = central tag and are excluded from
intra-body pair interactions via the nlist 'body' exclusion.
"""

from __future__ import annotations

import numpy as np

from .. import context


class rigid:
    """Rigid-body composite (reference md.constrain.rigid,
    constrain.py:255)."""

    def __init__(self):
        self._defs = {}
        context.current.system.add_composite(self)

    def set_param(self, type_name, types=None, positions=None,
                  orientations=None, charges=None, diameters=None):
        """Define the constituents of bodies whose central particle has
        type ``type_name`` (reference set_param)."""
        n = len(types)
        self._defs[type_name] = {
            'types': list(types),
            'positions': np.asarray(positions, dtype=float),
            'orientations': (np.tile([1.0, 0, 0, 0], (n, 1))
                             if orientations is None
                             else np.asarray(orientations, dtype=float)),
            'charges': (np.zeros(n) if charges is None
                        else np.asarray(charges, dtype=float)),
            'diameters': (np.ones(n) if diameters is None
                          else np.asarray(diameters, dtype=float)),
        }
        context.current.system._dirty()

    def create_bodies(self, create=True):
        """Append constituent particles to the system for every particle
        whose type has a body definition (reference create_bodies)."""
        system = context.current.system
        snap = system.take_snapshot()
        p = snap.particles
        types = p.types
        centrals = []
        for i in range(p.N):
            tname = types[p.typeid[i]]
            if tname in self._defs:
                centrals.append(i)
        if not centrals:
            raise RuntimeError("rigid.create_bodies: no particles with a "
                               "body definition")
        # make sure all constituent types exist
        for d in self._defs.values():
            for t in d['types']:
                if t not in p.types:
                    p.types.append(t)
        n_new = sum(len(self._defs[types[p.typeid[i]]]['types'])
                    for i in centrals)
        old_N = p.N
        p.resize(old_N + n_new)
        w = old_N
        import numpy as np
        for i in centrals:
            d = self._defs[types[p.typeid[i]]]
            p.body[i] = i            # central marks its own body
            q = p.orientation[i]
            for k, t in enumerate(d['types']):
                off = _quat_rotate_np(q, d['positions'][k])
                p.position[w] = p.position[i] + off
                p.typeid[w] = p.types.index(t)
                p.body[w] = i
                p.charge[w] = d['charges'][k]
                p.diameter[w] = d['diameters'][k]
                p.mass[w] = 1.0
                p.orientation[w] = _quat_mul_np(q, d['orientations'][k])
                w += 1
        system.restore_snapshot(snap)
        system._dirty()

    def validate_bodies(self):
        self._pack_tables(context.current.system)

    # -- internal -----------------------------------------------------------
    def _pack_tables(self, system):
        """(M,) constituent tables: tag of constituent, tag of central,
        body-frame offset and orientation."""
        snap = system.snapshot_template
        p = snap.particles
        types = p.types
        const_tags, cent_tags, offs, locq = [], [], [], []
        # reconstruct constituent order per central from the definitions
        by_central = {}
        for i in range(p.N):
            if p.body[i] >= 0 and p.body[i] != i:
                by_central.setdefault(int(p.body[i]), []).append(i)
        for c, members in by_central.items():
            tname = types[p.typeid[c]]
            if tname not in self._defs:
                raise RuntimeError(
                    f"rigid: central particle {c} (type {tname}) has no "
                    f"body definition")
            d = self._defs[tname]
            if len(members) != len(d['types']):
                raise RuntimeError(
                    f"rigid: body {c} has {len(members)} constituents, "
                    f"definition says {len(d['types'])}")
            for k, m in enumerate(sorted(members)):
                const_tags.append(m)
                cent_tags.append(c)
                offs.append(d['positions'][k])
                locq.append(d['orientations'][k])
        return (np.asarray(const_tags, np.int32),
                np.asarray(cent_tags, np.int32),
                np.asarray(offs, float), np.asarray(locq, float))

    def _pack_params(self, system):
        import jax.numpy as jnp
        ct, cc, off, lq = self._pack_tables(system)
        dt = system.real_dtype
        return {'const_tags': jnp.asarray(ct),
                'cent_tags': jnp.asarray(cc),
                'offsets': jnp.asarray(off, dtype=dt),
                'local_q': jnp.asarray(lq, dtype=dt)}

    # pure pipeline stages ---------------------------------------------------
    @staticmethod
    def update_constituents(state, params):
        """Set constituent pos/orientation/velocity from central rigid
        motion (ForceComposite::updateCompositeParticles)."""
        import jax.numpy as jnp
        from ..ops import quat as Q
        ci = state.rtag[params['const_tags']]     # constituent slots
        cc = state.rtag[params['cent_tags']]      # central slots
        qc = state.orientation[cc]
        off_space = Q.rotate(qc, params['offsets'])
        new_pos = state.pos[cc] + off_space
        img = state.image[ci]
        new_pos, img = state.box.wrap(new_pos, img)
        new_q = Q.multiply(qc, params['local_q'])
        # velocity = v_central + omega x r
        w_body = Q.angular_velocity_body(qc, state.angmom[cc],
                                         state.moment_inertia[cc])
        w_space = Q.rotate(qc, w_body)
        new_v = state.vel[cc] + jnp.cross(w_space, off_space)
        pos = state.pos.at[ci].set(new_pos)
        image = state.image.at[ci].set(img)
        q = state.orientation.at[ci].set(new_q)
        vel = state.vel.at[ci].set(new_v)
        return state.replace(pos=pos, image=image, orientation=q, vel=vel)

    @staticmethod
    def reduce_forces(state, params):
        """Accumulate constituent forces onto centrals as force + torque
        (ForceComposite force/torque reduction)."""
        import jax.numpy as jnp
        from ..ops import quat as Q
        ci = state.rtag[params['const_tags']]
        cc = state.rtag[params['cent_tags']]
        f_c = state.net_force[ci]
        qc = state.orientation[cc]
        arm = Q.rotate(qc, params['offsets'])
        tq_c = jnp.cross(arm, f_c) + state.net_torque[ci]
        force = state.net_force.at[cc].add(f_c)
        torque = state.net_torque.at[cc].add(tq_c)
        # constituents carry no independent dynamics
        force = force.at[ci].set(0.0)
        torque = torque.at[ci].set(0.0)
        return state.replace(net_force=force, net_torque=torque)


class distance:
    """Pairwise distance constraints (reference md.constrain.distance,
    ForceDistanceConstraint.h).  The reference solves the constraint-force
    linear system with Eigen SparseLU each step; the TPU-native equivalent
    is iterative SHAKE position projection + RATTLE-style velocity and
    force projections expressed as fixed-count lax.fori_loop sweeps with
    scatter-add updates (Jacobi style with under-relaxation, so shared
    atoms converge).  Constraints are read from the snapshot's
    ``constraints`` group data (tags + target distance).  Pair exclusions
    are not added automatically; exclude constrained pairs on the
    neighbor list if the pair potential should not act across them."""

    n_iter = 40
    omega = 0.7

    def __init__(self, exclude_from_nlist=True):
        context.current.system.add_composite(self)

    def _pack_params(self, system):
        import jax.numpy as jnp
        snap = system.snapshot_template
        g = np.asarray(snap.constraints.group,
                       dtype=np.int64).reshape(-1, 2)
        d0 = np.asarray(snap.constraints.value, dtype=float).reshape(-1)
        dt = system.real_dtype
        return {'a': jnp.asarray(g[:, 0], jnp.int32),
                'b': jnp.asarray(g[:, 1], jnp.int32),
                'd0': jnp.asarray(d0, dt)}

    @classmethod
    def update_constituents(cls, state, params):
        import jax
        import jax.numpy as jnp
        a = state.rtag[params['a']]
        b = state.rtag[params['b']]
        d0sq = params['d0'] ** 2
        inv_ma = 1.0 / state.mass[a]
        inv_mb = 1.0 / state.mass[b]
        im = inv_ma + inv_mb

        def shake(_, pos):
            d = state.box.min_image(pos[a] - pos[b])
            dd = jnp.sum(d * d, axis=-1)
            g = cls.omega * (dd - d0sq) / (2.0 * jnp.maximum(dd, 1e-12)
                                           * im)
            corr = g[:, None] * d
            pos = pos.at[a].add(-corr * inv_ma[:, None])
            pos = pos.at[b].add(corr * inv_mb[:, None])
            return pos
        pos = jax.lax.fori_loop(0, cls.n_iter, shake, state.pos)

        def rattle(_, vel):
            d = state.box.min_image(pos[a] - pos[b])
            dd = jnp.maximum(jnp.sum(d * d, axis=-1), 1e-12)
            lam = cls.omega * jnp.sum((vel[a] - vel[b]) * d, -1) \
                / (dd * im)
            corr = lam[:, None] * d
            vel = vel.at[a].add(-corr * inv_ma[:, None])
            vel = vel.at[b].add(corr * inv_mb[:, None])
            return vel
        vel = jax.lax.fori_loop(0, 12, rattle, state.vel)
        return state.replace(pos=pos, vel=vel)

    @classmethod
    def reduce_forces(cls, state, params):
        import jax
        import jax.numpy as jnp
        a = state.rtag[params['a']]
        b = state.rtag[params['b']]
        inv_ma = 1.0 / state.mass[a]
        inv_mb = 1.0 / state.mass[b]
        im = inv_ma + inv_mb
        d = state.box.min_image(state.pos[a] - state.pos[b])
        dd = jnp.maximum(jnp.sum(d * d, axis=-1), 1e-12)

        def proj(_, frc):
            lam = cls.omega * jnp.sum(
                (frc[a] * inv_ma[:, None] - frc[b] * inv_mb[:, None])
                * d, -1) / (dd * im)
            corr = lam[:, None] * d
            frc = frc.at[a].add(-corr)
            frc = frc.at[b].add(corr)
            return frc
        frc = jax.lax.fori_loop(0, 12, proj, state.net_force)
        return state.replace(net_force=frc)


class _manifold:
    """Algebraic manifold constraints (reference ConstraintSphere.h,
    ConstraintEllipsoid.h, OneDConstraint.h): after the drift half-step,
    positions are projected back onto the manifold and the normal velocity
    component is removed — the discrete constraint-force formulation of the
    reference expressed as a projection (equivalent for VV to O(dt^2))."""

    def __init__(self, group):
        self.group = group
        context.current.system.add_composite(self)

    def _pack_params(self, system):
        import jax.numpy as jnp
        member = np.zeros(system.state.N, dtype=bool)
        member[self.group.member_tags] = True
        p = {'member': jnp.asarray(member)}
        p.update(self._geom_params(system))
        return p

    # pipeline hooks (same interface as constrain.rigid)
    @classmethod
    def update_constituents(cls, state, params):
        import jax.numpy as jnp
        mask = params['member'][state.tag]
        pos_p, nrm = cls._project(state.pos, params)
        pos = jnp.where(mask[:, None], pos_p, state.pos)
        # remove the normal velocity component
        vn = jnp.sum(state.vel * nrm, axis=-1, keepdims=True)
        vel = jnp.where(mask[:, None], state.vel - vn * nrm, state.vel)
        return state.replace(pos=pos, vel=vel)

    @classmethod
    def reduce_forces(cls, state, params):
        import jax.numpy as jnp
        mask = params['member'][state.tag]
        _, nrm = cls._project(state.pos, params)
        fn = jnp.sum(state.net_force * nrm, axis=-1, keepdims=True)
        force = jnp.where(mask[:, None], state.net_force - fn * nrm,
                          state.net_force)
        return state.replace(net_force=force)


class sphere(_manifold):
    """Constrain a group to a spherical surface
    (reference md.constrain.sphere, ConstraintSphere.h)."""

    def __init__(self, group, P, r):
        self.P = tuple(float(x) for x in P)
        self.r = float(r)
        _manifold.__init__(self, group)

    def _geom_params(self, system):
        import jax.numpy as jnp
        dt = system.real_dtype
        return {'P': jnp.asarray(self.P, dt),
                'r': jnp.asarray(self.r, dt)}

    @staticmethod
    def _project(pos, params):
        import jax.numpy as jnp
        d = pos - params['P'][None, :]
        n = jnp.linalg.norm(d, axis=-1, keepdims=True)
        nrm = d / jnp.maximum(n, 1e-12)
        return params['P'][None, :] + params['r'] * nrm, nrm


class ellipsoid(_manifold):
    """Constrain a group to an ellipsoid surface
    (reference ConstraintEllipsoid.h): iterative normalized projection."""

    def __init__(self, group, P, rx, ry, rz):
        self.P = tuple(float(x) for x in P)
        self.radii = (float(rx), float(ry), float(rz))
        _manifold.__init__(self, group)

    def _geom_params(self, system):
        import jax.numpy as jnp
        dt = system.real_dtype
        return {'P': jnp.asarray(self.P, dt),
                'radii': jnp.asarray(self.radii, dt)}

    @staticmethod
    def _project(pos, params):
        import jax.numpy as jnp
        d = (pos - params['P'][None, :]) / params['radii'][None, :]
        n = jnp.linalg.norm(d, axis=-1, keepdims=True)
        d = d / jnp.maximum(n, 1e-12)
        proj = params['P'][None, :] + d * params['radii'][None, :]
        nrm = d / params['radii'][None, :]
        nrm = nrm / jnp.maximum(
            jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
        return proj, nrm


class oneD(_manifold):
    """Constrain motion to a line direction
    (reference md.constrain.oneD, OneDConstraint.h)."""

    def __init__(self, group, constraint_vector):
        v = np.asarray(constraint_vector, dtype=float)
        self.vec = tuple(v / np.linalg.norm(v))
        _manifold.__init__(self, group)
        sys_ = context.current.system
        snap = sys_.take_snapshot()
        self._ref = snap.particles.position.copy()

    def _geom_params(self, system):
        import jax.numpy as jnp
        dt = system.real_dtype
        return {'vec': jnp.asarray(self.vec, dt),
                'ref': jnp.asarray(self._ref, dt)}

    @classmethod
    def update_constituents(cls, state, params):
        import jax.numpy as jnp
        mask = params['member'][state.tag]
        v = params['vec'][None, :]
        ref = params['ref'][state.tag]
        # project displacement from the reference onto the line
        d = state.pos - ref
        along = jnp.sum(d * v, axis=-1, keepdims=True)
        pos = jnp.where(mask[:, None], ref + along * v, state.pos)
        vel_along = jnp.sum(state.vel * v, axis=-1, keepdims=True)
        vel = jnp.where(mask[:, None], vel_along * v, state.vel)
        return state.replace(pos=pos, vel=vel)

    @classmethod
    def reduce_forces(cls, state, params):
        import jax.numpy as jnp
        mask = params['member'][state.tag]
        v = params['vec'][None, :]
        f_along = jnp.sum(state.net_force * v, axis=-1, keepdims=True)
        force = jnp.where(mask[:, None], f_along * v, state.net_force)
        return state.replace(net_force=force)


def _quat_rotate_np(q, v):
    w, x, y, z = q
    qv = np.array([x, y, z])
    t = 2.0 * np.cross(qv, v)
    return v + w * t + np.cross(qv, t)


def _quat_mul_np(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw])
