"""MPCD collision rules (reference mpcd/SRDCollisionMethod.h,
mpcd/ATCollisionMethod.h, mpcd/CellThermoCompute.h).

Collision cells are a regular unit grid with a random shift drawn each
collision step (Galilean invariance, reference mpcd/CellList.h grid_shift);
cell center-of-mass velocities come from segment-sums over solvent +
embedded MD particles.
"""

from __future__ import annotations

import numpy as np

from .. import context


def _bin_cells(pos, box, shift, ncell_1d):
    import jax.numpy as jnp
    f = box.make_fraction(pos) + shift[None, :]
    f = f - jnp.floor(f)
    c3 = jnp.clip((f * ncell_1d).astype(jnp.int32), 0, ncell_1d - 1)
    return (c3[:, 0] * ncell_1d + c3[:, 1]) * ncell_1d + c3[:, 2]


class _collision_base:
    def __init__(self, seed, period, kT=None, group=None):
        self.seed = int(seed)
        self.period = int(period)
        self.kT = kT
        self.group = group            # embedded MD particles
        self.embed_all_md = False
        sys_ = context.current.system
        mode = sys_.integrator_mode
        if mode is None or not hasattr(mode, '_collide'):
            raise RuntimeError("create mpcd.integrator before the "
                               "collision method")
        mode._collide = self
        sys_._dirty()

    def embed(self, group):
        """Embed MD particles in the collision step
        (reference collide method embed)."""
        self.group = group
        context.current.system._dirty()

    def _cell_grid(self, system):
        L = np.asarray(system.state.box.L)
        # unit collision cells (reference default cell size a=1)
        return int(max(1, round(L[0] / 1.0)))

    def _embed_mask(self, system):
        import jax.numpy as jnp
        member = np.zeros(system.state.N, dtype=bool)
        if self.group is not None:
            member[self.group.member_tags] = True
        return jnp.asarray(member)


class srd(_collision_base):
    """Stochastic rotation dynamics (reference mpcd.collide.srd):
    rotate velocities relative to the cell COM by ``angle`` about a random
    per-cell axis; optional cell-level thermostat toward kT."""

    def __init__(self, seed, period, angle, kT=None, group=None):
        _collision_base.__init__(self, seed, period, kT, group)
        self.angle = float(angle) * np.pi / 180.0

    def _apply(self, state, aux, key, mode):
        import jax
        import jax.numpy as jnp
        system = context.current.system
        nc1 = self._cell_grid(system)
        ncells = nc1 ** 3
        dtp = state.pos.dtype
        member = self._embed_mask(system)[state.tag]

        k_shift, k_axis, k_th = jax.random.split(key, 3)
        shift = jax.random.uniform(k_shift, (3,), dtype=dtp,
                                   minval=-0.5 / nc1, maxval=0.5 / nc1)
        cid_s = _bin_cells(aux['pos'], state.box, shift, nc1)
        cid_m = _bin_cells(state.pos, state.box, shift, nc1)

        m_md = jnp.where(member, state.mass, 0.0)
        # cell momentum and mass over solvent + embedded MD
        mom = jnp.zeros((ncells, 3), dtp)
        mom = mom.at[cid_s].add(aux['vel'])
        mom = mom.at[cid_m].add(m_md[:, None] * state.vel)
        mass = jnp.zeros((ncells,), dtp)
        mass = mass.at[cid_s].add(1.0)
        mass = mass.at[cid_m].add(m_md)
        vcom = mom / jnp.maximum(mass, 1e-12)[:, None]

        # random unit axis per cell
        g = jax.random.normal(k_axis, (ncells, 3), dtype=dtp)
        axis = g / jnp.maximum(
            jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
        c = jnp.cos(self.angle)
        s = jnp.sin(self.angle)

        def rot(v_rel, cid):
            a = axis[cid]
            return (v_rel * c
                    + jnp.cross(a, v_rel) * s
                    + a * (jnp.sum(a * v_rel, axis=-1,
                                   keepdims=True)) * (1.0 - c))

        v_s = vcom[cid_s] + rot(aux['vel'] - vcom[cid_s], cid_s)
        v_m_new = vcom[cid_m] + rot(state.vel - vcom[cid_m], cid_m)
        v_m = jnp.where(member[:, None], v_m_new, state.vel)

        if self.kT is not None:
            # cell-level velocity rescale thermostat
            # (reference SRDCollisionMethod thermostat)
            ke = jnp.zeros((ncells,), dtp)
            ke = ke.at[cid_s].add(
                0.5 * jnp.sum((v_s - vcom[cid_s]) ** 2, axis=-1))
            ke = ke.at[cid_m].add(jnp.where(
                member, 0.5 * m_md * jnp.sum((v_m - vcom[cid_m]) ** 2,
                                             axis=-1), 0.0))
            cnt = jnp.zeros((ncells,), dtp)
            cnt = cnt.at[cid_s].add(1.0)
            cnt = cnt.at[cid_m].add(jnp.where(member, 1.0, 0.0))
            ndof = jnp.maximum(3.0 * (cnt - 1.0), 1.0)
            kT = jnp.asarray(float(self.kT), dtp)
            lam = jnp.sqrt(jnp.where(ke > 1e-10,
                                     0.5 * ndof * kT / jnp.maximum(
                                         ke, 1e-10), 1.0))
            v_s = vcom[cid_s] + lam[cid_s][:, None] * (v_s - vcom[cid_s])
            v_m2 = vcom[cid_m] + lam[cid_m][:, None] * (v_m - vcom[cid_m])
            v_m = jnp.where(member[:, None], v_m2, v_m)

        return (state.replace(vel=v_m), dict(aux, vel=v_s))


class at(_collision_base):
    """Andersen-thermostat collision (reference mpcd.collide.at): draw
    fresh Gaussian velocities, then restore each cell's COM momentum."""

    def __init__(self, seed, period, kT, group=None):
        _collision_base.__init__(self, seed, period, kT, group)

    def _apply(self, state, aux, key, mode):
        import jax
        import jax.numpy as jnp
        system = context.current.system
        nc1 = self._cell_grid(system)
        ncells = nc1 ** 3
        dtp = state.pos.dtype
        member = self._embed_mask(system)[state.tag]
        kT = jnp.asarray(float(self.kT), dtp)

        k_shift, k_s, k_m = jax.random.split(key, 3)
        shift = jax.random.uniform(k_shift, (3,), dtype=dtp,
                                   minval=-0.5 / nc1, maxval=0.5 / nc1)
        cid_s = _bin_cells(aux['pos'], state.box, shift, nc1)
        cid_m = _bin_cells(state.pos, state.box, shift, nc1)
        m_md = jnp.where(member, state.mass, 0.0)

        def cell_stats(v_s, v_m):
            mom = jnp.zeros((ncells, 3), dtp).at[cid_s].add(v_s)
            mom = mom.at[cid_m].add(m_md[:, None] * v_m)
            mass = jnp.zeros((ncells,), dtp).at[cid_s].add(1.0)
            mass = mass.at[cid_m].add(m_md)
            return mom / jnp.maximum(mass, 1e-12)[:, None]

        vcom_old = cell_stats(aux['vel'], state.vel)
        # fresh Maxwell-Boltzmann draws
        v_s_new = jnp.sqrt(kT) * jax.random.normal(
            k_s, aux['vel'].shape, dtype=dtp)
        v_m_draw = jnp.sqrt(kT / state.mass)[:, None] * jax.random.normal(
            k_m, state.vel.shape, dtype=dtp)
        v_m_new = jnp.where(member[:, None], v_m_draw, state.vel)
        vcom_new = cell_stats(v_s_new, v_m_new)
        # restore COM momentum per cell
        v_s = v_s_new + vcom_old[cid_s] - vcom_new[cid_s]
        v_m = jnp.where(member[:, None],
                        v_m_new + vcom_old[cid_m] - vcom_new[cid_m],
                        state.vel)
        return (state.replace(vel=v_m), dict(aux, vel=v_s))
