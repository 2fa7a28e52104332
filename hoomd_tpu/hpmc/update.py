"""HPMC updaters (reference hpmc/UpdaterBoxMC.{h,cc}, UpdaterMuVT.h,
UpdaterClusters.h, hpmc/update.py)."""

from __future__ import annotations

import numpy as np

from .. import context, variant
from ..operation import Updater


def _overlap_exists(system, mc, positions=None):
    """Jitted full-system hard-sphere overlap check (blocked pairwise)."""
    import jax
    import jax.numpy as jnp
    st = system.state
    pos = st.pos if positions is None else positions
    types = system.particle_types
    diam = np.array([float(mc.shape_param[t].get('diameter', 1.0))
                     for t in types])
    d_t = jnp.asarray(diam, pos.dtype)[st.typeid]
    N = st.N
    B = 512
    nb = -(-N // B)
    pad = nb * B - N
    pos_p = jnp.concatenate([pos, jnp.full((pad, 3), 1e8, pos.dtype)])
    d_p = jnp.concatenate([d_t, jnp.zeros((pad,), pos.dtype)])
    idx = jnp.arange(nb * B).reshape(nb, B)

    def block(rows):
        dr = st.box.min_image(pos_p[rows][:, None, :] - pos[None, :, :])
        r2 = jnp.sum(dr * dr, axis=-1)
        rsum = 0.5 * (d_p[rows][:, None] + d_t[None, :])
        hit = (r2 < rsum * rsum) & (rows[:, None] != jnp.arange(N)[None])
        return jnp.any(hit)
    return bool(jnp.any(jax.lax.map(block, idx)))


class boxmc(Updater):
    """Monte Carlo box moves: NPT for hard particles
    (reference hpmc.update.boxmc, UpdaterBoxMC.cc).  Supported move
    classes: volume(delta) and ln_volume(delta); aspect/shear arrive with
    triclinic HPMC."""

    def __init__(self, mc, betaP, seed):
        Updater.__init__(self, 1, 0)
        self.mc = mc
        self.betaP = variant.as_variant(betaP)
        self.seed = int(seed)
        self._rng = np.random.RandomState(seed)
        self._vol = {'mode': None, 'delta': 0.0, 'weight': 0}
        self.accepted = 0
        self.rejected = 0
        context.current.system.register_updater(self)

    def volume(self, delta=None, weight=None):
        if delta is not None:
            self._vol = {'mode': 'V', 'delta': float(delta),
                         'weight': weight or 1}
        return self._vol

    def ln_volume(self, delta=None, weight=None):
        if delta is not None:
            self._vol = {'mode': 'lnV', 'delta': float(delta),
                         'weight': weight or 1}
        return self._vol

    def aspect(self, *a, **k):
        raise NotImplementedError("boxmc.aspect: not yet implemented")

    shear = aspect
    length = aspect

    def get_volume_acceptance(self):
        t = self.accepted + self.rejected
        return self.accepted / t if t else 0.0

    def update(self, system, timestep):
        import jax.numpy as jnp
        if self._vol['mode'] is None:
            return
        st = system.state
        V = float(st.box.volume())
        N = st.N
        if self._vol['mode'] == 'lnV':
            lnv_new = np.log(V) + self._rng.uniform(
                -self._vol['delta'], self._vol['delta'])
            V_new = float(np.exp(lnv_new))
            n_exp = N + 1
        else:
            V_new = V + self._rng.uniform(-self._vol['delta'],
                                          self._vol['delta'])
            n_exp = N
        if V_new <= 0:
            self.rejected += 1
            return
        s = (V_new / V) ** (1.0 / 3.0)
        betaP = self.betaP.value(timestep)
        arg = -betaP * (V_new - V) + n_exp * np.log(V_new / V)
        if np.log(self._rng.rand() + 1e-300) > arg:
            self.rejected += 1
            return
        dt = st.pos.dtype
        new_box = st.box.replace(L=st.box.L * jnp.asarray(s, dt))
        new_pos = st.pos * s
        trial = st.replace(pos=new_pos, box=new_box)
        system.state = trial
        if _overlap_exists(system, self.mc):
            system.state = st      # reject: restore
            self.rejected += 1
        else:
            self.accepted += 1
            system._dirty()        # box changed: re-grid MC cells


class muvt(Updater):
    """Grand-canonical insertions/deletions (reference UpdaterMuVT.h).
    Requires dynamic particle number — arrives with the capacity-slot
    mechanism in a later round."""

    def __init__(self, mc, seed, period=1, transfer_types=None, ngibbs=1):
        raise NotImplementedError(
            "hpmc.update.muvt: grand-canonical moves not yet implemented")


class clusters(Updater):
    """Geometric cluster moves (reference UpdaterClusters.h)."""

    def __init__(self, mc, seed, period=1):
        raise NotImplementedError(
            "hpmc.update.clusters: cluster moves not yet implemented")


class remove_drift(Updater):
    """Remove net lattice drift relative to reference positions
    (reference hpmc.update.remove_drift)."""

    def __init__(self, mc, external_lattice, period=1):
        Updater.__init__(self, period, 0)
        self.lattice = external_lattice
        context.current.system.register_updater(self)

    def update(self, system, timestep):
        import jax.numpy as jnp
        st = system.state
        ref = jnp.asarray(self.lattice.reference_positions,
                          st.pos.dtype)[st.tag]
        drift = jnp.mean(st.box.min_image(st.pos - ref), axis=0)
        pos, image = st.box.wrap(st.pos - drift[None, :], st.image)
        system.state = st.replace(pos=pos, image=image)


class wall(Updater):
    def __init__(self, mc, walls, py_updater, move_ratio, seed, period=1):
        raise NotImplementedError(
            "hpmc.update.wall: not yet implemented")
