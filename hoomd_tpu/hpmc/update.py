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

    def aspect(self, delta=None, weight=None):
        """Constant-volume aspect-ratio moves (reference
        UpdaterBoxMC::update_aspect): one axis scaled by 1+u*delta, the
        others by the inverse square root."""
        if delta is not None:
            self._aspect = {'delta': float(delta), 'weight': weight or 1}
        return getattr(self, '_aspect', None)

    def shear(self, delta=None, weight=None, reduce=0.0):
        """Box tilt (shear) moves (reference UpdaterBoxMC::update_shear):
        random walk on xy/xz/yz at constant volume.  ``delta`` may be a
        scalar or a 3-tuple per tilt component."""
        if delta is not None:
            d = np.broadcast_to(np.asarray(delta, float), (3,)).copy()
            self._shear = {'delta': d, 'weight': weight or 1}
        return getattr(self, '_shear', None)

    def length(self, delta=None, weight=None):
        """Independent per-axis length moves at varying volume
        (reference UpdaterBoxMC::update_L)."""
        if delta is not None:
            d = np.broadcast_to(np.asarray(delta, float), (3,)).copy()
            self._length = {'delta': d, 'weight': weight or 1}
        return getattr(self, '_length', None)

    def get_volume_acceptance(self):
        t = self.accepted + self.rejected
        return self.accepted / t if t else 0.0

    def _accept_if_valid(self, system, st, trial, d_log_prob):
        """Metropolis on the box move: boltzmann arg + hard-particle
        overlap veto via the integrator's overlap kernel."""
        if np.log(self._rng.rand() + 1e-300) > d_log_prob:
            self.rejected += 1
            return False
        system.state = trial
        try:
            bad = self.mc.count_overlaps(system) > 0
        except NotImplementedError:
            bad = _overlap_exists(system, self.mc)
        if bad:
            system.state = st
            self.rejected += 1
            return False
        self.accepted += 1
        system._dirty()            # box changed: re-grid MC cells
        return True

    def _try_aspect(self, system, timestep):
        import jax.numpy as jnp
        st = system.state
        dlt = self._aspect['delta']
        ax = self._rng.randint(3 if st.box.dimensions == 3 else 2)
        s1 = 1.0 + self._rng.uniform(-dlt, dlt)
        if st.box.dimensions == 3:
            s_others = 1.0 / np.sqrt(s1)
            scale = np.full(3, s_others)
        else:
            scale = np.array([1.0, 1.0, 1.0])
            scale[:2] = 1.0 / s1
            scale[2] = 1.0
        scale[ax] = s1
        dt = st.pos.dtype
        sc = jnp.asarray(scale, dt)
        trial = st.replace(pos=st.pos * sc,
                           box=st.box.replace(L=st.box.L * sc))
        self._accept_if_valid(system, st, trial, 0.0)

    def _try_shear(self, system, timestep):
        import jax.numpy as jnp
        st = system.state
        dlt = self._shear['delta']
        comp = self._rng.randint(3 if st.box.dimensions == 3 else 1)
        dtilt = self._rng.uniform(-dlt[comp], dlt[comp])
        tilt = np.asarray(st.box.tilt).copy()
        tilt[comp] += dtilt
        dt = st.pos.dtype
        frac = st.box.make_fraction(st.pos)
        new_box = st.box.replace(tilt=jnp.asarray(tilt, dt))
        trial = st.replace(pos=new_box.from_fraction(frac), box=new_box)
        self._accept_if_valid(system, st, trial, 0.0)

    def _try_length(self, system, timestep):
        import jax.numpy as jnp
        st = system.state
        dlt = self._length['delta']
        ax = self._rng.randint(3 if st.box.dimensions == 3 else 2)
        L = np.asarray(st.box.L).copy()
        V = float(st.box.volume())
        L_new = L.copy()
        L_new[ax] += self._rng.uniform(-dlt[ax], dlt[ax])
        if L_new[ax] <= 0:
            self.rejected += 1
            return
        V_new = V * L_new[ax] / L[ax]
        betaP = self.betaP.value(timestep)
        arg = -betaP * (V_new - V) + st.N * np.log(V_new / V)
        dt = st.pos.dtype
        sc = jnp.asarray(L_new / L, dt)
        trial = st.replace(pos=st.pos * sc,
                           box=st.box.replace(L=jnp.asarray(L_new, dt)))
        self._accept_if_valid(system, st, trial, arg)

    def update(self, system, timestep):
        import jax.numpy as jnp
        moves = []
        if self._vol['mode'] is not None:
            moves += ['vol'] * self._vol['weight']
        if getattr(self, '_aspect', None):
            moves += ['aspect'] * self._aspect['weight']
        if getattr(self, '_shear', None):
            moves += ['shear'] * self._shear['weight']
        if getattr(self, '_length', None):
            moves += ['length'] * self._length['weight']
        if not moves:
            return
        pick = moves[self._rng.randint(len(moves))]
        if pick == 'aspect':
            return self._try_aspect(system, timestep)
        if pick == 'shear':
            return self._try_shear(system, timestep)
        if pick == 'length':
            return self._try_length(system, timestep)
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
    """Grand-canonical insertions/deletions for hard spheres (reference
    UpdaterMuVT.h, hpmc/update.py muvt).  Each fire attempts ``n_trial``
    insert/delete moves at the fugacities set with ``set_fugacity``;
    particle number changes go through snapshot rebuilds at the host
    boundary (the device program recompiles on N changes, so muvt is a
    periodic updater, not a per-step move — same cadence semantics as the
    reference's MPI-rank-serial implementation).  Anisotropic shapes are
    not yet supported."""

    def __init__(self, mc, seed, period=1, transfer_types=None,
                 ngibbs=1, n_trial=16):
        if ngibbs != 1:
            raise NotImplementedError(
                "hpmc.update.muvt: Gibbs-ensemble partition exchange "
                "(ngibbs > 1) not yet implemented")
        from .integrate import sphere as _sphere
        if not isinstance(mc, _sphere):
            raise NotImplementedError(
                "hpmc.update.muvt currently supports sphere shapes")
        Updater.__init__(self, period, 0)
        self.mc = mc
        self._rng = np.random.RandomState(int(seed))
        self.transfer_types = transfer_types
        self.n_trial = int(n_trial)
        self._fugacity = {}
        self.n_inserted = 0
        self.n_removed = 0
        self.n_attempted = 0
        context.current.system.register_updater(self)

    def set_fugacity(self, type, fugacity):
        self._fugacity[type] = variant.as_variant(fugacity)

    def update(self, system, timestep):
        from .. import data as data_mod
        snap = system.take_snapshot()
        types = list(snap.particles.types)
        ttypes = self.transfer_types or [
            t for t in types if t in self._fugacity]
        if not ttypes:
            return
        box = snap.box
        L = np.array([box.Lx, box.Ly, box.Lz])
        V = float(np.prod(L))
        pos = list(np.asarray(snap.particles.position))
        tid = list(np.asarray(snap.particles.typeid))
        diam = {i: float(self.mc.shape_param[t].get('diameter', 1.0))
                for i, t in enumerate(types)}
        changed = False
        for _ in range(self.n_trial):
            self.n_attempted += 1
            t_name = ttypes[self._rng.randint(len(ttypes))]
            t_id = types.index(t_name)
            z = self._fugacity[t_name].value(timestep)
            n_t = sum(1 for x in tid if x == t_id)
            if self._rng.rand() < 0.5:
                # insertion
                x = (self._rng.rand(3) - 0.5) * L
                ok = True
                ri = 0.5 * diam[t_id]
                for p, tj in zip(pos, tid):
                    d = x - p
                    d -= L * np.round(d / L)
                    if np.dot(d, d) < (ri + 0.5 * diam[tj]) ** 2:
                        ok = False
                        break
                if ok and self._rng.rand() < z * V / (n_t + 1):
                    pos.append(x)
                    tid.append(t_id)
                    self.n_inserted += 1
                    changed = True
            elif n_t > 0:
                # deletion
                cand = [i for i, x in enumerate(tid) if x == t_id]
                i = cand[self._rng.randint(len(cand))]
                if self._rng.rand() < n_t / (z * V):
                    pos.pop(i)
                    tid.pop(i)
                    self.n_removed += 1
                    changed = True
        if not changed:
            return
        new = data_mod.make_snapshot(
            len(pos), data_mod.boxdim(Lx=box.Lx, Ly=box.Ly, Lz=box.Lz),
            particle_types=types)
        new.particles.position[:] = np.asarray(pos)
        new.particles.typeid[:] = np.asarray(tid)
        for i, t in enumerate(np.asarray(tid)):
            new.particles.diameter[i] = diam[int(t)]
        system.restore_snapshot(new)


class clusters(Updater):
    """Geometric cluster moves for hard spheres (reference
    UpdaterClusters.h, Liu & Luijten PRL 92, 035504): point-reflect the
    cluster containing a random seed about a random pivot; the cluster is
    the connected component of the relation "reflected i overlaps j",
    which is symmetric under point reflection, so the move is
    rejection-free for hard particles without external fields."""

    def __init__(self, mc, seed, period=1):
        from .integrate import sphere as _sphere
        if not isinstance(mc, _sphere):
            raise NotImplementedError(
                "hpmc.update.clusters currently supports sphere shapes")
        Updater.__init__(self, period, 0)
        self.mc = mc
        self._rng = np.random.RandomState(int(seed))
        self.n_moves = 0
        self.total_cluster_size = 0
        context.current.system.register_updater(self)

    def get_info(self):
        n = max(self.n_moves, 1)
        return {'moves': self.n_moves,
                'average_cluster_size': self.total_cluster_size / n}

    def update(self, system, timestep):
        from scipy.sparse import coo_matrix
        from scipy.sparse.csgraph import connected_components
        snap = system.take_snapshot()
        types = list(snap.particles.types)
        pos = np.asarray(snap.particles.position).copy()
        tid = np.asarray(snap.particles.typeid)
        N = len(pos)
        L = np.array([snap.box.Lx, snap.box.Ly, snap.box.Lz])
        radii = np.array(
            [0.5 * float(self.mc.shape_param[t].get('diameter', 1.0))
             for t in types])[tid]
        pivot = (self._rng.rand(3) - 0.5) * L
        refl = 2.0 * pivot - pos
        # adjacency: reflected i overlaps original j (blocked O(N^2))
        rows, cols = [], []
        B = 1024
        for s in range(0, N, B):
            d = refl[s:s + B, None, :] - pos[None, :, :]
            d -= L * np.round(d / L)
            r2 = np.sum(d * d, axis=-1)
            rsum = radii[s:s + B, None] + radii[None, :]
            hit = r2 < rsum * rsum
            r, c = np.nonzero(hit)
            rows.append(r + s)
            cols.append(c)
        rows = np.concatenate(rows) if rows else np.zeros(0, int)
        cols = np.concatenate(cols) if cols else np.zeros(0, int)
        g = coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(N, N))
        ncomp, labels = connected_components(g, directed=False)
        seed_i = self._rng.randint(N)
        member = labels == labels[seed_i]
        new_pos = np.where(member[:, None], refl, pos)
        new_pos -= L * np.round(new_pos / L)      # wrap
        snap.particles.position[:] = new_pos
        system.restore_snapshot(snap)
        self.n_moves += 1
        self.total_cluster_size += int(member.sum())


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
