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
    not yet supported.

    ``ngibbs=2`` runs the Gibbs ensemble: a hidden partner box (its own
    in-process simulation, replacing the reference's MPI partitions) is
    stepped alongside the primary, with particle-transfer moves
    (acceptance N_src V_dst / ((N_dst+1) V_src)) and, when
    ``volume_delta`` > 0, total-volume-conserving volume exchanges
    (acceptance (V1'/V1)^N1 (V2'/V2)^N2), both with hard-overlap
    vetoes."""

    def __init__(self, mc, seed, period=1, transfer_types=None,
                 ngibbs=1, n_trial=16, volume_delta=0.0):
        if ngibbs not in (1, 2):
            raise NotImplementedError(
                "hpmc.update.muvt: ngibbs must be 1 (grand canonical) "
                "or 2 (Gibbs ensemble); the reference's >2-partition "
                "chains are not supported")
        from .integrate import sphere as _sphere
        if not isinstance(mc, _sphere):
            raise NotImplementedError(
                "hpmc.update.muvt currently supports sphere shapes")
        Updater.__init__(self, period, 0)
        self.mc = mc
        self.ngibbs = int(ngibbs)
        self.volume_delta = float(volume_delta)
        self._rng = np.random.RandomState(int(seed))
        self.transfer_types = transfer_types
        self.n_trial = int(n_trial)
        self._fugacity = {}
        self.n_inserted = 0
        self.n_removed = 0
        self.n_attempted = 0
        self.n_transferred = 0
        self.n_volume_accepted = 0
        self._partner = None       # (context, system, mc) for ngibbs=2
        context.current.system.register_updater(self)
        if self.ngibbs == 2:
            self._make_partner()

    def set_fugacity(self, type, fugacity):
        self._fugacity[type] = variant.as_variant(fugacity)

    # -- Gibbs ensemble (ngibbs == 2) ---------------------------------------
    #
    # The reference runs each Gibbs box in its own MPI partition and
    # exchanges particles/volume between partition roots (UpdaterMuVT.h
    # Gibbs branches).  Here the partner box is a second in-process
    # simulation (its own SimulationContext + System), initialized from
    # the primary's snapshot; each fire advances the partner by the same
    # number of MC sweeps and then performs the standard Gibbs-NVT
    # exchange moves over host-side snapshots of both boxes.

    def _make_partner(self):
        from .. import init as init_mod
        from .integrate import sphere as _sphere
        snap = context.current.system.take_snapshot()
        with context.SimulationContext() as ctx:
            ctx.options.notice_level = 0
            init_mod.read_snapshot(snap)
            pmc = _sphere(seed=self._rng.randint(2 ** 31),
                          d=self.mc._default_d,
                          nselect=self.mc.nselect)
            pmc.shape_param._params = {
                t: dict(p) for t, p in
                self.mc.shape_param._params.items()}
            pmc.d_by_type = dict(self.mc.d_by_type)
            psys = ctx.system
        self._partner = (ctx, psys, pmc)

    def gibbs_partner_system(self):
        """The hidden partner box's System (ngibbs == 2)."""
        return self._partner[1] if self._partner else None

    def _box_arrays(self, snap):
        L = np.array([snap.box.Lx, snap.box.Ly, snap.box.Lz])
        pos = np.asarray(snap.particles.position).copy()
        tid = np.asarray(snap.particles.typeid).copy()
        return L, pos, tid

    @staticmethod
    def _any_overlap_with(x, ri, pos, tid, radii, L, skip=None):
        if len(pos) == 0:
            return False
        d = x[None, :] - pos
        d -= L * np.round(d / L)
        r2 = np.sum(d * d, axis=-1)
        rs = ri + radii[tid]
        hit = r2 < rs * rs
        if skip is not None:
            hit[skip] = False
        return bool(hit.any())

    @staticmethod
    def _config_overlaps(pos, tid, radii, L):
        N = len(pos)
        if N < 2:
            return False
        B = 512
        for s in range(0, N, B):
            d = pos[s:s + B, None, :] - pos[None, :, :]
            d -= L * np.round(d / L)
            r2 = np.sum(d * d, axis=-1)
            rs = radii[tid[s:s + B]][:, None] + radii[tid][None, :]
            hit = r2 < rs * rs
            idx = np.arange(s, min(s + B, N))
            hit[np.arange(len(idx)), idx] = False
            if hit.any():
                return True
        return False

    def _update_gibbs(self, system, timestep):
        from .. import data as data_mod
        ctx, psys, pmc = self._partner
        # advance the partner box by the same number of sweeps the
        # primary ran since the last fire
        with ctx:
            psys.run(self.period, quiet=True)
        snaps = [system.take_snapshot(), psys.take_snapshot()]
        types = list(snaps[0].particles.types)
        ttypes = self.transfer_types or types
        radii = np.array(
            [0.5 * float(self.mc.shape_param[t].get('diameter', 1.0))
             for t in types])
        boxes = [self._box_arrays(s) for s in snaps]
        Ls = [b[0] for b in boxes]
        poss = [list(b[1]) for b in boxes]
        tids = [list(b[2]) for b in boxes]
        changed = [False, False]
        scaled = [1.0, 1.0]
        for _ in range(self.n_trial):
            self.n_attempted += 1
            do_vol = (self.volume_delta > 0.0
                      and self._rng.rand() < 1.0 / (1 + len(ttypes)))
            if do_vol:
                # volume exchange at fixed total volume: uniform dV,
                # acc = (V1'/V1)^N1 (V2'/V2)^N2, overlap veto after
                # isotropic rescale of both boxes
                V = [float(np.prod(L)) for L in Ls]
                dV = self._rng.uniform(-self.volume_delta,
                                       self.volume_delta)
                Vn = [V[0] + dV, V[1] - dV]
                if Vn[0] <= 0 or Vn[1] <= 0:
                    continue
                n0, n1 = len(poss[0]), len(poss[1])
                arg = (n0 * np.log(Vn[0] / V[0])
                       + n1 * np.log(Vn[1] / V[1]))
                if np.log(self._rng.rand() + 1e-300) > arg:
                    continue
                s0 = (Vn[0] / V[0]) ** (1.0 / 3.0)
                s1 = (Vn[1] / V[1]) ** (1.0 / 3.0)
                p0 = np.asarray(poss[0]) * s0 if poss[0] else \
                    np.zeros((0, 3))
                p1 = np.asarray(poss[1]) * s1 if poss[1] else \
                    np.zeros((0, 3))
                t0 = np.asarray(tids[0], int)
                t1 = np.asarray(tids[1], int)
                if self._config_overlaps(p0, t0, radii, Ls[0] * s0) or \
                        self._config_overlaps(p1, t1, radii, Ls[1] * s1):
                    continue
                Ls[0] = Ls[0] * s0
                Ls[1] = Ls[1] * s1
                poss[0] = list(p0)
                poss[1] = list(p1)
                scaled = [scaled[0] * s0, scaled[1] * s1]
                changed = [True, True]
                self.n_volume_accepted += 1
                continue
            # particle transfer src -> dst: acc = N_src V_dst /
            # ((N_dst + 1) V_src), overlap veto in dst
            src = self._rng.randint(2)
            dst = 1 - src
            t_name = ttypes[self._rng.randint(len(ttypes))]
            t_id = types.index(t_name)
            cand = [i for i, x in enumerate(tids[src]) if x == t_id]
            if not cand:
                continue
            V_src = float(np.prod(Ls[src]))
            V_dst = float(np.prod(Ls[dst]))
            n_src = len(cand)
            n_dst = sum(1 for x in tids[dst] if x == t_id)
            acc = n_src * V_dst / ((n_dst + 1.0) * V_src)
            if self._rng.rand() >= acc:
                continue
            x = (self._rng.rand(3) - 0.5) * Ls[dst]
            if self._any_overlap_with(
                    x, radii[t_id], np.asarray(poss[dst])
                    if poss[dst] else np.zeros((0, 3)),
                    np.asarray(tids[dst], int), radii, Ls[dst]):
                continue
            i = cand[self._rng.randint(len(cand))]
            poss[src].pop(i)
            tids[src].pop(i)
            poss[dst].append(x)
            tids[dst].append(t_id)
            changed = [True, True]
            self.n_transferred += 1
        systems = [system, psys]
        for b in range(2):
            if not changed[b]:
                continue
            n = len(poss[b])
            new = data_mod.make_snapshot(
                n, data_mod.boxdim(Lx=float(Ls[b][0]),
                                   Ly=float(Ls[b][1]),
                                   Lz=float(Ls[b][2])),
                particle_types=types)
            if n:
                new.particles.position[:] = np.asarray(poss[b])
                new.particles.typeid[:] = np.asarray(tids[b], int)
                for i, t in enumerate(tids[b]):
                    new.particles.diameter[i] = 2.0 * radii[int(t)]
            if b == 0:
                system.restore_snapshot(new)
            else:
                with self._partner[0]:
                    psys.restore_snapshot(new)

    def update(self, system, timestep):
        from .. import data as data_mod
        if self.ngibbs == 2:
            return self._update_gibbs(system, timestep)
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
    UpdaterClusters.h, Liu & Luijten PRL 92, 035504): reflect the
    cluster containing a random seed about a random pivot (point
    reflection, or line reflection — a pi rotation about a random axis
    through the pivot — chosen 50/50 as in the reference); the cluster
    is the connected component of the symmetric relation "moved i
    overlaps j or i overlaps moved j", so the move is rejection-free for
    hard particles without external fields.

    ``swap_move_ratio`` mixes in AB type-swap cluster moves between the
    two ``swap_types`` (reference swap moves): each particle of one swap
    type takes the other's shape in place; ``delta_mu`` applies the
    chemical-potential-difference Metropolis factor per swapped
    cluster."""

    def __init__(self, mc, seed, period=1, swap_move_ratio=0.0,
                 swap_types=None, delta_mu=0.0):
        from .integrate import sphere as _sphere
        if not isinstance(mc, _sphere):
            raise NotImplementedError(
                "hpmc.update.clusters currently supports sphere shapes")
        Updater.__init__(self, period, 0)
        self.mc = mc
        self._rng = np.random.RandomState(int(seed))
        self.swap_move_ratio = float(swap_move_ratio)
        self.swap_types = swap_types
        self.delta_mu = float(delta_mu)
        self.n_moves = 0
        self.total_cluster_size = 0
        self.n_swaps = 0
        context.current.system.register_updater(self)

    def get_info(self):
        n = max(self.n_moves, 1)
        return {'moves': self.n_moves,
                'average_cluster_size': self.total_cluster_size / n,
                'swaps': self.n_swaps}

    def _swap_update(self, system, snap, types, pos, tid, L, radii_t):
        from scipy.sparse import coo_matrix
        from scipy.sparse.csgraph import connected_components
        t1, t2 = (types.index(self.swap_types[0]),
                  types.index(self.swap_types[1]))
        N = len(pos)
        swap_tid = tid.copy()
        swap_tid[tid == t1] = t2
        swap_tid[tid == t2] = t1
        r_now = radii_t[tid]
        r_swp = radii_t[swap_tid]
        rows, cols = [], []
        B = 1024
        for s in range(0, N, B):
            d = pos[s:s + B, None, :] - pos[None, :, :]
            d -= L * np.round(d / L)
            r2 = np.sum(d * d, axis=-1)
            # moved i (swapped radius) vs original j
            rs = r_swp[s:s + B, None] + r_now[None, :]
            hit = r2 < rs * rs
            idx = np.arange(s, min(s + B, N))
            hit[np.arange(len(idx)), idx] = False
            r, c = np.nonzero(hit)
            rows.append(r + s)
            cols.append(c)
        rows = np.concatenate(rows) if rows else np.zeros(0, int)
        cols = np.concatenate(cols) if cols else np.zeros(0, int)
        g = coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(N, N))
        ncomp, labels = connected_components(g, directed=False)
        seed_i = self._rng.randint(N)
        member = labels == labels[seed_i]
        dn1 = int(np.sum(member & (swap_tid == t1))
                  - np.sum(member & (tid == t1)))
        if self.delta_mu != 0.0:
            if np.log(self._rng.rand() + 1e-300) > -self.delta_mu * dn1:
                self.n_moves += 1
                return
        new_tid = np.where(member, swap_tid, tid)
        # moved-vs-moved veto: the adjacency (swapped-i vs original-j)
        # guarantees cluster/outside pairs stay valid, but two cluster
        # members that BOTH grow (e.g. B->A at diameter ratio >1) can
        # overlap each other at the post-swap size without sharing an
        # edge (their mutual threshold r_swp+r_swp exceeds the edge
        # threshold r_swp+r_now).  The reference rejects any cluster
        # move whose moved-moved pairs overlap in the new configuration
        # (UpdaterClusters.h m_overlap/reject handling); do the same.
        mi = np.nonzero(member)[0]
        if len(mi) > 1:
            r_new = radii_t[new_tid]
            d = pos[mi][:, None, :] - pos[mi][None, :, :]
            d -= L * np.round(d / L)
            r2 = np.sum(d * d, axis=-1)
            rs = r_new[mi][:, None] + r_new[mi][None, :]
            hit = r2 < rs * rs
            np.fill_diagonal(hit, False)
            if hit.any():
                self.n_moves += 1
                return
        snap.particles.typeid[:] = new_tid
        for i in range(N):
            snap.particles.diameter[i] = 2.0 * radii_t[new_tid[i]]
        system.restore_snapshot(snap)
        self.n_moves += 1
        self.n_swaps += 1
        self.total_cluster_size += int(member.sum())

    def update(self, system, timestep):
        from scipy.sparse import coo_matrix
        from scipy.sparse.csgraph import connected_components
        snap = system.take_snapshot()
        types = list(snap.particles.types)
        pos = np.asarray(snap.particles.position).copy()
        tid = np.asarray(snap.particles.typeid)
        N = len(pos)
        L = np.array([snap.box.Lx, snap.box.Ly, snap.box.Lz])
        radii_t = np.array(
            [0.5 * float(self.mc.shape_param[t].get('diameter', 1.0))
             for t in types])
        if (self.swap_types is not None
                and self._rng.rand() < self.swap_move_ratio):
            return self._swap_update(system, snap, types, pos, tid, L,
                                     radii_t)
        radii = radii_t[tid]
        pivot = (self._rng.rand(3) - 0.5) * L
        point = self._rng.rand() < 0.5
        if point:
            refl = 2.0 * pivot - pos                   # point reflection
        else:
            # line reflection: pi rotation about a random axis n through
            # the pivot: x' = p + 2((x-p).n)n - (x-p)
            n = self._rng.normal(size=3)
            n /= np.linalg.norm(n)
            rel = pos - pivot
            refl = pivot + 2.0 * np.outer(rel @ n, n) - rel
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
        if not point:
            # line reflections are not rejection-free under periodic
            # boundaries (Sinkovits et al. 2012; reference
            # hpmc/update.py:845): the pi rotation is an isometry of
            # R^3 but not of the torus, so both moved-vs-unmoved and
            # moved-vs-moved IMAGE distances can shrink — veto any move
            # whose wrapped result overlaps anywhere
            mi = np.nonzero(member)[0]
            if len(mi):
                d = new_pos[mi][:, None, :] - new_pos[None, :, :]
                d -= L * np.round(d / L)
                r2 = np.sum(d * d, axis=-1)
                rs = radii[mi][:, None] + radii[None, :]
                hit = r2 < rs * rs
                hit[np.arange(len(mi)), mi] = False
                if hit.any():
                    self.n_moves += 1
                    return
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
    """MC updates of hard-wall geometry (reference
    UpdaterExternalFieldWall.h, hpmc/update.py wall): every ``period``
    steps, with probability ``move_ratio``, call the user's
    ``py_updater(timestep)`` (which mutates the wall group in place) and
    accept iff no particle violates the updated walls, else restore the
    previous geometry."""

    def __init__(self, mc, walls, py_updater, move_ratio, seed, period=1):
        import copy
        Updater.__init__(self, period, 0)
        self.mc = mc
        self.walls = walls
        self.py_updater = py_updater
        self.move_ratio = float(move_ratio)
        self._rng = np.random.RandomState(int(seed))
        self._copy = copy.deepcopy
        self.accepted = 0
        self.rejected = 0
        context.current.system.register_updater(self)

    def get_accepted_count(self, mode=0):
        return self.accepted

    def get_total_count(self, mode=0):
        return self.accepted + self.rejected

    def update(self, system, timestep):
        if self._rng.rand() >= self.move_ratio:
            return
        field = self.mc._external
        saved = (self._copy(self.walls.spheres),
                 self._copy(self.walls.cylinders),
                 self._copy(self.walls.planes))
        self.py_updater(timestep)
        system._dirty()          # wall params are baked into the program
        if field is not None and hasattr(field, 'count_overlaps') \
                and field.count_overlaps(system) > 0:
            (self.walls.spheres, self.walls.cylinders,
             self.walls.planes) = saved
            system._dirty()
            self.rejected += 1
        else:
            self.accepted += 1
