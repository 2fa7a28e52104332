"""Hard-particle Monte Carlo integrators (reference hpmc/integrate.py,
IntegratorHPMCMono.h:491-834).

TPU-native design = the reference's own GPU strategy, fully vectorized:
**checkerboard cell sets** (IntegratorHPMCMonoGPU.cuh:124-160).  Cells are
partitioned into 8 parity classes; all cells of one class are separated by
at least one inactive cell, so one trial per active cell can run in parallel
while preserving detailed balance — the reference GPU path is the proof this
sampling is correct.  Each sub-sweep:

  1. re-bin particles (sort-based cell list, ops/cells.py)
  2. pick one random occupant per active cell (counter-based RNG keyed by
     (seed, sweep, class, cell) — the Saru discipline, Saru.h:51-58)
  3. propose translate (and rotate, for anisotropic shapes)
  4. overlap-test against the 27-cell stencil (vectorized, masked)
  5. accept iff no overlap; scatter accepted positions

The cell width is kept >= max interaction diameter + 2*d so simultaneous
movers in distinct active cells can never overlap each other; the grid is
re-chosen when move sizes change.

A 'sweep' = nselect * 8 sub-sweeps ~ nselect trials per particle on
average, matching the reference's nselect semantics.
"""

from __future__ import annotations

import numpy as np

from .. import context
from ..ops import cells as cells_ops


class _hpmc_counters:
    """Acceptance bookkeeping (reference hpmc/HPMCCounters.h:27)."""

    def __init__(self):
        self.translate_accept = 0
        self.translate_reject = 0
        self.rotate_accept = 0
        self.rotate_reject = 0

    def get_translate_acceptance(self):
        t = self.translate_accept + self.translate_reject
        return self.translate_accept / t if t else 0.0

    def get_rotate_acceptance(self):
        t = self.rotate_accept + self.rotate_reject
        return self.rotate_accept / t if t else 0.0


class shape_param_proxy:
    """Per-type shape parameters (reference hpmc ShapeProxy.h:34-397)."""

    def __init__(self, mc):
        self._mc = mc
        self._params = {}

    def set(self, types, **params):
        if not isinstance(types, (list, tuple)):
            types = [types]
        for t in types:
            self._params.setdefault(t, {}).update(params)
        self._mc._dirty()

    def __getitem__(self, t):
        return dict(self._params.get(t, {}))


class mode_hpmc:
    """Base HPMC integrator (reference IntegratorHPMC)."""

    def __init__(self, seed, d=0.1, a=0.1, move_ratio=0.5, nselect=4):
        self.seed = int(seed)
        self.move_ratio = float(move_ratio)
        self.nselect = int(nselect)
        self._default_d = float(d)
        self._default_a = float(a)
        self.d_by_type = {}
        self.a_by_type = {}
        self.shape_param = shape_param_proxy(self)
        self._patch = None        # jit.patch.user attaches here
        self._external = None     # hpmc.field.* attaches here
        self.counters = _hpmc_counters()
        sys_ = context.current.system
        sys_.set_hpmc_integrator(self)

    def _dirty(self):
        context.current.system._dirty()

    def set_params(self, d=None, a=None, move_ratio=None, nselect=None):
        if d is not None:
            if isinstance(d, dict):
                self.d_by_type.update(d)
            else:
                self._default_d = float(d)
        if a is not None:
            if isinstance(a, dict):
                self.a_by_type.update(a)
            else:
                self._default_a = float(a)
        if move_ratio is not None:
            self.move_ratio = float(move_ratio)
        if nselect is not None:
            self.nselect = int(nselect)
        self._dirty()

    def get_d(self, type_name=None):
        return self.d_by_type.get(type_name, self._default_d)

    def get_a(self, type_name=None):
        return self.a_by_type.get(type_name, self._default_a)

    def get_translate_acceptance(self):
        c = context.current.system._hpmc_counters
        if c is None:
            return 0.0
        acc = int(c['translate_accept'])
        rej = int(c['translate_reject'])
        return acc / (acc + rej) if (acc + rej) else 0.0

    def get_rotate_acceptance(self):
        return self.counters.get_rotate_acceptance()

    def get_counters(self):
        c = context.current.system._hpmc_counters
        return {k: int(v) for k, v in c.items()} if c else {}

    # -- subclass interface -------------------------------------------------
    def _interaction_diameter(self, system):
        """Max center-to-center distance at which two shapes can overlap."""
        raise NotImplementedError

    def _make_overlap_fn(self, system):
        """Returns overlap(dr (M,C,3), ti (M,1), tj (M,C)) -> bool (M,C):
        True where shapes overlap."""
        raise NotImplementedError

    def _has_rotation(self):
        return False

    # -- program construction (called by System) -----------------------------
    def _build_program(self, system):
        import jax
        import jax.numpy as jnp
        from ..rng import step_key

        state = system.state
        N = state.N
        dtype = state.pos.dtype
        types = system.particle_types
        d_arr = np.array([self.get_d(t) for t in types])
        d_max = float(d_arr.max())
        diam = self._interaction_diameter(system)
        patch = self._patch
        if patch is not None:
            diam = max(diam, patch.r_cut)
        w_min = diam + 2.0 * d_max
        L = np.asarray(state.box.L)
        dims3 = state.box.dimensions
        # EVEN cell counts only: with an odd count the first and last cells
        # share parity but are adjacent through the periodic boundary, so
        # two same-class movers could overlap — the checkerboard argument
        # (IntegratorHPMCMonoGPU.cuh cell sets) requires even dimensions.
        cell_dim = list(cells_ops.choose_cell_dim(L, w_min, dims3))
        for ax in range(dims3):
            cell_dim[ax] = max(2, 2 * (cell_dim[ax] // 2))
        cell_dim = tuple(cell_dim)
        for ax in range(dims3):
            if L[ax] / cell_dim[ax] < w_min - 1e-9:
                raise RuntimeError(
                    f"hpmc: box too small for checkerboard cells "
                    f"(need >= 2 cells of width {w_min:.3f} per axis)")
        ncells = int(np.prod(cell_dim))
        cell_adj = jnp.asarray(cells_ops.build_cell_adj(cell_dim))
        cell_cap = max(4, int(np.ceil(N / ncells * 3.0)) + 4,
                       system._grow.get('hpmc_cell_cap', 0))

        # parity classes: host-side (8, max_class_size) table of cell ids
        nx, ny, nz = cell_dim
        ids = np.arange(ncells)
        ix = ids % nx
        iy = (ids // nx) % ny
        iz = ids // (nx * ny)
        classes = []
        for pz in (0, 1):
            for py in (0, 1):
                for px in (0, 1):
                    sel = ids[(ix % 2 == px) & (iy % 2 == py)
                              & (iz % 2 == pz)]
                    classes.append(sel)
        csize = max(len(c) for c in classes)
        class_table = np.full((8, csize), ncells, dtype=np.int32)
        for k, c in enumerate(classes):
            class_table[k, :len(c)] = c
        class_table = jnp.asarray(class_table)
        d_by_type = jnp.asarray(d_arr, dtype=dtype)
        overlap_fn = self._make_overlap_fn(system)
        n_sub = 8 * self.nselect
        seed = self.seed
        dims = state.box.dimensions

        def sub_sweep(state, counters, sweep_idx, class_idx):
            box = state.box
            cid, cell_list, cell_ovf = cells_ops.bin_particles(
                state.pos, box, cell_dim, cell_cap)
            cl_pad = jnp.concatenate(
                [cell_list, jnp.full((1, cell_cap), N, jnp.int32)], axis=0)
            counts = jnp.sum(cell_list < N, axis=1)
            counts_pad = jnp.concatenate(
                [counts, jnp.zeros((1,), counts.dtype)])

            active = class_table[class_idx]            # (csize,) cell ids
            acount = counts_pad[active]                # occupancy
            key = step_key(seed, state.timestep, salt=17)
            key = jax.random.fold_in(key, sweep_idx)
            k_sel, k_move, k_aux = jax.random.split(key, 3)
            u_sel = jax.random.uniform(k_sel, (csize,), dtype=dtype)
            pick = jnp.minimum((u_sel * acount).astype(jnp.int32),
                               jnp.maximum(acount - 1, 0))
            has = acount > 0
            i_sel = jnp.where(has, cl_pad[active, pick], N)  # (csize,)

            pos_pad = jnp.concatenate(
                [state.pos, jnp.zeros((1, 3), dtype)], axis=0)
            t_pad = jnp.concatenate(
                [state.typeid, jnp.zeros((1,), jnp.int32)])
            x_old = pos_pad[i_sel]
            ti = t_pad[i_sel]
            # trial translate: uniform in a ball of radius d(type)
            # (reference Moves.h move_translate)
            g = jax.random.normal(k_move, (csize, 3), dtype=dtype)
            if dims == 2:
                g = g.at[:, 2].set(0.0)
            rad = jax.random.uniform(k_aux, (csize,), dtype=dtype) \
                ** (1.0 / dims)
            g = g / jnp.maximum(
                jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
            delta = g * (rad * d_by_type[ti])[:, None]
            x_new = x_old + delta
            x_new, _ = box.wrap(x_new, jnp.zeros((csize, 3), jnp.int32))

            # overlap candidates: occupants of the 27-cell stencil around
            # the particle's ORIGINAL cell (moves are bounded so the
            # stencil still covers every possible overlap partner)
            adj_pad = jnp.concatenate(
                [cell_adj, jnp.full((1, 27), ncells, jnp.int32)], axis=0)
            my_cell = jnp.where(has, active, ncells)
            cand = cl_pad[adj_pad[my_cell]].reshape(csize, -1)
            dr = box.min_image(x_new[:, None, :] - pos_pad[cand])
            tj = t_pad[cand]
            olap = overlap_fn(dr, ti[:, None], tj, state, i_sel, cand)
            olap &= cand != i_sel[:, None]
            olap &= cand < N
            reject = jnp.any(olap, axis=1) | ~has
            if patch is not None:
                # Metropolis on the user patch energy (reference
                # PatchEnergyJIT plugged into the HPMC acceptance)
                q_pad = jnp.concatenate(
                    [state.orientation,
                     jnp.zeros((1, 4), dtype)], axis=0)
                ch_pad = jnp.concatenate(
                    [state.charge, jnp.zeros((1,), dtype)])
                di_pad = jnp.concatenate(
                    [state.diameter, jnp.ones((1,), dtype)])
                lane_ok = (cand != i_sel[:, None]) & (cand < N)

                def patch_sum(x_c):
                    drp = box.min_image(x_c[:, None, :] - pos_pad[cand])
                    rr = jnp.sum(drp * drp, axis=-1)
                    within = lane_ok & (rr < patch.r_cut ** 2)
                    ev = patch.func(drp, ti[:, None], tj,
                                    q_pad[i_sel][:, None, :], q_pad[cand],
                                    di_pad[i_sel][:, None], di_pad[cand],
                                    ch_pad[i_sel][:, None], ch_pad[cand])
                    return jnp.sum(jnp.where(within, ev, 0.0), axis=1)
                e_old = patch_sum(x_old)
                e_new = patch_sum(x_new)
                u_pad = jax.random.uniform(
                    jax.random.fold_in(k_aux, 1), (csize,), dtype=dtype)
                boltz = jnp.exp(jnp.clip(-(e_new - e_old), -50.0, 50.0))
                reject = reject | (u_pad > boltz)
            if self._external is not None:
                # external field Metropolis term (reference
                # ExternalFieldLattice plugged into the acceptance)
                tag_pad2 = jnp.concatenate(
                    [state.tag, jnp.zeros((1,), jnp.int32)])
                tsel = tag_pad2[i_sel]
                e_ext_old = self._external.energy_fn(x_old, tsel, state)
                e_ext_new = self._external.energy_fn(x_new, tsel, state)
                u_ext = jax.random.uniform(
                    jax.random.fold_in(k_aux, 2), (csize,), dtype=dtype)
                boltz_e = jnp.exp(jnp.clip(-(e_ext_new - e_ext_old),
                                           -50.0, 50.0))
                reject = reject | (u_ext > boltz_e)
            accept = ~reject & has

            i_write = jnp.where(accept, i_sel, N)
            new_pos = state.pos.at[
                jnp.minimum(i_write, N - 1)].set(
                jnp.where((i_write < N)[:, None], x_new,
                          state.pos[jnp.minimum(i_write, N - 1)]))
            # image flags: MC moves are local; images unchanged (wrap of
            # a bounded move crosses at most one boundary — fold into pos)
            n_acc = jnp.sum(accept)
            n_try = jnp.sum(has)
            counters = {
                'translate_accept': counters['translate_accept'] + n_acc,
                'translate_reject': counters['translate_reject']
                + (n_try - n_acc),
                'cell_overflow': counters['cell_overflow'] | cell_ovf,
            }
            return state.replace(pos=new_pos), counters

        def one_sweep(state, counters):
            key = step_key(seed, state.timestep, salt=23)
            perm = jax.random.permutation(key, 8 * self.nselect) % 8

            def body(k, carry):
                state, counters = carry
                return sub_sweep(state, counters, k, perm[k])
            state, counters = jax.lax.fori_loop(
                0, n_sub, body, (state, counters))
            return state.replace(timestep=state.timestep + 1), counters

        def run_chunk(state, counters, nsteps):
            def body(_, carry):
                return one_sweep(*carry)
            return jax.lax.fori_loop(0, nsteps, body, (state, counters))

        def init_counters():
            z = jnp.zeros((), jnp.int32)
            return {'translate_accept': z, 'translate_reject': z,
                    'cell_overflow': jnp.zeros((), bool)}

        import jax
        return {'run_chunk': jax.jit(run_chunk),
                'run_chunk_raw': run_chunk,
                'init_counters': init_counters,
                'cell_cap': cell_cap}

    # -- python-visible state sync ------------------------------------------
    def _absorb_counters(self, dev_counters):
        self.counters.translate_accept += int(
            dev_counters['translate_accept'])
        self.counters.translate_reject += int(
            dev_counters['translate_reject'])


class sphere(mode_hpmc):
    """Hard spheres (reference hpmc/integrate.py sphere, ShapeSphere.h).
    shape_param.set('A', diameter=1.0)."""

    def __init__(self, seed, d=0.1, nselect=4, implicit=False,
                 move_ratio=0.5):
        mode_hpmc.__init__(self, seed, d=d, nselect=nselect,
                           move_ratio=move_ratio)

    def _diameters(self, system):
        return np.array([
            float(self.shape_param[t].get('diameter', 1.0))
            for t in system.particle_types])

    def _interaction_diameter(self, system):
        return float(self._diameters(system).max())

    def _make_overlap_fn(self, system):
        import jax.numpy as jnp
        diam = self._diameters(system)

        def overlap(dr, ti, tj, state, i_sel, cand):
            d_t = jnp.asarray(diam, dr.dtype)
            rsum = 0.5 * (d_t[ti] + d_t[tj])
            r2 = jnp.sum(dr * dr, axis=-1)
            return r2 < rsum * rsum
        return overlap


class ellipsoid(mode_hpmc):
    """Placeholder: anisotropic shapes land with the rotation-move slice."""

    def __init__(self, *a, **k):
        raise NotImplementedError(
            "hpmc.integrate.ellipsoid: anisotropic HPMC shapes are not yet "
            "implemented in hoomd_tpu")


convex_polyhedron = ellipsoid
convex_spheropolyhedron = ellipsoid
polyhedron = ellipsoid
convex_polygon = ellipsoid
simple_polygon = ellipsoid
convex_spheropolygon = ellipsoid
faceted_sphere = ellipsoid
sphinx = ellipsoid
sphere_union = ellipsoid
