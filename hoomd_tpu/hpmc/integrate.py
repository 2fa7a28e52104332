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

import os

import numpy as np

from .. import context
from ..ops import cells as cells_ops
from . import data


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


class interaction_matrix:
    """Per-type-pair overlap-check enables (reference
    hpmc/integrate.py:11-29 ``interaction_matrix``; every shape exposes
    it as ``mc.overlap_checks``).  Pairs default to enabled; disabling
    e.g. ('B', 'B') makes B particles mutually penetrable — the explicit
    realization of a depletant bath."""

    def __init__(self, mc):
        self._mc = mc
        self._enables = {}

    @staticmethod
    def _key(a, b):
        return (a, b) if a <= b else (b, a)

    def set(self, a, b, enable):
        self._enables[self._key(a, b)] = bool(enable)
        self._mc._dirty()

    def get(self, a, b):
        return self._enables.get(self._key(a, b), True)

    def matrix(self, types):
        """(T, T) boolean numpy matrix in the given type order."""
        T = len(types)
        m = np.ones((T, T), bool)
        for i, a in enumerate(types):
            for j, b in enumerate(types):
                m[i, j] = self.get(a, b)
        return m


# per-type shape parameters live in hpmc.data (reference hpmc/data.py,
# ShapeProxy.h:34-397); re-exported here for backward compatibility
shape_param_proxy = data.param_dict


class mode_hpmc:
    """Base HPMC integrator (reference IntegratorHPMC)."""

    def __init__(self, seed, d=0.1, a=0.1, move_ratio=0.5, nselect=4,
                 implicit=False):
        self.seed = int(seed)
        self.move_ratio = float(move_ratio)
        self.nselect = int(nselect)
        self.implicit = bool(implicit)
        self.nR = 0.0
        self.depletant_type = None
        self.ntrial = 1          # accepted for API parity; see set_params
        self._default_d = float(d)
        self._default_a = float(a)
        self.d_by_type = {}
        self.a_by_type = {}
        self.shape_param = shape_param_proxy(self)
        self.overlap_checks = interaction_matrix(self)
        self._patch = None        # jit.patch.user attaches here
        self._external = None     # hpmc.field.* attaches here
        self.counters = _hpmc_counters()
        sys_ = context.current.system
        sys_.set_hpmc_integrator(self)

    def _dirty(self):
        context.current.system._dirty()

    def set_params(self, d=None, a=None, move_ratio=None, nselect=None,
                   nR=None, depletant_type=None, ntrial=None):
        """Set move sizes and (implicit mode) depletant parameters
        (reference hpmc/integrate.py:411-424 set_params).

        nR: reservoir number density of implicit depletants in free
        volume; depletant_type: particle type inserted as depletant.
        ntrial is accepted for API compatibility; the TPU acceptance
        rule (one-shot Poisson sampling of the newly covered exclusion
        volume, satisfying detailed balance directly) has no
        re-insertion loop, so it is a no-op."""
        if nR is not None:
            if not self.implicit:
                raise RuntimeError(
                    "hpmc: nR requires an integrator constructed with "
                    "implicit=True")
            # nR rides hdyn, but the depletant code is only IN the trace
            # when the program was built with nR > 0 (implicit_on): the
            # 0 -> >0 transition needs a rebuild
            if (self.nR > 0) != (float(nR) > 0):
                self._dirty()
            self.nR = float(nR)
        if depletant_type is not None:
            if not self.implicit:
                raise RuntimeError(
                    "hpmc: depletant_type requires implicit=True")
            if self.depletant_type != str(depletant_type):
                self._dirty()      # dep_idx/R_samp are baked in the trace
            self.depletant_type = str(depletant_type)
        if ntrial is not None:
            self.ntrial = int(ntrial)
        return self._set_move_params(d=d, a=a, move_ratio=move_ratio,
                                     nselect=nselect)

    def get_nR(self):
        return self.nR

    def get_depletant_type(self):
        return self.depletant_type

    def get_ntrial(self):
        return self.ntrial

    def _set_move_params(self, d=None, a=None, move_ratio=None,
                         nselect=None):
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
            self._dirty()           # n_sub is a static loop count
            return
        # move sizes / ratio ride hdyn (traced), so tuners adjust them
        # recompile-free — UNLESS a d grew past the stencil width the
        # program was built for (w_min is a capacity; see _build_program)
        built = getattr(self, '_built_d', None)
        if built is None:
            self._dirty()
            return
        if d is not None and any(
                self.get_d(t) > built.get(t, 0.0) for t in built):
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
        c = context.current.system._hpmc_counters
        if c is None or 'rotate_accept' not in c:
            return 0.0
        acc = int(c['rotate_accept'])
        rej = int(c['rotate_reject'])
        return acc / (acc + rej) if (acc + rej) else 0.0

    def get_counters(self):
        c = context.current.system._hpmc_counters
        return {k: int(v) for k, v in c.items()} if c else {}

    # -- subclass interface -------------------------------------------------
    def _interaction_diameter(self, system):
        """Max center-to-center distance at which two shapes can overlap."""
        raise NotImplementedError

    def _circumradii(self, system):
        """Per-type circumsphere radii.  The conservative default (half
        the max interaction diameter for every type) only enlarges the
        depletant sampling volume — Poisson thinning keeps the
        acceptance rule exact for any covering volume."""
        r = 0.5 * self._interaction_diameter(system)
        return np.full(len(system.particle_types), r)

    def count_overlaps(self, system=None):
        """Number of overlapping pairs in the current configuration
        (reference IntegratorHPMCMono::countOverlaps).  Blocked all-pairs
        sweep with the shape's overlap kernel — used by box updaters and
        sanity checks, not the per-step path."""
        import jax
        import jax.numpy as jnp
        from .. import context as _ctx
        system = system or _ctx.current.system
        fn = self._make_checked_overlap_fn(system)
        st = system.state
        N = st.N
        pos = st.pos
        tid = st.typeid
        q = st.orientation
        B = 256
        nb = -(-N // B)
        pad = nb * B - N
        pos_p = jnp.concatenate([pos, jnp.full((pad, 3), 1e8,
                                               pos.dtype)])
        tid_p = jnp.concatenate([tid, jnp.zeros((pad,), tid.dtype)])
        q_p = jnp.concatenate(
            [q, jnp.tile(jnp.asarray([1., 0, 0, 0], q.dtype),
                         (pad, 1))])
        rows_all = jnp.arange(nb * B).reshape(nb, B)
        jcol = jnp.arange(N)

        def block(rows):
            dr = st.box.min_image(pos_p[rows][:, None, :]
                                  - pos[None, :, :])
            hit = fn(dr, tid_p[rows][:, None],
                     jnp.broadcast_to(tid[None, :], (B, N)), st, None,
                     None, q_i=q_p[rows],
                     q_j=jnp.broadcast_to(q[None], (B, N, 4)))
            tri = (rows[:, None] < jcol[None, :])
            return jnp.sum(jnp.where(hit & tri, 1, 0))
        return int(jnp.sum(jax.lax.map(block, rows_all)))

    def _make_overlap_fn(self, system):
        """Returns overlap(dr (M,C,3), ti (M,1), tj (M,C)) -> bool (M,C):
        True where shapes overlap."""
        raise NotImplementedError

    def _make_checked_overlap_fn(self, system):
        """Shape overlap fn AND the interaction-matrix enables
        (reference hpmc/IntegratorHPMCMono.h overlap_idx lookups)."""
        fn = self._make_overlap_fn(system)
        m = self.overlap_checks.matrix(system.particle_types)
        if m.all():
            return fn
        import jax.numpy as jnp
        mat = jnp.asarray(m)

        def checked(dr, ti, tj, *a, **k):
            # advanced indexing broadcasts (M,1) x (M,C) -> (M,C)
            return fn(dr, ti, tj, *a, **k) & mat[ti, tj]
        return checked

    def _has_rotation(self):
        return False

    def _fused_radii(self, system):
        """Per-type hard radii when the shape is a sphere (the fused
        Pallas sweep's narrow phase); None gates the fused path off."""
        return None

    def _fused_poly_tables(self, system):
        """(V, F, E) static hull tables for the fused SAT sweep
        (single-type convex polyhedra); None gates it off."""
        return None

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
        # -- implicit depletants (reference IntegratorHPMCMonoImplicit;
        # redesigned acceptance, see the sub_sweep block below).  The
        # stencil must additionally cover the depletant test reach:
        # d + R_samp + rc_dep + rc_max + d <= w_min + 2 rc_dep.
        implicit_on = bool(self.implicit and self.nR > 0
                           and self.depletant_type is not None)
        if implicit_on:
            rc_arr = np.asarray(self._circumradii(system), float)
            dep_idx = list(types).index(self.depletant_type)
            rc_dep = float(rc_arr[dep_idx])
            w_min += 2.0 * rc_dep
        # tilted (sheared) boxes shrink the perpendicular slab width of a
        # fraction-space cell by 1/sqrt(1+t^2); pad the requirement so the
        # stencil invariant survives boxmc shear moves
        tilt = np.abs(np.asarray(state.box.tilt))
        w_min = w_min * float(np.sqrt(1.0 + np.max(tilt) ** 2))
        L = np.asarray(state.box.L)
        dims3 = state.box.dimensions
        # EVEN cell counts only: with an odd count the first and last cells
        # share parity but are adjacent through the periodic boundary, so
        # two same-class movers could overlap — the checkerboard argument
        # (IntegratorHPMCMonoGPU.cuh cell sets) requires even dimensions.
        cell_dim = list(cells_ops.choose_cell_dim(L, w_min, dims3))
        # tiny shapes would explode the grid; past ~32 cells/axis the
        # checkerboard gains nothing (reference CellList also caps its
        # dimensions to keep memory bounded)
        cell_dim = [min(c, 32) for c in cell_dim]
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
        # candidate compaction width: the 27-cell stencil yields
        # 27*cell_cap lanes but only the few within the circumsphere
        # reach w_min can interact — a distance top-k keeps the SAT /
        # GJK tensor narrow (the reference's check_circumsphere_overlap
        # prefilter, hpmc/ShapeConvexPolyhedron.h).  Grows on overflow
        # like the neighbor list.
        cand_cap = max(32, system._grow.get('hpmc_cand_cap', 0))

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
        overlap_fn = self._make_checked_overlap_fn(system)
        has_rotation = self._has_rotation()
        trial_rotation = (self._make_trial_rotation(system, dtype)
                          if has_rotation else None)
        n_sub = 8 * self.nselect
        dims = state.box.dimensions
        # move parameters + seed ride a small traced dict (hdyn) packed
        # at every chunk boundary: tuners (hpmc.util.tune) and
        # set_params(d=..., a=...) adjust moves WITHOUT a recompile, and
        # ensemble replicas can vmap over per-replica values.  The cell
        # stencil width w_min is a build-time CAPACITY sized from the
        # d at build; growing any d past it triggers a program rebuild
        # (mode_hpmc._set_move_params), shrinking is free — the same
        # split as the reference's cell-width vs nominal-width handling.
        types_t = tuple(types)

        def pack_hdyn():
            d_now = np.array([self.get_d(t) for t in types_t])
            a_now = np.array([self.get_a(t) for t in types_t])
            return {'seed': jnp.asarray(self.seed, jnp.uint32),
                    'd': jnp.asarray(d_now, dtype),
                    'a': jnp.asarray(a_now, dtype),
                    'mr': jnp.asarray(self.move_ratio, dtype),
                    'nR': jnp.asarray(float(self.nR), dtype)}

        if implicit_on:
            # per-type depletant sampling radius (covers the exclusion
            # region E_i(new) of any mover of that type) and Poisson cap
            R_samp_np = rc_arr + rc_dep
            if dims == 3:
                vol_np = 4.0 / 3.0 * np.pi * R_samp_np ** 3
            else:
                vol_np = np.pi * R_samp_np ** 2
            lam_max = float(self.nR * vol_np.max())
            M_dep = int(np.ceil(lam_max + 6.0 * np.sqrt(lam_max))) + 4
            M_dep = max(M_dep, system._grow.get('hpmc_dep_cap', 0))
            R_samp = jnp.asarray(R_samp_np, dtype)
            vol_samp = jnp.asarray(vol_np, dtype)
        else:
            M_dep = 0

        def sub_sweep(state, counters, sweep_idx, class_idx, hdyn,
                      cell_list):
            # cell_list comes from the ROUND-level binning: within a
            # round each particle moves at most once (a particle is a
            # member of exactly one stale cell, so one parity class),
            # and the stencil width diam + 2*d_max covers partners
            # after both endpoints moved once — the same invariant the
            # dense sweep and the reference GPU path rely on
            # (IntegratorHPMCMonoGPU.cuh cell sets).  Hoisting the
            # re-bin out of the sub-sweep removes 7/8 of the binning
            # scatters (serial element stores on TPU).
            box = state.box
            cl_pad = jnp.concatenate(
                [cell_list, jnp.full((1, cell_cap), N, jnp.int32)], axis=0)
            counts = jnp.sum(cell_list < N, axis=1)
            counts_pad = jnp.concatenate(
                [counts, jnp.zeros((1,), counts.dtype)])

            active = class_table[class_idx]            # (csize,) cell ids
            acount = counts_pad[active]                # occupancy
            key = step_key(hdyn['seed'], state.timestep, salt=17)
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
            quat_pad = jnp.concatenate(
                [state.orientation,
                 jnp.asarray([[1.0, 0, 0, 0]], dtype)], axis=0)
            x_old = pos_pad[i_sel]
            q_old = quat_pad[i_sel]
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
            delta = g * (rad * hdyn['d'][ti])[:, None]
            if has_rotation:
                k_rot = jax.random.fold_in(k_move, 3)
                q_rot, do_rot = trial_rotation(k_rot, q_old, ti, None,
                                               hdyn)
                delta = jnp.where(do_rot[:, None], 0.0, delta)
                q_new = jnp.where(do_rot[:, None], q_rot, q_old)
            else:
                do_rot = jnp.zeros((csize,), bool)
                q_new = q_old
            x_new = x_old + delta
            x_new, _ = box.wrap(x_new, jnp.zeros((csize, 3), jnp.int32))

            # overlap candidates: occupants of the 27-cell stencil around
            # the particle's ORIGINAL cell (moves are bounded so the
            # stencil still covers every possible overlap partner)
            adj_pad = jnp.concatenate(
                [cell_adj, jnp.full((1, 27), ncells, jnp.int32)], axis=0)
            my_cell = jnp.where(has, active, ncells)
            cand_w = cl_pad[adj_pad[my_cell]].reshape(csize, -1)
            # circumsphere prefilter + top-k compaction: of the
            # 27*cell_cap stencil lanes only those within w_min of the
            # mover can interact (incl. depletant/patch reach — w_min
            # was sized for them); keep the cand_cap nearest and flag
            # overflow for the grow/retry protocol
            dr_w = box.min_image(x_new[:, None, :] - pos_pad[cand_w])
            rr_w = jnp.sum(dr_w * dr_w, axis=-1)
            lane_w = (cand_w != i_sel[:, None]) & (cand_w < N)
            rr_m = jnp.where(lane_w, rr_w, jnp.inf)
            kc = min(cand_cap, cand_w.shape[1])
            n_in = jnp.sum(rr_m <= w_min * w_min, axis=1)
            cand_ovf = jnp.any(n_in > kc)
            _, kidx = jax.lax.top_k(-rr_m, kc)
            cand = jnp.take_along_axis(cand_w, kidx, axis=1)
            dr = jnp.take_along_axis(dr_w, kidx[..., None], axis=1)
            tj = t_pad[cand]
            olap = overlap_fn(dr, ti[:, None], tj, state, i_sel, cand,
                              q_i=q_new, q_j=quat_pad[cand])
            olap &= cand != i_sel[:, None]
            olap &= cand < N
            reject = jnp.any(olap, axis=1) | ~has
            dep_ovf = jnp.zeros((), bool)
            if implicit_on:
                # Implicit depletants (reference
                # IntegratorHPMCMonoImplicit.h, Glaser et al. 2015
                # redesigned for the checkerboard): integrating out an
                # ideal penetrable-depletant bath at fugacity nR gives
                # the effective weight exp(nR * V_free).  Detailed
                # balance holds with P_acc(old->new) = exp(-nR * |B|)
                # where B = E_i(new) \ (E_i(old) u U) is the exclusion
                # volume newly covered by the move (the reverse move's
                # region is exactly the freed volume A).  Realized by
                # Poisson(nR * V_samp) uniform insertions in a sampling
                # ball covering E_i(new): reject iff any depletant
                # overlaps i_new but neither i_old nor any other
                # particle.  Oversampling (V_samp > |E_i(new)|) is
                # exact by Poisson thinning.
                kd = jax.random.fold_in(k_aux, 7)
                Rs = R_samp[ti]                           # (csize,)
                lam = hdyn['nR'] * vol_samp[ti]
                ndep = jax.random.poisson(
                    jax.random.fold_in(kd, 0), lam)       # (csize,)
                dep_ovf = jnp.any(ndep > M_dep)
                gd = jax.random.normal(jax.random.fold_in(kd, 1),
                                       (csize, M_dep, 3), dtype=dtype)
                if dims == 2:
                    gd = gd.at[..., 2].set(0.0)
                gd = gd / jnp.maximum(
                    jnp.linalg.norm(gd, axis=-1, keepdims=True), 1e-12)
                ud = jax.random.uniform(jax.random.fold_in(kd, 2),
                                        (csize, M_dep), dtype=dtype)
                radd = ud ** (1.0 / dims) * Rs[:, None]
                dep = x_new[:, None, :] + gd * radd[..., None]
                live = (jnp.arange(M_dep)[None, :]
                        < jnp.minimum(ndep, M_dep)[:, None])
                dep_tj = jnp.full((csize, M_dep), dep_idx, jnp.int32)
                if has_rotation:
                    qd = jax.random.normal(
                        jax.random.fold_in(kd, 3),
                        (csize, M_dep, 4), dtype=dtype)
                    qd = qd / jnp.maximum(
                        jnp.linalg.norm(qd, axis=-1, keepdims=True),
                        1e-12)
                else:
                    qd = jnp.broadcast_to(
                        jnp.asarray([1.0, 0, 0, 0], dtype),
                        (csize, M_dep, 4))
                # (a) depletant overlaps the mover's NEW configuration
                dr_n = box.min_image(x_new[:, None, :] - dep)
                o_new = overlap_fn(dr_n, ti[:, None], dep_tj, state,
                                   None, None, q_i=q_new, q_j=qd)
                # (b) ... but not its OLD configuration
                dr_o = box.min_image(x_old[:, None, :] - dep)
                o_old = overlap_fn(dr_o, ti[:, None], dep_tj, state,
                                   None, None, q_i=q_old, q_j=qd)
                # (c) ... and no OTHER particle (stencil candidates,
                # excluding the mover itself): rows = (mover, depletant)
                K = cand.shape[1]
                M2 = csize * M_dep
                pc = pos_pad[cand]                        # (csize, K, 3)
                dr_c = box.min_image(
                    dep[:, :, None, :] - pc[:, None, :, :])
                ti_dep = jnp.full((M2, 1), dep_idx, jnp.int32)
                tj_c = jnp.broadcast_to(tj[:, None, :],
                                        (csize, M_dep, K))
                qc = jnp.broadcast_to(quat_pad[cand][:, None],
                                      (csize, M_dep, K, 4))
                o_oth = overlap_fn(dr_c.reshape(M2, K, 3), ti_dep,
                                   tj_c.reshape(M2, K), state, None,
                                   None, q_i=qd.reshape(M2, 4),
                                   q_j=qc.reshape(M2, K, 4))
                lane_ok = (cand != i_sel[:, None]) & (cand < N)
                o_oth &= jnp.broadcast_to(
                    lane_ok[:, None, :], (csize, M_dep, K)
                ).reshape(M2, K)
                o_any = jnp.any(o_oth, axis=1).reshape(csize, M_dep)
                viol = live & o_new & ~o_old & ~o_any
                reject = reject | jnp.any(viol, axis=1)
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
            iw = jnp.minimum(i_write, N - 1)
            wmask = (i_write < N)[:, None]
            new_pos = state.pos.at[iw].set(
                jnp.where(wmask, x_new, state.pos[iw]))
            if has_rotation:
                new_q = state.orientation.at[iw].set(
                    jnp.where(wmask, q_new, state.orientation[iw]))
            else:
                new_q = state.orientation
            # image flags: MC moves are local; images unchanged (wrap of
            # a bounded move crosses at most one boundary — fold into pos)
            n_acc_t = jnp.sum(accept & ~do_rot)
            n_try_t = jnp.sum(has & ~do_rot)
            n_acc_r = jnp.sum(accept & do_rot)
            n_try_r = jnp.sum(has & do_rot)
            counters = {
                'translate_accept': counters['translate_accept'] + n_acc_t,
                'translate_reject': counters['translate_reject']
                + (n_try_t - n_acc_t),
                'rotate_accept': counters['rotate_accept'] + n_acc_r,
                'rotate_reject': counters['rotate_reject']
                + (n_try_r - n_acc_r),
                'cell_overflow': counters['cell_overflow'],
                'cand_overflow': counters['cand_overflow'] | cand_ovf,
                'depletant_overflow':
                    counters['depletant_overflow'] | dep_ovf,
            }
            return state.replace(pos=new_pos, orientation=new_q), counters

        # HOOMD_TPU_HPMC_REBIN=subsweep re-bins before EVERY sub-sweep
        # instead of once per 8-class round — the reference semantics
        # the hoisted binning must match (tests/test_hpmc_fused_sweep.py
        # asserts validity + acceptance parity of the two)
        rebin_subsweep = (os.environ.get('HOOMD_TPU_HPMC_REBIN', 'round')
                          == 'subsweep')

        def one_sweep(state, counters, hdyn):
            key = step_key(hdyn['seed'], state.timestep, salt=23)
            nsel = max(1, n_sub // 8)

            def round_body(r, carry):
                state, counters = carry
                kr = jax.random.fold_in(key, r)
                perm = jax.random.permutation(kr, 8)
                cid, cell_list, cell_ovf = cells_ops.bin_particles(
                    state.pos, state.box, cell_dim, cell_cap)
                counters = dict(counters)
                counters['cell_overflow'] = \
                    counters['cell_overflow'] | cell_ovf

                def body(k, carry2):
                    st, ct = carry2
                    cl = cell_list
                    if rebin_subsweep:
                        _, cl, ovf_k = cells_ops.bin_particles(
                            st.pos, st.box, cell_dim, cell_cap)
                        ct = dict(ct)
                        ct['cell_overflow'] = ct['cell_overflow'] | ovf_k
                    return sub_sweep(st, ct, r * 8 + k, perm[k], hdyn,
                                     cl)
                return jax.lax.fori_loop(0, 8, body, (state, counters))
            state, counters = jax.lax.fori_loop(
                0, nsel, round_body, (state, counters))
            return state.replace(timestep=state.timestep + 1), counters

        # -- dense cell-major sweep --------------------------------------
        # The gather-path sub_sweep re-bins all N particles and pays
        # (csize, 27*cell_cap) index+position GATHERS every sub-sweep —
        # serial element loads on TPU, the same pathology the MD fast
        # engine removes.  The dense sweep is the reference GPU's
        # one-trial-per-active-cell checkerboard
        # (hpmc/IntegratorHPMCMonoGPU.cuh:124-160) in cell-major form:
        #   * one sweep = nselect ROUNDS; each round re-bins once and
        #     visits the 8 parity classes in random order (the GPU
        #     path's shuffled cell-set order per pass).  Within a round
        #     each particle moves at most once, so candidate drift is
        #     <= d and the build-time stencil width diam + 2*d_max
        #     covers every overlap partner without mid-round re-bins;
        #   * per sub-sweep the state is ROLLED by the class parity so
        #     the active cells sit at [::2,::2,::2] — candidate windows
        #     become 27 static rolls + strided slices (zero gathers),
        #     occupants line up in the lane dimension;
        #   * accepted movers write back through a one-hot select into
        #     the strided block (no scatter).
        # Overlap tests run on all 27*cell_cap lanes masked by liveness
        # (compaction would itself need a gather; the VPU is
        # compute-rich — the MD fast-path lesson).
        dims_even = all(c % 2 == 0 for c in cell_dim[:dims3])
        # measured on TPU (cubes phi=0.4 N=4096): the dense sweep runs
        # 3.2x SLOWER than the gather path (42k vs 133k trial-moves/s)
        # — its 27 rolls x 4 channel arrays per sub-sweep are hundreds
        # of TINY ops (the whole grid is only ~16k elements), so it is
        # op-dispatch bound where the gather path's few larger gathers
        # win.  Kept opt-in for large-N grids where the rolls carry
        # real volume.
        use_dense = (dims3 == 3 and dims_even and not implicit_on
                     and patch is None and self._external is None
                     and os.environ.get('HOOMD_TPU_HPMC_DENSE', 'off')
                     == 'on')

        def one_sweep_dense(state, counters, hdyn):
            box = state.box
            nx_, ny_, nz_ = cell_dim
            hz, hy, hx = nz_ // 2, ny_ // 2, nx_ // 2
            ncls = hz * hy * hx
            K27 = 27 * cell_cap
            pos_pad = jnp.concatenate(
                [state.pos, jnp.zeros((1, 3), dtype)], axis=0)
            t_pad = jnp.concatenate(
                [state.typeid, jnp.zeros((1,), jnp.int32)])
            quat_pad = jnp.concatenate(
                [state.orientation,
                 jnp.asarray([[1.0, 0, 0, 0]], dtype)], axis=0)
            key0 = step_key(hdyn['seed'], state.timestep, salt=29)

            offs = [(dz, dy, dx) for dz in (-1, 0, 1)
                    for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
            c_center = offs.index((0, 0, 0))

            def one_round(r, carry):
                state, counters = carry
                kr = jax.random.fold_in(key0, r)
                perm = jax.random.permutation(kr, 8)
                cid, cell_list, cell_ovf = cells_ops.bin_particles(
                    state.pos, box, cell_dim, cell_cap)
                g4 = (nz_, ny_, nx_, cell_cap)
                cidx = cell_list.reshape(g4)
                cpos = pos_pad[cell_list].reshape(g4 + (3,))
                ctyp = t_pad[cell_list].reshape(g4)
                cq = quat_pad[cell_list].reshape(g4 + (4,))

                def sub(s, sc):
                    cpos, cq, counters = sc
                    c = perm[s]
                    pz, py, px = c // 4, (c // 2) % 2, c % 2
                    sh = (-pz, -py, -px)

                    def rot(a):
                        return jnp.roll(a, sh, axis=(0, 1, 2))

                    def unrot(a):
                        return jnp.roll(a, (pz, py, px), axis=(0, 1, 2))
                    pr = rot(cpos)
                    qr = rot(cq)
                    tr = rot(ctyp)
                    ir = rot(cidx)

                    def act(a):
                        return a[::2, ::2, ::2]
                    live_act = act(ir) < N            # (hz,hy,hx,cap)
                    cnt = jnp.sum(live_act, axis=-1)
                    ks = jax.random.fold_in(kr, 100 + s)
                    k_sel, k_move, k_aux = jax.random.split(ks, 3)
                    u_sel = jax.random.uniform(k_sel, (hz, hy, hx),
                                               dtype=dtype)
                    # occupied slots are a contiguous prefix (bin rank)
                    pick = jnp.minimum((u_sel * cnt).astype(jnp.int32),
                                       jnp.maximum(cnt - 1, 0))
                    ohf = (jax.nn.one_hot(pick, cell_cap, dtype=dtype)
                           * live_act.astype(dtype))  # (hz,hy,hx,cap)
                    has = cnt > 0
                    x_old = jnp.sum(act(pr) * ohf[..., None], axis=-2)
                    q_old = jnp.sum(act(qr) * ohf[..., None], axis=-2)
                    ti = jnp.sum(act(tr) * ohf.astype(jnp.int32),
                                 axis=-1)
                    M = ncls
                    g = jax.random.normal(k_move, (hz, hy, hx, 3),
                                          dtype=dtype)
                    rad = jax.random.uniform(k_aux, (hz, hy, hx),
                                             dtype=dtype) ** (1.0 / 3.0)
                    g = g / jnp.maximum(
                        jnp.linalg.norm(g, axis=-1, keepdims=True),
                        1e-12)
                    delta = g * (rad * hdyn['d'][ti])[..., None]
                    if has_rotation:
                        k_rot = jax.random.fold_in(k_move, 3)
                        q_rot, do_rot = trial_rotation(
                            k_rot, q_old.reshape(M, 4),
                            ti.reshape(M), None, hdyn)
                        q_rot = q_rot.reshape(hz, hy, hx, 4)
                        do_rot = do_rot.reshape(hz, hy, hx)
                        delta = jnp.where(do_rot[..., None], 0.0, delta)
                        q_new = jnp.where(do_rot[..., None], q_rot,
                                          q_old)
                    else:
                        do_rot = jnp.zeros((hz, hy, hx), bool)
                        q_new = q_old
                    x_new = x_old + delta
                    x_new, _ = box.wrap(
                        x_new.reshape(M, 3), jnp.zeros((M, 3), jnp.int32))
                    x_new = x_new.reshape(hz, hy, hx, 3)

                    # 27-block candidate window: static rolls + strided
                    # slices (no gathers)
                    wp, wq, wt, wl = [], [], [], []
                    for (dz, dy, dx) in offs:
                        s3 = (-dz, -dy, -dx)
                        wp.append(act(jnp.roll(pr, s3, axis=(0, 1, 2))))
                        wq.append(act(jnp.roll(qr, s3, axis=(0, 1, 2))))
                        wt.append(act(jnp.roll(tr, s3, axis=(0, 1, 2))))
                        wl.append(act(jnp.roll(ir, s3, axis=(0, 1, 2)))
                                  < N)
                    cposw = jnp.concatenate(wp, axis=-2)   # (...,27cap,3)
                    cqw = jnp.concatenate(wq, axis=-2)
                    ctw = jnp.concatenate(wt, axis=-1)
                    clw = jnp.concatenate(wl, axis=-1)
                    # self lane: slot `pick` of the center (0,0,0) block
                    lane_i = jax.lax.broadcasted_iota(
                        jnp.int32, (hz, hy, hx, K27), 3)
                    self_lane = lane_i == (c_center * cell_cap
                                           + pick)[..., None]
                    dr = box.min_image(
                        (x_new[..., None, :] - cposw).reshape(M, K27, 3))
                    olap = overlap_fn(
                        dr, ti.reshape(M, 1), ctw.reshape(M, K27),
                        state, None, None,
                        q_i=q_new.reshape(M, 4),
                        q_j=cqw.reshape(M, K27, 4))
                    olap &= (clw & ~self_lane).reshape(M, K27)
                    reject = (jnp.any(olap, axis=1).reshape(hz, hy, hx)
                              | ~has)
                    accept = ~reject & has

                    wsel = (ohf > 0.0) & accept[..., None]
                    blk_p = jnp.where(wsel[..., None],
                                      x_new[..., None, :], act(pr))
                    pr = pr.at[::2, ::2, ::2].set(blk_p)
                    if has_rotation:
                        blk_q = jnp.where(wsel[..., None],
                                          q_new[..., None, :], act(qr))
                        qr = qr.at[::2, ::2, ::2].set(blk_q)
                    n_acc_t = jnp.sum(accept & ~do_rot)
                    n_try_t = jnp.sum(has & ~do_rot)
                    n_acc_r = jnp.sum(accept & do_rot)
                    n_try_r = jnp.sum(has & do_rot)
                    counters = dict(counters)
                    counters['translate_accept'] = \
                        counters['translate_accept'] + n_acc_t
                    counters['translate_reject'] = \
                        counters['translate_reject'] + (n_try_t - n_acc_t)
                    counters['rotate_accept'] = \
                        counters['rotate_accept'] + n_acc_r
                    counters['rotate_reject'] = \
                        counters['rotate_reject'] + (n_try_r - n_acc_r)
                    return unrot(pr), unrot(qr), counters

                cpos, cq, counters = jax.lax.fori_loop(
                    0, 8, sub, (cpos, cq, counters))
                # write the round's moves back to particle order
                idx_f = cidx.reshape(nc_cap_total)
                dst = jnp.where(idx_f < N, idx_f, N)
                new_pos = state.pos.at[dst].set(
                    cpos.reshape(nc_cap_total, 3), mode='drop')
                new_q = state.orientation.at[dst].set(
                    cq.reshape(nc_cap_total, 4), mode='drop') \
                    if has_rotation else state.orientation
                counters = dict(counters)
                counters['cell_overflow'] = (counters['cell_overflow']
                                             | cell_ovf)
                return (state.replace(pos=new_pos, orientation=new_q),
                        counters)

            nc_cap_total = ncells * cell_cap
            state, counters = jax.lax.fori_loop(
                0, self.nselect, one_round, (state, counters))
            return state.replace(timestep=state.timestep + 1), counters

        # -- fused-sweep Pallas kernel (spheres) -------------------------
        # ONE kernel per sweep: nselect rounds x 8 parity sub-sweeps
        # resident in VMEM (hpmc/pallas_sweep.py) — replaces 8*nselect
        # sequential XLA sub-sweeps of serial element gathers (measured
        # ~3 ms each on TPU at N=4k).  Needs its own, WIDER grid: stale
        # cell membership over R rounds requires width >= diam+2*R*d_max
        # (the same invariant as the hoisted re-bin, extended R rounds).
        fused_env = os.environ.get('HOOMD_TPU_HPMC_FUSED', 'auto')
        radii_np = self._fused_radii(system)
        poly_tables = (self._fused_poly_tables(system)
                       if radii_np is None else None)
        use_fused = False
        if (dims3 == 3 and not implicit_on and patch is None
                and self._external is None
                and (radii_np is not None
                     or (poly_tables is not None and has_rotation))
                and dtype == jnp.float32
                and float(np.max(tilt)) < 1e-12   # orthorhombic min_image
                and fused_env != 'off'
                and (fused_env in ('on', 'interpret')
                     or jax.default_backend() == 'tpu')):
            # R = rounds per kernel call (and per re-bin).  Finer grids
            # pack MORE trials per kernel (trials/round = ncells ~ 1/w^3
            # with w = diam + 2*R*d), so small R wins as long as the
            # re-bin amortizes — measured on TPU at N=4k spheres:
            # R=1 -> 2744 trials/0.8ms beats R=4 -> 2048 trials/1.7ms.
            R_f = int(os.environ.get('HOOMD_TPU_HPMC_R', '1'))
            R_f = max(1, min(R_f, int(self.nselect)))
            w_f = (diam + 2.0 * d_max * R_f) \
                * float(np.sqrt(1.0 + np.max(tilt) ** 2))
            cd = list(cells_ops.choose_cell_dim(L, w_f, 3))
            cd = [min(c, 32) for c in cd]
            for ax in range(3):
                cd[ax] = max(2, 2 * (cd[ax] // 2))
            if all(L[ax] / cd[ax] >= w_f - 1e-9 for ax in range(3)):
                nxf, nyf, nzf = cd
                ncells_f = nxf * nyf * nzf
                cap_f = max(4, int(np.ceil(N / ncells_f * 2.0)) + 4,
                            system._grow.get('hpmc_cell_cap', 0))
                use_fused = True
        if use_fused and poly_tables is not None:
            from ..rng import step_key as _step_key
            from .pallas_sweep import fused_poly_sweep
            fused_interp = (jax.default_backend() != 'tpu')
            box_Lf = tuple(float(v) for v in np.asarray(state.box.L))
            n_kernels = max(1, -(-int(self.nselect) // R_f))

            def one_sweep_fused(state, counters, hdyn):
                pos = state.pos
                quat = state.orientation
                acc4 = jnp.zeros((4,), jnp.int32)
                cell_ovf = jnp.zeros((), bool)
                key = _step_key(hdyn['seed'], state.timestep, salt=37)
                mp = jnp.stack([hdyn['d'][0], hdyn['a'][0],
                                hdyn['mr']])
                for kcall in range(n_kernels):
                    cid, cell_list, ovf = cells_ops.bin_particles(
                        pos, state.box, (nxf, nyf, nzf), cap_f)
                    cell_ovf = cell_ovf | ovf
                    pos_pad = jnp.concatenate(
                        [pos, jnp.zeros((1, 3), dtype)], axis=0)
                    q_pad = jnp.concatenate(
                        [quat, jnp.asarray([[1.0, 0, 0, 0]], dtype)],
                        axis=0)
                    pc = pos_pad[cell_list]
                    qc = q_pad[cell_list]
                    live = (cell_list < N).astype(dtype)
                    shp = (nzf, nyf, nxf * cap_f)
                    planes = [pc[..., k].reshape(shp) for k in range(3)]
                    planes += [qc[..., k].reshape(shp)
                               for k in range(4)]
                    kk = jax.random.fold_in(key, kcall)
                    ks = jax.random.split(kk, R_f + 1)
                    perms = jnp.concatenate(
                        [jax.random.permutation(ks[r], 8)
                         for r in range(R_f)]).astype(jnp.int32)
                    if fused_interp:
                        randu = jax.random.uniform(
                            ks[-1], (R_f * 8, 12, nzf, nyf, nxf),
                            dtype)
                    else:
                        randu = jnp.zeros((1, 1, 1, 1, 1), dtype)
                    seed_s = (hdyn['seed'].astype(jnp.int32)
                              + state.timestep.astype(jnp.int32)
                              * 131071 + kcall * 7919)
                    out = fused_poly_sweep(
                        *planes, live.reshape(shp), perms, seed_s,
                        randu, mp, cell_dim=(nxf, nyf, nzf), C=cap_f,
                        R=R_f, box_L=box_Lf, tables=poly_tables,
                        interpret=fused_interp)
                    acc4 = acc4 + out[7]
                    newp = jnp.stack(
                        [out[k].reshape(-1) for k in range(3)],
                        axis=-1)
                    newq = jnp.stack(
                        [out[3 + k].reshape(-1) for k in range(4)],
                        axis=-1)
                    flat = cell_list.reshape(-1)
                    dst = jnp.where(flat < N, flat, N)
                    pos = pos.at[dst].set(newp, mode='drop')
                    quat = quat.at[dst].set(newq, mode='drop')
                counters = dict(counters)
                counters['translate_accept'] = \
                    counters['translate_accept'] + acc4[0]
                counters['translate_reject'] = \
                    counters['translate_reject'] + (acc4[1] - acc4[0])
                counters['rotate_accept'] = \
                    counters['rotate_accept'] + acc4[2]
                counters['rotate_reject'] = \
                    counters['rotate_reject'] + (acc4[3] - acc4[2])
                counters['cell_overflow'] = (counters['cell_overflow']
                                             | cell_ovf)
                return (state.replace(pos=pos, orientation=quat,
                                      timestep=state.timestep + 1),
                        counters)
        elif use_fused:
            from ..rng import step_key as _step_key
            from .pallas_sweep import fused_sphere_sweep
            fused_interp = (jax.default_backend() != 'tpu')
            radii_j = jnp.asarray(radii_np, dtype)
            box_Lf = tuple(float(v) for v in np.asarray(state.box.L))

            n_kernels = max(1, -(-int(self.nselect) // R_f))

            def one_sweep_fused(state, counters, hdyn):
                pos = state.pos
                nacc = jnp.zeros((), jnp.int32)
                ntry = jnp.zeros((), jnp.int32)
                cell_ovf = jnp.zeros((), bool)
                t_pad = jnp.concatenate(
                    [state.typeid, jnp.zeros((1,), jnp.int32)])
                key = _step_key(hdyn['seed'], state.timestep, salt=31)
                for kcall in range(n_kernels):
                    cid, cell_list, ovf = cells_ops.bin_particles(
                        pos, state.box, (nxf, nyf, nzf), cap_f)
                    cell_ovf = cell_ovf | ovf
                    pos_pad = jnp.concatenate(
                        [pos, jnp.zeros((1, 3), dtype)], axis=0)
                    pc = pos_pad[cell_list]       # (ncells, cap, 3)
                    live = (cell_list < N).astype(dtype)
                    shp = (nzf, nyf, nxf * cap_f)
                    px = pc[..., 0].reshape(shp)
                    py = pc[..., 1].reshape(shp)
                    pz = pc[..., 2].reshape(shp)
                    if len(radii_np) == 1:
                        # single type: skip the typeid gathers
                        rad = radii_j[0] * live.reshape(shp)
                        dmv = hdyn['d'][0] * live.reshape(shp)
                    else:
                        tc = t_pad[cell_list]
                        rad = (radii_j[tc] * live).reshape(shp)
                        dmv = (hdyn['d'][tc] * live).reshape(shp)
                    kk = jax.random.fold_in(key, kcall)
                    ks = jax.random.split(kk, R_f + 1)
                    perms = jnp.concatenate(
                        [jax.random.permutation(ks[r], 8)
                         for r in range(R_f)]).astype(jnp.int32)
                    if fused_interp:
                        randu = jax.random.uniform(
                            ks[-1], (R_f * 8, 6, nzf, nyf, nxf), dtype)
                    else:
                        randu = jnp.zeros((1, 1, 1, 1, 1), dtype)
                    seed_s = (hdyn['seed'].astype(jnp.int32)
                              + state.timestep.astype(jnp.int32)
                              * 131071 + kcall * 7919)
                    npx, npy, npz, na, nt = fused_sphere_sweep(
                        px, py, pz, rad, dmv, live.reshape(shp), perms,
                        seed_s, randu, cell_dim=(nxf, nyf, nzf),
                        C=cap_f, R=R_f, box_L=box_Lf,
                        interpret=fused_interp)
                    nacc = nacc + na
                    ntry = ntry + nt
                    newp = jnp.stack(
                        [npx.reshape(-1), npy.reshape(-1),
                         npz.reshape(-1)], axis=-1)
                    flat = cell_list.reshape(-1)
                    dst = jnp.where(flat < N, flat, N)
                    pos = pos.at[dst].set(newp, mode='drop')
                counters = dict(counters)
                counters['translate_accept'] = \
                    counters['translate_accept'] + nacc
                counters['translate_reject'] = \
                    counters['translate_reject'] + (ntry - nacc)
                counters['cell_overflow'] = (counters['cell_overflow']
                                             | cell_ovf)
                return (state.replace(pos=pos,
                                      timestep=state.timestep + 1),
                        counters)

        def run_chunk(state, counters, hdyn, nsteps):
            sweep = (one_sweep_fused if use_fused
                     else one_sweep_dense if use_dense else one_sweep)

            def body(_, carry):
                return sweep(*carry, hdyn)
            return jax.lax.fori_loop(0, nsteps, body, (state, counters))

        def init_counters():
            z = jnp.zeros((), jnp.int32)
            return {'translate_accept': z, 'translate_reject': z,
                    'rotate_accept': z, 'rotate_reject': z,
                    'cell_overflow': jnp.zeros((), bool),
                    'cand_overflow': jnp.zeros((), bool),
                    'depletant_overflow': jnp.zeros((), bool)}

        import jax
        # rebuild thresholds for _set_move_params: growing a move size
        # past the stencil capacity (or enabling rotation classes the
        # trace lacks) needs a recompile; anything else repacks hdyn
        self._built_d = {t: float(d_arr[k]) for k, t in enumerate(types)}
        return {'run_chunk': jax.jit(run_chunk),
                'run_chunk_raw': run_chunk,
                'pack_hdyn': pack_hdyn,
                'init_counters': init_counters,
                'cell_cap': max(cell_cap, cap_f if use_fused else 0),
                'cand_cap': cand_cap,
                'dense': use_dense,
                'fused': use_fused,
                'dep_cap': M_dep}


class sphere(mode_hpmc):
    """Hard spheres (reference hpmc/integrate.py sphere, ShapeSphere.h).
    shape_param.set('A', diameter=1.0)."""

    def __init__(self, seed, d=0.1, nselect=4, implicit=False,
                 move_ratio=0.5):
        mode_hpmc.__init__(self, seed, d=d, nselect=nselect,
                           move_ratio=move_ratio, implicit=implicit)

    def _diameters(self, system):
        return np.array([
            float(self.shape_param[t].get('diameter', 1.0))
            for t in system.particle_types])

    def _circumradii(self, system):
        return 0.5 * self._diameters(system)

    def _interaction_diameter(self, system):
        return float(self._diameters(system).max())

    def _fused_radii(self, system):
        return 0.5 * self._diameters(system)

    def _make_overlap_fn(self, system):
        import jax.numpy as jnp
        diam = self._diameters(system)

        def overlap(dr, ti, tj, state, i_sel, cand, q_i=None, q_j=None):
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


# ---------------------------------------------------------------------------
# Anisotropic shapes: rotation moves + exact separating-axis overlap tests.
#
# The reference tests convex overlaps with XenoCollide MPR
# (hpmc/XenoCollide3D.h) — an iterative, branchy portal refinement that maps
# poorly to vector units.  For convex POLYTOPES the separating-axis theorem
# is exact and completely branch-free: overlap iff no axis among {face
# normals of A, face normals of B, edge x edge} separates the support
# intervals.  Axis counts are static per shape pair, so the whole test is a
# fixed set of dense dot products — the TPU-native replacement.
# ---------------------------------------------------------------------------

def _hull_data(verts):
    """Host-side convex hull features: unique face normals and edge
    direction vectors (deduplicated up to sign)."""
    from scipy.spatial import ConvexHull
    v = np.asarray(verts, dtype=float)
    hull = ConvexHull(v)
    normals = hull.equations[:, :3]
    normals = normals / np.linalg.norm(normals, axis=1, keepdims=True)
    # dedupe up to sign
    def dedupe(rows):
        out = []
        for r in rows:
            if not any(np.allclose(r, o, atol=1e-9)
                       or np.allclose(r, -o, atol=1e-9) for o in out):
                out.append(r)
        return np.array(out)
    normals = dedupe(normals)
    # true hull edges only: Qhull triangulates faces, so an "edge" shared
    # by two COPLANAR triangles is a face-internal diagonal, not a real
    # edge — including it multiplies the SAT cross-axis count (a cube
    # would get 9 edge directions instead of 3, i.e. 81 cross axes
    # instead of 9, and the (M,C,NE^2,3) tensor OOMs large systems)
    edge_owners = {}
    raw_normals = hull.equations[:, :3]
    raw_normals = raw_normals / np.linalg.norm(raw_normals, axis=1,
                                               keepdims=True)
    for si, simplex in enumerate(hull.simplices):
        for a, b in ((0, 1), (1, 2), (2, 0)):
            e = tuple(sorted((simplex[a], simplex[b])))
            edge_owners.setdefault(e, []).append(si)
    edges = []
    for e, owners in edge_owners.items():
        if len(owners) == 2 and np.allclose(
                raw_normals[owners[0]], raw_normals[owners[1]],
                atol=1e-7):
            continue                      # coplanar neighbors: diagonal
        edges.append(e)
    evecs = np.array([v[b] - v[a] for a, b in edges])
    evecs = evecs / np.linalg.norm(evecs, axis=1, keepdims=True)
    evecs = dedupe(evecs)
    return v[hull.vertices], normals, evecs


class _aniso_hpmc(mode_hpmc):
    """Shared machinery for shapes with rotation moves."""

    def _has_rotation(self):
        return True

    def _build_program(self, system):
        prog = mode_hpmc._build_program(self, system)
        return prog

    # rotation moves are woven into sub_sweep via _trial_orientation
    def _make_trial_rotation(self, system, dtype):
        import jax
        import jax.numpy as jnp
        from ..ops import quat as Q
        def trial(key, q_old, ti, delta_ok, hdyn):
            """Either translate (handled by caller) or rotate: returns
            (new_q, rotate_mask).  reference Moves.h move_rotate.
            Rotation size a and the move ratio ride hdyn (traced)."""
            k1, k2, k3 = jax.random.split(key, 3)
            m = q_old.shape[0]
            u = jax.random.uniform(k1, (m,), dtype=dtype)
            do_rot = u > hdyn['mr']
            g = jax.random.normal(k2, (m, 3), dtype=dtype)
            axis = g / jnp.maximum(
                jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
            ang = jax.random.uniform(k3, (m,), dtype=dtype,
                                     minval=-1.0, maxval=1.0) \
                * hdyn['a'][ti]
            half = 0.5 * ang
            dq = jnp.concatenate([jnp.cos(half)[:, None],
                                  jnp.sin(half)[:, None] * axis], axis=1)
            q_new = Q.normalize(Q.multiply(dq, q_old))
            return q_new, do_rot
        return trial


class convex_polyhedron(_aniso_hpmc):
    """Hard convex polyhedra (reference hpmc.integrate.convex_polyhedron,
    ShapeConvexPolyhedron.h) with SAT overlap tests.
    shape_param.set('A', vertices=[(x,y,z), ...])."""

    def __init__(self, seed, d=0.1, a=0.1, move_ratio=0.5, nselect=4,
                 implicit=False, max_verts=None):
        _aniso_hpmc.__init__(self, seed, d=d, a=a, move_ratio=move_ratio,
                             nselect=nselect, implicit=implicit)

    def _shape_tables(self, system):
        import jax.numpy as jnp
        types = system.particle_types
        hulls = []
        for t in types:
            verts = self.shape_param[t].get('vertices')
            if verts is None:
                raise RuntimeError(f"convex_polyhedron: no vertices set "
                                   f"for type {t!r}")
            hulls.append(_hull_data(verts))
        NV = max(len(h[0]) for h in hulls)
        NF = max(len(h[1]) for h in hulls)
        NE = max(len(h[2]) for h in hulls)
        nt = len(types)
        V = np.zeros((nt, NV, 3))
        Fn = np.zeros((nt, NF, 3))
        E = np.zeros((nt, NE, 3))
        nv = np.zeros(nt, np.int32)
        for i, (v, f, e) in enumerate(hulls):
            V[i, :len(v)] = v
            # pad with repeats of the first vertex so supports are exact
            V[i, len(v):] = v[0]
            Fn[i, :len(f)] = f
            Fn[i, len(f):] = f[0]
            E[i, :len(e)] = e
            E[i, len(e):] = e[0]
            nv[i] = len(v)
        return (jnp.asarray(V, jnp.float32), jnp.asarray(Fn, jnp.float32),
                jnp.asarray(E, jnp.float32))

    def _interaction_diameter(self, system):
        types = system.particle_types
        r = 0.0
        for t in types:
            verts = np.asarray(self.shape_param[t].get('vertices'))
            r = max(r, float(np.linalg.norm(verts, axis=1).max()))
        return 2.0 * r

    def _fused_poly_tables(self, system):
        types = system.particle_types
        if len(types) != 1:
            return None
        verts = self.shape_param[types[0]].get('vertices')
        if verts is None:
            return None
        v, f, e = _hull_data(verts)
        # code-size bound: the SAT axis loops are fully unrolled in the
        # kernel (NF + NF + NE^2 axes, NV-way supports each)
        if len(v) > 8 or len(f) > 8 or len(e) > 6:
            return None
        return (tuple(map(tuple, v.tolist())),
                tuple(map(tuple, f.tolist())),
                tuple(map(tuple, e.tolist())))

    def _make_overlap_fn(self, system):
        import jax.numpy as jnp
        from ..ops import quat as Q
        V, Fn, E = self._shape_tables(system)

        def overlap(dr, ti, tj, state, i_sel, cand, q_i=None, q_j=None):
            """SAT over face normals of both shapes + edge cross products.
            dr = x_i - x_j (M, C, 3); q_i (M,1,4), q_j (M,C,4)."""
            qi = q_i[:, None, None, :]                  # (M,1,1,4)
            qj = q_j[..., None, :]                      # (M,C,1,4)
            vi = Q.rotate(qi, V[ti])                    # (M,1,NV,3)
            vj = Q.rotate(qj, V[tj])                    # (M,C,NV,3)
            ni = Q.rotate(qi, Fn[ti])                   # (M,1,NF,3)
            nj = Q.rotate(qj, Fn[tj])
            ei = Q.rotate(qi, E[ti])                    # (M,1,NE,3)
            ej = Q.rotate(qj, E[tj])
            NE_ = ei.shape[-2]
            # cross-product axes (M,C,NE,NE,3)
            cross = jnp.cross(ei[..., :, None, :], ej[..., None, :, :])
            cross = cross.reshape(cross.shape[:-3]
                                  + (NE_ * NE_, 3))
            axes = jnp.concatenate(
                [jnp.broadcast_to(ni, nj.shape[:-2] + ni.shape[-2:]),
                 nj, cross], axis=-2)                    # (M,C,NA,3)
            # degenerate cross products (parallel edges): harmless — the
            # axis is ~0 so both intervals collapse to ~0 and never
            # separate; real separating axes are always among the rest
            # support intervals: A centered at dr, B at origin.
            # Precision.HIGHEST (bf16x3): these einsums hit the MXU,
            # whose single-pass bf16 quantizes the projections to ~8
            # mantissa bits — measured as 56 PHANTOM overlaps (depth
            # ~1e-3, f64 SAT says zero) on a valid N=4096 cube config
            # on TPU, which would invalidate EOS gates and falsely
            # veto moves
            import jax as _jax
            HI = _jax.lax.Precision.HIGHEST
            pa = jnp.einsum('...ak,...vk->...av', axes,
                            jnp.broadcast_to(
                                vi, axes.shape[:-2] + vi.shape[-2:]),
                            precision=HI)
            pb = jnp.einsum('...ak,...vk->...av', axes, vj,
                            precision=HI)
            da = jnp.einsum('...ak,...k->...a', axes, dr,
                            precision=HI)
            a_lo = jnp.min(pa, axis=-1) + da
            a_hi = jnp.max(pa, axis=-1) + da
            b_lo = jnp.min(pb, axis=-1)
            b_hi = jnp.max(pb, axis=-1)
            sep = (a_lo > b_hi + 1e-7) | (b_lo > a_hi + 1e-7)
            return ~jnp.any(sep, axis=-1)
        return overlap


class sphere_union(_aniso_hpmc):
    """Union of spheres (reference ShapeUnion<ShapeSphere>,
    hpmc.integrate.sphere_union): shape_param.set('A',
    diameters=[...], centers=[(x,y,z), ...])."""

    def __init__(self, seed, d=0.1, a=0.1, move_ratio=0.5, nselect=4):
        _aniso_hpmc.__init__(self, seed, d=d, a=a, move_ratio=move_ratio,
                             nselect=nselect)

    def _tables(self, system):
        import jax.numpy as jnp
        types = system.particle_types
        ns = max(len(self.shape_param[t].get('centers', [(0, 0, 0)]))
                 for t in types)
        nt = len(types)
        C = np.zeros((nt, ns, 3))
        R = np.zeros((nt, ns))      # zero radius = inert padding
        for i, t in enumerate(types):
            cs = np.asarray(self.shape_param[t].get('centers',
                                                    [(0, 0, 0)]))
            ds = np.asarray(self.shape_param[t].get(
                'diameters', [1.0] * len(cs)))
            C[i, :len(cs)] = cs
            R[i, :len(cs)] = ds / 2.0
        return jnp.asarray(C, jnp.float32), jnp.asarray(R, jnp.float32)

    def _interaction_diameter(self, system):
        C, R = self._tables(system)
        return 2.0 * float((np.linalg.norm(np.asarray(C), axis=2)
                            + np.asarray(R)).max())

    def _make_overlap_fn(self, system):
        import jax.numpy as jnp
        from ..ops import quat as Q
        C, R = self._tables(system)

        def overlap(dr, ti, tj, state, i_sel, cand, q_i=None, q_j=None):
            ci = Q.rotate(q_i[:, None, None, :], C[ti])   # (M,1,S,3)
            cj = Q.rotate(q_j[..., None, :], C[tj])       # (M,C,S,3)
            ri = R[ti]                                    # (M,1,S)
            rj = R[tj]                                    # (M,C,S)
            d = (dr[..., None, None, :] + ci[..., :, None, :]
                 - cj[..., None, :, :])                   # (M,C,S,S,3)
            r2 = jnp.sum(d * d, axis=-1)
            rsum = ri[..., :, None] + rj[..., None, :]
            hit = (r2 < rsum * rsum) & (ri[..., :, None] > 0) \
                & (rj[..., None, :] > 0)
            return jnp.any(hit, axis=(-1, -2))
        return overlap


class sphinx(_aniso_hpmc):
    """Sphinx particles — intersections of positive spheres and
    complements of negative ('dimple') spheres (reference
    hpmc.integrate.sphinx, hpmc/ShapeSphinx.h:181, integrate.py:1536).
    shape_param.set('A', centers=[(x,y,z), ...], diameters=[d0, d1, ...])
    with negative diameters marking dimples.  Overlap: E.R. Chen's
    sphere-arrangement separation algebra, vectorized over all subsets
    of size <= 4 of the combined sphere set (see sphinx_overlap.py)."""

    def __init__(self, seed, d=0.1, a=0.1, move_ratio=0.5, nselect=4):
        _aniso_hpmc.__init__(self, seed, d=d, a=a, move_ratio=move_ratio,
                             nselect=nselect)

    def _tables(self, system):
        import jax.numpy as jnp
        types = system.particle_types
        ns = max(len(self.shape_param[t].get('centers', [(0, 0, 0)]))
                 for t in types)
        nt = len(types)
        C = np.zeros((nt, ns, 3))
        R = np.zeros((nt, ns))      # signed radii; zero = inert padding
        for i, t in enumerate(types):
            cs = np.asarray(self.shape_param[t].get('centers',
                                                    [(0, 0, 0)]),
                            np.float64).reshape(-1, 3)
            ds = np.asarray(self.shape_param[t].get(
                'diameters', [1.0] * len(cs)), np.float64)
            C[i, :len(cs)] = cs
            R[i, :len(cs)] = ds / 2.0
        return jnp.asarray(C, jnp.float32), jnp.asarray(R, jnp.float32)

    def _interaction_diameter(self, system):
        # circumsphere: max over positive spheres of |center| + radius
        C, R = self._tables(system)
        Cn, Rn = np.asarray(C), np.asarray(R)
        reach = np.where(Rn > 0, np.linalg.norm(Cn, axis=2) + Rn, 0.0)
        return 2.0 * float(reach.max())

    def _make_overlap_fn(self, system):
        import jax.numpy as jnp
        from ..ops import quat as Q
        from .sphinx_overlap import arrangement_separated, subset_tables
        C, R = self._tables(system)
        S = C.shape[1]
        tables = subset_tables(2 * S)

        def overlap(dr, ti, tj, state, i_sel, cand, q_i=None, q_j=None):
            M, Cc = dr.shape[:2]
            ci = Q.rotate(q_i[:, None, None, :],
                          C[ti].reshape(M, 1, S, 3))       # (M,1,S,3)
            cj = Q.rotate(q_j[..., None, :],
                          C[tj].reshape(M, Cc, S, 3))      # (M,C,S,3)
            # combined arrangement in i's frame: j's spheres at cj - dr
            pos = jnp.concatenate(
                [jnp.broadcast_to(ci, (M, Cc, S, 3)),
                 cj - dr[..., None, :]], axis=-2)          # (M,C,2S,3)
            ri = jnp.broadcast_to(R[ti].reshape(M, 1, S), (M, Cc, S))
            rj = R[tj].reshape(M, Cc, S)
            r = jnp.concatenate([ri, rj], axis=-1)         # (M,C,2S)
            valid = r != 0.0
            sgn = jnp.where(r < 0, -1.0, 1.0)
            sep = arrangement_separated(pos, r * r, sgn, valid, tables)
            return ~sep
        return overlap


class convex_polygon(_aniso_hpmc):
    """Hard convex polygons, 2D (reference hpmc.integrate.convex_polygon,
    ShapeConvexPolygon.h): SAT over the edge normals of both shapes —
    exact for convex polygons.  shape_param.set('A',
    vertices=[(x, y), ...]) counter-clockwise."""

    def __init__(self, seed, d=0.1, a=0.1, move_ratio=0.5, nselect=4):
        _aniso_hpmc.__init__(self, seed, d=d, a=a, move_ratio=move_ratio,
                             nselect=nselect)

    def _tables(self, system):
        import jax.numpy as jnp
        types = system.particle_types
        NV = max(len(self.shape_param[t].get('vertices', [(0, 0)]))
                 for t in types)
        nt = len(types)
        V = np.zeros((nt, NV, 3))
        Nrm = np.zeros((nt, NV, 3))
        for i, t in enumerate(types):
            v2 = np.asarray(self.shape_param[t].get('vertices'),
                            dtype=float)
            n = len(v2)
            V[i, :n, :2] = v2
            V[i, n:, :2] = v2[0]
            e = np.roll(v2, -1, axis=0) - v2      # edge vectors, ccw
            nrm = np.stack([e[:, 1], -e[:, 0]], axis=1)
            nrm /= np.maximum(np.linalg.norm(nrm, axis=1,
                                             keepdims=True), 1e-12)
            Nrm[i, :n, :2] = nrm
            Nrm[i, n:, :2] = nrm[0]
        return jnp.asarray(V, jnp.float32), jnp.asarray(Nrm, jnp.float32)

    def _interaction_diameter(self, system):
        types = system.particle_types
        r = 0.0
        for t in types:
            v = np.asarray(self.shape_param[t].get('vertices'))
            r = max(r, float(np.linalg.norm(v, axis=1).max()))
        return 2.0 * r

    def _make_overlap_fn(self, system):
        import jax.numpy as jnp
        from ..ops import quat as Q
        V, Nrm = self._tables(system)

        def overlap(dr, ti, tj, state, i_sel, cand, q_i=None, q_j=None):
            qi = q_i[:, None, None, :]
            qj = q_j[..., None, :]
            vi = Q.rotate(qi, V[ti])
            vj = Q.rotate(qj, V[tj])
            ni = Q.rotate(qi, Nrm[ti])
            nj = Q.rotate(qj, Nrm[tj])
            axes = jnp.concatenate(
                [jnp.broadcast_to(ni, nj.shape[:-2] + ni.shape[-2:]),
                 nj], axis=-2)
            import jax as _jax
            HI = _jax.lax.Precision.HIGHEST
            # bf16x3: MXU einsum quantization creates phantom overlaps
            pa = jnp.einsum('...ak,...vk->...av', axes,
                            jnp.broadcast_to(
                                vi, axes.shape[:-2] + vi.shape[-2:]),
                            precision=HI)
            pb = jnp.einsum('...ak,...vk->...av', axes, vj,
                            precision=HI)
            da = jnp.einsum('...ak,...k->...a', axes, dr, precision=HI)
            sep = ((jnp.min(pa, -1) + da > jnp.max(pb, -1) + 1e-7)
                   | (jnp.min(pb, -1) > jnp.max(pa, -1) + da + 1e-7))
            return ~jnp.any(sep, axis=-1)
        return overlap


class simple_polygon(convex_polygon):
    """General simple (possibly non-convex) polygons (reference
    hpmc.integrate.simple_polygon, ShapeSimplePolygon.h): overlap = any
    boundary edge pair crosses, or one polygon\'s reference vertex lies
    inside the other (2D ray-parity) — exact for simple polygons, no
    convex decomposition needed."""

    def _tables_counted(self, system):
        import jax.numpy as jnp
        types = system.particle_types
        NV = max(len(self.shape_param[t].get('vertices', [(0, 0)]))
                 for t in types)
        nt = len(types)
        V = np.zeros((nt, NV, 3))
        cnt = np.zeros((nt,), np.int32)
        for i, t in enumerate(types):
            v2 = np.asarray(self.shape_param[t].get('vertices'),
                            dtype=float)
            n = len(v2)
            V[i, :n, :2] = v2
            V[i, n:, :2] = v2[0]
            cnt[i] = n
        return jnp.asarray(V, jnp.float32), jnp.asarray(cnt)

    def _make_overlap_fn(self, system):
        import jax.numpy as jnp
        from ..ops import quat as Q
        V, counts = self._tables_counted(system)
        NV = V.shape[1]

        def edges_of(v, cnt):
            kv = jnp.arange(NV)
            nxt = jnp.where(kv + 1 < cnt[..., None], kv + 1, 0)
            p1 = jnp.take_along_axis(
                v, jnp.broadcast_to(nxt[..., None], v.shape), axis=-2)
            mask = kv < cnt[..., None]
            return v, p1, mask

        def seg_cross(a0, a1, b0, b1):
            """2D segment intersection (xy components), branch-free."""
            def orient(p, q, r):
                return ((q[..., 0] - p[..., 0])
                        * (r[..., 1] - p[..., 1])
                        - (q[..., 1] - p[..., 1])
                        * (r[..., 0] - p[..., 0]))
            d1 = orient(b0, b1, a0)
            d2 = orient(b0, b1, a1)
            d3 = orient(a0, a1, b0)
            d4 = orient(a0, a1, b1)
            return (d1 * d2 < 0) & (d3 * d4 < 0)

        def parity_inside(p, v, p1, mask):
            """2D point-in-polygon by crossing parity along +x-ish ray
            with an irrational slope."""
            sl = 0.4793021
            x0, y0 = p[..., 0], p[..., 1]
            # edge endpoints relative to ray coords u = x - x0,
            # w = y - y0 - sl*(x - x0); crossing iff w changes sign with
            # the intersection at u > 0
            ua = v[..., 0] - x0[..., None]
            wa = v[..., 1] - y0[..., None] - sl * ua
            ub = p1[..., 0] - x0[..., None]
            wb = p1[..., 1] - y0[..., None] - sl * ub
            t = wa / jnp.where(jnp.abs(wa - wb) > 1e-12, wa - wb, 1.0)
            u_at = ua + t * (ub - ua)
            crossing = (wa * wb < 0) & (u_at > 0) & mask
            return jnp.sum(jnp.where(crossing, 1, 0), -1) % 2 == 1

        def overlap(dr, ti, tj, state, i_sel, cand, q_i=None, q_j=None):
            qi = q_i[:, None, None, :]
            qj = q_j[..., None, :]
            vi = Q.rotate(qi, V[ti]) + dr[..., None, :]   # (M,C,NV,3)
            vj = Q.rotate(qj, V[tj])
            ci = jnp.broadcast_to(counts[ti], vi.shape[:-2])
            cj = counts[tj]
            vi0, vi1, mi = edges_of(vi, ci)
            vj0, vj1, mj = edges_of(vj, cj)
            cross = seg_cross(vi0[..., :, None, :], vi1[..., :, None, :],
                              vj0[..., None, :, :], vj1[..., None, :, :])
            cross = cross & mi[..., :, None] & mj[..., None, :]
            any_cross = jnp.any(cross, axis=(-1, -2))
            inside = parity_inside(vi[..., 0, :], vj, vj1, mj) \
                | parity_inside(vj[..., 0, :], vi, vi1, mi)
            return any_cross | inside
        return overlap


class _gjk_shape(_aniso_hpmc):
    """Shared machinery for shapes tested with batched GJK distance
    (hpmc/gjk.py): overlap iff the certified distance lower bound between
    the convex cores is <= the summed sweep radii.  Ties inside the GJK
    tolerance band resolve toward overlap (MC-safe: never accepts a move
    the exact test would reject)."""

    def _core_support(self, system, t_table, q, t):
        """Return (support_fn, 'any point' seed offset fn)."""
        raise NotImplementedError

    def _sweep_radius_table(self, system):
        raise NotImplementedError

    def _make_overlap_fn(self, system):
        import jax.numpy as jnp
        from .gjk import gjk_distance
        Rs = self._sweep_radius_table(system)

        def overlap(dr, ti, tj, state, i_sel, cand, q_i=None, q_j=None):
            # batch (M, C)
            M, Cc = dr.shape[:2]
            qi = jnp.broadcast_to(q_i[:, None, :], (M, Cc, 4))
            supA, seedA = self._core_support(system, qi, ti)
            supB, seedB = self._core_support(system, q_j, tj)

            def sup(d):
                return dr + supA(d) - supB(-d)
            x0 = dr + seedA - seedB
            lo, hi = gjk_distance(sup, x0)
            rsum = Rs[ti] + Rs[tj]
            return lo <= rsum + 1e-6
        return overlap


class ellipsoid(_gjk_shape):
    """Hard ellipsoids (reference hpmc.integrate.ellipsoid,
    ShapeEllipsoid.h — the reference uses XenoCollide MPR; here batched
    GJK over the closed-form ellipsoid support function).
    shape_param.set('A', a=..., b=..., c=...)."""

    def __init__(self, seed, d=0.1, a=0.1, move_ratio=0.5, nselect=4,
                 implicit=False):
        _gjk_shape.__init__(self, seed, d=d, a=a, move_ratio=move_ratio,
                            nselect=nselect)

    def _abc_table(self, system):
        import jax.numpy as jnp
        types = system.particle_types
        A = np.zeros((len(types), 3))
        for i, t in enumerate(types):
            p = self.shape_param[t]
            for k, nm in enumerate(('a', 'b', 'c')):
                v = p.get(nm)
                if v is None:
                    raise RuntimeError(
                        f"ellipsoid: semi-axis {nm} not set for {t!r}")
                A[i, k] = v
        return jnp.asarray(A, jnp.float32)

    def _interaction_diameter(self, system):
        return 2.0 * float(np.asarray(self._abc_table(system)).max())

    def _sweep_radius_table(self, system):
        import jax.numpy as jnp
        return jnp.zeros((len(system.particle_types),), jnp.float32)

    def _core_support(self, system, q, t):
        import jax.numpy as jnp
        from .gjk import ellipsoid_support
        abc = self._abc_table(system)[t]
        return ellipsoid_support(q, abc), jnp.zeros_like(abc)


class convex_spheropolyhedron(_gjk_shape):
    """Convex spheropolyhedra = convex polytope swept by a sphere
    (reference hpmc.integrate.convex_spheropolyhedron,
    ShapeSpheropolyhedron.h).  Includes spherocylinders (2 vertices) and
    spheres (1 vertex).  shape_param.set('A', vertices=[...],
    sweep_radius=R)."""

    def __init__(self, seed, d=0.1, a=0.1, move_ratio=0.5, nselect=4,
                 implicit=False, max_verts=None):
        _gjk_shape.__init__(self, seed, d=d, a=a, move_ratio=move_ratio,
                            nselect=nselect)

    _dim = 3

    def _vert_table(self, system):
        import jax.numpy as jnp
        types = system.particle_types
        nv = max(max(len(self.shape_param[t].get('vertices',
                                                 [(0, 0, 0)])), 1)
                 for t in types)
        V = np.zeros((len(types), nv, 3))
        for i, t in enumerate(types):
            v = np.asarray(self.shape_param[t].get('vertices',
                                                   [(0, 0, 0)]),
                           dtype=float)
            if v.ndim == 1:
                v = v[None]
            if self._dim == 2:
                v3 = np.zeros((len(v), 3))
                v3[:, :2] = v[:, :2]
                v = v3
            V[i, :len(v)] = v
            V[i, len(v):] = v[0]      # pad with a real vertex
        return jnp.asarray(V, jnp.float32)

    def _sweep_radius_table(self, system):
        import jax.numpy as jnp
        types = system.particle_types
        R = np.array([float(self.shape_param[t].get('sweep_radius', 0.0))
                      for t in types])
        return jnp.asarray(R, jnp.float32)

    def _interaction_diameter(self, system):
        V = np.asarray(self._vert_table(system))
        R = np.asarray(self._sweep_radius_table(system))
        return 2.0 * float((np.linalg.norm(V, axis=2).max(axis=1)
                            + R).max())

    def _core_support(self, system, q, t):
        import jax.numpy as jnp
        from ..ops import quat as Q
        from .gjk import polytope_support
        V = self._vert_table(system)[t]              # (..., NV, 3)
        vw = Q.rotate(q[..., None, :], V)            # world frame
        return polytope_support(vw), vw[..., 0, :]


class convex_spheropolygon(convex_spheropolyhedron):
    """2D convex spheropolygons (reference ShapeSpheropolygon.h):
    vertices in the xy plane + sweep_radius; rounded discs from a single
    vertex.  Same GJK machinery with z = 0."""
    _dim = 2


class convex_polyhedron_union(_aniso_hpmc):
    """Union of convex polyhedra (reference ShapeUnion<ShapeConvexPolyhedron>,
    hpmc.integrate.convex_polyhedron_union): member polytopes at body-frame
    positions/orientations; overlap iff ANY member pair overlaps (pairwise
    batched GJK).  shape_param.set('A', vertices=[[...], [...]],
    centers=[(x,y,z), ...], orientations=[(w,x,y,z), ...])."""

    def __init__(self, seed, d=0.1, a=0.1, move_ratio=0.5, nselect=4,
                 capacity=4):
        _aniso_hpmc.__init__(self, seed, d=d, a=a, move_ratio=move_ratio,
                             nselect=nselect)

    def _tables(self, system):
        import jax.numpy as jnp
        types = system.particle_types
        nm = max(len(self.shape_param[t].get('centers', [(0, 0, 0)]))
                 for t in types)
        nv = 1
        for t in types:
            for vv in self.shape_param[t].get('vertices', [[(0, 0, 0)]]):
                nv = max(nv, len(vv))
        nt = len(types)
        V = np.zeros((nt, nm, nv, 3))
        C = np.zeros((nt, nm, 3))
        Q = np.zeros((nt, nm, 4))
        Q[..., 0] = 1.0
        ACT = np.zeros((nt, nm), bool)
        for i, t in enumerate(types):
            p = self.shape_param[t]
            cs = np.asarray(p.get('centers', [(0, 0, 0)]), float)
            vs = p.get('vertices')
            if vs is None:
                raise RuntimeError(
                    f"convex_polyhedron_union: vertices not set for "
                    f"{t!r}")
            qs = np.asarray(p.get('orientations',
                                  [(1, 0, 0, 0)] * len(cs)), float)
            for m, vv in enumerate(vs):
                vv = np.asarray(vv, float)
                V[i, m, :len(vv)] = vv
                V[i, m, len(vv):] = vv[0]
                C[i, m] = cs[m]
                Q[i, m] = qs[m]
                ACT[i, m] = True
        return (jnp.asarray(V, jnp.float32), jnp.asarray(C, jnp.float32),
                jnp.asarray(Q, jnp.float32), jnp.asarray(ACT))

    def _interaction_diameter(self, system):
        V, C, Q, ACT = self._tables(system)
        V, C = np.asarray(V), np.asarray(C)
        r = (np.linalg.norm(C, axis=-1)
             + np.linalg.norm(V, axis=-1).max(-1)) * np.asarray(ACT)
        return 2.0 * float(r.max())

    def _make_overlap_fn(self, system):
        import jax.numpy as jnp
        from ..ops import quat as Q_ops
        from .gjk import gjk_distance, polytope_support
        V, C, Qm, ACT = self._tables(system)
        nm = V.shape[1]

        def overlap(dr, ti, tj, state, i_sel, cand, q_i=None, q_j=None):
            M, Cc = dr.shape[:2]
            qi = jnp.broadcast_to(q_i[:, None, :], (M, Cc, 4))
            qj = q_j
            hit = jnp.zeros((M, Cc), bool)
            for ma in range(nm):
                qa = Q_ops.multiply(qi, Qm[ti][..., ma, :])
                ca = Q_ops.rotate(qi, C[ti][..., ma, :])
                va = Q_ops.rotate(qa[..., None, :], V[ti][..., ma, :, :])
                act_a = ACT[ti][..., ma]
                for mb in range(nm):
                    qb = Q_ops.multiply(qj, Qm[tj][..., mb, :])
                    cb = Q_ops.rotate(qj, C[tj][..., mb, :])
                    vb = Q_ops.rotate(qb[..., None, :],
                                      V[tj][..., mb, :, :])
                    act = act_a & ACT[tj][..., mb]
                    d_ab = dr + ca - cb
                    supA = polytope_support(va)
                    supB = polytope_support(vb)

                    def sup(d, supA=supA, supB=supB, d_ab=d_ab):
                        return d_ab + supA(d) - supB(-d)
                    x0 = d_ab + va[..., 0, :] - vb[..., 0, :]
                    lo, hi = gjk_distance(sup, x0)
                    hit = hit | (act & (lo <= 1e-6))
            return hit
        return overlap


class polyhedron(_aniso_hpmc):
    """General (possibly non-convex) triangle-mesh polyhedra (reference
    hpmc.integrate.polyhedron, ShapePolyhedron.h — the reference walks a
    GPUTree of triangles; here the test is a dense vectorized sweep,
    adequate for the modest face counts HPMC shapes use).

    Overlap = any edge of one mesh crosses a triangle of the other
    (non-coplanar surface intersection), or one mesh's reference vertex
    lies inside the other (ray-parity containment).
    shape_param.set('A', vertices=[...], faces=[[i,j,k], ...])."""

    def __init__(self, seed, d=0.1, a=0.1, move_ratio=0.5, nselect=4):
        _aniso_hpmc.__init__(self, seed, d=d, a=a, move_ratio=move_ratio,
                             nselect=nselect)

    def _tables(self, system):
        import jax.numpy as jnp
        types = system.particle_types
        nf = 1
        for t in types:
            f = self.shape_param[t].get('faces')
            if f is None:
                raise RuntimeError(
                    f"polyhedron: faces not set for {t!r}")
            nf = max(nf, len(f))
        nt = len(types)
        FAR = 1e6
        TRI = np.full((nt, nf, 3, 3), FAR)
        V0 = np.zeros((nt, 3))
        for i, t in enumerate(types):
            v = np.asarray(self.shape_param[t].get('vertices'), float)
            f = np.asarray(self.shape_param[t].get('faces'), int)
            TRI[i, :len(f)] = v[f]
            V0[i] = v[0]
        return jnp.asarray(TRI, jnp.float32), jnp.asarray(V0, jnp.float32)

    def _interaction_diameter(self, system):
        out = 0.0
        for t in system.particle_types:
            v = np.asarray(self.shape_param[t].get('vertices'))
            out = max(out, float(np.linalg.norm(v, axis=1).max()))
        return 2.0 * out

    def _make_overlap_fn(self, system):
        import jax.numpy as jnp
        from ..ops import quat as Q
        TRI, V0 = self._tables(system)

        def seg_tri_cross(p, q, a, b, c):
            """Does segment p->q cross triangle abc?  Branch-free:
            plane crossing with t in (0,1) + barycentric containment.
            Degenerate padding triangles have zero normal -> excluded."""
            n = jnp.cross(b - a, c - a)
            nn = jnp.sum(n * n, -1)
            denom = jnp.sum(n * (q - p), -1)
            t = jnp.sum(n * (a - p), -1) / jnp.where(
                jnp.abs(denom) > 1e-12, denom, 1.0)
            x = p + t[..., None] * (q - p)
            s1 = jnp.sum(jnp.cross(b - x, c - x) * n, -1)
            s2 = jnp.sum(jnp.cross(c - x, a - x) * n, -1)
            s3 = jnp.sum(jnp.cross(a - x, b - x) * n, -1)
            inside = (s1 >= 0) & (s2 >= 0) & (s3 >= 0)
            return inside & (t > 0) & (t < 1) \
                & (jnp.abs(denom) > 1e-12) & (nn > 1e-12)

        def ray_parity_inside(p, tri):
            """Point containment by ray parity: tri (..., F, 3, 3).
            The ray direction is deliberately irrational so axis-aligned
            meshes never put it exactly on an edge/diagonal."""
            ray = jnp.asarray([0.8775825, 0.42073549, 0.22984884])
            a = tri[..., 0, :]
            b = tri[..., 1, :]
            c = tri[..., 2, :]
            n = jnp.cross(b - a, c - a)
            denom = jnp.sum(n * ray, -1)
            t = jnp.sum(n * (a - p[..., None, :]), -1) / jnp.where(
                jnp.abs(denom) > 1e-12, denom, 1.0)
            x = p[..., None, :] + t[..., None] * ray
            s1 = jnp.sum(jnp.cross(b - x, c - x) * n, -1)
            s2 = jnp.sum(jnp.cross(c - x, a - x) * n, -1)
            s3 = jnp.sum(jnp.cross(a - x, b - x) * n, -1)
            hitf = (s1 >= 0) & (s2 >= 0) & (s3 >= 0) & (t > 0) \
                & (jnp.abs(denom) > 1e-12)
            return jnp.sum(jnp.where(hitf, 1, 0), -1) % 2 == 1

        def overlap(dr, ti, tj, state, i_sel, cand, q_i=None, q_j=None):
            M, Cc = dr.shape[:2]
            qi = jnp.broadcast_to(q_i[:, None, :], (M, Cc, 4))
            tri_i = Q.rotate(qi[..., None, None, :], TRI[ti]) \
                + dr[..., None, None, :]
            tri_j = Q.rotate(q_j[..., None, None, :], TRI[tj])

            def edges_cross(tA, tB):
                # all 3 edges of every A-triangle vs every B-triangle
                hit = jnp.zeros(tA.shape[:-3] + (1,), bool)[..., 0]
                out = False
                for e in range(3):
                    p = tA[..., :, None, e, :]
                    q = tA[..., :, None, (e + 1) % 3, :]
                    a = tB[..., None, :, 0, :]
                    b = tB[..., None, :, 1, :]
                    c = tB[..., None, :, 2, :]
                    h = seg_tri_cross(p, q, a, b, c)
                    out = h if out is False else (out | h)
                return jnp.any(out, axis=(-1, -2))
            cross = edges_cross(tri_i, tri_j) | edges_cross(tri_j, tri_i)
            # containment: A's reference vertex inside B or vice versa
            va0 = Q.rotate(qi, V0[ti]) + dr
            vb0 = Q.rotate(q_j, V0[tj])
            inside = ray_parity_inside(va0, tri_j) \
                | ray_parity_inside(vb0, tri_i)
            return cross | inside
        return overlap


class faceted_sphere(_gjk_shape):
    """Sphere truncated by halfspaces n_i . x + b_i <= 0 (reference
    hpmc.integrate.faceted_sphere, ShapeFacetedSphere.h:104-200).  The
    support function enumerates the same candidates as the reference —
    sphere point, per-plane sphere-circle points, precomputed
    plane-plane-sphere vertices, user vertices — picks the valid one
    with the largest projection, and feeds batched GJK.
    shape_param.set('A', normals=[(nx,ny,nz), ...], offsets=[b, ...],
    diameter=D, vertices=[...] (optional), origin=(0,0,0))."""

    def __init__(self, seed, d=0.1, a=0.1, move_ratio=0.5, nselect=4):
        _gjk_shape.__init__(self, seed, d=d, a=a, move_ratio=move_ratio,
                            nselect=nselect)

    def _ftables(self, system):
        import jax.numpy as jnp
        types = system.particle_types
        nt = len(types)
        NP = max(len(self.shape_param[t].get('normals', [])) or 1
                 for t in types)
        NVu = max(len(self.shape_param[t].get('vertices', [])) or 1
                  for t in types)
        NA = 1
        add_all = []
        for t in types:
            p = self.shape_param[t]
            n = np.asarray(p.get('normals', []), float).reshape(-1, 3)
            b = np.asarray(p.get('offsets', []), float).reshape(-1)
            R = float(p.get('diameter', 1.0)) / 2.0
            # plane-plane-sphere intersection vertices (reference
            # initializeVertices, ShapeFacetedSphere.h:272-310)
            verts = []
            for i in range(len(n)):
                for j in range(i + 1, len(n)):
                    ni, nj = n[i], n[j]
                    u = np.cross(ni, nj)
                    uu = np.dot(u, u)
                    if uu < 1e-12:
                        continue
                    # point on the intersection line closest to origin
                    A = np.array([ni, nj, u])
                    rhs = np.array([-b[i], -b[j], 0.0])
                    try:
                        x0 = np.linalg.solve(A, rhs)
                    except np.linalg.LinAlgError:
                        continue
                    h2 = R * R - np.dot(x0, x0)
                    if h2 <= 0:
                        continue
                    step = np.sqrt(h2 / uu) * u
                    for v in (x0 + step, x0 - step):
                        ok = all(np.dot(n[k], v) + b[k] <= 1e-9
                                 for k in range(len(n))
                                 if k not in (i, j))
                        if ok:
                            verts.append(v)
            add_all.append(verts)
            NA = max(NA, len(verts) or 1)
        Nrm = np.zeros((nt, NP, 3))
        Off = np.full((nt, NP), -1e9)    # inactive planes never cut
        Rad = np.ones((nt,))
        Org = np.zeros((nt, 3))
        AV = np.zeros((nt, NA, 3))
        AVm = np.zeros((nt, NA), bool)
        UV = np.zeros((nt, NVu, 3))
        UVm = np.zeros((nt, NVu), bool)
        for i, t in enumerate(types):
            p = self.shape_param[t]
            n = np.asarray(p.get('normals', []), float).reshape(-1, 3)
            b = np.asarray(p.get('offsets', []), float).reshape(-1)
            Nrm[i, :len(n)] = n
            Off[i, :len(n)] = b
            Rad[i] = float(p.get('diameter', 1.0)) / 2.0
            Org[i] = np.asarray(p.get('origin', (0, 0, 0)), float)
            for k, v in enumerate(add_all[i]):
                AV[i, k] = v
                AVm[i, k] = True
            uv = np.asarray(p.get('vertices', []),
                            float).reshape(-1, 3)
            UV[i, :len(uv)] = uv
            UVm[i, :len(uv)] = True
        f32 = jnp.float32
        return (jnp.asarray(Nrm, f32), jnp.asarray(Off, f32),
                jnp.asarray(Rad, f32), jnp.asarray(Org, f32),
                jnp.asarray(AV, f32), jnp.asarray(AVm),
                jnp.asarray(UV, f32), jnp.asarray(UVm))

    def _interaction_diameter(self, system):
        return max(float(self.shape_param[t].get('diameter', 1.0))
                   for t in system.particle_types)

    def _sweep_radius_table(self, system):
        import jax.numpy as jnp
        return jnp.zeros((len(system.particle_types),), jnp.float32)

    def _core_support(self, system, q, t):
        import jax.numpy as jnp
        from ..ops import quat as Q
        Nrm, Off, Rad, Org, AV, AVm, UV, UVm = self._ftables(system)
        n_t = Nrm[t]          # (..., P, 3)
        b_t = Off[t]          # (..., P)
        R = Rad[t][..., None]                     # (..., 1)
        org = Org[t]
        av, avm = AV[t], AVm[t]
        uv, uvm = UV[t], UVm[t]

        def inside_all(v, exclude=None):
            # v (..., 3) against every ACTIVE plane
            d = jnp.einsum('...pk,...k->...p', n_t, v) + b_t
            ok = d <= 1e-6
            return jnp.all(ok | (b_t <= -1e8), axis=-1)

        def sup(d):
            db = Q.rotate(Q.conjugate(q), d)
            dn = db / jnp.sqrt(jnp.maximum(
                jnp.sum(db * db, -1, keepdims=True), 1e-20))
            s = R * dn                            # sphere support
            cands = [s]
            valids = [inside_all(s)]
            scores = [jnp.sum(s * db, -1)]
            # per-plane circle candidates
            np_sq = jnp.maximum(jnp.sum(n_t * n_t, -1), 1e-12)
            alpha = jnp.einsum('...pk,...k->...p', n_t, s)
            arg = R * R - alpha * alpha / np_sq
            arg2 = jnp.maximum(R * R - b_t * b_t / np_sq, 0.0)
            invg = jnp.sqrt(arg2 / jnp.maximum(arg, 1e-12))
            v_c = invg[..., None] * (s[..., None, :]
                                     - (alpha / np_sq)[..., None]
                                     * n_t) \
                - (b_t / np_sq)[..., None] * n_t
            v_deg = -(b_t / np_sq)[..., None] * n_t
            v_c = jnp.where((arg > 1e-6 * R * R)[..., None], v_c, v_deg)
            P = n_t.shape[-2]
            for i in range(P):
                vi = v_c[..., i, :]
                # valid: inside all planes except i, plane i active
                dots = jnp.einsum('...pk,...k->...p', n_t, vi) + b_t
                mask = jnp.arange(P) == i
                ok = jnp.all((dots <= 1e-5) | mask | (b_t <= -1e8),
                             axis=-1) & (b_t[..., i] > -1e8)
                cands.append(vi)
                valids.append(ok)
                scores.append(jnp.sum(vi * db, -1))
            # plane-plane-sphere and user vertices
            for tab, msk in ((av, avm), (uv, uvm)):
                sc = jnp.einsum('...vk,...k->...v', tab, db)
                sc = jnp.where(msk, sc, -jnp.inf)
                best = jnp.argmax(sc, axis=-1)
                vb = jnp.take_along_axis(
                    tab, best[..., None, None].repeat(3, -1),
                    axis=-2)[..., 0, :]
                cands.append(vb)
                valids.append(jnp.take_along_axis(
                    msk, best[..., None], axis=-1)[..., 0])
                scores.append(jnp.sum(vb * db, -1))
            S = jnp.stack(scores, -1)
            Vl = jnp.stack(valids, -1)
            S = jnp.where(Vl, S, -jnp.inf)
            k = jnp.argmax(S, -1)
            C = jnp.stack(cands, -2)
            v = jnp.take_along_axis(
                C, k[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
            return Q.rotate(q, v - org)
        seed = Q.rotate(q, -org)
        return sup, seed
