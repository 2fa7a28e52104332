"""System orchestration: the run loop.

TPU-native redesign of the reference System (hoomd/System.cc:419-620) and
IntegratorTwoStep (md/IntegratorTwoStep.cc:96-161).  The reference executes
per timestep: analyzers -> updaters -> integrator(step1 -> communicate ->
forces -> step2).  Here the whole integrator pipeline — including the
lax.cond-gated neighbor rebuild — is ONE jitted function iterated with
``lax.fori_loop`` for a chunk of steps; analyzers/updaters run host-side at
chunk boundaries, reproducing the period/phase semantics (System.h:71-128)
without per-step host synchronization.

Capacity overflow (neighbor/cell list) follows the reference's
grow-and-retry protocol: sticky device flags are checked after each chunk;
on overflow the host enlarges the static capacities, recompiles, and re-runs
the chunk from the saved carry (states are immutable, so retry is free).

The reference's ``determineFlags`` lazy PE/virial computation
(System.cc:855) is unnecessary here: the fused pair kernel produces force,
energy and virial in one pass over the same gathered data, so they are
effectively free.
"""

from __future__ import annotations

import time

import numpy as np

from . import rng
from ._config import real_dtype
from .ops.neighbor import fresh_neighbor_list, update_neighbor_list
from .ops.reduce import ksum
from .state import snapshot_from_state, state_from_snapshot


def _device_sync(arr):
    """Wait until ``arr`` is actually computed.

    ``jax.block_until_ready`` returns before remote completion on
    tunneled TPU backends (measured: a host fetch after "blocking"
    still waits for the computation), so every wall-clock measurement
    in the run loop syncs by fetching one scalar element to the host —
    a genuine round-trip that cannot resolve early.
    """
    import jax
    np.asarray(jax.device_get(arr.ravel()[0]))


class System:
    """Holds the device state and all registered operations; compiles and
    runs the step pipeline."""

    def __init__(self, snapshot):
        self.snapshot_template = snapshot
        self._fast_carry = None      # resident cell-major carry (fast engine)
        self._fast_state_stale = False
        self.state = state_from_snapshot(snapshot)
        self.particle_types = list(snapshot.particles.types)
        self.forces = []
        self.nlists = []
        self.methods = []
        self.integrator_mode = None
        self.analyzers = []
        self.updaters = []
        self._program = None
        self._dirty_flag = True
        self._params_dirty = True
        self._dyn = None
        self._nl_data = None       # tuple(NeighborListData) matching program
        self._method_aux = None
        self._method_aux_by_obj = {}
        self._restored_method_state = {}
        self._grow = {}            # nlist -> dict of capacity floors
        self._last_tps = 0.0
        self._forces_fresh = False
        self._mode_aux = None
        self.hpmc_integrator = None
        self._hpmc_counters = None
        self.composites = []

    # -- state residency -----------------------------------------------------
    # When the fast cell-major engine is active, the authoritative particle
    # data lives in ``_fast_carry`` between chunks; ``state`` is materialized
    # lazily on first access (one jitted scatter).  Any external assignment
    # to ``state`` invalidates the carry (the writer changed particle data
    # the carry doesn't know about).
    @property
    def state(self):
        if self._fast_state_stale:
            self._sync_fast_state()
        return self._state_raw

    @state.setter
    def state(self, value):
        self._state_raw = value
        self._fast_carry = None
        self._fast_state_stale = False

    def _sync_fast_state(self):
        self._fast_state_stale = False
        fast = self._program['fast']
        # the hot loop computes forces only; fill pe/virial at the
        # current positions before materializing the State
        self._fast_carry = fast['refresh'](self._fast_carry,
                                           self._dyn['fast'])
        self._state_raw = fast['to_state'](self._fast_carry,
                                           self._state_raw)
        m = fast['method']
        self._method_aux_by_obj[m] = self._fast_carry.aux
        if self._method_aux is not None:
            self._method_aux = tuple(
                self._method_aux_by_obj.get(mm, a)
                for mm, a in zip(self._program['methods'],
                                 self._method_aux))
        self._forces_fresh = True

    # -- registration ------------------------------------------------------
    def add_force(self, f):
        self.forces.append(f)
        self._dirty()

    def add_nlist(self, nl):
        self.nlists.append(nl)
        self._dirty()

    def add_integration_method(self, m):
        self.methods.append(m)
        self._dirty()

    def set_integrator_mode(self, mode):
        self.integrator_mode = mode
        self._dirty()

    def set_hpmc_integrator(self, mc):
        """HPMC integrators replace the MD pipeline entirely (reference:
        one Integrator per System, System.h:62)."""
        self.hpmc_integrator = mc
        self._dirty()

    def add_composite(self, c):
        """Rigid-body composite (reference ForceComposite)."""
        self.composites.append(c)
        self._dirty()

    def register_analyzer(self, a):
        self.analyzers.append(a)

    def register_updater(self, u):
        self.updaters.append(u)

    def _dirty(self):
        self._dirty_flag = True
        self._params_dirty = True
        self._forces_fresh = False

    def _refresh_params(self):
        self._params_dirty = True

    # -- properties ----------------------------------------------------------
    @property
    def timestep(self):
        return int(self.state.timestep)

    @property
    def real_dtype(self):
        return real_dtype()

    # -- program construction ------------------------------------------------
    def _active(self):
        forces = [f for f in self.forces if f.enabled]
        methods = [m for m in self.methods if m.enabled]
        nlists = []
        for f in forces:
            if f._nlist is not None and f._nlist not in nlists:
                nlists.append(f._nlist)
        return forces, nlists, methods

    def _rebuild_program(self):
        import jax
        import jax.numpy as jnp

        # a recompile may change the fast engine's layout (C, cell grid):
        # materialize any resident carry into the state first
        if self._fast_state_stale:
            self._sync_fast_state()
        self._fast_carry = None

        if self.hpmc_integrator is not None:
            prog = self.hpmc_integrator._build_program(self)
            prog['kind'] = 'hpmc'
            self._program = prog
            self._hpmc_counters = prog['init_counters']()
            self._dyn = {}
            self._dirty_flag = False
            self._params_dirty = False
            self._forces_fresh = True   # no forces in pure HPMC
            return

        forces, nlists, methods = self._active()
        for nl in nlists:
            nl._build_config(self, grow=self._grow.get(nl))
        nl_cfgs = [nl._cfg for nl in nlists]
        force_fns = [f._make_compute(self) for f in forces]
        force_nl_slot = [nlists.index(f._nlist) if f._nlist in nlists
                         else -1 for f in forces]
        method_seeds = [getattr(m, 'seed', 0) for m in methods]

        def _update_nls(state, nls, force=False):
            out = []
            for k, cfg in enumerate(nl_cfgs):
                out.append(update_neighbor_list(
                    state.pos, state.typeid, state.tag, state.diameter,
                    state.box, nls[k], r_buff=cfg.r_buff,
                    r_max=cfg.r_max,
                    cell_dim=cfg.cell_dim, cell_cap=cfg.cell_cap,
                    cell_adj=cfg.cell_adj, rmax_table=cfg.rmax_table,
                    max_neigh=cfg.max_neigh, excl_tags=cfg.excl_tags,
                    diameter_shift=cfg.diameter_shift, body=state.body,
                    exclude_body=cfg.exclude_body, force=force))
            return tuple(out)

        def _net_force(state, nls, dyn):
            N = state.N
            dt_ = state.pos.dtype
            F = jnp.zeros((N, 3), dtype=dt_)
            T = jnp.zeros((N, 3), dtype=dt_)
            pe = jnp.zeros((N,), dtype=dt_)
            vir = jnp.zeros((N, 6), dtype=dt_)
            for fn, slot, fp in zip(force_fns, force_nl_slot,
                                    dyn['forces']):
                nl = nls[slot] if slot >= 0 else None
                out = fn(state, nl, fp)
                if len(out) == 4:           # aniso: (force, torque, pe, vir)
                    f, tq, p, v = out
                    T = T + tq
                else:
                    f, p, v = out
                F, pe, vir = F + f, pe + p, vir + v
            return state.replace(net_force=F, net_torque=T, net_pe=pe,
                                 net_virial=vir)

        mode = self.integrator_mode
        has_mode_hooks = mode is not None and hasattr(mode, '_post_force')
        # rotational integration (reference IntegratorTwoStep aniso mode):
        # enabled when any aniso force is present or explicitly requested
        aniso = any(getattr(f, 'is_aniso', False) for f in forces)
        if mode is not None and getattr(mode, 'aniso', None) is not None:
            aniso = bool(mode.aniso) if mode.aniso != 'auto' else aniso
        # rigid bodies force aniso (torques drive central rotation)
        composites = list(self.composites)
        if composites:
            aniso = True
        comp_params = [c._pack_params(self) for c in composites]
        comp_classes = [type(c) for c in composites]
        for m in methods:
            m._aniso = aniso

        def one_step(state, nls, auxs, mode_aux, dyn):
            # FIRE-style modes own an adaptive dt (reference
            # FIREEnergyMinimizer); standard mode uses the traced dyn dt
            dt = (mode._resolve_dt(dyn, mode_aux) if has_mode_hooks
                  else dyn['dt'])
            auxs = list(auxs)
            # seeds ride dyn (not the trace) so ensemble.replicas can
            # vmap one compiled program over per-replica seeds
            mseeds = dyn.get('mseeds', method_seeds)
            for i, m in enumerate(methods):
                key = rng.step_key(mseeds[i], state.timestep, salt=i)
                state, auxs[i] = m._step1(state, auxs[i],
                                          dyn['methods'][i], dt, key)
            for cls, cp in zip(comp_classes, comp_params):
                state = cls.update_constituents(state, cp)
            nls = _update_nls(state, nls)
            state = _net_force(state, nls, dyn)
            for cls, cp in zip(comp_classes, comp_params):
                state = cls.reduce_forces(state, cp)
            if has_mode_hooks:
                state, mode_aux = mode._post_force(state, mode_aux)
            for i, m in enumerate(methods):
                key = rng.step_key(mseeds[i], state.timestep,
                                   salt=4096 + i)
                state, auxs[i] = m._step2(state, auxs[i],
                                          dyn['methods'][i], dt, key)
            state = state.replace(timestep=state.timestep + 1)
            return state, nls, tuple(auxs), mode_aux

        def run_chunk(state, nls, auxs, mode_aux, dyn, nsteps):
            def body(_, carry):
                return one_step(*carry, dyn)
            import jax.lax as lax
            return lax.fori_loop(0, nsteps, body,
                                 (state, nls, auxs, mode_aux))

        def prep(state, nls, dyn):
            """Initial force evaluation (reference Integrator::prepRun)."""
            for cls, cp in zip(comp_classes, comp_params):
                state = cls.update_constituents(state, cp)
            nls = _update_nls(state, nls)
            state = _net_force(state, nls, dyn)
            for cls, cp in zip(comp_classes, comp_params):
                state = cls.reduce_forces(state, cp)
            return state, nls

        # fast-path specialization: single-type LJ + simple integrator
        # routes to the cell-major Pallas engine (ops/fast_lj.py)
        fast = self._maybe_build_fast(forces, nlists, methods,
                                      has_mode_hooks, aniso, composites)

        program = {
            'kind': 'md', 'fast': fast,
            'forces': forces, 'nlists': nlists, 'methods': methods,
            'nl_cfgs': nl_cfgs,
            'run_chunk': jax.jit(run_chunk),
            'run_chunk_raw': run_chunk,
            'one_step_raw': one_step,
            'prep': jax.jit(prep),
            'force_fns': force_fns, 'force_nl_slot': force_nl_slot,
        }
        self._program = program

        # (re)initialize device-side nlist data and method aux
        dtype = self.state.pos.dtype
        self._nl_data = tuple(
            fresh_neighbor_list(self.state.N, cfg.max_neigh, dtype)
            for cfg in nl_cfgs)
        auxs = []
        for m in methods:
            if m in self._method_aux_by_obj:
                auxs.append(self._method_aux_by_obj[m])
            else:
                a = m._init_aux(self.state)
                self._method_aux_by_obj[m] = a
                auxs.append(a)
        self._method_aux = tuple(auxs)
        if has_mode_hooks and self._mode_aux is None:
            self._mode_aux = mode._init_mode_aux(self.state)
        elif not has_mode_hooks:
            self._mode_aux = None
        # placeholder so the carry pytree is stable when no mode hooks
        self._dirty_flag = False
        self._params_dirty = True

    def _pack_dyn(self):
        import jax.numpy as jnp
        p = self._program
        dt_val = self.integrator_mode.dt if self.integrator_mode else 0.0
        self._dyn = {
            'dt': jnp.asarray(dt_val, dtype=self.real_dtype),
            'forces': tuple(f._pack_params(self) for f in p.get('forces',
                                                                ())),
            'methods': tuple(m._pack_params(self) for m in p.get('methods',
                                                                 ())),
            # per-method RNG seeds as traced values: ensemble.replicas
            # vmaps over these to give each replica its own noise stream
            'mseeds': tuple(jnp.asarray(getattr(m, 'seed', 0), jnp.uint32)
                            for m in p.get('methods', ())),
        }
        if p.get('fast'):
            self._dyn['fast'] = self._fast_dyn()
        self._params_dirty = False

    def _maybe_build_fast(self, forces, nlists, methods, has_mode_hooks,
                          aniso, composites):
        """Eligibility + construction of the cell-major LJ engine."""
        import os
        import jax
        import jax.numpy as jnp
        from .ops import pair_eval
        from .ops.fast_lj import build_fast_lj_chunk, plan_fast_lj
        # HOOMD_TPU_FAST: 'auto' (TPU only), 'on' (any backend),
        # 'interpret' (any backend, Pallas interpret mode), 'off'
        mode_env = os.environ.get('HOOMD_TPU_FAST', 'auto')
        if mode_env == 'off':
            return None
        from . import context as _ctx
        dd_shape = getattr(_ctx.current, 'dd_shape', None) \
            if _ctx.current is not None else None
        want_dd = (self._mesh() is not None and dd_shape is not None
                   and os.environ.get('HOOMD_TPU_FASTDD', 'auto')
                   != 'off')
        if self._mesh() is not None and not want_dd:
            return None     # 1-D atom decomposition: sharded general engine
        if (not want_dd and jax.default_backend() != 'tpu'
                and mode_env not in ('on', 'interpret')):
            return None
        interpret = (mode_env == 'interpret'
                     and jax.default_backend() != 'tpu')

        def _decline(why):
            # name the FIRST failed gate: silently dropping 30-200x in
            # throughput is the reference Messenger's mode-selection
            # notice territory (hoomd/Messenger.h:39-59)
            from .util import notice
            notice(2, f"fast engine declined ({why}); using the general "
                      f"engine")
            return None
        # bonded (fixed-topology) forces ride the fast engine as
        # tag-space terms around the cell-pair kernel (fast_lj
        # bonded_cfg); any count of them is allowed beside ONE pair
        # force (reference analog: IntegratorTwoStep sums ForceComputes,
        # md/IntegratorTwoStep.cc)
        from .md._bonded import BondedForce
        from .md import charge as _charge
        bonded_objs = [g for g in forces if isinstance(g, BondedForce)]
        pair_list = [g for g in forces if g not in bonded_objs]
        # charged configs: ONE pppm mesh force may ride the fast engine
        # as a per-step XLA hook beside its real-space ewald pair; the
        # real-space part fuses with an optional LJ pair into the
        # lj_ewald stencil evaluator (reference: PPPMForceComputeGPU +
        # pair ewald on one nlist)
        mesh_list = [g for g in pair_list
                     if isinstance(g, _charge.pppm)]
        pair_list = [g for g in pair_list if g not in mesh_list]
        if len(mesh_list) > 1:
            return _decline('multiple pppm instances')
        mesh_f = mesh_list[0] if mesh_list else None
        charged = None
        if mesh_f is not None:
            ew = mesh_f._ewald_pair
            if ew is None or ew not in pair_list:
                return _decline('pppm without its real-space ewald pair')
            others = [g for g in pair_list if g is not ew]
            if len(others) > 1:
                return _decline(f'{len(others) + 1} pair forces beside '
                                f'pppm (need at most lj + ewald)')
            if want_dd:
                return _decline('pppm under spatial DD (general engine)')
            if others:
                lj_f = others[0]
                if getattr(getattr(lj_f, '_evaluator', None), '__name__',
                           None) != 'lj':
                    return _decline('pppm + non-lj pair (need lj)')
                if lj_f.mode != 'none':
                    return _decline('pppm + shifted lj pair')
                if lj_f._nlist is not ew._nlist:
                    return _decline('pppm pair on a different nlist')
                if not np.allclose(
                        lj_f._rcut_matrix(self.particle_types),
                        ew._rcut_matrix(self.particle_types)):
                    return _decline('pppm lj/ewald cutoffs differ')
                charged = {'kind': 'lj_ewald', 'lj': lj_f, 'ewald': ew,
                           'mesh': mesh_f}
                pair_list = [lj_f]
            else:
                charged = {'kind': 'ewald', 'lj': None, 'ewald': ew,
                           'mesh': mesh_f}
                pair_list = [ew]
        elif len(pair_list) == 1 and getattr(
                getattr(pair_list[0], '_evaluator', None), '__name__',
                None) == 'ewald':
            charged = {'kind': 'ewald', 'lj': None,
                       'ewald': pair_list[0], 'mesh': None}
        if len(pair_list) != 1:
            return _decline(f'{len(pair_list)} pair forces (need exactly 1)')
        if len(methods) != 1:
            return _decline(f'{len(methods)} integration methods (need 1)')
        if aniso:
            return _decline('anisotropic pair forces')
        if has_mode_hooks:
            return _decline('integrator mode hooks (fire/npt hooks)')
        if composites:
            return _decline('rigid-body composites')
        if len(self.particle_types) > 4:
            return _decline(f'{len(self.particle_types)} particle types (max 4)')
        for g in bonded_objs:
            if getattr(g, '_needs_charge', False):
                return _decline('coulomb special pairs')
            if type(g)._energy_fn is None:
                return _decline('table bonded potential')
        f = pair_list[0]
        # any single-type, charge/diameter-free pair evaluator rides the
        # planar stencil kernel; the math is injected from ops/pair_eval
        FAST_EVALS = ('lj', 'gauss', 'yukawa', 'morse', 'mie',
                      'buckingham', 'lj1208', 'force_shifted_lj',
                      'dpd_conservative', 'moliere')
        if charged is not None:
            # bonded forces and nlist exclusions ride the charged fast
            # path as tag-space terms: the exclusion correction
            # subtracts the in-kernel real-space term (lj + erfc) AND
            # the mesh's k-space erf part for each excluded pair — the
            # reference's PPPM intramolecular-exclusion fixup
            # (md/PPPMForceCompute.h:103-186) in energy form.  This is
            # the molecular-electrolyte bread-and-butter case (water
            # models, polyelectrolytes).
            if self.real_dtype != jnp.float32:
                return _decline('charged fast path is f32-only')
            eval_name = charged['kind']
        else:
            ev = getattr(f, '_evaluator', None)
            eval_name = getattr(ev, '__name__', None)
            if eval_name not in FAST_EVALS:
                return _decline(
                    f'pair evaluator {eval_name!r} not stencil-eligible')
        if f.mode not in ('none', 'shift'):
            return _decline(f'pair shift mode {f.mode!r} (need none/shift)')
        nl = f._nlist
        if nl is None or nl._cfg is None:
            return _decline('no neighbor list attached')
        if nl._cfg.diameter_shift:
            return _decline('diameter-shifted neighbor list (slj)')
        # neighbor-list exclusions (bonded pairs removed from the pair
        # sum, reference md/NeighborList.h exclusion machinery): the
        # stencil kernel has no per-pair filtering, so the fast path
        # computes the FULL pair sum and SUBTRACTS each excluded pair's
        # contribution as one more tag-space fixed-topology term —
        # algebraically identical, and the exclusion list is tiny
        # compared to the pair sum
        excl_pairs = None
        if nl._cfg.excl_tags is not None:
            et = np.asarray(nl._cfg.excl_tags)
            t_idx = np.repeat(np.arange(et.shape[0]), et.shape[1])
            u = et.reshape(-1)
            keep = (u < et.shape[0]) & (t_idx < u)
            if keep.any():
                excl_pairs = np.stack([t_idx[keep], u[keep]],
                                      axis=1).astype(np.int32)
        snap = self.snapshot_template
        if (snap.particles.body >= 0).any():
            return _decline('rigid/floppy body particles')
        m = methods[0]
        kind = type(m).__name__
        if kind not in ('nve', 'langevin', 'nvt'):
            return _decline(f'integration method {kind!r}')
        if kind == 'nve' and (m.limit is not None or m.zero_force):
            return _decline('nve limit/zero_force options')
        if kind == 'langevin' and (m.dscale or m.noiseless_t):
            return _decline('langevin dscale/noiseless options')
        if len(m.group.member_tags) != self.state.N:
            return _decline('method group is not group.all()')
        box = self.state.box
        import numpy as _np
        if box.dimensions != 3 or _np.abs(_np.asarray(box.tilt)).max() \
                > 1e-12:
            return _decline('non-orthorhombic or 2D box')
        N = self.state.N
        rcut = float(np.max(f._rcut_matrix(self.particle_types)))
        r_buff = nl.r_buff
        L = _np.asarray(box.L)
        if want_dd:
            dd_prog = self._build_fast_dd(
                dd_shape=dd_shape, pair=f, bonded_objs=bonded_objs,
                excl_pairs=excl_pairs, method=m, kind=kind,
                eval_name=eval_name, N=N, box=box, rcut=rcut,
                r_buff=r_buff)
            if dd_prog is not None:
                return dd_prog
            # DD-ineligible (box too small for 3 cell planes per axis,
            # too few devices, ...): on a 1-device grid fall through to
            # the single-chip fast engine rather than silently dropping
            # to the 30-200x slower general engine; on a real multi-
            # device grid the atom decomposition is the fallback
            _decline('spatial-DD gate (plan_fast_dd rejected the '
                     'grid/box); falling back')
            if int(_np.prod(dd_shape)) != 1:
                return None
        # chain-topology detection happens BEFORE grid planning: the
        # in-kernel angle extraction OOMs VMEM at C = 40 tiles, so
        # angle-bearing chain configs plan with a C cap
        # the in-kernel chain-bonded path is OFF by default: measured on
        # TPU v5e at the Kremer-Grest benchmark statepoint, the compiled
        # chain megastep produces NaN positions right after a dt change
        # (wmax=nan, cmiss+danger together) while the interpret-mode
        # oracle passes — a compiled-Mosaic-only defect — and each of
        # its plan variants costs a 5-20 minute Mosaic compile at 32k.
        # The tag-space bonded path (one_step) is correct and measured
        # at 6.9M pss on the same config.  HOOMD_TPU_CHAIN=on re-enables
        # the kernel for debugging.
        chain_cfg = None
        if (bonded_objs and len(self.particle_types) == 1
                and charged is None
                and self.real_dtype == jnp.float32
                and not self._grow.get('fast_chain_off')
                and os.environ.get('HOOMD_TPU_CHAIN', 'off') == 'on'):
            chain_cfg = self._chain_cfg_for_kernel(bonded_objs,
                                                   excl_pairs)
        # overflow-driven cap: repeated capacity overflows force finer
        # grids with real headroom instead of growing C past the
        # one-lane-tile kernel limit (see the ovf handler)
        chain_max_C = self._grow.get('fast_plan_maxC')
        conservative = bool(self._grow.get('fast_plan_conservative'))
        # small systems: start on the conservative plan outright.  The
        # adaptation ladder (brave capacity -> ovf -> replan -> xsel
        # flip ...) exists to squeeze big grids; at N=1000 every rung
        # is a 10-60 s Mosaic compile that can never amortize (the
        # README bench spent >90% of its walltime compiling variants,
        # 0.5M pss vs ~10M steady)
        small_N = N < 4096
        if small_N or charged is not None:
            # charged configs start on lattice-like states (electrolyte
            # crystals) whose commensurate packing overflows the brave
            # capacity model; the replan ladder costs Mosaic compiles
            # that dwarf the slots saved (measured: config-4's bench
            # window spent most of its time in ovf retries)
            conservative = True
        # STATE-AWARE planning: the dense-liquid capacity margin
        # assumes liquid count statistics, but the CURRENT
        # configuration may be anything — a commensurate lattice start
        # packs (ceil(n_side/nx))^3 per cell (measured 64 at the 64k
        # sc start on a 13-cell grid) and a clustered polymer bundle
        # can pack ~100 into one coarse cell, an occupancy NO C <= 40
        # holds.  The planner bins the actual positions per candidate
        # grid and sizes C from max(model, real occupancy), so
        # clustered configurations land on the finer grid that
        # actually fits (ops/fast_lj.plan_fast_lj).
        pos_h = _np.asarray(self._state_raw.pos)
        frac = (pos_h / L + 0.5) % 1.0
        cell_dim, ncells, C = plan_fast_lj(
            N, L, rcut, r_buff, conservative=conservative,
            max_C=chain_max_C, frac=frac)
        if min(L / _np.array(cell_dim)) < rcut + r_buff - 1e-9:
            return _decline('box too small for the 27-cell stencil')
        C = max(C, self._grow.get('fast_C', 0))
        # legacy LJ-only Pallas variants can't host other evaluators
        impl_env = os.environ.get('HOOMD_TPU_FAST_IMPL')
        if eval_name != 'lj' and impl_env in ('pallas', 'pallas3d',
                                              'row'):
            return None
        impl = impl_env
        if impl is None:
            # the planar (SoA) row kernels keep every elementwise op on
            # (nx, C, 3C) lane tiles (~94% VPU utilization at C=40); the
            # AoS variants waste lanes on the xyz triplet and the XLA roll
            # formulation materializes (nc, C, 27C) in HBM.  The default
            # is the Newton's-third-law half-stencil variant (5 of 9
            # stencil rows, each pair evaluated once and scattered to
            # both particles).  XLA remains the portable path (CPU
            # tests, interpret-free fallback).
            # 'plane': plane-blocked full-stencil kernel with deferred
            # reductions — fastest measured (the per-offset reductions
            # of the row kernels dominate their runtime)
            impl = 'plane' if jax.default_backend() == 'tpu' \
                else 'xla'
        ntypes = len(self.particle_types)
        if ntypes > 1 and impl in ('pallas', 'pallas3d', 'row'):
            return None
        if 3 * C > 128 and impl in ('plane', 'planar', 'planar_n3l'):
            # a capacity grow pushed the j-window past one (8,128) lane
            # tile: the Mosaic kernels register-spill past VMEM at 2-3
            # tiles (measured fatal compile OOM).  The XLA formulation
            # is shape-agnostic — slower, but it keeps the run alive.
            impl = 'xla'
        if charged is not None and charged['kind'] == 'lj_ewald':
            pnames = ('kappa', 'lj1', 'lj2', 'rcut')
        elif charged is not None:
            pnames = ('kappa', 'rcut')
        else:
            pnames = tuple(sorted(
                f._pack_params(self)['tables'].keys())) + ('rcut',)
        # rebuild window: steps for the fastest particle to cross half
        # the Verlet skin at the current dt (conservative: the true
        # max-displacement crossing is slower than ballistic v_max).
        # Quantized to bound recompiles; the in-window danger flag +
        # segment retry (see _run_fast_chunk) makes any estimate exact.
        import jax.numpy as _jnp
        skin = float(min(_np.asarray(box.L) / _np.asarray(cell_dim))
                     - rcut)
        skin = max(skin, r_buff)
        vmax = float(_jnp.max(_jnp.linalg.norm(self._state_raw.vel,
                                               axis=-1)))
        dt = float(getattr(self.integrator_mode, 'dt', 0.005)
                   or 0.005)
        # k_rebuild here is the KERNEL window (steps fused into one
        # megastep pallas_call) — capped at 8 since larger windows gain
        # nothing per-step and cost superlinear Mosaic compiles.  The
        # REBUILD CADENCE is k * fast_m where fast_m (window count per
        # rebuild cycle) is a traced runtime value adapted from measured
        # drift in _run_fast_chunk at zero recompile cost; 0.55x the
        # ballistic estimate keeps the very first windows safely inside
        # the skin before any drift has been measured
        # cadence state measured at a materially different dt is
        # stale — drift per step scales with dt, so carrying fast_m
        # (or its danger ceiling) across a dt change probes wrongly
        k_dt = getattr(self, '_fast_k_dt', dt)
        if abs(dt - k_dt) > 0.25 * max(k_dt, 1e-12):
            self._grow.pop('fast_m', None)
            self._grow.pop('fast_m_ceil', None)
            self._grow.pop('fast_m_pinned', None)
            self._grow.pop('fast_m_probe_fails', None)
            self._grow.pop('fast_k_cap', None)
            self._grow.pop('fast_k_grown', None)
            self._grow.pop('fast_k_grow_block', None)
            self._grow.pop('fast_clean_segs', None)
        k_est = int(0.55 * (0.5 * skin) / max(vmax * dt, 1e-12))
        # k is capped at 4: per-step kernel time is flat in k (the
        # window loop is in-kernel), so a smaller k only buys FINER
        # cadence granularity for the m-controller — with k=8 the
        # controller quantizes to 8/16/24-step cadences and a true
        # danger edge at ~12 pins it to 8, measured ~5% slower than
        # k=4 sitting at m=3
        for q in (4, 3, 2, 1):
            if q <= max(k_est, 1):
                k_rebuild = q
                break
        if self._grow.get('fast_k_grown'):
            # measured drift cleared 4x the planned cadence (see
            # _run_fast_chunk): the ballistic estimate was conservative
            k_rebuild = 4
        cap = self._grow.get('fast_k_cap')
        if cap:
            k_rebuild = min(k_rebuild, cap)
        self._fast_k_dt = dt
        # rebuild implementation: the plane-local migration stencil
        # (ops/pallas_rebin.py) replaces the 12-operand sort when the
        # one-cell-drift precondition and the f32-value-exactness of the
        # integer payload hold; the rebin_ovf sticky flag + segment
        # retry (below) falls back to the sort on buffer overflow
        rebin_impl = 'sort'
        env_rebin = os.environ.get('HOOMD_TPU_REBIN', 'on')
        if (ntypes == 1 and (1 << 12) <= N < (1 << 23)
                and min(cell_dim) >= 3
                and self.real_dtype == _jnp.float32
                and impl in ('plane', 'planar', 'planar_n3l')
                and not self._grow.get('fast_rebin_sort')
                and env_rebin != 'off'):
            # default: the staged one-hot-matmul XLA rebin (MXU,
            # ~0.4 ms at 64k vs the Mosaic plane kernel's 2.3 ms);
            # HOOMD_TPU_REBIN=pallas keeps the old kernel for A/B.
            # Below 4096 particles the sort costs next to nothing and
            # xsel's transient-failure flip cycle costs Mosaic compiles
            # the tiny run can never amortize — sort unconditionally
            rebin_impl = 'pallas' if env_rebin == 'pallas' else 'xsel'
        # emigrant-buffer width: 8 covers the drift bound with a wide
        # margin at liquid densities (measured E=8 rebin ~2x faster
        # than E=16); the rebin_ovf retry widens it to 16 once before
        # falling back to the sort
        rebin_E = int(self._grow.get('fast_rebin_E', 8))
        # tag-space fixed-topology terms: user bonded forces, then the
        # exclusion-pair correction (subtracts the pair evaluator on
        # excluded pairs, matching the kernel's shift mode exactly)
        bonded_cfg = self._bonded_cfg_for(f, bonded_objs, excl_pairs,
                                          charged=charged)
        # chain topologies (bead-spring family) move INTO the megastep
        # kernel via tag matching when eligible; the tag-space
        # bonded_cfg stays for pe/virial refresh + remainder steps
        charges_arr = None
        mesh_cfg = None
        if charged is not None:
            charges_arr = np.asarray(
                self.snapshot_template.particles.charge, np.float64)
            if charged['mesh'] is not None:
                mf = charged['mesh']
                if not hasattr(mf, '_mesh_compute'):
                    mf._make_compute(self)
                mesh_cfg = {'fn': mf._mesh_compute}
        if impl != 'plane':
            chain_cfg = None     # kernel path only
        # MEMOIZE built programs by their full static plan: the
        # adaptation machinery (ovf replans, xsel<->sort flips, k
        # grows) oscillates on hard systems (condensing gases), and
        # every _rebuild_program used to create FRESH closures whose
        # jits could never reuse a previously compiled executable —
        # measured as 10-15 s Mosaic recompiles per flip that crushed
        # the N=1000 README bench to 0.5M pss (steady state runs at
        # ~10M).  Returning the cached program makes revisiting a plan
        # free.  Only topology-free configs are cached (bonded/chain/
        # charged carry unhashable tables and don't oscillate).
        prog_key = None
        if not bonded_cfg and chain_cfg is None and charged is None:
            prog_key = (N, tuple(np.asarray(box.L).tolist()),
                        tuple(cell_dim), C, float(r_buff), float(rcut),
                        kind, int(getattr(m, 'seed', 0) or 0),
                        str(self.real_dtype), interpret, impl,
                        eval_name, tuple(pnames), ntypes, k_rebuild,
                        rebin_impl, rebin_E)
        cache = getattr(self, '_fast_prog_cache', None)
        if cache is None:
            cache = self._fast_prog_cache = {}
        if prog_key is not None and prog_key in cache:
            to_fast, refresh, run_chunk, to_state = cache[prog_key]
        else:
            to_fast, refresh, run_chunk, to_state = build_fast_lj_chunk(
                N=N, box=box, cell_dim=cell_dim, C=C, r_buff=r_buff,
                rcut=rcut, method_kind=kind,
                method_seed=getattr(m, 'seed', 0),
                dtype=self.real_dtype,
                interpret=interpret, impl=impl, eval_name=eval_name,
                pnames=pnames, ntypes=ntypes, k_rebuild=k_rebuild,
                rebin_impl=rebin_impl, rebin_E=rebin_E,
                bonded_cfg=tuple(bonded_cfg), chain_cfg=chain_cfg,
                charges=charges_arr, mesh_cfg=mesh_cfg)
            if prog_key is not None:
                cache[prog_key] = (to_fast, refresh, run_chunk,
                                   to_state)
        return {'to_fast': to_fast, 'refresh': refresh,
                'run_chunk': run_chunk, 'to_state': to_state,
                'C': C, 'method': m, 'kind': kind, 'rcut': rcut,
                'eval_name': eval_name, 'pnames': pnames,
                'ntypes': ntypes, 'k_rebuild': k_rebuild, 'skin': skin,
                'rebin_impl': rebin_impl, 'rebin_E': rebin_E,
                'pair_force': f, 'bonded_forces': list(bonded_objs),
                'excl_pairs': excl_pairs, 'chain': chain_cfg,
                'charged': charged}

    def _bonded_cfg_for(self, f, bonded_objs, excl_pairs, charged=None):
        """Fixed-topology term configs for the fast engines: user bonded
        forces first, then the nlist-exclusion pair correction.  For
        charged configs the correction subtracts the in-kernel
        real-space term (lj + qiqj erfc(kr)/r inside rcut) and, when a
        PPPM mesh is present, the k-space erf part at any distance —
        mirroring the general engine (md/charge.py exclusion fixups;
        reference md/PPPMForceCompute.h:103-186)."""
        bonded_cfg = []
        for g in bonded_objs:
            data = g._topology_data(self)
            bonded_cfg.append({'energy_fn': type(g)._energy_fn,
                               'groups': np.asarray(data.group)})
        if excl_pairs is not None and charged is not None:
            import jax
            import jax.numpy as _jnpx
            has_lj = charged['lj'] is not None
            has_mesh = charged['mesh'] is not None
            lj_ev = charged['lj']._evaluator if has_lj else None

            def _excl_energy_q(disps, p, _lj=lj_ev, _mesh=has_mesh):
                d = disps[0]
                r2 = _jnpx.sum(d * d)
                r = _jnpx.sqrt(r2)
                in_rc = r2 < p['rcut2']
                kap = p['kappa']
                e = _jnpx.where(
                    in_rc,
                    p['qiqj'] * jax.scipy.special.erfc(kap * r) / r,
                    0.0)
                if _lj is not None:
                    _, V = _lj.energy_force(r2, p)
                    e = e + _jnpx.where(in_rc, V, 0.0)
                if _mesh:
                    e = e + p['qiqj'] \
                        * jax.scipy.special.erf(kap * r) / r
                return -e
            bonded_cfg.append({'energy_fn': _excl_energy_q,
                               'groups': excl_pairs})
        elif excl_pairs is not None:
            evaluator = f._evaluator
            shifted = (f.mode == 'shift')
            import jax.numpy as _jnpx

            def _excl_energy(disps, p, _ev=evaluator, _sh=shifted):
                d = disps[0]
                r2 = _jnpx.sum(d * d)
                _, V = _ev.energy_force(r2, p)
                if _sh:
                    V = V - p['e_shift']
                return -_jnpx.where(r2 < p['rcut2'], V, 0.0)
            bonded_cfg.append({'energy_fn': _excl_energy,
                               'groups': excl_pairs})
        return bonded_cfg

    def _chain_cfg_for_kernel(self, bonded_objs, excl_pairs):
        """Detect LINEAR-CHAIN topology eligible for the in-kernel
        bonded path (megastep tag matching, ops/pallas_pair.py): one
        fene/harmonic bond force whose graph has degree <= 2, plus at
        most one harmonic angle force whose every angle is a
        consecutive bonded triple, exclusions either empty or exactly
        the bond (and optionally 1-3) set.  Returns the static
        chain_cfg dict for build_fast_lj_chunk, plus bookkeeping for
        _fast_dyn, or None (one_step tag-space path).  The reference
        runs every such system through per-kind GPU kernels
        (md/PotentialBondGPU.cuh, HarmonicAngleForceComputeGPU.cc);
        this is the cell-major analog for the bead-spring family."""
        from .md import angle as _angle
        from .md import bond as _bond
        if self.state.N >= (1 << 24):
            return None   # float tag matching is exact below 2^24 only
        bond_f = angle_f = None
        for g in bonded_objs:
            if isinstance(g, (_bond.fene, _bond.harmonic)) \
                    and g._topology == 'bonds':
                if bond_f is not None:
                    return None
                bond_f = g
            elif isinstance(g, _angle.harmonic) \
                    and g._topology == 'angles':
                if angle_f is not None:
                    return None
                angle_f = g
            else:
                return None
        if bond_f is None:
            return None
        snap = self.snapshot_template
        bonds = np.asarray(snap.bonds.group, np.int64)
        if bonds.size == 0 or len(snap.bonds.types) != 1:
            return None
        N = self.state.N
        # adjacency, degree <= 2
        deg = np.zeros(N, np.int64)
        np.add.at(deg, bonds[:, 0], 1)
        np.add.at(deg, bonds[:, 1], 1)
        if deg.max() > 2:
            return None
        # 'no partner' sentinel is N (tags span [0, N); PAD slots
        # carry tag -1, so -1 would falsely match every pad lane)
        ptab = np.full((N + 1, 4), N, np.int32)
        slot_next = np.zeros(N, np.int64)
        for a, b in bonds:
            ptab[a, slot_next[a]] = b
            slot_next[a] += 1
            ptab[b, slot_next[b]] = a
            slot_next[b] += 1
        # second neighbors: the OTHER partner of each bond partner
        for ch in (0, 1):
            p = ptab[:N, ch]
            has = p < N
            pa = np.where(has, p, 0)
            other = np.where(ptab[pa, 0] == np.arange(N, dtype=np.int32),
                             ptab[pa, 1], ptab[pa, 0])
            ptab[:N, 2 + ch] = np.where(has, other, N)
        has_ang = angle_f is not None
        aflag = None
        if has_ang:
            angles = np.asarray(snap.angles.group, np.int64)
            if len(snap.angles.types) != 1 or angles.size == 0:
                return None
            aflag = np.zeros(N + 1, np.int32)
            b0 = ptab[:N, 0]
            b1 = ptab[:N, 1]
            for i, j, k in angles:
                # center j must be bonded to exactly {i, k}
                pj = {ptab[j, 0], ptab[j, 1]}
                if pj != {i, k}:
                    return None
                aflag[j] |= 1
                for end, far in ((i, k), (k, i)):
                    if b0[end] == j and ptab[end, 2] == far:
                        aflag[end] |= 2
                    elif b1[end] == j and ptab[end, 3] == far:
                        aflag[end] |= 4
                    else:
                        return None
        # exclusion analysis: empty, bonds-only, or bonds + 1-3
        def _pair_set(arr):
            if arr is None or len(arr) == 0:
                return set()
            a = np.asarray(arr, np.int64)
            return {(min(x, y), max(x, y)) for x, y in a}
        excl = _pair_set(excl_pairs)
        bond_set = _pair_set(bonds)
        if not excl:
            excl_bond = excl_13 = False
        elif excl == bond_set:
            excl_bond, excl_13 = True, False
        else:
            if not has_ang:
                return None
            set13 = {(min(i, k), max(i, k)) for i, _, k in angles}
            if excl == (bond_set | set13):
                excl_bond = excl_13 = True
            else:
                return None
        bond_kind = 'fene' if isinstance(bond_f, _bond.fene) \
            else 'harmonic'
        return {'ptab': ptab if has_ang else ptab[:, :2],
                'aflag': aflag, 'bond_kind': bond_kind,
                'excl_bond': excl_bond, 'excl_13': excl_13,
                'has_ang': has_ang,
                'bond_force': bond_f, 'angle_force': angle_f}

    def _build_fast_dd(self, *, dd_shape, pair, bonded_objs, excl_pairs,
                       method, kind, eval_name, N, box, rcut, r_buff):
        """Spatial-DD cell-major engine over a ('dz','dy','dx') mesh
        (parallel/fastdd.py) — the engine-integrated analog of the
        reference's DomainDecomposition + per-step
        Communicator::communicate (hoomd/Communicator.cc:1300,
        hoomd/md/IntegratorTwoStep.cc:96-161).  Returns the fast-program
        dict or None (caller falls back to 1-D atom decomposition)."""
        import jax
        import numpy as _np
        import jax.numpy as _jnp
        from .parallel.fastdd import (build_fast_dd_chunk, make_dd_mesh,
                                      plan_fast_dd)
        n_dev = int(_np.prod(dd_shape))
        if n_dev > len(jax.devices()):
            return None
        L = _np.asarray(box.L)
        grid, C = plan_fast_dd(N, L, rcut, r_buff, dd_shape)
        if grid is None:
            return None          # box too small: atom decomposition
        C = max(C, self._grow.get('fast_C', 0))
        mesh = make_dd_mesh(dd_shape)
        ntypes = len(self.particle_types)
        pnames = tuple(sorted(
            pair._pack_params(self)['tables'].keys())) + ('rcut',)
        skin = float(min(L[::-1] / _np.asarray(grid)) - rcut)
        vmax = float(_jnp.max(_jnp.linalg.norm(self._state_raw.vel,
                                               axis=-1)))
        dt = float(getattr(self.integrator_mode, 'dt', 0.005) or 0.005)
        k_dt = getattr(self, '_fast_k_dt', dt)
        if abs(dt - k_dt) > 0.25 * max(k_dt, 1e-12):
            self._grow.pop('fast_m', None)
            self._grow.pop('fast_m_ceil', None)
            self._grow.pop('fast_m_pinned', None)
            self._grow.pop('fast_m_probe_fails', None)
            self._grow.pop('fast_clean_segs', None)
        k_est = int(0.55 * (0.5 * skin) / max(vmax * dt, 1e-12))
        k_rebuild = next((q for q in (8, 6, 4, 3, 2, 1)
                          if q <= max(k_est, 1)), 1)
        if self._grow.get('fast_k_grown'):
            k_rebuild = 8
        cap = self._grow.get('fast_k_cap')
        if cap:
            k_rebuild = min(k_rebuild, cap)
        self._fast_k_dt = dt
        bonded_cfg = self._bonded_cfg_for(pair, bonded_objs, excl_pairs)
        gz, gy, gx = grid
        mig_G = self._grow.get('fast_dd_G') or (
            max(N // max(gz, gy, gx)
                // max((n_dev // max(dd_shape[0], 1)), 1), 8) * 2 + 32)
        to_fast, refresh, run_chunk, to_state = build_fast_dd_chunk(
            N=N, box=box, mesh=mesh, grid=grid, C=C, rcut=rcut,
            r_buff=r_buff, method_kind=kind,
            method_seed=getattr(method, 'seed', 0),
            dtype=self.real_dtype, eval_name=eval_name, pnames=pnames,
            ntypes=ntypes, k_rebuild=k_rebuild, mig_G=mig_G,
            bonded_cfg=tuple(bonded_cfg))
        if getattr(self, '_dd_cuts', None) is not None:
            # live load-balancing cuts survive program rebuilds only if
            # the grid they were made for still matches
            if tuple(len(c) - 1 for c in self._dd_cuts) != tuple(grid):
                self._dd_cuts = None
        return {'to_fast': to_fast, 'refresh': refresh,
                'run_chunk': run_chunk, 'to_state': to_state,
                'flavor': 'dd', 'dd_shape': dd_shape, 'grid': grid,
                'C': C, 'method': method, 'kind': kind, 'rcut': rcut,
                'r_buff': r_buff, 'eval_name': eval_name,
                'pnames': pnames, 'ntypes': ntypes,
                'k_rebuild': k_rebuild, 'skin': skin, 'mig_G': mig_G,
                'rebin_impl': 'dd', 'pair_force': pair,
                'bonded_forces': list(bonded_objs),
                'excl_pairs': excl_pairs, 'mesh': mesh}

    def _fast_dyn(self):
        import jax.numpy as jnp
        fast = self._program['fast']
        f = fast.get('pair_force') or self._program['forces'][0]
        fi = self._program['forces'].index(f)
        fp = self._dyn['forces'][fi]
        pnames = fast['pnames']
        T = fast.get('ntypes', 1)
        charged = fast.get('charged')
        if charged is not None:
            # merged coefficient tables: rcut/lj from the lj pair (if
            # any), kappa from the ewald pair; shift mode is gated to
            # 'none' so e_shift is zero
            ei = self._program['forces'].index(charged['ewald'])
            ep_ = self._dyn['forces'][ei]
            tabs = {'kappa': ep_['tables']['kappa']}
            rc = fp['rcut']
            if charged['lj'] is not None:
                tabs['lj1'] = fp['tables']['lj1']
                tabs['lj2'] = fp['tables']['lj2']
            tabs['rcut'] = rc
            rc2 = rc * rc
            if T == 1:
                pv = jnp.stack([rc2[0, 0], jnp.zeros((), self.real_dtype)]
                               + [tabs[k][0, 0] for k in pnames])
            else:
                pv = jnp.stack([rc2, jnp.zeros_like(rc2)]
                               + [tabs[k] for k in pnames])
            out = {'pv': pv, 'dt': self._dyn['dt'], 'lj': pv}
            mp = self._dyn['methods'][0]
            kind = fast['kind']
            if kind in ('langevin', 'nvt'):
                out['kT'] = mp['kT']
            else:
                out['kT'] = (jnp.zeros((1,), self.real_dtype),
                             jnp.ones((1,), self.real_dtype))
            out['tau'] = mp.get('tau', jnp.ones((), self.real_dtype))
            gam = mp.get('gamma')
            out['gamma'] = (gam[0] if gam is not None
                            else jnp.ones((), self.real_dtype))
            # tag-space fixed-topology params (same order as the
            # build's bonded_cfg): user bonded forces, then the
            # charged exclusion correction (lj + erfc real-space +
            # mesh erf part; see _bonded_cfg_for)
            bd = []
            for g in fast.get('bonded_forces', ()):
                gi = self._program['forces'].index(g)
                bd.append(self._dyn['forces'][gi])
            ep = fast.get('excl_pairs')
            if ep is not None:
                tids = np.asarray(
                    self.snapshot_template.particles.typeid)
                ti = tids[ep[:, 0]]
                tj = tids[ep[:, 1]]
                p = {}
                if charged['lj'] is not None:
                    p['lj1'] = fp['tables']['lj1'][ti, tj]
                    p['lj2'] = fp['tables']['lj2'][ti, tj]
                p['kappa'] = ep_['tables']['kappa'][ti, tj]
                rc_e = rc[ti, tj]
                p['rcut2'] = rc_e * rc_e
                q = np.asarray(
                    self.snapshot_template.particles.charge)
                p['qiqj'] = jnp.asarray(
                    q[ep[:, 0]] * q[ep[:, 1]], self.real_dtype)
                bd.append(p)
            out['bonded'] = tuple(bd)
            if charged['mesh'] is not None:
                mi = self._program['forces'].index(charged['mesh'])
                out['mesh'] = self._dyn['forces'][mi]
            return out
        if T == 1:
            rc = fp['rcut'][0, 0]
            rc2 = rc * rc
            scal = {k: fp['tables'][k][0, 0] for k in fp['tables']}
            scal['rcut'] = rc
            if f.mode == 'shift':
                _, e_shift = f._evaluator.energy_force(rc2, scal)
            else:
                e_shift = jnp.zeros((), self.real_dtype)
            pv = jnp.stack([rc2, e_shift] + [scal[k] for k in pnames])
        else:
            rc = fp['rcut']                            # (T, T)
            rc2 = rc * rc
            tabs = {k: fp['tables'][k] for k in fp['tables']}
            tabs['rcut'] = rc
            if f.mode == 'shift':
                _, e_shift = f._evaluator.energy_force(rc2, tabs)
            else:
                e_shift = jnp.zeros_like(rc2)
            pv = jnp.stack([rc2, e_shift]
                           + [tabs[k] for k in pnames])   # (NP, T, T)
        mp = self._dyn['methods'][0]
        out = {'pv': pv, 'dt': self._dyn['dt']}
        if fast.get('eval_name') == 'lj' and T == 1:
            scal = {k: fp['tables'][k][0, 0] for k in fp['tables']}
            out['lj'] = jnp.stack([scal['lj1'], scal['lj2'],
                                   fp['rcut'][0, 0] ** 2, e_shift])
        else:
            out['lj'] = pv   # unused by the generic impls
        kind = fast['kind']
        if kind in ('langevin', 'nvt'):
            out['kT'] = mp['kT']
        else:
            out['kT'] = (jnp.zeros((1,), self.real_dtype),
                         jnp.ones((1,), self.real_dtype))
        out['tau'] = mp.get('tau', jnp.ones((), self.real_dtype))
        gam = mp.get('gamma')
        out['gamma'] = (gam[0] if gam is not None
                        else jnp.ones((), self.real_dtype))
        # tag-space fixed-topology params, aligned with the build's
        # bonded_cfg order: user bonded forces first, then the
        # exclusion-pair correction (per-pair evaluator params gathered
        # by the STATIC endpoint typeids)
        bd = []
        for g in fast.get('bonded_forces', ()):
            gi = self._program['forces'].index(g)
            bd.append(self._dyn['forces'][gi])
        ch = fast.get('chain')
        if ch is not None:
            gi = self._program['forces'].index(ch['bond_force'])
            bp = self._dyn['forces'][gi]
            z = jnp.zeros((), self.real_dtype)
            if ch['bond_kind'] == 'fene':
                sig = bp['sigma'][0]
                eps = bp['epsilon'][0]
                s6 = sig ** 6
                bvec = [bp['k'][0], bp['r0'][0] ** 2,
                        4.0 * eps * s6 * s6, 4.0 * eps * s6,
                        2.0 ** (1.0 / 3.0) * sig ** 2]
            else:
                bvec = [bp['k'][0], bp['r0'][0], z, z, z]
            if ch['angle_force'] is not None:
                ai = self._program['forces'].index(ch['angle_force'])
                ap = self._dyn['forces'][ai]
                bvec += [ap['k'][0], ap['t0'][0]]
            else:
                bvec += [z, z]
            out['bpar'] = jnp.stack(
                [jnp.asarray(v, self.real_dtype) for v in bvec])
        ep = fast.get('excl_pairs')
        if ep is not None:
            tids = np.asarray(self.snapshot_template.particles.typeid)
            ti = tids[ep[:, 0]]
            tj = tids[ep[:, 1]]
            p = {k: fp['tables'][k][ti, tj] for k in fp['tables']}
            rc_e = fp['rcut'][ti, tj]
            p['rcut2'] = rc_e * rc_e
            p['rcut'] = rc_e       # needs_rcut evaluators (fslj, dpdc)
            if f.mode == 'shift':
                _, es = f._evaluator.energy_force(rc_e * rc_e, p)
            else:
                es = jnp.zeros_like(rc_e)
            p['e_shift'] = es
            bd.append(p)
        if bd:
            out['bonded'] = tuple(bd)
        if fast.get('flavor') == 'dd':
            # live load-balancing plane cuts (z, y, x fractions): a
            # traced operand, so update.balance moves them at zero
            # recompile cost (reference LoadBalancer.h:46-144)
            cuts = getattr(self, '_dd_cuts', None)
            if cuts is None:
                gz, gy, gx = fast['grid']
                cuts = (np.linspace(0.0, 1.0, gz + 1, dtype=np.float32),
                        np.linspace(0.0, 1.0, gy + 1, dtype=np.float32),
                        np.linspace(0.0, 1.0, gx + 1, dtype=np.float32))
            out['cuts'] = tuple(jnp.asarray(c, jnp.float32)
                                for c in cuts)
        return out

    def _run_fast_chunk(self, chunk):
        """Execute one chunk on the cell-major engine in bounded
        segments, with grow-and-retry on cell-capacity overflow and
        shrink-and-retry on a dangerous rebuild window (Verlet skin
        crossed between fixed-cadence rebuilds).  The carry stays
        device-resident across chunks; State is materialized lazily by
        the ``state`` property only when a host op actually reads it."""
        # the rebuild window k was sized for the dt in effect at compile
        # time; a materially different dt (e.g. equilibration at small
        # dt, production at full dt) would trigger a danger-retry storm
        # or waste rebuilds — re-plan instead, and drop any danger cap
        # that the stale window caused
        dt_now = float(getattr(self.integrator_mode, 'dt', 0.005)
                       or 0.005)
        k_dt = getattr(self, '_fast_k_dt', dt_now)
        if abs(dt_now - k_dt) > 0.25 * max(k_dt, 1e-12):
            self._grow.pop('fast_k_cap', None)
            self._grow.pop('fast_m', None)
            self._grow.pop('fast_m_ceil', None)
            self._grow.pop('fast_m_pinned', None)
            self._grow.pop('fast_m_probe_fails', None)
            self._grow.pop('fast_k_grown', None)
            self._grow.pop('fast_k_grow_block', None)
            self._grow.pop('fast_clean_segs', None)
            self._rebuild_program()
            self._pack_dyn()
        done = 0
        import os as _os
        import time as _time
        dbg = _os.environ.get('HOOMD_TPU_DEBUG_FAST')
        # segment size bounds the retry redo cost; each segment pays
        # one device->host flag fetch (a full tunnel round-trip), so
        # clean segments earn exponentially longer ones
        seg_cap = getattr(self, '_fast_seg_cap', 512)
        while done < chunk:
            seg = min(seg_cap, chunk - done)
            for attempt in range(6):
                m_now = max(int(self._grow.get('fast_m', 1)), 1)
                if dbg:
                    print(f"[fast] seg={seg} attempt={attempt} "
                          f"k={self._program['fast']['k_rebuild']} "
                          f"m={m_now} t={_time.time():.1f}", flush=True)
                fast = self._program['fast']
                m = fast['method']
                fdyn = self._dyn['fast']
                carry0 = self._fast_carry
                if carry0 is None:
                    aux = self._method_aux_by_obj.get(m) \
                        or m._init_aux(self._state_raw)
                    if not isinstance(aux, dict):
                        aux = {}
                    if fast.get('flavor') == 'dd':
                        carry0 = fast['to_fast'](self._state_raw, aux,
                                                 cuts=fdyn.get('cuts'))
                    else:
                        carry0 = fast['to_fast'](self._state_raw, aux)
                    carry0 = fast['refresh'](carry0, fdyn)
                carry = fast['run_chunk'](carry0, fdyn, seg, m_now)
                # ONE packed device->host fetch for all control flags:
                # each separate bool()/float() is a full tunnel
                # round-trip (~15 ms on remote backends)
                import jax as _jax
                import jax.numpy as _j
                cm = carry.chain_miss if carry.chain_miss is not None \
                    else _j.zeros((), bool)
                fl = np.asarray(_jax.device_get(_j.stack([
                    carry.overflow.astype(_j.float32),
                    carry.danger.astype(_j.float32),
                    carry.rebin_ovf.astype(_j.float32),
                    carry.wmax.astype(_j.float32),
                    cm.astype(_j.float32)])))
                ovf = bool(fl[0] > 0.5)
                dng = bool(fl[1] > 0.5)
                rbo = bool(fl[2] > 0.5)
                cmiss = bool(fl[4] > 0.5)
                if dbg and (ovf or dng or rbo or cmiss):
                    print(f"[fast] flags ovf={ovf} dng={dng} rbo={rbo} "
                          f"cmiss={cmiss} "
                          f"wmax={float(fl[3]):.4g} "
                          f"rebin={fast.get('rebin_impl')} "
                          f"C={fast.get('C')}", flush=True)
                if not (ovf or dng or rbo or cmiss):
                    self._fast_carry = carry
                    self._fast_state_stale = True
                    seg_cap = min(seg_cap * 2, 8192)
                    self._fast_seg_cap = seg_cap
                    # adaptive cadence, optimistic: the in-kernel
                    # danger check + segment retry makes ANY cadence
                    # exact, so each clean segment DOUBLES the
                    # per-cycle window count fast_m (a traced operand:
                    # no recompile) up to a ceiling that a dangerous
                    # probe pins — at most log2(64) probe retries per
                    # run, no storms.  The measured-drift linear
                    # extrapolation (ballistic worst case from the
                    # kernel-reported max drift^2) only FAST-TRACKS
                    # growth past doubling when it is confident.
                    k_now = fast.get('k_rebuild', 8)
                    cadence = k_now * m_now
                    ceil_m = int(self._grow.get('fast_m_ceil', 64))
                    # a pinned ceiling decays: after 4 consecutive
                    # clean segments at the ceiling, allow one more
                    # doubling probe (transients — e.g. right after a
                    # melt — pin it low; the equilibrated system
                    # deserves a re-try).  Probe segments restart at
                    # the small segment size so a failed probe redoes
                    # little work.
                    clean = self._grow.get('fast_clean_segs', 0) + 1
                    self._grow['fast_clean_segs'] = clean
                    # probe AMNESTY: strikes earned during transients
                    # (melt, dt switch) must not bind at steady state —
                    # a 2-strike stop recorded then once pinned the
                    # bench at cadence 4 (measured 53M vs 65M pss).  A
                    # long clean streak clears the pin and the strike
                    # count: the cost of a wrong re-probe is one small
                    # segment, the cost of a wrong permanent pin is
                    # unbounded
                    # (the pin itself stays, so the re-probe is the
                    # gentle +1 kind; and a failed probe restarts at
                    # the 512-step segment size while clean segments
                    # have grown to 8192, so the worst-case redo tax
                    # of periodic amnesty is <1%)
                    if clean == 16 \
                            and (self._grow.get('fast_m_probe_fails')
                                 or self._grow.get('fast_xsel_fails')):
                        self._grow.pop('fast_m_probe_fails', None)
                        # same amnesty for xsel strikes: transient-heavy
                        # starts (melts) must not permanently cost the
                        # fast rebin at steady state
                        self._grow.pop('fast_xsel_fails', None)
                        self._grow['fast_clean_segs'] = 0
                        if dbg:
                            print("[fast] probe amnesty (16 clean)",
                                  flush=True)
                    # temporary sort-rebuild fallback after an xsel
                    # failure (melt transients): re-enable xsel once
                    # the system has run clean for a while
                    xr = self._grow.get('fast_xsel_retry')
                    if xr:
                        if xr <= 1:
                            self._grow.pop('fast_xsel_retry', None)
                            # lifetime flip cap (NOT subject to the
                            # probe amnesty): a condensing gas fails
                            # xsel indefinitely, and the re-enable /
                            # re-fail cycle costs two program rebuilds
                            # per lap — the README N=1000 bench spent
                            # 90% of its walltime in this loop
                            flips = self._grow.get(
                                'fast_xsel_flips', 0) + 1
                            self._grow['fast_xsel_flips'] = flips
                            if flips <= 2:
                                self._grow.pop('fast_rebin_sort', None)
                                self._rebuild_program()
                                self._pack_dyn()
                        else:
                            self._grow['fast_xsel_retry'] = xr - 1
                    if (ceil_m < 64 and m_now >= ceil_m and clean >= 4
                            and self._grow.get('fast_m_probe_fails', 0)
                            < 2):
                        # danger pinned the ceiling at a MEASURED edge:
                        # re-probe one window at a time (a doubling
                        # probe from a pinned edge nearly always re-hits
                        # danger and redoes the segment — measured as
                        # the 0.99 vs 1.19 ms/step steady-state split).
                        # After TWO failed probes of the same edge, stop
                        # probing for good: the edge is physics (skin /
                        # drift), and each failed probe redoes a whole
                        # segment (measured ~15% steady-state loss from
                        # endless 2<->3 thrash)
                        ceil_m = min(ceil_m + 1, 64) \
                            if self._grow.get('fast_m_pinned') \
                            else min(ceil_m * 2, 64)
                        self._grow['fast_m_ceil'] = ceil_m
                        self._grow['fast_clean_segs'] = 0
                        seg_cap = 512
                        self._fast_seg_cap = seg_cap
                    m_next = m_now
                    if seg >= 2 * cadence and m_now < ceil_m:
                        import math
                        # wmax is the NORMALIZED max drift ratio (the
                        # kernels report max_a drift_a^2/(skin_a/2)^2;
                        # danger fires at 1.0)
                        wmax = float(fl[3])
                        m_next = m_now * 2
                        if wmax > 0.0:
                            cad_max = cadence * 0.7 / max(
                                math.sqrt(wmax), 1e-9)
                            m_next = max(m_next, int(cad_max // k_now))
                        m_next = min(m_next, ceil_m,
                                     max(seg // (2 * k_now), 1))
                        if m_next > m_now:
                            if dbg:
                                print(f"[fast] grow m {m_now}->"
                                      f"{m_next} (wmax={wmax:.4g})",
                                      flush=True)
                            self._grow['fast_m'] = m_next
                            import jax.numpy as _j
                            self._fast_carry = carry.replace(
                                wmax=_j.zeros_like(carry.wmax))
                    # grow the KERNEL window when the ACHIEVED clean
                    # cadence (m_now just ran clean — not the untested
                    # optimistic probe) shows 4x headroom over the
                    # plan: per-window dispatch overhead halves (one
                    # recompile, amortized by the persistent cache).
                    # Never after a danger shrink (fast_k_cap is
                    # measured truth).
                    if (k_now < 4 and m_now >= 4
                            and 'fast_k_cap' not in self._grow
                            and not self._grow.get('fast_k_grow_block')
                            and not self._grow.get('fast_k_grown')):
                        self._grow['fast_k_grown'] = True
                        self._grow['fast_m'] = max(
                            (k_now * max(m_next, m_now)) // 4, 1)
                        if dbg:
                            print(f"[fast] grow k {k_now}->4",
                                  flush=True)
                        self._rebuild_program()
                        self._pack_dyn()
                    break
                # recover the pre-segment state, adjust, retry (only
                # capacity/impl changes force a program rebuild — a
                # cadence shrink is free); retries re-earn segment size
                seg_cap = 512
                self._fast_seg_cap = seg_cap
                seg = min(seg, seg_cap)
                if not bool(carry0.overflow):
                    self._state_raw = fast['to_state'](carry0,
                                                       self._state_raw)
                self._fast_carry = None
                self._fast_state_stale = False
                need_rebuild = False
                if ovf:
                    if not self._grow.get('fast_plan_conservative') \
                            and fast.get('flavor') != 'dd':
                        # first cell-capacity overflow: the dense-liquid
                        # capacity model was too brave for this system
                        # (clustering / dilute) — replan the whole grid
                        # with the Poissonian margin before growing C in
                        # place (an in-place grow can push 3C past one
                        # lane tile and degrade the kernel to XLA)
                        self._grow['fast_plan_conservative'] = True
                    elif fast.get('flavor') != 'dd' \
                            and fast.get('C', 40) < 40 \
                            and not self._grow.get('fast_plan_maxC'):
                        # grow WITHIN the one-lane-tile limit first:
                        # the blind 1.5x+8 grow once pushed C 32 -> 56
                        # (3C = 168) and silently demoted the README
                        # bench to the XLA impl for the rest of the run
                        self._grow['fast_C'] = 40
                    elif fast.get('flavor') != 'dd' and \
                            self._grow.get('fast_plan_maxC', 40) > 16:
                        # C = 40 still overflows: force a FINER grid
                        # with real headroom (mean occupancy bounded by
                        # max_C with the conservative margin) instead
                        # of leaving the kernel tile
                        self._grow['fast_plan_maxC'] = \
                            {40: 24, 24: 16}.get(
                                self._grow.get('fast_plan_maxC', 40),
                                16)
                        self._grow.pop('fast_C', None)
                    else:
                        self._grow['fast_C'] = int(fast['C'] * 1.5) + 8
                    need_rebuild = True
                if rbo and ovf and fast.get('flavor') != 'dd':
                    # a cell-capacity overflow already forces a replan/
                    # regrow; the simultaneous rebin overflow is a
                    # symptom of the same event (e.g. a commensurate
                    # lattice overflowing both C and the xsel transient
                    # stage) — don't also burn an xsel strike
                    pass
                elif rbo:
                    if fast.get('flavor') == 'dd':
                        # migration buffers overflowed (or a particle
                        # out-ran the single-hop protocol): double the
                        # per-axis packed-buffer capacity
                        self._grow['fast_dd_G'] = \
                            int(fast.get('mig_G', 64)) * 2
                    elif self._program['fast'].get('rebin_impl') \
                            == 'xsel':
                        # xsel transient-stage overflow or conservation
                        # miss: retry the segment on the sort rebuild.
                        # Melt transients cause this legitimately, so
                        # re-enable xsel after 8 clean segments (up to
                        # 3 times; then sort for good)
                        fails = self._grow.get('fast_xsel_fails', 0) + 1
                        self._grow['fast_xsel_fails'] = fails
                        self._grow['fast_rebin_sort'] = True
                        self._grow.pop('fast_xsel_retry', None)
                        if fails <= 3:
                            self._grow['fast_xsel_retry'] = 8
                    # plane-local rebin buffers overflowed (heavy local
                    # density churn): widen the emigrant buffers once
                    # (E 8 -> 16 costs ~2x rebin time, measured), then
                    # fall back to the sort rebuild for the rest of
                    # this simulation
                    elif self._program['fast'].get('rebin_E', 8) < 16:
                        self._grow['fast_rebin_E'] = 16
                    else:
                        self._grow['fast_rebin_sort'] = True
                    need_rebuild = True
                if cmiss and not ovf:
                    # a chain partner fell outside the stencil at a
                    # rebuild: the in-kernel bonded path cannot see it.
                    # Permanently fall back to the one_step tag-space
                    # bonded path for this simulation (correct for any
                    # geometry); the reference has no analog cliff —
                    # its bond kernels gather by index
                    from .util import notice
                    notice(2, "fast engine: chain partner left the "
                              "27-cell stencil; falling back to the "
                              "tag-space bonded path")
                    self._grow['fast_chain_off'] = True
                    need_rebuild = True
                if dng:
                    if m_now > 1:
                        # back off: ONE window when the edge was barely
                        # crossed (the usual case — halving overshoots
                        # and the doubling re-probe re-hits danger, an
                        # oscillation that cost ~20% steady state), but
                        # PROPORTIONALLY when the kernel-reported drift
                        # ratio is large (a gas config once overshot
                        # 6.8x and the -1 ladder retried whole segments
                        # for each rung)
                        import math as _math
                        wm = max(float(fl[3]), 1.0)
                        if _math.isnan(wm):
                            # diverged dynamics report wmax=nan; back
                            # off maximally instead of crashing on
                            # int(nan)
                            wm = float('inf')
                        m_tgt = max(
                            int(m_now * 0.8 / _math.sqrt(wm))
                            if _math.isfinite(wm) else 1, 1)
                        m_tgt = min(m_tgt, m_now - 1)
                        if self._grow.get('fast_m_pinned'):
                            # a re-probe of an already-measured edge
                            # failed again: count toward the 2-strike
                            # probe stop
                            self._grow['fast_m_probe_fails'] = \
                                self._grow.get('fast_m_probe_fails',
                                               0) + 1
                        self._grow['fast_m'] = max(m_tgt, 1)
                        self._grow['fast_m_ceil'] = max(m_tgt, 1)
                        self._grow['fast_m_pinned'] = True
                        self._grow['fast_clean_segs'] = 0
                    elif self._grow.get('fast_k_grown'):
                        # revert the opportunistic k growth first: the
                        # plan-k program was already compiled earlier
                        # this process, so this shrink is cheap —
                        # quantized k-cap steps would each pay a fresh
                        # Mosaic compile (measured: a danger storm of
                        # recompiles took a 3000-step run to 209 s)
                        self._grow.pop('fast_k_grown')
                        self._grow['fast_k_grow_block'] = True
                        self._grow['fast_clean_segs'] = 0
                        need_rebuild = True
                    else:
                        k_now = fast.get('k_rebuild', 8)
                        self._grow['fast_k_cap'] = next(
                            (q for q in (8, 6, 4, 3, 2, 1) if q < k_now),
                            1)
                        need_rebuild = True
                if need_rebuild:
                    self._rebuild_program()
                    self._pack_dyn()
            else:
                raise RuntimeError(
                    "fast LJ engine: capacity overflow or dangerous "
                    "rebuild persists after repeated adjustment — this "
                    "usually means the dynamics diverged (NaN "
                    "positions); check dt and the initial configuration")
            done += seg

    def _ensure_ready(self):
        if self._program is None or self._dirty_flag:
            self._rebuild_program()
        if self._params_dirty or self._dyn is None:
            self._pack_dyn()
        self._apply_sharding()

    # -- multi-device sharding -------------------------------------------------
    def _mesh(self):
        from . import context
        ctx = context.current
        return getattr(ctx, 'mesh', None) if ctx is not None else None

    def _apply_sharding(self):
        """Lay the particle state over the context's device mesh.

        The reference distributes by spatial DomainDecomposition + ghost
        exchange hand-wired into every step
        (hoomd/Communicator.cc:1300, md/IntegratorTwoStep.cc:96-161).
        Here the SAME job-script engine runs multi-device: every (N,...)
        array is sharded over the 'domain' mesh axis with NamedSharding
        and XLA's SPMD partitioner inserts the collectives for the cell
        build, force sums and thermostat reductions.  One code path,
        any device count.  device_put on an already-correctly-sharded
        array is a no-op, so calling this every run boundary is cheap.
        """
        mesh = self._mesh()
        if mesh is None or self._program is None:
            return
        if self._program.get('fast'):
            return
        if self._program['kind'] not in ('md', 'hpmc'):
            return
        # hpmc rides the same path: the checkerboard sweep is dense and
        # data-parallel over particles/cells, so sharding the state
        # arrays partitions the trial-move/overlap work the way the
        # reference's cell-set scheme shards over spatial domains
        # (hpmc/IntegratorHPMCMonoGPU.cuh:124-160)
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        N = self.state.N
        nshard = mesh.devices.size
        # MPCD solvent arrays (mpcd aux pos/vel, (N_solvent, 3)) shard
        # over the same particle axis: the solvent's bin/scatter-add
        # collision math is data-parallel over solvent particles, the
        # reference's mpcd::Communicator role collapsing into GSPMD
        # collectives (reference mpcd/Communicator.h)
        lead_ok = {N} if N % nshard == 0 else set()
        mm = getattr(self, '_mpcd_method', None)
        if mm is not None:
            aux = self._method_aux_by_obj.get(mm)
            if aux and 'pos' in aux and hasattr(aux['pos'], 'shape'):
                ns = aux['pos'].shape[0]
                if ns % nshard == 0:
                    lead_ok.add(ns)

        def spec_for(leaf):
            if (hasattr(leaf, 'ndim') and leaf.ndim >= 1
                    and leaf.shape[0] in lead_ok):
                return NamedSharding(
                    mesh, P('domain', *([None] * (leaf.ndim - 1))))
            return NamedSharding(mesh, P())   # replicate small leaves

        def put(tree):
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, spec_for(x)), tree)

        self.state = put(self.state)
        if self._nl_data is not None:
            self._nl_data = put(self._nl_data)
        if self._method_aux is not None:
            self._method_aux = put(self._method_aux)
        if self._mode_aux is not None:
            self._mode_aux = put(self._mode_aux)

    def reset_nlist(self):
        """Force neighbor rebuild on next step (after sorts/snapshot
        restores)."""
        if self._program is not None and self._program['kind'] == 'md':
            dtype = self.state.pos.dtype
            self._nl_data = tuple(
                fresh_neighbor_list(self.state.N, cfg.max_neigh, dtype)
                for cfg in self._program['nl_cfgs'])

    # -- overflow handling ----------------------------------------------------
    def _check_overflow(self, nls):
        """Returns True when capacities were grown or the cell grid became
        invalid (retry needed)."""
        grew = False
        L = np.asarray(self.state.box.L)
        dims = self.state.box.dimensions
        for nl_obj, data, cfg in zip(self._program['nlists'], nls,
                                     self._program['nl_cfgs']):
            g = self._grow.setdefault(nl_obj, {})
            if bool(data.overflow):
                g['max_neigh'] = max(g.get('max_neigh', 0),
                                     int(cfg.max_neigh * 1.5) + 8)
                grew = True
            if bool(data.cell_overflow):
                g['cell_cap'] = max(g.get('cell_cap', 0),
                                    int(cfg.cell_cap * 1.5) + 4)
                grew = True
            # box deformation (NPT/box_resize) can shrink cells until the
            # stencil no longer covers the interaction range: re-grid and
            # retry (reference CellList recomputes its dimensions on box
            # changes, CellList.cc).  Coverage is per-axis width*reach
            # (reach > 1 for the stencil/tree fine-grid variants).
            reach = getattr(cfg, 'reach', (1, 1, 1))
            covered = min(L[d] / cfg.cell_dim[d] * reach[d]
                          for d in range(dims))
            if covered < cfg.r_max * 0.9999:
                grew = True
        if grew:
            self._rebuild_program()
            self._pack_dyn()
        return grew

    # -- run loop ---------------------------------------------------------------
    def run(self, nsteps, callback=None, callback_period=0, quiet=False,
            limit_hours=None, limit_multiple=1, profile=False):
        """Advance the simulation (reference hoomd.run, System::run
        System.cc:419-620).  profile=True prints a wall-time breakdown of
        device chunks vs host-side operations (the reference Profiler's
        push/pop tree, hoomd/Profiler.h:62-116, collapsed to the two
        phases that exist in this architecture)."""
        import jax
        nsteps = int(nsteps)
        prof = {'device_s': 0.0, 'host_ops_s': 0.0, 'chunks': 0,
                'host_fires': 0, 'ops': {},
                'rebuilds0': None, 'rebuilds': 0} if profile else None
        self._ensure_ready()
        start = self.timestep
        end = start + nsteps
        t_wall0 = time.perf_counter()
        deadline = (t_wall0 + limit_hours * 3600.0) if limit_hours else None
        # HOOMD_WALLTIME_STOP (reference System.cc:520-549): absolute
        # unix time the job will be killed; end the run at the last
        # chunk the measured step rate predicts completes before it
        import os as _os
        _wts = _os.environ.get('HOOMD_WALLTIME_STOP')
        wstop = float(_wts) if _wts else None
        t_unix0 = time.time()

        def _wstop_hit(next_chunk):
            if wstop is None:
                return False
            now = time.time()
            done_steps = max(self.timestep - start, 1)
            rate = (now - t_unix0) / done_steps
            return now + next_chunk * rate > wstop

        # SIGINT ends the run at the next chunk boundary with valid state
        # (reference SignalHandler.cc / System.cc:610-615 g_sigint_recvd);
        # a second Ctrl-C falls through to the default KeyboardInterrupt
        import signal
        sigint = {'hit': False}
        prev_handler = None

        def _on_sigint(signum, frame):
            sigint['hit'] = True
            signal.signal(signal.SIGINT, prev_handler or signal.SIG_DFL)
        try:
            prev_handler = signal.signal(signal.SIGINT, _on_sigint)
        except ValueError:          # non-main thread: no handler swap
            prev_handler = None

        # initial force computation so step1 sees valid accelerations
        # (the fast engine computes its own via refresh on conversion)
        if self._program['kind'] == 'md' and not self._program.get('fast'):
            self._prep_forces()

        # the global Hilbert sorter is redundant under the fast engine: the
        # carry IS spatially sorted (re-binned every Verlet rebuild), and
        # firing it would force a carry round-trip each period
        from .update import sort as _sort_cls
        skip_sorter = bool(self._program.get('fast'))

        cur = start
        if not quiet:
            print(f"** starting run at step {cur} **")
        while cur < end:
            # fire host-side ops due at this step
            for op in self.analyzers + self.updaters:
                if skip_sorter and isinstance(op, _sort_cls):
                    continue
                if op._due(cur):
                    t_op = time.perf_counter()
                    self._fire(op, cur)
                    if prof is not None:
                        d_op = time.perf_counter() - t_op
                        prof['host_ops_s'] += d_op
                        prof['host_fires'] += 1
                        nm = type(op).__name__
                        e = prof['ops'].setdefault(nm, [0.0, 0])
                        e[0] += d_op
                        e[1] += 1
            if callback is not None and callback_period and \
                    cur % callback_period == 0:
                res = callback(cur)
                if res is not None and res < 0:
                    break
            # next host-boundary
            stops = [end]
            for op in self.analyzers + self.updaters:
                if skip_sorter and isinstance(op, _sort_cls):
                    continue
                nxt = op._next_stop(cur)
                if nxt is not None:
                    stops.append(nxt)
            if callback is not None and callback_period:
                stops.append(cur + callback_period
                             - (cur % callback_period))
            chunk = int(min(stops)) - cur
            chunk = max(chunk, 1)
            # an op may have reconfigured the simulation (wall moves,
            # enable/disable, set_params): rebuild/repack before the
            # next device chunk (reference: ops mutate the C++ objects
            # the next step reads directly)
            self._ensure_ready()

            t_chunk = time.perf_counter()
            if self._program['kind'] == 'md' and self._program.get('fast'):
                self._run_fast_chunk(chunk)
                cur += chunk
                if prof is not None:
                    _device_sync(self.state.pos)
                    prof['device_s'] += time.perf_counter() - t_chunk
                    prof['chunks'] += 1
                if sigint['hit']:
                    if not quiet:
                        print("** caught SIGINT: ending run **")
                    break
                if deadline and time.perf_counter() > deadline:
                    if not quiet:
                        print("** walltime limit reached **")
                    break
                if _wstop_hit(min(chunk, end - cur)):
                    if not quiet:
                        print("** HOOMD_WALLTIME_STOP predicted: "
                              "ending run **")
                    break
                continue
            if self._program['kind'] == 'hpmc':
                state0 = self.state
                # move sizes/seed ride a tiny traced dict repacked every
                # chunk: set_params/tuners take effect without recompiles
                hdyn = self._program['pack_hdyn']()
                for _ in range(8):
                    state, counters = self._program['run_chunk'](
                        state0, self._hpmc_counters, hdyn, chunk)
                    cell_ovf = bool(counters['cell_overflow'])
                    cand_ovf = bool(counters.get('cand_overflow', False))
                    dep_ovf = bool(counters.get('depletant_overflow',
                                                False))
                    if not (cell_ovf or cand_ovf or dep_ovf):
                        break
                    # grow the overflowed capacity and retry from the
                    # saved state (same protocol as the neighbor list)
                    if cell_ovf:
                        self._grow['hpmc_cell_cap'] = \
                            int(self._program['cell_cap'] * 1.5) + 4
                    if cand_ovf:
                        self._grow['hpmc_cand_cap'] = \
                            int(self._program.get('cand_cap', 32) * 1.5) + 8
                    if dep_ovf:
                        self._grow['hpmc_dep_cap'] = \
                            int(self._program.get('dep_cap', 0) * 1.5) + 8
                    self._rebuild_program()
                else:
                    raise RuntimeError("hpmc cell capacity still "
                                       "overflowing after growth")
                self.state, self._hpmc_counters = state, counters
            else:
                state0 = self.state
                mode_aux0 = self._mode_aux
                for _ in range(16):
                    # retry the chunk from the saved state whenever
                    # capacities grew (immutable states make retry free)
                    state, nls, auxs, mode_aux = self._program['run_chunk'](
                        state0, self._nl_data, self._method_aux, mode_aux0,
                        self._dyn, chunk)
                    if not self._check_overflow(nls):
                        break
                else:
                    raise RuntimeError("neighbor list capacity still "
                                       "overflowing after repeated growth")
                self.state, self._nl_data, self._method_aux = state, nls, \
                    tuple(auxs)
                self._mode_aux = mode_aux
                for m, a in zip(self._program['methods'], auxs):
                    self._method_aux_by_obj[m] = a
            if prof is not None:
                _device_sync(self.state.pos)
                prof['device_s'] += time.perf_counter() - t_chunk
                prof['chunks'] += 1
            cur += chunk
            if sigint['hit']:
                if not quiet:
                    print("** caught SIGINT: ending run **")
                break
            if deadline and time.perf_counter() > deadline:
                if not quiet:
                    print("** walltime limit reached **")
                break
            if _wstop_hit(min(chunk, end - cur)):
                if not quiet:
                    print("** HOOMD_WALLTIME_STOP predicted: "
                          "ending run **")
                break
        if prev_handler is not None:
            try:
                signal.signal(signal.SIGINT, prev_handler)
            except ValueError:
                pass
        # block until the device is done so TPS is honest
        _device_sync(self.state.pos)
        elapsed = time.perf_counter() - t_wall0
        done = self.timestep - start
        self._last_tps = done / elapsed if elapsed > 0 else 0.0
        if not quiet:
            print(f"** run complete: {done} steps in {elapsed:.3f} s = "
                  f"{self._last_tps:.1f} TPS **")
        if prof is not None and not quiet:
            # hierarchical breakdown, the reference Profiler's output
            # role (hoomd/Profiler.h:62-116 push/pop tree)
            other = elapsed - prof['device_s'] - prof['host_ops_s']
            print(f"** profile ({done} steps, {elapsed:.3f} s wall) **")
            print(f"  device step loop   {prof['device_s']:9.3f} s "
                  f"({prof['chunks']} chunks)")
            if self._program.get('fast') and self._fast_carry is not None:
                nr = int(self._fast_carry.n_rebuilds)
                print(f"    cell rebuilds    {nr:9d} total "
                      f"(every ~{done / max(nr, 1):.1f} steps)")
            print(f"  host-side ops      {prof['host_ops_s']:9.3f} s "
                  f"({prof['host_fires']} fires)")
            for nm, (t_s, n_f) in sorted(prof['ops'].items(),
                                         key=lambda kv: -kv[1][0]):
                print(f"    {nm:<16s} {t_s:9.3f} s ({n_f} fires)")
            print(f"  dispatch/other     {other:9.3f} s")

    def _prep_forces(self):
        """Evaluate all forces at the current positions
        (reference Integrator::prepRun).  Loops on capacity growth until
        the neighbor list fits (the reference grows its nlist the same
        way, md/NeighborList.cc overflow handling)."""
        for _ in range(16):
            state, nls = self._program['prep'](self.state, self._nl_data,
                                               self._dyn)
            if not self._check_overflow(nls):
                break
        else:
            raise RuntimeError("neighbor list capacity still overflowing "
                               "after repeated growth")
        self.state, self._nl_data = state, nls
        self._forces_fresh = True

    def _fire(self, op, ts):
        from .operation import Analyzer
        if isinstance(op, Analyzer):
            op.analyze(self, ts)
        else:
            op.update(self, ts)

    # -- observables -------------------------------------------------------------
    def take_snapshot(self):
        return snapshot_from_state(self.state, self.snapshot_template)

    def restore_snapshot(self, snap):
        self.state = state_from_snapshot(snap)
        self.snapshot_template = snap
        self.particle_types = list(snap.particles.types)
        self._dirty()

    def thermo_quantities(self, member_tags=None):
        """Kinetic/potential/temperature/pressure over a group
        (reference ComputeThermo.cc:189-404).  Computed from the state's
        cached net_pe/net_virial — valid at chunk boundaries."""
        import jax.numpy as jnp
        st = self.state      # materializes a resident fast carry first
        if not self._forces_fresh and self.forces:
            # forces never evaluated at these positions (fresh init/restore)
            self._ensure_ready()
            self._prep_forces()
            st = self.state
        if member_tags is None:
            mask = jnp.ones((st.N,), dtype=bool)
            n_g = st.N
        else:
            member = np.zeros(st.N, dtype=bool)
            member[member_tags] = True
            mask = jnp.asarray(member)[st.tag]
            n_g = len(member_tags)
        dim = st.box.dimensions
        mv2 = jnp.where(mask, st.mass * jnp.sum(st.vel ** 2, -1), 0.0)
        ke = 0.5 * float(ksum(mv2))
        pe = float(ksum(jnp.where(mask, st.net_pe, 0.0)))
        ndof = dim * n_g
        T = 2.0 * ke / ndof if ndof else 0.0
        vol = float(st.box.volume())
        w = jnp.where(mask[:, None], st.net_virial, 0.0)
        w_sum = np.asarray(jnp.sum(w, axis=0))
        trace = w_sum[0] + w_sum[3] + w_sum[5]
        P = (2.0 * ke + trace) / (dim * vol)
        mom = np.asarray(jnp.sum(
            jnp.where(mask[:, None], st.mass[:, None] * st.vel, 0.0),
            axis=0))
        # full pressure tensor: P_ab = (sum m v_a v_b + sum virial_ab) / V
        mvv = np.asarray(jnp.sum(
            jnp.where(mask[:, None, None],
                      st.mass[:, None, None]
                      * st.vel[:, :, None] * st.vel[:, None, :], 0.0),
            axis=0))
        ptens = {
            'pressure_xx': float((mvv[0, 0] + w_sum[0]) / vol),
            'pressure_xy': float((mvv[0, 1] + w_sum[1]) / vol),
            'pressure_xz': float((mvv[0, 2] + w_sum[2]) / vol),
            'pressure_yy': float((mvv[1, 1] + w_sum[3]) / vol),
            'pressure_yz': float((mvv[1, 2] + w_sum[4]) / vol),
            'pressure_zz': float((mvv[2, 2] + w_sum[5]) / vol),
        }
        # rotational part (ComputeThermo rotational KE / ndof)
        from .ops.quat import rotational_ke
        ke_rot_pp = rotational_ke(st.orientation, st.angmom,
                                  st.moment_inertia)
        ke_rot = float(ksum(jnp.where(mask, ke_rot_pp, 0.0)))
        ndof_rot = float(np.asarray(jnp.sum(jnp.where(
            mask[:, None], (st.moment_inertia > 1e-12), False))))
        out = {
            'temperature': T, 'pressure': float(P),
            'kinetic_energy': ke, 'potential_energy': pe,
            'rotational_kinetic_energy': ke_rot,
            'rotational_ndof': ndof_rot,
            'temperature_rotational': (2.0 * ke_rot / ndof_rot
                                       if ndof_rot else 0.0),
            'ndof': float(ndof), 'num_particles': float(n_g),
            'volume': vol,
            'lx': float(st.box.L[0]), 'ly': float(st.box.L[1]),
            'lz': float(st.box.L[2]),
            'xy': float(st.box.tilt[0]), 'xz': float(st.box.tilt[1]),
            'yz': float(st.box.tilt[2]),
            'momentum': float(np.linalg.norm(mom)),
        }
        out.update(ptens)
        return out

    def force_energy(self, force, group=None):
        """Total PE of one force (reference ForceCompute::calcEnergySum):
        recomputed on demand from the current state."""
        self._ensure_ready()
        if self._program.get('fast'):
            # the fast engine leaves the general neighbor list stale;
            # refresh it (cond-gated, cheap if still within the skin)
            self._prep_forces()
        p = self._program
        if force not in p['forces']:
            return 0.0
        i = p['forces'].index(force)
        slot = p['force_nl_slot'][i]
        nl = self._nl_data[slot] if slot >= 0 else None
        _, pe, _ = p['force_fns'][i](self.state, nl,
                                     self._dyn['forces'][i])
        import jax.numpy as jnp
        if group is not None:
            member = np.zeros(self.state.N, dtype=bool)
            member[group.member_tags] = True
            pe = jnp.where(jnp.asarray(member)[self.state.tag], pe, 0.0)
        return float(ksum(pe))

    def nlist_min_rebuild_interval(self, nl):
        if self._program is None or nl not in self._program['nlists']:
            return None
        i = self._program['nlists'].index(nl)
        return int(self._nl_data[i].n_rebuilds)

    def restore_method_state(self, method):
        key = type(method).__name__
        if key in self._restored_method_state:
            self._method_aux_by_obj[method] = \
                self._restored_method_state[key]
            self._dirty()
