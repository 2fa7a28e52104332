"""Partition-parallel ensembles: many independent replicas in ONE program.

The reference runs ensembles by splitting the MPI world into partitions
(``mpirun -n 16 ... --nrank=2`` -> 8 independent simulations;
hoomd/comm.py get_partition, hoomd/context.py partition setup, used by
UpdaterMuVT Gibbs partitions).  Every partition executes the same
script with per-partition parameters.

The TPU-native redesign exploits that the general engine's step program
is a pure function: ``replicas(n, vary=...)`` stacks the (state,
neighbor-data, aux, dyn) pytrees along a leading replica axis, ``vmap``s
one compiled ``run_chunk`` over it, and lays the batch over a 'replica'
device mesh axis with NamedSharding — n independent simulations advance
in a single XLA program, one replica per device (or device group), with
zero cross-replica communication.  Per-replica RNG comes from the seeds
riding ``dyn['mseeds']`` (system.py packs them as traced values for
exactly this).

Parameter sweeps (the dominant ensemble use: temperature ladders,
pressure scans) vary any ``set_params``-settable method parameter or
the method seed; each replica's dyn is packed by the same host code
that packs a single run's, so variants/tables behave identically.
"""

from __future__ import annotations

import numpy as np

from . import context


class replicas:
    """n independent copies of the current job-script simulation.

    Usage (after the usual init/force/integrator setup)::

        ens = hoomd_tpu.ensemble.replicas(4, vary={'kT': [0.5, 1, 2, 4]})
        ens.run(10000)
        snap = ens.take_snapshot(2)
        T = ens.thermo(2)['temperature']

    ``vary`` maps a method parameter name to an n-sequence; it is applied
    through the method's ``set_params`` (falling back to setattr) before
    packing that replica's dyn.  Method seeds are automatically offset
    per replica (seed + r) unless ``seeds`` (an n-sequence) is given.

    HPMC systems are supported too (vary any of d/a/move_ratio/nR — they
    ride the sweep program's traced hdyn).  Replicas advance purely
    device-side: host-side analyzers/updaters (loggers, dumps, the
    default SFC sorter) do NOT fire inside ``run`` — use
    ``take_snapshot(i)``/``thermo(i)``/``counters(i)`` between runs, the
    per-partition analysis idiom of the reference's partition scripts.
    """

    def __init__(self, n, vary=None, seeds=None, system=None):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.n = int(n)
        sys_ = system or context.current.system
        if sys_ is None:
            raise RuntimeError("ensemble.replicas: no system — call "
                               "init.* first")
        self._system = sys_
        sys_._ensure_ready()
        prog = sys_._program
        self._kind = prog['kind']
        if self._kind not in ('md', 'hpmc'):
            raise RuntimeError("ensemble.replicas supports the MD and "
                               "HPMC engines")
        self._prog = prog
        vary = dict(vary or {})
        for k, v in vary.items():
            if len(v) != self.n:
                raise ValueError(f"vary[{k!r}] must have length {n}")
        if seeds is not None and len(seeds) != self.n:
            raise ValueError(f"seeds must have length {n}")
        if self._kind == 'hpmc':
            self._init_hpmc(vary, seeds)
            return
        methods = prog['methods']

        # pack each replica's dyn with the per-replica parameters applied
        # on the host (same packing code as a single run — variants,
        # per-type tables, group masks all behave identically)
        saved = [dict(m.__dict__) for m in methods]
        dyns = []
        try:
            for r in range(self.n):
                for j, m in enumerate(methods):
                    if 'seed' not in saved[j]:
                        continue      # deterministic method (e.g. nve)
                    m.seed = (int(seeds[r]) if seeds is not None
                              else int(saved[j]['seed']) + r)
                for k, v in vary.items():
                    hit = False
                    for m in methods:
                        if not hasattr(m, k):
                            continue
                        try:
                            m.set_params(**{k: v[r]})
                        except TypeError:
                            # set_params rejects the kwarg: the attr is
                            # structured (e.g. langevin's gamma dict) —
                            # blind setattr would corrupt it
                            continue
                        hit = True
                    if not hit:
                        raise ValueError(
                            f"vary[{k!r}]: no integration method has "
                            f"that parameter")
                sys_._pack_dyn()
                dyns.append(sys_._dyn)
        finally:
            for m, s in zip(methods, saved):
                m.__dict__.update(s)
            sys_._pack_dyn()

        self._dyn = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                           *dyns)
        state = self._bcast(sys_.state)
        nls = self._bcast(sys_._nl_data)
        auxs = self._bcast(sys_._method_aux)
        mode_aux = self._bcast(sys_._mode_aux)

        put = self._make_sharding(int(sys_.state.N))
        if put is not None:
            state, nls, auxs, mode_aux, self._dyn = (
                put(state), put(nls), put(auxs), put(mode_aux),
                put(self._dyn))

        self._vrun = jax.jit(
            jax.vmap(prog['run_chunk_raw'], in_axes=(0, 0, 0, 0, 0, None)),
            static_argnums=5)
        vprep = jax.jit(jax.vmap(
            lambda s, d, dy: prog['prep'](s, d, dy), in_axes=(0, 0, 0)))
        state, nls = vprep(state, nls, self._dyn)
        self._carry = (state, nls, auxs, mode_aux)

    def _bcast(self, tree):
        import jax
        import jax.numpy as jnp
        return jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(
                jnp.asarray(x)[None], (self.n,) + jnp.shape(x)), tree)

    def _make_sharding(self, N):
        """Two-level device hierarchy (the reference DomainDecomposition's
        node-local sub-grids, hoomd/DomainDecomposition.h:49-175, mapped
        to TPU topology): replicas over the OUTER 'replica' axis (no
        cross-replica communication — this axis can ride DCN across
        slices), each replica's particles over the INNER 'domain' axis
        (collectives stay on ICI).  Returns a put(tree) or None."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        devs = jax.devices()
        R = 0
        for cand in range(min(self.n, len(devs)), 0, -1):
            if self.n % cand == 0:
                R = cand
                break
        D = 1
        if R >= 1 and len(devs) // R > 1:
            D = len(devs) // R
            while D > 1 and N % D != 0:
                D -= 1
        self._sharding = None
        if R > 1 or D > 1:
            self._mesh = Mesh(np.asarray(devs[:R * D]).reshape(R, D),
                              ('replica', 'domain'))

            def spec_for(x):
                if x.ndim >= 2 and x.shape[1] == N and N % D == 0:
                    return P('replica', 'domain',
                             *([None] * (x.ndim - 2)))
                return P('replica', *([None] * (x.ndim - 1)))

            def put(tree):
                return jax.tree_util.tree_map(
                    lambda x: jax.device_put(
                        x, NamedSharding(self._mesh, spec_for(x))), tree)
            self._sharding = put
        return self._sharding

    # -- HPMC replicas ----------------------------------------------------------
    def _init_hpmc(self, vary, seeds):
        """HPMC replicas: the sweep program's move sizes/seed ride the
        traced hdyn (hpmc/integrate.py pack_hdyn), so n independent
        Markov chains run as one vmapped program — the reference's
        partition-parallel HPMC (e.g. Frenkel-Ladd sweeps) without MPI."""
        import jax
        import jax.numpy as jnp
        sys_ = self._system
        mc = sys_.hpmc_integrator
        allowed = ('d', 'a', 'move_ratio', 'nR')
        for k in vary:
            if k not in allowed:
                raise ValueError(
                    f"vary[{k!r}]: hpmc replicas support {allowed}")
        base_seed = int(mc.seed)
        self._hp_overrides = []
        for r in range(self.n):
            ov = {'seed': (int(seeds[r]) if seeds is not None
                           else base_seed + r)}
            for k, v in vary.items():
                ov[k] = float(v[r])
            self._hp_overrides.append(ov)
        # stencil capacity: rebuild once at the max d over replicas so
        # every replica fits the built cell width
        if 'd' in vary:
            dmax = max(ov['d'] for ov in self._hp_overrides)
            built = getattr(mc, '_built_d', {})
            if built and dmax > min(built.values()):
                keep_d, keep_map = mc._default_d, dict(mc.d_by_type)
                mc.d_by_type = {}
                mc._set_move_params(d=dmax)
                sys_._ensure_ready()
                mc._default_d, mc.d_by_type = keep_d, keep_map
        self._prog = sys_._program
        self._dyn = self._hp_pack_all()
        state = self._bcast(sys_.state)
        counters = self._bcast(self._prog['init_counters']())
        put = self._make_sharding(int(sys_.state.N))
        if put is not None:
            state, counters, self._dyn = (put(state), put(counters),
                                          put(self._dyn))
        self._make_hp_vrun()
        self._carry = (state, counters)

    def _hp_pack_all(self):
        import jax
        import jax.numpy as jnp
        mc = self._system.hpmc_integrator
        pack = self._prog['pack_hdyn']
        keys = ('seed', '_default_d', 'd_by_type', '_default_a',
                'a_by_type', 'move_ratio', 'nR')
        saved = {k: getattr(mc, k) for k in keys}
        dyns = []
        try:
            for ov in self._hp_overrides:
                mc.seed = ov['seed']
                if 'd' in ov:
                    mc.d_by_type = {}
                    mc._default_d = ov['d']
                if 'a' in ov:
                    mc.a_by_type = {}
                    mc._default_a = ov['a']
                if 'move_ratio' in ov:
                    mc.move_ratio = ov['move_ratio']
                if 'nR' in ov:
                    mc.nR = ov['nR']
                dyns.append(pack())
        finally:
            for k, v in saved.items():
                setattr(mc, k, v)
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *dyns)

    def _make_hp_vrun(self):
        import jax
        self._vrun = jax.jit(jax.vmap(
            self._prog['run_chunk_raw'], in_axes=(0, 0, 0, None)),
            static_argnums=3)

    def counters(self, i):
        """Python counter dict of replica ``i`` (acceptance etc.)."""
        import jax
        if self._kind != 'hpmc':
            raise RuntimeError("counters(i) is an HPMC accessor")
        c = jax.tree_util.tree_map(lambda x: x[i], self._carry[1])
        return {k: (bool(v) if v.dtype == bool else int(v))
                for k, v in c.items()}

    # -- state access ---------------------------------------------------------
    @property
    def state(self):
        """The stacked (n, ...) state pytree."""
        return self._carry[0]

    def _replica_state(self, i):
        import jax
        return jax.tree_util.tree_map(lambda x: x[i], self._carry[0])

    def take_snapshot(self, i):
        """Snapshot of replica ``i`` (reference: per-partition
        take_snapshot)."""
        sys_ = self._system
        saved = sys_.state
        try:
            sys_.state = self._replica_state(i)
            return sys_.take_snapshot()
        finally:
            sys_.state = saved

    def thermo(self, i):
        """thermo_quantities() of replica ``i``."""
        sys_ = self._system
        saved = sys_.state
        try:
            sys_.state = self._replica_state(i)
            return sys_.thermo_quantities()
        finally:
            sys_.state = saved

    # -- run loop ---------------------------------------------------------------
    def run(self, nsteps, chunk=1000):
        """Advance every replica ``nsteps`` steps (one vmapped program;
        the chunk/retry protocol mirrors System.run's capacity growth)."""
        import jax
        import jax.numpy as jnp
        if self._kind == 'hpmc':
            return self._run_hpmc(int(nsteps), chunk)
        sys_ = self._system
        nsteps = int(nsteps)
        done = 0
        while done < nsteps:
            c = min(chunk, nsteps - done)
            carry0 = self._carry
            for _ in range(8):
                state, nls, auxs, mode_aux = self._vrun(
                    carry0[0], carry0[1], carry0[2], carry0[3],
                    self._dyn, c)
                # replica-reduced overflow view for the shared grow logic
                red = jax.tree_util.tree_map(
                    lambda x: (jnp.any(x, axis=0)
                               if x.dtype == jnp.bool_ else x[0]), nls)
                if not sys_._check_overflow(red):
                    break
                # capacities grew: rebuild this ensemble's stacked nls at
                # the new width and retry the chunk from the saved carry
                self._rebuild_after_growth()
                carry0 = (carry0[0], self._fresh_nls(), carry0[2],
                          carry0[3])
            else:
                raise RuntimeError("ensemble: neighbor capacity still "
                                   "overflowing after repeated growth")
            self._carry = (state, nls, auxs, mode_aux)
            done += c

    def _run_hpmc(self, nsteps, chunk):
        """HPMC sweep loop with the capacity grow/retry protocol of
        System.run's hpmc branch (overflow flags are sticky bools in the
        counters; retry re-runs the chunk from the saved pre-chunk
        carry, so no sweeps are lost or double-counted)."""
        import jax
        import jax.numpy as jnp
        sys_ = self._system
        done = 0
        while done < nsteps:
            c = min(chunk, nsteps - done)
            carry0 = self._carry
            for _ in range(8):
                state, counters = self._vrun(carry0[0], carry0[1],
                                             self._dyn, c)
                cell = bool(jnp.any(counters['cell_overflow']))
                cand = bool(jnp.any(counters.get(
                    'cand_overflow', jnp.zeros((), bool))))
                dep = bool(jnp.any(counters.get(
                    'depletant_overflow', jnp.zeros((), bool))))
                if not (cell or cand or dep):
                    break
                prog = self._prog
                if cell:
                    sys_._grow['hpmc_cell_cap'] = \
                        int(prog.get('cell_cap', 8) * 1.5) + 4
                if cand:
                    sys_._grow['hpmc_cand_cap'] = \
                        int(prog.get('cand_cap', 32) * 1.5) + 8
                if dep:
                    sys_._grow['hpmc_dep_cap'] = \
                        int(prog.get('dep_cap', 0) * 1.5) + 8
                sys_._rebuild_program()
                self._prog = sys_._program
                self._dyn = self._hp_pack_all()
                if self._sharding is not None:
                    self._dyn = self._sharding(self._dyn)
                self._make_hp_vrun()
            else:
                raise RuntimeError("ensemble: hpmc capacity still "
                                   "overflowing after repeated growth")
            self._carry = (state, counters)
            done += c

    def _fresh_nls(self):
        import jax
        import jax.numpy as jnp
        from .ops.neighbor import fresh_neighbor_list
        sys_ = self._system
        dtype = sys_.real_dtype
        nls = tuple(
            fresh_neighbor_list(sys_.state.N, cfg.max_neigh, dtype)
            for cfg in sys_._program['nl_cfgs'])
        nls = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (self.n,) + x.shape), nls)
        return self._sharding(nls) if self._sharding else nls

    def _rebuild_after_growth(self):
        """_check_overflow already rebuilt the system program; re-derive
        the vmapped runner against the new static capacities."""
        import jax
        prog = self._system._program
        self._prog = prog
        self._vrun = jax.jit(
            jax.vmap(prog['run_chunk_raw'], in_axes=(0, 0, 0, 0, 0, None)),
            static_argnums=5)
