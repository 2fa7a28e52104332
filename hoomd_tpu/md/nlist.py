"""Neighbor list configuration objects (reference md/nlist.py:45-860).

On TPU there is a single neighbor-list algorithm — the binned, padded,
sort-based build in ops/neighbor.py (the NeighborListBinned analog).  The
reference's ``tree`` (AABB BVH, NeighborListTree.h) and ``stencil``
(CellListStencil) variants exist for size-asymmetric systems on CPUs/GPUs;
pointer-chasing tree traversals do not map to the TPU's vector units, so
those classes are provided for API compatibility and use the binned build
with a conservatively sized stencil.

Multiple forces subscribing to one nlist have their r_cut matrices merged
exactly like the reference (nlist.py:417 ``rcut`` class).
"""

from __future__ import annotations

import numpy as np

from .. import context
from .._config import int_dtype
from ..ops import cells


class _NlistConfig:
    """Frozen per-compile static configuration of one neighbor list."""

    def __init__(self, cell_dim, cell_cap, max_neigh, cell_adj, rmax_table,
                 excl_tags, exclude_body, diameter_shift, r_buff, r_max):
        self.cell_dim = cell_dim
        self.cell_cap = cell_cap
        self.max_neigh = max_neigh
        self.cell_adj = cell_adj            # device (ncells, 27)
        self.rmax_table = rmax_table        # device (ntypes, ntypes)
        self.excl_tags = excl_tags          # device (Ntags, E) or None
        self.exclude_body = exclude_body
        self.diameter_shift = diameter_shift
        self.r_buff = r_buff
        self.r_max = r_max

    def signature(self):
        return (self.cell_dim, self.cell_cap, self.max_neigh,
                self.exclude_body, self.diameter_shift,
                None if self.excl_tags is None else self.excl_tags.shape)


class nlist:
    """Base neighbor list (reference md/nlist.py nlist).

    r_buff: Verlet skin (default 0.4, nlist.py:63).
    check_period: accepted for API compatibility; the displacement check is
    so cheap on TPU (one fused max-reduce) that it runs every step.
    """

    def __init__(self, r_buff=0.4, check_period=1, d_max=None,
                 dist_check=True, name=None):
        self.r_buff = float(r_buff)
        self.check_period = int(check_period)
        self.d_max = d_max
        self.dist_check = dist_check
        self.name = name or f"nlist_{len(_sys().nlists)}"
        self.subscribers = []
        # reference default exclusions (md/nlist.py): bond, body, constraint
        self.exclusions = ['bond', 'body', 'constraint']
        self.diameter_shift = False
        self._cfg = None
        _sys().add_nlist(self)

    # -- public API (reference nlist.py) ---------------------------------
    def subscribe(self, force):
        if force not in self.subscribers:
            self.subscribers.append(force)
        _sys()._dirty()

    def set_params(self, r_buff=None, check_period=None, d_max=None,
                   dist_check=None):
        if r_buff is not None:
            self.r_buff = float(r_buff)
        if check_period is not None:
            self.check_period = int(check_period)
        if d_max is not None:
            self.d_max = d_max
        if dist_check is not None:
            self.dist_check = dist_check
        _sys()._dirty()

    def reset_exclusions(self, exclusions=None):
        self.exclusions = list(exclusions) if exclusions else []
        _sys()._dirty()

    def query_update_period(self):
        """Smallest rebuild interval observed (reference getSmallestRebuild)."""
        return _sys().nlist_min_rebuild_interval(self)

    def tune(self, warmup=0, r_min=0.05, r_max=1.0, jumps=20, steps=5000,
             set_max_check_period=False, quiet=False):
        """Sweep r_buff for the fastest steps/sec
        (reference md/nlist.py tune)."""
        import time
        import hoomd_tpu as hoomd
        best = (None, -1.0)
        for rb in np.linspace(r_min, r_max, jumps):
            self.set_params(r_buff=float(rb))
            if warmup:
                hoomd.run(warmup, quiet=True)
            t0 = time.perf_counter()
            hoomd.run(steps, quiet=True)
            tps = steps / (time.perf_counter() - t0)
            if not quiet:
                print(f"r_buff={rb:.3f} -> {tps:.1f} TPS")
            if tps > best[1]:
                best = (float(rb), tps)
        self.set_params(r_buff=best[0])
        return best[0]

    # -- internal: static config construction -----------------------------
    def _max_rcut_matrix(self, types):
        ntypes = len(types)
        rmat = np.zeros((ntypes, ntypes))
        for f in self.subscribers:
            if f.enabled:
                rmat = np.maximum(rmat, f._rcut_matrix(types))
        return rmat

    def _build_exclusion_table(self, snap):
        """Host-side per-tag exclusion tag table from topology
        (reference NeighborList exclusion machinery, md/NeighborList.h)."""
        N = snap.particles.N
        excl = [set() for _ in range(N)]

        def add_pairs(pairs):
            for a, b in pairs:
                excl[a].add(b)
                excl[b].add(a)

        if 'bond' in self.exclusions and snap.bonds.N:
            add_pairs(snap.bonds.group)
        if 'constraint' in self.exclusions and snap.constraints.N:
            add_pairs(snap.constraints.group)
        if 'pair' in self.exclusions and snap.pairs.N:
            add_pairs(snap.pairs.group)
        if ('angle' in self.exclusions or '1-3' in self.exclusions) \
                and snap.angles.N:
            add_pairs(snap.angles.group[:, [0, 2]])
        if ('dihedral' in self.exclusions or '1-4' in self.exclusions) \
                and snap.dihedrals.N:
            add_pairs(snap.dihedrals.group[:, [0, 3]])
        emax = max((len(s) for s in excl), default=0)
        if emax == 0:
            return None
        table = np.full((N, emax), N, dtype=np.int32)
        for t, s in enumerate(excl):
            table[t, :len(s)] = sorted(s)
        return table

    def _build_config(self, system, grow=None):
        import jax.numpy as jnp
        types = system.particle_types
        snap = system.snapshot_template
        rmat = self._max_rcut_matrix(types)
        if self.diameter_shift:
            dmax = self.d_max or float(np.max(
                snap.particles.diameter, initial=1.0))
            rmat = rmat + (dmax - 1.0)
        rmax = rmat + np.where(rmat > 0, self.r_buff, 0.0)
        r_span = float(np.max(rmax))
        if r_span <= 0:
            r_span = 1.0
        box = system.state.box
        L = np.asarray(box.L)
        cell_dim = cells.choose_cell_dim(L, r_span, box.dimensions)
        N = system.state.N
        ncells = int(np.prod(cell_dim))
        # capacity estimates from mean density with headroom; the overflow
        # flags trigger host-side growth when the estimate is too small
        mean_per_cell = N / ncells
        cell_cap = max(4, int(np.ceil(mean_per_cell * 2.0)) + 4)
        density = N / float(np.prod(L[:box.dimensions]))
        if box.dimensions == 3:
            vol = 4.0 / 3.0 * np.pi * r_span ** 3
        else:
            vol = np.pi * r_span ** 2
        est_neigh = density * vol
        max_neigh = max(8, int(np.ceil(est_neigh * 1.4)) + 8)
        if grow is not None:
            cell_cap = max(cell_cap, grow.get('cell_cap', 0))
            max_neigh = max(max_neigh, grow.get('max_neigh', 0))
        excl = self._build_exclusion_table(snap)
        self._cfg = _NlistConfig(
            cell_dim=cell_dim,
            cell_cap=cell_cap,
            max_neigh=max_neigh,
            cell_adj=jnp.asarray(cells.build_cell_adj(cell_dim)),
            rmax_table=jnp.asarray(rmax, dtype=system.real_dtype),
            excl_tags=None if excl is None else jnp.asarray(excl),
            exclude_body='body' in self.exclusions,
            diameter_shift=self.diameter_shift,
            r_buff=self.r_buff,
            r_max=r_span,
        )
        return self._cfg


class cell(nlist):
    """O(N) binned neighbor list (reference md/NeighborListBinned.cc:79;
    GPU kernel NeighborListGPUBinned.cu:75)."""


class tree(nlist):
    """API-compatible stand-in for the AABB-tree list
    (reference md/NeighborListTree.h).  BVH traversal is irregular pointer
    chasing — the TPU-native build is the same binned construction."""


class stencil(nlist):
    """API-compatible stand-in for the stenciled list
    (reference md/NeighborListStencil.h)."""

    def __init__(self, r_buff=0.4, check_period=1, d_max=None,
                 dist_check=True, name=None, cell_width=None):
        super().__init__(r_buff, check_period, d_max, dist_check, name)
        self.cell_width = cell_width


def _sys():
    if context.current is None or context.current.system is None:
        raise RuntimeError("create the system first: context.initialize() "
                           "then init.*")
    return context.current.system
