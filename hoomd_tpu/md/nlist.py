"""Neighbor list configuration objects (reference md/nlist.py:45-860).

All three variants share the binned, padded, sort-based build in
ops/neighbor.py (the NeighborListBinned analog); they differ in how the
cell grid is dimensioned:

  * ``cell`` — bin width = maximum interaction range, 27-cell stencil
    (NeighborListBinned);
  * ``stencil`` — bin width = user ``cell_width`` or the shortest active
    cutoff, adjacency widened to cover the largest cutoff, per-type-pair
    range culling (NeighborListStencil / CellListStencil);
  * ``tree`` — same fine-grid wide-stencil machinery, auto-dimensioned;
    the TPU-native replacement for the reference's AABB-BVH traversal
    (NeighborListTree.h), which is pointer chasing the VPU cannot do.

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
                 excl_tags, exclude_body, diameter_shift, r_buff, r_max,
                 reach=(1, 1, 1)):
        self.reach = reach                  # static per-axis stencil reach
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
    def _cell_width_target(self, rmax, r_span):
        """Bin width the cell grid aims for.  Base/`cell`: the maximum
        interaction range (27-stencil); subclasses narrow it."""
        return r_span

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
        width = self._cell_width_target(rmax, r_span)
        cell_dim = cells.choose_cell_dim(L, width, box.dimensions)
        # adjacency reach per axis: actual cell widths are L/dim >= width,
        # and the stencil must cover r_span (CellListStencil.h analog)
        actual_w = L[:3] / np.maximum(np.asarray(cell_dim), 1)
        reach = tuple(int(np.ceil(r_span / w - 1e-9)) for w in actual_w)
        if box.dimensions == 2:
            reach = (reach[0], reach[1], 0)
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
            cell_adj=jnp.asarray(cells.build_cell_adj(cell_dim, reach)),
            rmax_table=jnp.asarray(rmax, dtype=system.real_dtype),
            excl_tags=None if excl is None else jnp.asarray(excl),
            exclude_body='body' in self.exclusions,
            diameter_shift=self.diameter_shift,
            r_buff=self.r_buff,
            r_max=r_span,
            reach=reach,
        )
        return self._cfg


class cell(nlist):
    """O(N) binned neighbor list (reference md/NeighborListBinned.cc:79;
    GPU kernel NeighborListGPUBinned.cu:75)."""


class stencil(nlist):
    """Stenciled neighbor list for size-asymmetric systems
    (reference md/NeighborListStencil.h, hoomd/CellListStencil.h).

    Bins at ``cell_width`` (default: the shortest active cutoff, the
    reference default md/nlist.py:612) and searches a wider adjacency
    stencil that covers the largest cutoff; candidates are culled by the
    per-type-pair range mask during the build.  With a size-ratio-3
    binary mixture this keeps the per-cell capacity (and so the
    candidate set and HBM footprint) sized to the small species, where a
    max-cutoff bin would pad every cell to the large species' occupancy."""

    def __init__(self, r_buff=0.4, check_period=1, d_max=None,
                 dist_check=True, name=None, cell_width=None,
                 deterministic=True):
        super().__init__(r_buff, check_period, d_max, dist_check, name)
        self.cell_width = cell_width

    def set_cell_width(self, cell_width):
        """Set the cell width (reference md/nlist.py:688)."""
        self.cell_width = cell_width
        _sys()._dirty()

    def tune_cell_width(self, warmup=0, min_width=None, max_width=None,
                        jumps=20, steps=5000, quiet=False):
        """Sweep cell_width for the fastest steps/sec
        (reference md/nlist.py:698 tune_cell_width)."""
        import time
        import hoomd_tpu as hoomd
        sys_ = _sys()
        types = sys_.particle_types
        rmat = self._max_rcut_matrix(types)
        r_span = float(np.max(rmat + np.where(rmat > 0, self.r_buff, 0.0)))
        lo = min_width or 0.5 * r_span
        hi = max_width or r_span
        best = (None, -1.0)
        if warmup:
            hoomd.run(warmup, quiet=True)
        for w in np.linspace(lo, hi, jumps):
            self.set_cell_width(float(w))
            t0 = time.perf_counter()
            hoomd.run(steps, quiet=True)
            tps = steps / (time.perf_counter() - t0)
            if not quiet:
                print(f"cell_width={w:.3f} -> {tps:.1f} TPS")
            if tps > best[1]:
                best = (float(w), tps)
        self.set_cell_width(best[0])
        return best[0]

    def _cell_width_target(self, rmax, r_span):
        if self.cell_width is not None:
            return float(self.cell_width)
        active = rmax[rmax > 0]
        return float(active.min()) if active.size else r_span


class tree(nlist):
    """Neighbor list for large size disparity
    (reference md/NeighborListTree.h).

    The reference walks an AABB BVH — irregular pointer chasing that does
    not map to the TPU's vector units.  The TPU-native equivalent of the
    same capability (bounded per-query work under heterogeneous particle
    sizes) is a fine uniform grid with a per-type-pair-range-culled wide
    stencil: cells sized to the smallest active cutoff bound per-cell
    occupancy the way BVH leaves bound theirs, and the wrap-deduplicated
    offset stencil replaces the tree traversal with dense regular loads."""

    def _cell_width_target(self, rmax, r_span):
        active = rmax[rmax > 0]
        return float(active.min()) if active.size else r_span


def _sys():
    if context.current is None or context.current.system is None:
        raise RuntimeError("create the system first: context.initialize() "
                           "then init.*")
    return context.current.system
