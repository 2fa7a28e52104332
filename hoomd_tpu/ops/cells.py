"""Uniform cell binning of particles.

TPU-native redesign of the reference CellList (hoomd/CellList.h:99-361,
CellList.cc:133/438 and the GPU kernels in CellListGPU.cu): instead of
per-cell atomic counters, binning is a sort + scan ranking, which is
deterministic, has no atomics, and keeps every shape static — the XLA-friendly
formulation.  Cells are padded to a fixed ``capacity``; overflow raises a flag
so the host can regrow and recompile (the same grow-and-rebuild protocol the
reference uses for its cell list and neighbor list).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .._config import int_dtype


def choose_cell_dim(box_L_np, r_max, dimensions=3):
    """Host-side choice of cell grid dimensions: the widest grid whose cell
    width is still >= r_max (CellList::computeDimensions analog)."""
    dim = np.maximum(1, np.floor(np.asarray(box_L_np) / r_max)).astype(int)
    if dimensions == 2:
        dim[2] = 1
    return tuple(int(d) for d in dim)


def build_cell_adj(cell_dim, reach=(1, 1, 1)):
    """Host-side (ncells, n_adj) adjacency of each cell to its
    (2*reach+1)^3 stencil, periodic-wrapped and deduplicated (duplicates
    appear when a dimension has fewer cells than the stencil spans).
    Duplicate slots get the sentinel id ``ncells`` which maps to an
    all-padding row of the cell list.

    reach > 1 per axis is the CellListStencil analog
    (reference hoomd/CellListStencil.h): cells narrower than the
    interaction range searched over a wider offset neighborhood, so the
    bin width can follow the *smallest* cutoff in a size-disparate
    mixture instead of the largest."""
    nx, ny, nz = cell_dim
    rx, ry, rz = reach
    ncells = nx * ny * nz
    ids = np.arange(ncells)
    ix = ids % nx
    iy = (ids // nx) % ny
    iz = ids // (nx * ny)
    n_adj = (2 * rx + 1) * (2 * ry + 1) * (2 * rz + 1)
    adj = np.empty((ncells, n_adj), np.int32)
    c = 0
    for dz in range(-rz, rz + 1):
        for dy in range(-ry, ry + 1):
            for dx in range(-rx, rx + 1):
                jx = (ix + dx) % nx
                jy = (iy + dy) % ny
                jz = (iz + dz) % nz
                adj[:, c] = jx + nx * (jy + ny * jz)
                c += 1
    adj.sort(axis=1)
    dup = np.zeros_like(adj, dtype=bool)
    dup[:, 1:] = adj[:, 1:] == adj[:, :-1]
    adj[dup] = ncells
    return adj


def cell_index(pos, box, cell_dim):
    """Flat cell id per particle (jit-safe). cell_dim is static."""
    idt = int_dtype()
    nx, ny, nz = cell_dim
    f = box.make_fraction(pos)
    # particles are kept wrapped, but guard roundoff at the boundary
    f = f - jnp.floor(f)
    dims = jnp.asarray([nx, ny, nz], dtype=f.dtype)
    c3 = jnp.clip((f * dims).astype(idt), 0,
                  jnp.asarray([nx - 1, ny - 1, nz - 1], dtype=idt))
    return c3[:, 0] + nx * (c3[:, 1] + ny * c3[:, 2])


def bin_particles(pos, box, cell_dim, capacity):
    """Bin particles into a (ncells, capacity) table of particle indices,
    padded with the sentinel N.

    Returns (cid, cell_list, overflow).  Deterministic: within a cell,
    particles appear in index order (via stable argsort).
    """
    idt = int_dtype()
    N = pos.shape[0]
    nx, ny, nz = cell_dim
    ncells = nx * ny * nz
    cid = cell_index(pos, box, cell_dim)
    order = jnp.argsort(cid, stable=True).astype(idt)
    scid = cid[order]
    # rank of each particle within its cell = position in sorted order
    # minus the index of the first particle of that cell.  The first
    # index comes from a cummax over segment boundaries — searchsorted
    # here is a binary search of N serial gathers, measured 6x slower
    # than this scan on TPU (0.40 vs 0.07 ms at N=4k)
    idx = jnp.arange(N, dtype=idt)
    bnd = jnp.concatenate(
        [jnp.ones((1,), bool), scid[1:] != scid[:-1]])
    first = jax.lax.associative_scan(
        jnp.maximum, jnp.where(bnd, idx, 0))
    rank = idx - first
    ok = rank < capacity
    slot = scid * capacity + jnp.minimum(rank, capacity - 1)
    # overflowing entries are routed to an out-of-bounds slot and dropped
    slot = jnp.where(ok, slot, ncells * capacity)
    flat = jnp.full((ncells * capacity,), N, dtype=idt)
    flat = flat.at[slot].set(order, mode='drop')
    cell_list = flat.reshape(ncells, capacity)
    overflow = jnp.any(~ok)
    return cid, cell_list, overflow
