"""Padded fixed-capacity Verlet neighbor lists.

TPU-native redesign of the reference NeighborList
(md/NeighborList.h:115-465) + binned GPU build
(md/NeighborListGPUBinned.cu:75):

  * full (symmetric) per-particle lists, shape (N, max_neigh), padded with
    sentinel N — forces are evaluated twice per pair with no scatter, exactly
    like the reference GPU path;
  * compaction of cell-stencil candidates is done with a row cumsum +
    scatter, not atomics — deterministic and XLA-friendly;
  * rebuild-when-needed (Verlet skin distance check,
    md/NeighborList.cc:964-1080) is a ``lax.cond`` inside the jitted step:
    both branches are compiled once, the check itself is a cheap max-reduce;
  * capacity overflow (too many neighbors / too many particles in a cell)
    raises sticky flags; the host grows capacities and recompiles — the same
    grow-and-retry protocol the reference uses.

Exclusions (bond/1-3/1-4/body, md/NeighborList.h exclusion machinery) are a
per-tag table of excluded tags, applied during the build.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .._config import PAD_COORD, int_dtype
from .cells import bin_particles


@struct.dataclass
class NeighborListData:
    """Device-side neighbor list state (carried through the step loop)."""
    idx: jnp.ndarray          # (N, max_neigh) int, sentinel N
    n_neigh: jnp.ndarray      # (N,) int
    ref_pos: jnp.ndarray      # (N, 3) positions at last rebuild
    ref_box_L: jnp.ndarray    # (3,) box lengths at last rebuild
    overflow: jnp.ndarray     # () bool — neighbor capacity exceeded (sticky)
    cell_overflow: jnp.ndarray  # () bool — cell capacity exceeded (sticky)
    n_rebuilds: jnp.ndarray   # () int


def build_neighbor_list(pos, typeid, tag, diameter, box, cell_dim, cell_cap,
                        cell_adj, rmax_table, max_neigh, excl_tags=None,
                        diameter_shift=False, body=None, exclude_body=False):
    """One full rebuild: bin -> stencil gather -> cutoff mask -> compact.

    rmax_table: (ntypes, ntypes) r_cut + r_buff per type pair.
    excl_tags: optional (Ntags, E) table of excluded tags per tag
               (sentinel >= Ntags).
    Returns (idx, n_neigh, nbr_overflow, cell_overflow).
    """
    idt = int_dtype()
    N = pos.shape[0]
    cid, cell_list, cell_overflow = bin_particles(pos, box, cell_dim,
                                                  cell_cap)
    # pad cell list with a sentinel row for deduplicated adjacency slots
    cl_pad = jnp.concatenate(
        [cell_list, jnp.full((1, cell_cap), N, dtype=idt)], axis=0)
    cand = cl_pad[cell_adj[cid]].reshape(N, -1)      # (N, 27*cell_cap)

    pos_pad = jnp.concatenate(
        [pos, jnp.full((1, 3), PAD_COORD, dtype=pos.dtype)], axis=0)
    dr = box.min_image(pos[:, None, :] - pos_pad[cand])
    r2 = jnp.sum(dr * dr, axis=-1)

    t_pad = jnp.concatenate([typeid, jnp.zeros((1,), dtype=idt)])
    tj = t_pad[cand]
    rmax = rmax_table[typeid[:, None], tj]
    if diameter_shift:
        d_pad = jnp.concatenate([diameter, jnp.ones((1,),
                                                    dtype=diameter.dtype)])
        rmax = rmax + 0.5 * (diameter[:, None] + d_pad[cand]) - 1.0
    keep = (r2 <= rmax * rmax)
    keep &= cand != jnp.arange(N, dtype=idt)[:, None]
    keep &= cand < N
    if exclude_body and body is not None:
        b_pad = jnp.concatenate([body, jnp.full((1,), -1, dtype=idt)])
        bj = b_pad[cand]
        keep &= ~((body[:, None] == bj) & (body[:, None] != -1))
    if excl_tags is not None and excl_tags.shape[1] > 0:
        tag_pad = jnp.concatenate(
            [tag, jnp.full((1,), excl_tags.shape[0], dtype=idt)])
        cand_tag = tag_pad[cand]                     # (N, C)
        my_excl = excl_tags[tag]                     # (N, E)
        keep &= ~jnp.any(cand_tag[:, :, None] == my_excl[:, None, :],
                         axis=-1)

    # compact each row: position among kept candidates via cumsum, overflow
    # entries routed to a trash column that is sliced off
    rank = jnp.cumsum(keep, axis=1, dtype=idt) - 1
    slot = jnp.where(keep, jnp.minimum(rank, max_neigh), max_neigh)
    rows = jnp.arange(N, dtype=idt)[:, None]
    nbr = jnp.full((N, max_neigh + 1), N, dtype=idt)
    nbr = nbr.at[rows, slot].set(jnp.where(keep, cand, N))
    n_neigh = jnp.sum(keep, axis=1, dtype=idt)
    nbr_overflow = jnp.any(n_neigh > max_neigh)
    return nbr[:, :max_neigh], n_neigh, nbr_overflow, cell_overflow


def needs_rebuild(pos, box, nl: NeighborListData, r_buff):
    """Verlet-skin displacement criterion (md/NeighborList.cc:964-1010):
    rebuild when any particle moved more than r_buff/2 since the reference
    snapshot, or when the box changed (deformation-safe, conservative)."""
    dr = box.min_image(pos - nl.ref_pos)
    max_d2 = jnp.max(jnp.sum(dr * dr, axis=-1))
    moved = max_d2 > (0.5 * r_buff) ** 2
    box_changed = jnp.any(jnp.abs(box.L - nl.ref_box_L) > 1e-7 * box.L)
    return moved | box_changed


def update_neighbor_list(pos, typeid, tag, diameter, box,
                         nl: NeighborListData, *, r_buff, cell_dim, cell_cap,
                         cell_adj, rmax_table, max_neigh, excl_tags=None,
                         diameter_shift=False, body=None, exclude_body=False,
                         force=False):
    """lax.cond-gated rebuild: the hot-path branch is a no-op."""

    def _rebuild(nl):
        idx, nn, ovf, covf = build_neighbor_list(
            pos, typeid, tag, diameter, box, cell_dim, cell_cap, cell_adj,
            rmax_table, max_neigh, excl_tags=excl_tags,
            diameter_shift=diameter_shift, body=body,
            exclude_body=exclude_body)
        return NeighborListData(
            idx=idx, n_neigh=nn, ref_pos=pos, ref_box_L=box.L,
            overflow=nl.overflow | ovf,
            cell_overflow=nl.cell_overflow | covf,
            n_rebuilds=nl.n_rebuilds + 1)

    if force:
        return _rebuild(nl)
    pred = needs_rebuild(pos, box, nl, r_buff)
    return jax.lax.cond(pred, _rebuild, lambda nl: nl, nl)


def fresh_neighbor_list(N, max_neigh, dtype, idt=None):
    """Empty NeighborListData forcing a rebuild on first use."""
    idt = idt or int_dtype()
    return NeighborListData(
        idx=jnp.full((N, max_neigh), N, dtype=idt),
        n_neigh=jnp.zeros((N,), dtype=idt),
        ref_pos=jnp.full((N, 3), PAD_COORD, dtype=dtype),
        ref_box_L=jnp.zeros((3,), dtype=dtype),
        overflow=jnp.zeros((), dtype=bool),
        cell_overflow=jnp.zeros((), dtype=bool),
        n_rebuilds=jnp.zeros((), dtype=idt))
