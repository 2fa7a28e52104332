"""Neighbor-list correctness: brute-force O(N^2) oracle vs the binned build
(reference md/test/test_neighborlist.cc CPU-vs-GPU parity pattern — here the
oracle is numpy)."""

import numpy as np
import pytest


def brute_force_neighbors(pos, L, rmax):
    N = len(pos)
    out = [set() for _ in range(N)]
    for i in range(N):
        dr = pos - pos[i]
        dr -= L * np.round(dr / L)
        r2 = (dr ** 2).sum(axis=1)
        for j in np.nonzero((r2 <= rmax * rmax))[0]:
            if j != i:
                out[i].add(int(j))
    return out


@pytest.mark.parametrize("N,L,rmax", [(64, 6.0, 1.5), (200, 8.0, 2.0),
                                      (40, 3.5, 1.2)])
def test_binned_matches_bruteforce(N, L, rmax):
    import jax.numpy as jnp
    from hoomd_tpu.box import Box
    from hoomd_tpu.ops import cells
    from hoomd_tpu.ops.neighbor import build_neighbor_list

    rng = np.random.RandomState(42 + N)
    pos_np = rng.uniform(-L / 2, L / 2, (N, 3)).astype(np.float32)
    box = Box.create(L)
    cell_dim = cells.choose_cell_dim(np.array([L, L, L]), rmax)
    adj = jnp.asarray(cells.build_cell_adj(cell_dim))
    pos = jnp.asarray(pos_np)
    typeid = jnp.zeros(N, dtype=jnp.int32)
    tag = jnp.arange(N, dtype=jnp.int32)
    diam = jnp.ones(N, dtype=jnp.float32)
    rmax_t = jnp.full((1, 1), rmax, dtype=jnp.float32)

    idx, n_neigh, ovf, covf = build_neighbor_list(
        pos, typeid, tag, diam, box, cell_dim, cell_cap=N,
        cell_adj=adj, rmax_table=rmax_t, max_neigh=N)
    assert not bool(ovf) and not bool(covf)

    ref = brute_force_neighbors(pos_np.astype(np.float64), L, rmax)
    idx = np.asarray(idx)
    for i in range(N):
        got = set(int(j) for j in idx[i] if j < N)
        # tolerate boundary-epsilon differences at exactly r == rmax
        sym = ref[i] ^ got
        for j in sym:
            dr = pos_np[j] - pos_np[i]
            dr -= L * np.round(dr / L)
            assert abs(np.linalg.norm(dr) - rmax) < 1e-3, \
                f"particle {i}: neighbor sets differ beyond boundary eps"


def test_overflow_flag():
    import jax.numpy as jnp
    from hoomd_tpu.box import Box
    from hoomd_tpu.ops import cells
    from hoomd_tpu.ops.neighbor import build_neighbor_list

    N, L, rmax = 50, 4.0, 1.5
    rng = np.random.RandomState(7)
    pos = jnp.asarray(rng.uniform(-L / 2, L / 2, (N, 3)).astype(np.float32))
    box = Box.create(L)
    cell_dim = cells.choose_cell_dim(np.array([L, L, L]), rmax)
    adj = jnp.asarray(cells.build_cell_adj(cell_dim))
    idx, nn, ovf, covf = build_neighbor_list(
        pos, jnp.zeros(N, dtype=jnp.int32), jnp.arange(N, dtype=jnp.int32),
        jnp.ones(N, dtype=jnp.float32), box, cell_dim, cell_cap=N,
        cell_adj=adj, rmax_table=jnp.full((1, 1), rmax, dtype=jnp.float32),
        max_neigh=2)
    assert bool(ovf)


def test_exclusions():
    import jax.numpy as jnp
    from hoomd_tpu.box import Box
    from hoomd_tpu.ops import cells
    from hoomd_tpu.ops.neighbor import build_neighbor_list

    # two particles close together, excluded from each other
    L = 10.0
    pos = jnp.asarray([[0.0, 0, 0], [0.5, 0, 0], [1.0, 0, 0]],
                      dtype=jnp.float32)
    box = Box.create(L)
    cell_dim = cells.choose_cell_dim(np.array([L, L, L]), 2.0)
    adj = jnp.asarray(cells.build_cell_adj(cell_dim))
    excl = jnp.asarray([[1], [0], [3]], dtype=jnp.int32)  # 0-1 excluded
    idx, nn, _, _ = build_neighbor_list(
        pos, jnp.zeros(3, dtype=jnp.int32), jnp.arange(3, dtype=jnp.int32),
        jnp.ones(3, dtype=jnp.float32), box, cell_dim, cell_cap=8,
        cell_adj=adj, rmax_table=jnp.full((1, 1), 2.0, dtype=jnp.float32),
        max_neigh=4, excl_tags=excl)
    idx = np.asarray(idx)
    assert 1 not in idx[0]
    assert 0 not in idx[1]
    assert 2 in idx[0] or 2 in idx[1]


def test_verlet_skin_rebuild_logic():
    """needs_rebuild triggers only after r_buff/2 displacement."""
    import jax.numpy as jnp
    from hoomd_tpu.box import Box
    from hoomd_tpu.ops.neighbor import (NeighborListData, needs_rebuild)

    box = Box.create(10.0)
    N = 4
    pos0 = jnp.zeros((N, 3), dtype=jnp.float32)
    nl = NeighborListData(
        idx=jnp.zeros((N, 4), dtype=jnp.int32),
        n_neigh=jnp.zeros(N, dtype=jnp.int32),
        ref_pos=pos0, ref_box_L=box.L, ref_box_tilt=box.tilt,
        overflow=jnp.zeros((), dtype=bool),
        cell_overflow=jnp.zeros((), dtype=bool),
        n_rebuilds=jnp.zeros((), dtype=jnp.int32))
    r_buff = 0.4
    small = pos0.at[0, 0].set(0.19)
    big = pos0.at[0, 0].set(0.21)
    assert not bool(needs_rebuild(small, box, nl, r_buff, r_max=2.0))
    assert bool(needs_rebuild(big, box, nl, r_buff, r_max=2.0))
    # box deformation charges the skin budget: 5% shrink at r_max=2.0
    # consumes 0.1 of the 0.2 budget
    import jax.numpy as jnp2
    shrunk = box.replace(L=box.L * 0.95)
    # after affine remap a stationary particle has ~zero displacement,
    # but a 10%-of-budget mover now must trigger at >0.1
    small2 = (pos0.at[0, 0].set(0.11) * 0.95)
    assert bool(needs_rebuild(small2, shrunk, nl, r_buff, r_max=2.0))
    small3 = (pos0.at[0, 0].set(0.05) * 0.95)
    assert not bool(needs_rebuild(small3, shrunk, nl, r_buff, r_max=2.0))
