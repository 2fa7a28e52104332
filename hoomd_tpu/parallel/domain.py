"""Multi-chip sharded MD via shard_map — the Communicator/
DomainDecomposition replacement (reference hoomd/Communicator.cc:1300-2298,
DomainDecomposition.h:49-175).

Strategy (round 1): **atom decomposition + ensemble axis.**  Particle slots
are sharded uniformly across the 'domain' mesh axis; each step all-gathers
positions over ICI (an O(N) collective — for MD's N this is kilobytes to a
few MB, far below ICI bandwidth at the step rates involved), every device
builds the neighbor rows for its own slot range against the gathered
positions, computes its forces, and integrates its slice.  The 'replica'
axis runs independent ensemble members (the reference's --nrank partitions)
with no cross-talk except explicitly requested reductions.

Compared to the reference's spatial DD + 6-direction ghost exchange, atom
decomposition trades bandwidth (full positions instead of ghost shells) for
zero migration machinery and perfectly static shapes — the right first
rung on TPU where the all-gather is a single fused ICI collective.  Spatial
sub-box sharding with ppermute halos is the planned upgrade for
N >> 1e6/chip.

Thermo reductions use psum over 'domain' — the MPI_Allreduce analog
(ComputeThermo.cc:404).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .._config import PAD_COORD
from ..box import Box
from ..ops import cells


def build_sharded_lj_md(mesh, n_per_replica, box_l, *, dt=0.005,
                        rcut=2.5, r_buff=0.4, epsilon=1.0, sigma=1.0,
                        kT=None, seed=7, max_neigh=96, cell_cap=None,
                        dtype=jnp.float32):
    """Compile a full sharded MD training-step for an LJ fluid.

    Returns (step_fn, init_fn):
      init_fn(pos (R, N, 3), vel (R, N, 3)) -> carry, device-sharded
      step_fn(carry) -> carry, advancing one MD step on every replica.

    kT=None -> NVE; otherwise Langevin at kT.
    The state layout is (replicas, particles, 3) sharded
    P('replica', 'domain') — both mesh axes carry real work.
    """
    R = mesh.shape['replica']
    S = mesh.shape['domain']
    N = n_per_replica
    if N % S:
        raise ValueError(f"N={N} must be divisible by domain size {S}")
    box = Box(L=jnp.asarray([box_l] * 3, dtype=dtype),
              tilt=jnp.zeros(3, dtype=dtype),
              periodic=jnp.ones(3, dtype=bool))
    rmax = rcut + r_buff
    cell_dim = cells.choose_cell_dim(np.array([box_l] * 3), rmax)
    ncells = int(np.prod(cell_dim))
    if cell_cap is None:
        cell_cap = max(4, int(np.ceil(N / ncells * 2.0)) + 4)
    cell_adj = jnp.asarray(cells.build_cell_adj(cell_dim))
    lj1 = 4.0 * epsilon * sigma ** 12
    lj2 = 4.0 * epsilon * sigma ** 6
    rc2 = rcut * rcut
    # energy shift at r_cut (mode='shift')
    rc6i = 1.0 / rc2 ** 3
    e_shift = rc6i * (lj1 * rc6i - lj2)

    def _build_rows(pos_l, pos_g, cid_l, cell_list):
        """Neighbor rows for the local slot range against global positions."""
        n_l = pos_l.shape[0]
        cl_pad = jnp.concatenate(
            [cell_list, jnp.full((1, cell_cap), N, jnp.int32)], axis=0)
        cand = cl_pad[cell_adj[cid_l]].reshape(n_l, -1)
        pos_pad = jnp.concatenate(
            [pos_g, jnp.full((1, 3), PAD_COORD, dtype)], axis=0)
        dr = box.min_image(pos_l[:, None, :] - pos_pad[cand])
        r2 = jnp.sum(dr * dr, axis=-1)
        my = jax.lax.axis_index('domain') * n_l \
            + jnp.arange(n_l, dtype=jnp.int32)
        keep = (r2 <= rmax * rmax) & (cand != my[:, None]) & (cand < N)
        rank = jnp.cumsum(keep, axis=1, dtype=jnp.int32) - 1
        slot = jnp.where(keep, jnp.minimum(rank, max_neigh), max_neigh)
        rows = jnp.arange(n_l, dtype=jnp.int32)[:, None]
        nbr = jnp.full((n_l, max_neigh + 1), N, jnp.int32)
        nbr = nbr.at[rows, slot].set(jnp.where(keep, cand, N))
        return nbr[:, :max_neigh]

    def _forces(pos_l, pos_g, nbr):
        pos_pad = jnp.concatenate(
            [pos_g, jnp.full((1, 3), PAD_COORD, dtype)], axis=0)
        dr = box.min_image(pos_l[:, None, :] - pos_pad[nbr])
        r2 = jnp.sum(dr * dr, axis=-1)
        valid = (nbr < N) & (r2 < rc2)
        r2s = jnp.where(valid, r2, 1.0)
        r2i = 1.0 / r2s
        r6i = r2i * r2i * r2i
        fdivr = jnp.where(valid,
                          r2i * r6i * (12.0 * lj1 * r6i - 6.0 * lj2), 0.0)
        e = jnp.where(valid, r6i * (lj1 * r6i - lj2) - e_shift, 0.0)
        f = jnp.sum(fdivr[:, :, None] * dr, axis=1)
        pe = 0.5 * jnp.sum(e, axis=1)
        return f.astype(dtype), pe.astype(dtype)

    def _one_replica_step(pos_l, vel_l, img_l, frc_l, nbr, ref_l, ts):
        """One MD step for one replica; runs inside shard_map, arrays are
        the local 'domain' shard."""
        # -- step1: velocity-Verlet drift
        v = vel_l + 0.5 * dt * frc_l
        pos_l = pos_l + dt * v
        img = img_l
        pos_l, img = box.wrap(pos_l, img)

        # -- neighbor refresh decision (collective max ~= MPI vote)
        dr = box.min_image(pos_l - ref_l)
        md2 = jnp.max(jnp.sum(dr * dr, axis=-1))
        md2 = jax.lax.pmax(md2, 'domain')
        rebuild = md2 > (0.5 * r_buff) ** 2

        pos_g = jax.lax.all_gather(pos_l, 'domain', tiled=True)  # (N,3)

        def _do_rebuild(args):
            nbr, ref_l = args
            cid_g = cells.cell_index(pos_g, box, cell_dim)
            n_l = pos_l.shape[0]
            off = jax.lax.axis_index('domain') * n_l
            cid_l = jax.lax.dynamic_slice_in_dim(cid_g, off, n_l)
            order = jnp.argsort(cid_g, stable=True).astype(jnp.int32)
            scid = cid_g[order]
            first = jnp.searchsorted(scid, scid, side='left')
            rank = jnp.arange(N, dtype=jnp.int32) - first.astype(jnp.int32)
            slot = jnp.where(rank < cell_cap,
                             scid * cell_cap
                             + jnp.minimum(rank, cell_cap - 1),
                             ncells * cell_cap)
            flat = jnp.full((ncells * cell_cap,), N, jnp.int32)
            cell_list = flat.at[slot].set(order, mode='drop') \
                .reshape(ncells, cell_cap)
            return _build_rows(pos_l, pos_g, cid_l, cell_list), pos_l

        nbr, ref_l = jax.lax.cond(rebuild, _do_rebuild,
                                  lambda a: a, (nbr, ref_l))

        # -- forces + step2 kick
        frc, pe = _forces(pos_l, pos_g, nbr)
        if kT is not None:
            gamma = 1.0
            key = jax.random.fold_in(
                jax.random.fold_in(jax.random.key(seed), ts),
                jax.lax.axis_index('domain')
                + 1000 * jax.lax.axis_index('replica'))
            u = jax.random.uniform(key, pos_l.shape, dtype=dtype,
                                   minval=-1.0, maxval=1.0)
            frc = frc + jnp.sqrt(6.0 * gamma * kT / dt) * u - gamma * v
        v = v + 0.5 * dt * frc

        # -- thermo reductions: the MPI_Allreduce analog
        ke = jax.lax.psum(0.5 * jnp.sum(v * v), 'domain')
        pe_tot = jax.lax.psum(jnp.sum(pe), 'domain')
        return pos_l, v, img, frc, nbr, ref_l, ke, pe_tot

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P('replica', 'domain'),) * 6 + (P(),),
        out_specs=(P('replica', 'domain'),) * 6 + (P('replica'), P('replica'),
                                                   P()),
        check_vma=False)
    def _sharded_step(pos, vel, img, frc, nbr, ref, ts):
        # one replica per 'replica'-axis shard; vmap-free since the leading
        # replica axis is sharded to size 1 locally
        outs = _one_replica_step(pos[0], vel[0], img[0], frc[0], nbr[0],
                                 ref[0], ts)
        pos, vel, img, frc, nbr, ref, ke, pe = outs
        return (pos[None], vel[None], img[None], frc[None], nbr[None],
                ref[None], ke[None], pe[None], ts + 1)

    def step_fn(carry):
        pos, vel, img, frc, nbr, ref, ts = carry
        pos, vel, img, frc, nbr, ref, ke, pe, ts = _sharded_step(
            pos, vel, img, frc, nbr, ref, ts)
        return (pos, vel, img, frc, nbr, ref, ts), {'ke': ke, 'pe': pe}

    def run_steps(carry, nsteps):
        """Advance nsteps inside one executable (lax.scan over the step):
        one dispatch instead of nsteps — on real hardware this is also the
        form that keeps the ICI collectives pipelined."""
        def body(c, _):
            c, th = step_fn(c)
            return c, th
        return jax.lax.scan(body, carry, None, length=nsteps)

    def init_fn(pos, vel):
        """pos, vel: host arrays (R, N, 3) -> device-sharded carry."""
        sharding = NamedSharding(mesh, P('replica', 'domain'))
        pos = jax.device_put(jnp.asarray(pos, dtype=dtype), sharding)
        vel = jax.device_put(jnp.asarray(vel, dtype=dtype), sharding)
        img = jax.device_put(jnp.zeros((R, N, 3), jnp.int32), sharding)
        frc = jax.device_put(jnp.zeros((R, N, 3), dtype), sharding)
        nbr = jax.device_put(jnp.full((R, N, max_neigh), N, jnp.int32),
                             sharding)
        # ref offset by > r_buff/2 in every component forces the first
        # rebuild (a PAD sentinel is unsafe here: min_image can wrap it to
        # ~zero displacement when it is a near-multiple of L)
        ref = jax.device_put(
            jnp.asarray(pos, dtype=dtype) + jnp.asarray(r_buff, dtype),
            sharding)
        ts = jnp.zeros((), jnp.int32)
        return (pos, vel, img, frc, nbr, ref, ts)

    return step_fn, init_fn, run_steps
