"""Spatial domain decomposition with halo exchange and migration.

The full analog of the reference's DomainDecomposition + Communicator
protocol (hoomd/DomainDecomposition.h:49-175, Communicator.cc:1300-2298):

  * the box is split into slabs along x over the 'domain' mesh axis; each
    device OWNS the particles inside its slab (1D decomposition — the
    reference's default for elongated boxes; 3D grids are a later
    extension); slab boundaries are ADJUSTABLE (carried as an (S+1,)
    cut array) and ``rebalance_fn`` shifts them toward uniform particle
    counts — the reference's LoadBalancer (hoomd/LoadBalancer.h:46-144)
    acting on DomainDecomposition's fractions;
  * **ghost exchange** each step: owned particles within r_ghost of a slab
    face are packed into fixed-capacity buffers and sent to the face
    neighbor with `lax.ppermute` (the ICI replacement for the reference's
    staged MPI_Isend/Irecv sweeps, Communicator.cc:1561,2298);
  * **migration**: after each drift, particles that crossed a slab boundary
    are packed and transferred to the new owner, and each shard compacts
    its slots (sort by validity) — ownership transfer with static shapes
    (Communicator::migrateParticles, Communicator.cc:1369);
  * force evaluation is local: owned x (owned + ghosts) with masked tiles.

Static capacities (slots per device, ghosts per face) follow the same
grow-on-overflow philosophy as the neighbor list; overflow flags are
returned per step for host-side handling.

This module implements the sharded LJ-fluid step used by the parity tests
and dryrun; the single-chip engine remains the production path until
multi-chip hardware is available to tune against.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .._config import PAD_COORD


def build_spatial_lj_md(mesh, n_total, box_l, *, dt=0.005, rcut=2.5,
                        r_buff=0.4, epsilon=1.0, sigma=1.0, slot_cap=None,
                        ghost_cap=None, dtype=jnp.float32):
    """Compile a slab-decomposed LJ NVE step over mesh axis 'domain'.

    Returns (step_fn, init_fn, run_steps) like
    parallel.domain.build_sharded_lj_md; the carry is
    (pos, vel, frc, tag, owned_mask, timestep) with leading axis
    S * slot_cap sharded over 'domain'.
    """
    S = mesh.shape['domain']
    if S < 3:
        raise ValueError("spatial decomposition needs >= 3 slabs (face "
                         "exchange requires distinct left/right "
                         "neighbors); use parallel.domain for fewer")
    if slot_cap is None:
        slot_cap = int(np.ceil(n_total / S * 2.0)) + 16
    if ghost_cap is None:
        # ghost shell volume fraction with safety factor
        frac = min(1.0, 2.0 * (rcut + r_buff) / (box_l / S))
        ghost_cap = int(np.ceil(n_total / S * frac * 1.5)) + 16
    G = ghost_cap
    C = slot_cap
    lj1 = 4.0 * epsilon * sigma ** 12
    lj2 = 4.0 * epsilon * sigma ** 6
    rc2 = rcut * rcut
    rc6i = 1.0 / rc2 ** 3
    e_shift = rc6i * (lj1 * rc6i - lj2)
    r_ghost = rcut + r_buff
    slab_w = box_l / S
    if slab_w < r_ghost:
        raise ValueError(f"slab width {slab_w:.3f} < ghost width "
                         f"{r_ghost:.3f}: fewer slabs or a larger box")
    L = box_l

    def _wrap(pos):
        return pos - L * jnp.round(pos / L)

    def _pack(pos, vel, tag, sel, cap):
        """Pack selected rows into a fixed (cap, ...) buffer (sorted by
        ~sel so selected rows lead); overflow when count > cap."""
        order = jnp.argsort(~sel)                  # selected first
        idx = order[:cap]
        ok = sel[idx]
        p = jnp.where(ok[:, None], pos[idx], PAD_COORD)
        v = jnp.where(ok[:, None], vel[idx], 0.0)
        t = jnp.where(ok, tag[idx], -1)
        return p, v, t, jnp.sum(sel) > cap

    def local_step(pos, vel, frc, tag, ts, cuts):
        """One step on one shard (inside shard_map).  pos (C,3) with
        PAD_COORD for empty slots; tag -1 for empty; cuts (S+1,)
        replicated slab boundaries (adjusted by rebalance_fn)."""
        me = jax.lax.axis_index('domain')
        owned = tag >= 0

        # -- drift
        v_half = jnp.where(owned[:, None], vel + 0.5 * dt * frc, vel)
        pos = jnp.where(owned[:, None], _wrap(pos + dt * v_half), pos)

        # -- migration: new owner by x coordinate vs the cut array
        # (vectorized count-of-cuts-below instead of searchsorted)
        owner = jnp.sum(pos[:, 0:1] >= cuts[None, 1:-1],
                        axis=1).astype(jnp.int32)
        stay = owned & (owner == me)
        go_r = owned & (owner == (me + 1) % S)
        go_l = owned & (owner == (me - 1) % S)
        # anything farther than one slab is an error (skin guarantees
        # bounded per-step motion)
        lost = owned & ~stay & ~go_l & ~go_r
        mig_ovf = jnp.any(lost)

        pr, vr, tr, o1 = _pack(pos, v_half, tag, go_r, G)
        plf, vlf, tlf, o2 = _pack(pos, v_half, tag, go_l, G)
        mig_ovf = mig_ovf | o1 | o2
        # ring transfers (ppermute): right-going to me+1, left to me-1
        perm_r = [(i, (i + 1) % S) for i in range(S)]
        perm_l = [(i, (i - 1) % S) for i in range(S)]
        pr, vr, tr = [jax.lax.ppermute(x, 'domain', perm_r)
                      for x in (pr, vr, tr)]
        plf, vlf, tlf = [jax.lax.ppermute(x, 'domain', perm_l)
                         for x in (plf, vlf, tlf)]

        # merge: keep stayers, then append arrivals into free slots.
        # compact by sorting stayers first
        order = jnp.argsort(~stay)
        pos_s = jnp.where(stay[order][:, None], pos[order], PAD_COORD)
        vel_s = jnp.where(stay[order][:, None], v_half[order], 0.0)
        tag_s = jnp.where(stay[order], tag[order], -1)
        n_stay = jnp.sum(stay)
        arr_p = jnp.concatenate([pr, plf], axis=0)      # (2G, 3)
        arr_v = jnp.concatenate([vr, vlf], axis=0)
        arr_t = jnp.concatenate([tr, tlf], axis=0)
        arr_ok = arr_t >= 0
        arr_rank = jnp.cumsum(arr_ok) - 1
        # invalid arrival rows route out of bounds and are DROPPED (an
        # in-bounds clamp would race with genuine writes to slot C-1)
        slot = jnp.where(arr_ok, n_stay + arr_rank, C)
        slot_ovf = jnp.any(jnp.where(arr_ok, slot, 0) >= C)
        pos_s = pos_s.at[slot].set(arr_p, mode='drop')
        vel_s = vel_s.at[slot].set(arr_v, mode='drop')
        tag_s = tag_s.at[slot].set(arr_t, mode='drop')
        pos, vel, tag = pos_s, vel_s, tag_s
        owned = tag >= 0

        # -- ghost exchange (positions only, both faces)
        lo = cuts[me]
        hi = cuts[me + 1]
        near_r = owned & (pos[:, 0] > hi - r_ghost)
        near_l = owned & (pos[:, 0] < lo + r_ghost)
        gp_r, _, gt_r, o3 = _pack(pos, vel, tag, near_r, G)
        gp_l, _, gt_l, o4 = _pack(pos, vel, tag, near_l, G)
        ghost_ovf = o3 | o4
        gp_r = jax.lax.ppermute(gp_r, 'domain', perm_r)
        gt_r = jax.lax.ppermute(gt_r, 'domain', perm_r)
        gp_l = jax.lax.ppermute(gp_l, 'domain', perm_l)
        gt_l = jax.lax.ppermute(gt_l, 'domain', perm_l)
        ghosts = jnp.concatenate([gp_r, gp_l], axis=0)   # (2G, 3)
        ghosts_ok = jnp.concatenate([gt_r, gt_l]) >= 0

        # -- forces: owned vs (owned + ghosts), masked dense tiles
        src = jnp.concatenate([pos, ghosts], axis=0)     # (C+2G, 3)
        src_ok = jnp.concatenate([owned, ghosts_ok])
        dr = _wrap(pos[:, None, :] - src[None, :, :])
        r2 = jnp.sum(dr * dr, axis=-1)
        pair_ok = (owned[:, None] & src_ok[None, :]
                   & (r2 > 1e-9) & (r2 < rc2))
        r2s = jnp.where(pair_ok, r2, 1.0)
        r2i = 1.0 / r2s
        r6i = r2i * r2i * r2i
        fdivr = jnp.where(pair_ok,
                          r2i * r6i * (12.0 * lj1 * r6i - 6.0 * lj2), 0.0)
        e = jnp.where(pair_ok, r6i * (lj1 * r6i - lj2) - e_shift, 0.0)
        frc = jnp.sum(fdivr[:, :, None] * dr, axis=1)
        pe = 0.5 * jnp.sum(e)

        # -- kick
        vel = jnp.where(owned[:, None], vel + 0.5 * dt * frc, vel)
        ke = 0.5 * jnp.sum(jnp.where(owned[:, None], vel ** 2, 0.0))

        ke = jax.lax.psum(ke, 'domain')
        pe = jax.lax.psum(pe, 'domain')
        n_owned = jax.lax.psum(jnp.sum(owned), 'domain')
        ovf = jax.lax.pmax((mig_ovf | slot_ovf | ghost_ovf)
                           .astype(jnp.int32), 'domain')
        return pos, vel, frc, tag, ts + 1, ke, pe, n_owned, ovf

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P('domain'), P('domain'), P('domain'), P('domain'),
                  P(), P()),
        out_specs=(P('domain'), P('domain'), P('domain'), P('domain'),
                   P(), P(), P(), P(), P()),
        check_vma=False)
    def _sharded(pos, vel, frc, tag, ts, cuts):
        return local_step(pos, vel, frc, tag, ts, cuts)

    def step_fn(carry):
        pos, vel, frc, tag, ts, cuts = carry
        pos, vel, frc, tag, ts, ke, pe, n, ovf = _sharded(
            pos, vel, frc, tag, ts, cuts)
        return (pos, vel, frc, tag, ts, cuts), {'ke': ke, 'pe': pe,
                                                'n_owned': n,
                                                'overflow': ovf}

    def run_steps(carry, nsteps):
        def body(c, _):
            c, th = step_fn(c)
            return c, th
        return jax.lax.scan(body, carry, None, length=nsteps)

    def init_fn(pos_global, vel_global):
        """Distribute an (N,3) configuration into slab-owned slots."""
        pos_global = np.asarray(pos_global)
        vel_global = np.asarray(vel_global)
        N = len(pos_global)
        pos_dev = np.full((S, C, 3), PAD_COORD, np.float32)
        vel_dev = np.zeros((S, C, 3), np.float32)
        tag_dev = np.full((S, C), -1, np.int32)
        counts = np.zeros(S, np.int32)
        owner = np.clip(((pos_global[:, 0] + L / 2) // slab_w)
                        .astype(int), 0, S - 1)
        for i in range(N):
            s = owner[i]
            if counts[s] >= C:
                raise RuntimeError("slot capacity too small at init")
            pos_dev[s, counts[s]] = pos_global[i]
            vel_dev[s, counts[s]] = vel_global[i]
            tag_dev[s, counts[s]] = i
            counts[s] += 1
        sh = NamedSharding(mesh, P('domain'))
        pos = jax.device_put(
            jnp.asarray(pos_dev.reshape(S * C, 3), dtype), sh)
        vel = jax.device_put(
            jnp.asarray(vel_dev.reshape(S * C, 3), dtype), sh)
        frc = jax.device_put(jnp.zeros((S * C, 3), dtype), sh)
        tag = jax.device_put(jnp.asarray(tag_dev.reshape(S * C)), sh)
        ts = jnp.zeros((), jnp.int32)
        cuts = jnp.asarray(np.linspace(-L / 2, L / 2, S + 1), dtype)
        return (pos, vel, frc, tag, ts, cuts)

    def rebalance_fn(carry, max_shift=0.25):
        """Shift slab cuts toward uniform particle counts (the
        reference LoadBalancer's fraction adjustment, LoadBalancer.cc:59).
        Host-side: each interior cut moves toward the neighbor with the
        higher count, bounded by max_shift * slab_w and by the minimum
        slab width (the ghost shell), so migration stays single-hop."""
        pos, vel, frc, tag, ts, cuts = carry
        tag_h = np.asarray(tag)
        pos_h = np.asarray(pos)
        cuts_h = np.asarray(cuts).copy()
        sel = tag_h >= 0
        x = pos_h[sel, 0]
        counts = np.array([
            np.sum((x >= cuts_h[s]) & (x < cuts_h[s + 1]))
            for s in range(S)], float)
        target = counts.sum() / S
        for s in range(1, S):
            # imbalance between the two slabs sharing cut s
            d = (counts[s - 1] - counts[s]) / max(target, 1.0)
            shift = np.clip(0.5 * d, -1.0, 1.0) * max_shift * slab_w
            new = cuts_h[s] - shift
            # sequential clamp against the UPDATED left neighbor and the
            # old right neighbor keeps cuts strictly monotonic with the
            # r_ghost minimum slab width (which is exactly what makes
            # single-neighbor ghost exchange sufficient); a squeezed
            # interval keeps the old cut
            lo_lim = cuts_h[s - 1] + r_ghost
            hi_lim = cuts_h[s + 1] - r_ghost
            if lo_lim <= hi_lim:
                cuts_h[s] = float(np.clip(new, lo_lim, hi_lim))
        return (pos, vel, frc, tag, ts,
                jnp.asarray(cuts_h, dtype))

    def gather_fn(carry):
        """Collect (pos, vel) back to tag order on the host."""
        pos, vel, frc, tag, ts, cuts = carry
        pos = np.asarray(pos)
        vel = np.asarray(vel)
        tag = np.asarray(tag)
        sel = tag >= 0
        N = int(sel.sum())
        out_p = np.zeros((N, 3))
        out_v = np.zeros((N, 3))
        out_p[tag[sel]] = pos[sel]
        out_v[tag[sel]] = vel[sel]
        return out_p, out_v

    return step_fn, init_fn, run_steps, gather_fn, rebalance_fn
