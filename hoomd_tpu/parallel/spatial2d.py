"""2-D spatial domain decomposition over a ('domain_y','domain_x') mesh.

Extends parallel/spatial.py's 1-D slabs to a tensor grid — the analog of
the reference's multi-axis DomainDecomposition rank grid
(hoomd/DomainDecomposition.h:49-175) with Communicator's STAGED AXIS
SWEEPS (Communicator.cc:1561-2298): ghosts are exchanged along x first,
and the y-sweep forwards both owned particles AND the just-received
x-ghosts, so corner regions propagate in two stages with no diagonal
sends.  Migration is likewise x-then-y, each single-hop (the Verlet
skin bounds per-step motion to well under a cell width).

Per-axis adjustable cuts (cuts_x (Sx+1,), cuts_y (Sy+1,)) give the
LoadBalancer degrees of freedom; ``rebalance_until`` iterates cut
adjustment + migration to a tolerance, the reference LoadBalancer's
convergence loop (hoomd/LoadBalancer.h:46-144) rather than round 1's
single bounded shift.

Rings of size 2 have one physical neighbor for both faces, so the
exchange collapses to a single send (the reference's
DomainDecomposition twod/single-rank special cases); rings of size 1
skip the axis entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .._config import PAD_COORD

AX_X = 'domain_x'
AX_Y = 'domain_y'


def build_spatial2d_lj_md(mesh, n_total, box_l, *, dt=0.005, rcut=2.5,
                          r_buff=0.4, epsilon=1.0, sigma=1.0,
                          slot_cap=None, ghost_cap=None,
                          dtype=jnp.float32):
    """Compile a (Sy, Sx)-grid-decomposed LJ NVE step.

    Returns (step_fn, init_fn, run_steps, gather_fn, rebalance_until).
    The carry is (pos, vel, frc, tag, ts, cuts_x, cuts_y) with the
    leading axis Sy*Sx*slot_cap sharded over ('domain_y','domain_x').
    """
    Sy = mesh.shape[AX_Y]
    Sx = mesh.shape[AX_X]
    if Sx < 2 or Sy < 2:
        raise ValueError("2-D decomposition needs >= 2 ranks per axis; "
                         "use parallel.spatial (1-D) otherwise")
    nshard = Sx * Sy
    if slot_cap is None:
        slot_cap = int(np.ceil(n_total / nshard * 3.0)) + 16
    C = slot_cap
    r_ghost = rcut + r_buff
    L = box_l
    wx = L / Sx
    wy = L / Sy
    if min(wx, wy) < r_ghost:
        raise ValueError(f"cell width ({wx:.3f},{wy:.3f}) < ghost width "
                         f"{r_ghost:.3f}")
    if ghost_cap is None:
        frac = min(1.0, 2.0 * r_ghost / min(wx, wy))
        ghost_cap = int(np.ceil(n_total / nshard * frac * 2.0)) + 16
    G = ghost_cap
    lj1 = 4.0 * epsilon * sigma ** 12
    lj2 = 4.0 * epsilon * sigma ** 6
    rc2 = rcut * rcut
    rc6i = 1.0 / rc2 ** 3
    e_shift = rc6i * (lj1 * rc6i - lj2)

    def _wrap(pos):
        return pos - L * jnp.round(pos / L)

    def _pack(rows_p, rows_v, rows_t, sel, cap):
        order = jnp.argsort(~sel)
        idx = order[:cap]
        ok = sel[idx]
        p = jnp.where(ok[:, None], rows_p[idx], PAD_COORD)
        v = jnp.where(ok[:, None], rows_v[idx], 0.0)
        t = jnp.where(ok, rows_t[idx], -1)
        return p, v, t, jnp.sum(sel) > cap

    def _axis_migrate(pos, vel, tag, cuts, axis_name, S, coord):
        """Single-hop ownership transfer along one mesh axis.  Returns
        compacted (pos, vel, tag, overflow)."""
        me = jax.lax.axis_index(axis_name)
        owned = tag >= 0
        owner = jnp.sum(pos[:, coord:coord + 1] >= cuts[None, 1:-1],
                        axis=1).astype(jnp.int32)
        stay = owned & (owner == me)
        if S == 2:
            go = owned & ~stay
            lost = jnp.zeros((), bool)
            perm = [(i, i ^ 1) for i in range(S)]
            pg, vg, tg, o1 = _pack(pos, vel, tag, go, G)
            pg, vg, tg = [jax.lax.ppermute(x, axis_name, perm)
                          for x in (pg, vg, tg)]
            arr = [(pg, vg, tg)]
            ovf = o1
        else:
            go_r = owned & (owner == (me + 1) % S)
            go_l = owned & (owner == (me - 1) % S)
            lost = jnp.any(owned & ~stay & ~go_r & ~go_l)
            perm_r = [(i, (i + 1) % S) for i in range(S)]
            perm_l = [(i, (i - 1) % S) for i in range(S)]
            pr, vr, tr, o1 = _pack(pos, vel, tag, go_r, G)
            pl, vl, tl, o2 = _pack(pos, vel, tag, go_l, G)
            pr, vr, tr = [jax.lax.ppermute(x, axis_name, perm_r)
                          for x in (pr, vr, tr)]
            pl, vl, tl = [jax.lax.ppermute(x, axis_name, perm_l)
                          for x in (pl, vl, tl)]
            arr = [(pr, vr, tr), (pl, vl, tl)]
            ovf = o1 | o2
        order = jnp.argsort(~stay)
        pos_s = jnp.where(stay[order][:, None], pos[order], PAD_COORD)
        vel_s = jnp.where(stay[order][:, None], vel[order], 0.0)
        tag_s = jnp.where(stay[order], tag[order], -1)
        n = jnp.sum(stay)
        ap = jnp.concatenate([a[0] for a in arr], axis=0)
        av = jnp.concatenate([a[1] for a in arr], axis=0)
        at = jnp.concatenate([a[2] for a in arr], axis=0)
        ok = at >= 0
        rank = jnp.cumsum(ok) - 1
        slot = jnp.where(ok, n + rank, C)
        slot_ovf = jnp.any(jnp.where(ok, slot, 0) >= C)
        pos_s = pos_s.at[slot].set(ap, mode='drop')
        vel_s = vel_s.at[slot].set(av, mode='drop')
        tag_s = tag_s.at[slot].set(at, mode='drop')
        return pos_s, vel_s, tag_s, ovf | slot_ovf | lost

    def _axis_ghosts(rows_p, rows_t, cuts, axis_name, S, coord):
        """Collect face ghosts along one axis from the given rows
        (owned, or owned+previous-axis ghosts for the staged sweep)."""
        me = jax.lax.axis_index(axis_name)
        ok = rows_t >= 0
        lo = cuts[me]
        hi = cuts[me + 1]
        zeros_v = jnp.zeros_like(rows_p)
        if S == 2:
            near = ok & ((rows_p[:, coord] > hi - r_ghost)
                         | (rows_p[:, coord] < lo + r_ghost))
            perm = [(i, i ^ 1) for i in range(S)]
            gp, _, gt, o = _pack(rows_p, zeros_v, rows_t, near, 2 * G)
            gp = jax.lax.ppermute(gp, axis_name, perm)
            gt = jax.lax.ppermute(gt, axis_name, perm)
            return gp, gt, o
        near_r = ok & (rows_p[:, coord] > hi - r_ghost)
        near_l = ok & (rows_p[:, coord] < lo + r_ghost)
        perm_r = [(i, (i + 1) % S) for i in range(S)]
        perm_l = [(i, (i - 1) % S) for i in range(S)]
        gpr, _, gtr, o1 = _pack(rows_p, zeros_v, rows_t, near_r, G)
        gpl, _, gtl, o2 = _pack(rows_p, zeros_v, rows_t, near_l, G)
        gpr = jax.lax.ppermute(gpr, axis_name, perm_r)
        gtr = jax.lax.ppermute(gtr, axis_name, perm_r)
        gpl = jax.lax.ppermute(gpl, axis_name, perm_l)
        gtl = jax.lax.ppermute(gtl, axis_name, perm_l)
        return (jnp.concatenate([gpr, gpl], axis=0),
                jnp.concatenate([gtr, gtl]), o1 | o2)

    def local_step(pos, vel, frc, tag, ts, cuts_x, cuts_y):
        owned = tag >= 0

        # -- drift
        v_half = jnp.where(owned[:, None], vel + 0.5 * dt * frc, vel)
        pos = jnp.where(owned[:, None], _wrap(pos + dt * v_half), pos)

        # -- staged migration: x then y (each single-hop)
        pos, v_half, tag, ovf_mx = _axis_migrate(
            pos, v_half, tag, cuts_x, AX_X, Sx, 0)
        pos, v_half, tag, ovf_my = _axis_migrate(
            pos, v_half, tag, cuts_y, AX_Y, Sy, 1)
        owned = tag >= 0

        # -- staged ghost exchange: x from owned, then y from
        # owned + x-ghosts (corners arrive via the second stage)
        gx_p, gx_t, ovf_gx = _axis_ghosts(pos, tag, cuts_x, AX_X, Sx, 0)
        rows_p = jnp.concatenate([pos, gx_p], axis=0)
        rows_t = jnp.concatenate([tag, gx_t])
        gy_p, gy_t, ovf_gy = _axis_ghosts(rows_p, rows_t, cuts_y,
                                          AX_Y, Sy, 1)

        # -- forces: owned x (owned + ghosts)
        src = jnp.concatenate([pos, gx_p, gy_p], axis=0)
        src_ok = jnp.concatenate([owned, gx_t >= 0, gy_t >= 0])
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
        vel = jnp.where(owned[:, None], v_half + 0.5 * dt * frc, v_half)
        ke = 0.5 * jnp.sum(jnp.where(owned[:, None], vel ** 2, 0.0))

        axes = (AX_Y, AX_X)
        ke = jax.lax.psum(ke, axes)
        pe = jax.lax.psum(pe, axes)
        n_owned = jax.lax.psum(jnp.sum(owned), axes)
        ovf = jax.lax.pmax(
            (ovf_mx | ovf_my | ovf_gx | ovf_gy).astype(jnp.int32), axes)
        return pos, vel, frc, tag, ts + 1, ke, pe, n_owned, ovf

    spec2 = P((AX_Y, AX_X))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec2, spec2, spec2, spec2, P(), P(), P()),
        out_specs=(spec2, spec2, spec2, spec2, P(), P(), P(), P(), P()),
        check_vma=False)
    def _sharded(pos, vel, frc, tag, ts, cuts_x, cuts_y):
        return local_step(pos, vel, frc, tag, ts, cuts_x, cuts_y)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec2, spec2, spec2, P(), P()),
        out_specs=(spec2, spec2, spec2, P()),
        check_vma=False)
    def _migrate_only(pos, vel, tag, cuts_x, cuts_y):
        pos, vel, tag, o1 = _axis_migrate(pos, vel, tag, cuts_x,
                                          AX_X, Sx, 0)
        pos, vel, tag, o2 = _axis_migrate(pos, vel, tag, cuts_y,
                                          AX_Y, Sy, 1)
        return pos, vel, tag, jax.lax.pmax(
            (o1 | o2).astype(jnp.int32), (AX_Y, AX_X))

    def step_fn(carry):
        pos, vel, frc, tag, ts, cx, cy = carry
        pos, vel, frc, tag, ts, ke, pe, n, ovf = _sharded(
            pos, vel, frc, tag, ts, cx, cy)
        return (pos, vel, frc, tag, ts, cx, cy), {
            'ke': ke, 'pe': pe, 'n_owned': n, 'overflow': ovf}

    def run_steps(carry, nsteps):
        def body(c, _):
            c, th = step_fn(c)
            return c, th
        return jax.lax.scan(body, carry, None, length=nsteps)

    def init_fn(pos_global, vel_global):
        pos_global = np.asarray(pos_global)
        vel_global = np.asarray(vel_global)
        N = len(pos_global)
        pos_dev = np.full((nshard, C, 3), PAD_COORD, np.float32)
        vel_dev = np.zeros((nshard, C, 3), np.float32)
        tag_dev = np.full((nshard, C), -1, np.int32)
        ox = np.clip(((pos_global[:, 0] + L / 2) // wx).astype(int),
                     0, Sx - 1)
        oy = np.clip(((pos_global[:, 1] + L / 2) // wy).astype(int),
                     0, Sy - 1)
        owner = oy * Sx + ox          # row-major over (Sy, Sx)
        if np.bincount(owner, minlength=nshard).max() > C:
            raise RuntimeError("slot capacity too small at init")
        order = np.argsort(owner, kind='stable')
        so = owner[order]
        slot = np.arange(N) - np.searchsorted(so, so, side='left')
        pos_dev[so, slot] = pos_global[order]
        vel_dev[so, slot] = vel_global[order]
        tag_dev[so, slot] = order
        sh = NamedSharding(mesh, spec2)
        pos = jax.device_put(
            jnp.asarray(pos_dev.reshape(nshard * C, 3), dtype), sh)
        vel = jax.device_put(
            jnp.asarray(vel_dev.reshape(nshard * C, 3), dtype), sh)
        frc = jax.device_put(jnp.zeros((nshard * C, 3), dtype), sh)
        tag = jax.device_put(jnp.asarray(tag_dev.reshape(nshard * C)), sh)
        ts = jnp.zeros((), jnp.int32)
        cx = jnp.asarray(np.linspace(-L / 2, L / 2, Sx + 1), dtype)
        cy = jnp.asarray(np.linspace(-L / 2, L / 2, Sy + 1), dtype)
        return (pos, vel, frc, tag, ts, cx, cy)

    def _marginal_counts(pos_h, tag_h, cuts, coord):
        sel = tag_h >= 0
        x = pos_h[sel, coord]
        return np.array([np.sum((x >= cuts[s]) & (x < cuts[s + 1]))
                         for s in range(len(cuts) - 1)], float)

    def _adjust(cuts_h, xs):
        """Quantile-targeted cut placement: each interior cut moves
        toward the marginal-coordinate quantile that equalizes slab
        counts (the objective the reference LoadBalancer solves by
        fractional adjustment, LoadBalancer.cc adjust()).  Moves are
        clamped to the OLD neighbor cuts + the r_ghost minimum slab
        width: new[s] >= old[s-1]+r_ghost and new[s] <= old[s+1]-r_ghost
        guarantee no particle's owner index changes by more than one
        rank per pass, so single-hop migration stays valid; iteration
        supplies the reach when a clamp binds."""
        S = len(cuts_h) - 1
        if len(xs) == 0:
            return cuts_h
        old = cuts_h.copy()
        for s in range(1, S):
            target = float(np.quantile(xs, s / S))
            lo_lim = max(old[s - 1], cuts_h[s - 1]) + r_ghost
            hi_lim = old[s + 1] - r_ghost
            if lo_lim <= hi_lim:
                cuts_h[s] = float(np.clip(target, lo_lim, hi_lim))
        return cuts_h

    def rebalance_until(carry, tol=0.05, max_iters=20):
        """Iterate cut adjustment + migration until the worst-shard
        marginal imbalance is within ``tol`` of uniform (or the cut
        geometry can move no further) — the reference LoadBalancer's
        convergence loop (LoadBalancer.h:46-144).  Single-hop migration
        bounds each pass's shift; iteration supplies the reach."""
        pos, vel, frc, tag, ts, cx, cy = carry
        for _ in range(max_iters):
            pos_h = np.asarray(pos)
            tag_h = np.asarray(tag)
            sel = tag_h >= 0
            nx = _marginal_counts(pos_h, tag_h, np.asarray(cx), 0)
            ny = _marginal_counts(pos_h, tag_h, np.asarray(cy), 1)
            imb = max(np.abs(nx / nx.mean() - 1.0).max(),
                      np.abs(ny / ny.mean() - 1.0).max())
            if imb <= tol:
                break
            cx_h = _adjust(np.asarray(cx).copy(), pos_h[sel, 0])
            cy_h = _adjust(np.asarray(cy).copy(), pos_h[sel, 1])
            cx = jnp.asarray(cx_h, dtype)
            cy = jnp.asarray(cy_h, dtype)
            pos, vel, tag, ovf = _migrate_only(pos, vel, tag, cx, cy)
            if int(ovf):
                raise RuntimeError("migration overflow during rebalance")
        return (pos, vel, frc, tag, ts, cx, cy)

    def gather_fn(carry):
        pos, vel, frc, tag, ts, cx, cy = carry
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

    return step_fn, init_fn, run_steps, gather_fn, rebalance_until
