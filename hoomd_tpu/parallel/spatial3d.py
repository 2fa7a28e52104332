"""3-D spatial domain decomposition over a ('domain_z','domain_y',
'domain_x') mesh.

Completes the DomainDecomposition axis ladder (parallel/spatial.py 1-D
slabs, parallel/spatial2d.py 2-D grid): the full 3-D rank grid of the
reference (hoomd/DomainDecomposition.h:49-175, auto-factored nx*ny*nz)
with Communicator's STAGED AXIS SWEEPS (Communicator.cc:1561-2298).
Ghosts are exchanged along x first from owned rows; the y sweep forwards
owned rows AND the just-received x-ghosts; the z sweep forwards all of
the above — so edge regions arrive after two stages and corner regions
after three, with no diagonal sends (26-neighbor connectivity from 6
face exchanges, exactly the reference's scheme).  Migration is likewise
x-then-y-then-z, each single-hop (the Verlet skin bounds per-step motion
to well under a domain width).

Per-axis adjustable cuts give the LoadBalancer its degrees of freedom;
``rebalance_until`` iterates cut adjustment + migration to tolerance
(hoomd/LoadBalancer.h:46-144).  An axis of size 1 is skipped entirely
and size 2 collapses both faces into the single physical neighbor (the
reference's twod/single-rank special cases), so the same builder serves
2x2x2 up to arbitrary grids.
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
AX_Z = 'domain_z'
AXES = (AX_Z, AX_Y, AX_X)          # mesh order (row-major shards)
COORD = {AX_X: 0, AX_Y: 1, AX_Z: 2}


def build_spatial3d_lj_md(mesh, n_total, box_l, *, dt=0.005, rcut=2.5,
                          r_buff=0.4, epsilon=1.0, sigma=1.0,
                          slot_cap=None, ghost_cap=None,
                          dtype=jnp.float32):
    """Compile a (Sz, Sy, Sx)-grid-decomposed LJ NVE step.

    Returns (step_fn, init_fn, run_steps, gather_fn, rebalance_until).
    The carry is (pos, vel, frc, tag, ts, cuts) with cuts a dict
    axis_name -> (S_axis + 1,) cut positions and the particle axis
    sharded over ('domain_z','domain_y','domain_x').
    """
    S = {a: mesh.shape[a] for a in AXES}
    if max(S.values()) < 2:
        raise ValueError("3-D decomposition needs at least one axis of "
                         ">= 2 ranks")
    live_axes = tuple(a for a in AXES if S[a] > 1)
    nshard = int(np.prod([S[a] for a in AXES]))
    if slot_cap is None:
        slot_cap = int(np.ceil(n_total / nshard * 3.0)) + 16
    C = slot_cap
    r_ghost = rcut + r_buff
    L = box_l
    width = {a: L / S[a] for a in AXES}
    for a in live_axes:
        if width[a] < r_ghost:
            raise ValueError(f"domain width {width[a]:.3f} along {a} < "
                             f"ghost width {r_ghost:.3f}")
    if ghost_cap is None:
        frac = min(1.0, 2.0 * r_ghost
                   / min(width[a] for a in live_axes))
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

    def _axis_migrate(pos, vel, tag, cuts, axis_name):
        """Single-hop ownership transfer along one mesh axis.  Returns
        compacted (pos, vel, tag, overflow)."""
        Sa = S[axis_name]
        coord = COORD[axis_name]
        me = jax.lax.axis_index(axis_name)
        owned = tag >= 0
        owner = jnp.sum(pos[:, coord:coord + 1] >= cuts[None, 1:-1],
                        axis=1).astype(jnp.int32)
        stay = owned & (owner == me)
        if Sa == 2:
            go = owned & ~stay
            lost = jnp.zeros((), bool)
            perm = [(i, i ^ 1) for i in range(Sa)]
            pg, vg, tg, o1 = _pack(pos, vel, tag, go, G)
            pg, vg, tg = [jax.lax.ppermute(x, axis_name, perm)
                          for x in (pg, vg, tg)]
            arr = [(pg, vg, tg)]
            ovf = o1
        else:
            go_r = owned & (owner == (me + 1) % Sa)
            go_l = owned & (owner == (me - 1) % Sa)
            lost = jnp.any(owned & ~stay & ~go_r & ~go_l)
            perm_r = [(i, (i + 1) % Sa) for i in range(Sa)]
            perm_l = [(i, (i - 1) % Sa) for i in range(Sa)]
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

    def _axis_ghosts(rows_p, rows_t, cuts, axis_name, cap):
        """Collect face ghosts along one axis from the given rows
        (owned, or owned + previous stages' ghosts for the sweep)."""
        Sa = S[axis_name]
        coord = COORD[axis_name]
        me = jax.lax.axis_index(axis_name)
        ok = rows_t >= 0
        lo = cuts[me]
        hi = cuts[me + 1]
        zeros_v = jnp.zeros_like(rows_p)
        if Sa == 2:
            near = ok & ((rows_p[:, coord] > hi - r_ghost)
                         | (rows_p[:, coord] < lo + r_ghost))
            perm = [(i, i ^ 1) for i in range(Sa)]
            gp, _, gt, o = _pack(rows_p, zeros_v, rows_t, near, 2 * cap)
            gp = jax.lax.ppermute(gp, axis_name, perm)
            gt = jax.lax.ppermute(gt, axis_name, perm)
            return gp, gt, o
        near_r = ok & (rows_p[:, coord] > hi - r_ghost)
        near_l = ok & (rows_p[:, coord] < lo + r_ghost)
        perm_r = [(i, (i + 1) % Sa) for i in range(Sa)]
        perm_l = [(i, (i - 1) % Sa) for i in range(Sa)]
        gpr, _, gtr, o1 = _pack(rows_p, zeros_v, rows_t, near_r, cap)
        gpl, _, gtl, o2 = _pack(rows_p, zeros_v, rows_t, near_l, cap)
        gpr = jax.lax.ppermute(gpr, axis_name, perm_r)
        gtr = jax.lax.ppermute(gtr, axis_name, perm_r)
        gpl = jax.lax.ppermute(gpl, axis_name, perm_l)
        gtl = jax.lax.ppermute(gtl, axis_name, perm_l)
        return (jnp.concatenate([gpr, gpl], axis=0),
                jnp.concatenate([gtr, gtl]), o1 | o2)

    def local_step(pos, vel, frc, tag, ts, cuts):
        owned = tag >= 0

        # -- drift
        v_half = jnp.where(owned[:, None], vel + 0.5 * dt * frc, vel)
        pos = jnp.where(owned[:, None], _wrap(pos + dt * v_half), pos)

        # -- staged migration: x then y then z (each single-hop)
        ovf_m = jnp.zeros((), bool)
        for a in (AX_X, AX_Y, AX_Z):
            if S[a] > 1:
                pos, v_half, tag, o = _axis_migrate(pos, v_half, tag,
                                                    cuts[a], a)
                ovf_m = ovf_m | o
        owned = tag >= 0

        # -- staged ghost exchange: each axis forwards owned rows plus
        # every earlier axis' ghosts, so edges arrive after 2 stages and
        # corners after 3 (Communicator.cc staged sweeps)
        rows_p, rows_t = pos, tag
        ghost_p, ghost_t = [], []
        ovf_g = jnp.zeros((), bool)
        for a in (AX_X, AX_Y, AX_Z):
            if S[a] == 1:
                continue
            gp, gt, o = _axis_ghosts(rows_p, rows_t, cuts[a], a, G)
            ovf_g = ovf_g | o
            ghost_p.append(gp)
            ghost_t.append(gt)
            rows_p = jnp.concatenate([rows_p, gp], axis=0)
            rows_t = jnp.concatenate([rows_t, gt])

        # -- forces: owned x (owned + ghosts)
        src = rows_p
        src_ok = rows_t >= 0
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

        ke = jax.lax.psum(ke, AXES)
        pe = jax.lax.psum(pe, AXES)
        n_owned = jax.lax.psum(jnp.sum(owned), AXES)
        ovf = jax.lax.pmax((ovf_m | ovf_g).astype(jnp.int32), AXES)
        return pos, vel, frc, tag, ts + 1, ke, pe, n_owned, ovf

    spec3 = P(AXES)
    cuts_specs = {a: P() for a in AXES}

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec3, spec3, spec3, spec3, P(), cuts_specs),
        out_specs=(spec3, spec3, spec3, spec3, P(), P(), P(), P(), P()),
        check_vma=False)
    def _sharded(pos, vel, frc, tag, ts, cuts):
        return local_step(pos, vel, frc, tag, ts, cuts)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec3, spec3, spec3, cuts_specs),
        out_specs=(spec3, spec3, spec3, P()),
        check_vma=False)
    def _migrate_only(pos, vel, tag, cuts):
        ovf = jnp.zeros((), bool)
        for a in (AX_X, AX_Y, AX_Z):
            if S[a] > 1:
                pos, vel, tag, o = _axis_migrate(pos, vel, tag,
                                                 cuts[a], a)
                ovf = ovf | o
        return pos, vel, tag, jax.lax.pmax(ovf.astype(jnp.int32), AXES)

    def step_fn(carry):
        pos, vel, frc, tag, ts, cuts = carry
        pos, vel, frc, tag, ts, ke, pe, n, ovf = _sharded(
            pos, vel, frc, tag, ts, cuts)
        return (pos, vel, frc, tag, ts, cuts), {
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
        # row-major over (Sz, Sy, Sx) to match the mesh axis order
        o = {a: np.clip(((pos_global[:, COORD[a]] + L / 2)
                         // width[a]).astype(int), 0, S[a] - 1)
             for a in AXES}
        owner = (o[AX_Z] * S[AX_Y] + o[AX_Y]) * S[AX_X] + o[AX_X]
        if np.bincount(owner, minlength=nshard).max() > C:
            raise RuntimeError("slot capacity too small at init")
        order = np.argsort(owner, kind='stable')
        so = owner[order]
        slot = np.arange(N) - np.searchsorted(so, so, side='left')
        pos_dev[so, slot] = pos_global[order]
        vel_dev[so, slot] = vel_global[order]
        tag_dev[so, slot] = order
        sh = NamedSharding(mesh, spec3)
        pos = jax.device_put(
            jnp.asarray(pos_dev.reshape(nshard * C, 3), dtype), sh)
        vel = jax.device_put(
            jnp.asarray(vel_dev.reshape(nshard * C, 3), dtype), sh)
        frc = jax.device_put(jnp.zeros((nshard * C, 3), dtype), sh)
        tag = jax.device_put(jnp.asarray(tag_dev.reshape(nshard * C)), sh)
        ts = jnp.zeros((), jnp.int32)
        cuts = {a: jnp.asarray(np.linspace(-L / 2, L / 2, S[a] + 1),
                               dtype) for a in AXES}
        return (pos, vel, frc, tag, ts, cuts)

    def _marginal_counts(pos_h, tag_h, cuts, coord):
        sel = tag_h >= 0
        x = pos_h[sel, coord]
        return np.array([np.sum((x >= cuts[s]) & (x < cuts[s + 1]))
                         for s in range(len(cuts) - 1)], float)

    def _adjust(cuts_h, xs):
        """Quantile-targeted cut placement, clamped so no particle's
        owner index moves more than one rank per pass (see
        spatial2d._adjust; LoadBalancer.cc adjust())."""
        Sa = len(cuts_h) - 1
        if len(xs) == 0:
            return cuts_h
        old = cuts_h.copy()
        for s in range(1, Sa):
            target = float(np.quantile(xs, s / Sa))
            lo_lim = max(old[s - 1], cuts_h[s - 1]) + r_ghost
            hi_lim = old[s + 1] - r_ghost
            if lo_lim <= hi_lim:
                cuts_h[s] = float(np.clip(target, lo_lim, hi_lim))
        return cuts_h

    def rebalance_until(carry, tol=0.05, max_iters=20):
        """Iterate cut adjustment + migration until the worst-shard
        marginal imbalance is within ``tol`` of uniform (or the cut
        geometry can move no further) — the reference LoadBalancer's
        convergence loop (hoomd/LoadBalancer.h:46-144)."""
        pos, vel, frc, tag, ts, cuts = carry
        for _ in range(max_iters):
            pos_h = np.asarray(pos)
            tag_h = np.asarray(tag)
            sel = tag_h >= 0
            imb = 0.0
            for a in live_axes:
                na = _marginal_counts(pos_h, tag_h,
                                      np.asarray(cuts[a]), COORD[a])
                imb = max(imb, np.abs(na / na.mean() - 1.0).max())
            if imb <= tol:
                break
            new_cuts = dict(cuts)
            for a in live_axes:
                ch = _adjust(np.asarray(cuts[a]).copy(),
                             pos_h[sel, COORD[a]])
                new_cuts[a] = jnp.asarray(ch, dtype)
            cuts = new_cuts
            pos, vel, tag, ovf = _migrate_only(pos, vel, tag, cuts)
            if int(ovf):
                raise RuntimeError("migration overflow during rebalance")
        return (pos, vel, frc, tag, ts, cuts)

    def gather_fn(carry):
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

    return step_fn, init_fn, run_steps, gather_fn, rebalance_until
