"""Multi-chip cell-major MD: the fast engine's layout distributed.

The single-chip fast engine (ops/fast_lj.py) keeps particles in a
(nz, ny, nx, C) cell-major layout.  This module shards that layout over
the 'domain' mesh axis along z — the TPU-native realization of the
reference's spatial domain decomposition + ghost-layer protocol
(hoomd/DomainDecomposition.h:49-175, Communicator.cc:1561-2298):

  * each device owns nz_local = nz / S contiguous z-planes of cells;
  * **ghost exchange** each step: the first/last owned plane's particle
    positions are sent to the z-neighbors with `lax.ppermute` (one
    (ny, nx, C, 3) slab each way — the ICI analog of the reference's
    staged ghost sends), building an extended (nz_local + 2)-plane grid;
  * forces use the FULL 27-cell stencil on the extended grid (each
    particle accumulates its own force, so no reverse force
    communication is needed — the reference's ghost-force pattern is
    traded for recomputing boundary pair terms, the standard
    compute-over-communicate trade on TPU);
  * **migration** at each re-bin: particles are sorted into global
    cells per shard; rows landing outside the shard's z-range are
    packed into fixed-capacity buffers and `ppermute`d one hop (the
    Verlet window bounds per-step motion, so single-hop suffices);
  * thermo reductions ride `psum`; capacity overflow and skin-crossing
    danger are sticky flags reduced with `pmax` for the host
    grow/retry protocol.

Pair math matches ops/pallas_pair.cell_pair_xla (LJ; masked dense
tiles), so trajectories agree with the single-chip engines to f32
roundoff.  Works on any mesh whose 'domain' axis size divides nz —
validated on the virtual 8-device CPU mesh in tests and by
__graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .._config import PAD_COORD


def build_cell_md(mesh, n_total, box_l, *, dt=0.005, rcut=2.5,
                  r_buff=0.4, epsilon=1.0, sigma=1.0, kT=None,
                  seed=0, cap=None, mig_cap=None, k_rebuild=4,
                  dtype=jnp.float32):
    """Compile a z-slab-sharded cell-major LJ NVE/Langevin step.

    Returns (init_fn, run_fn, gather_fn).  The carry is a dict of
    (S*nzl, ny, nx, C, ...) arrays sharded over 'domain' on the leading
    axis plus replicated scalars.
    """
    S = mesh.shape['domain']
    L = float(box_l)
    w0 = rcut + r_buff
    nz = (int(np.floor(L / w0)) // S) * S
    ny = nx = max(3, int(np.floor(L / w0)))
    if nz < S or S < 2:
        raise ValueError("need >= 1 cell plane per shard and >= 2 "
                         "shards; use the single-chip engine otherwise")
    nzl = nz // S
    wz = L / nz
    wy = L / ny
    wx = L / nx
    if min(wx, wy, wz) < rcut:
        raise ValueError("box too small for this shard count")
    skin = min(wx, wy, wz) - rcut
    occ = n_total / (nz * ny * nx)
    if cap is None:
        cap = max(8, int(np.ceil(occ + 2.0 * np.sqrt(occ))) + 2)
    C = cap
    if mig_cap is None:
        # particles within one skin of a face, with slack
        mig_cap = max(16, int(np.ceil(n_total / nz * 2.0)) + 16)
    G = mig_cap
    lj1 = 4.0 * epsilon * sigma ** 12
    lj2 = 4.0 * epsilon * sigma ** 6
    rc2 = rcut * rcut
    rc6i = 1.0 / rc2 ** 3
    e_shift = rc6i * (lj1 * rc6i - lj2)
    perm_up = [(i, (i + 1) % S) for i in range(S)]
    perm_dn = [(i, (i - 1) % S) for i in range(S)]

    def _wrap(p):
        return p - L * jnp.round(p / L)

    # ---- per-shard force pass (full 27-stencil on extended grid) ----
    def _forces_local(posx):
        """posx (nzl+2, ny, nx, C, 3): owned planes 1..nzl with ghost
        planes 0 and nzl+1.  Periodic shifts are pre-applied to ghost
        COPIES by the caller; y/x wraps handled here via roll+shift.
        Returns forces for the nzl owned planes."""
        out = jnp.zeros((nzl, ny, nx, C, 3), dtype)
        own = posx[1:nzl + 1]
        ar_y = jnp.arange(ny)
        ar_x = jnp.arange(nx)
        for dz in (-1, 0, 1):
            blkz = posx[1 + dz: 1 + dz + nzl]        # (nzl, ny, nx, C, 3)
            for dy in (-1, 0, 1):
                blky = jnp.roll(blkz, -dy, axis=1)
                sy = jnp.where(ar_y + dy < 0, -L, 0.0) \
                    + jnp.where(ar_y + dy >= ny, L, 0.0)
                for dx in (-1, 0, 1):
                    blk = jnp.roll(blky, -dx, axis=2)
                    sx = jnp.where(ar_x + dx < 0, -L, 0.0) \
                        + jnp.where(ar_x + dx >= nx, L, 0.0)
                    xj = blk + jnp.stack(
                        [jnp.broadcast_to(sx[None, None, :, None],
                                          blk.shape[:-1]),
                         jnp.broadcast_to(sy[None, :, None, None],
                                          blk.shape[:-1]),
                         jnp.zeros(blk.shape[:-1], dtype)], axis=-1)
                    dr = own[..., :, None, :] - xj[..., None, :, :]
                    r2 = jnp.sum(dr * dr, axis=-1)
                    r2s = jnp.maximum(r2, 1e-3)
                    cut = r2 < rc2
                    r2i = 1.0 / r2s
                    r6i = r2i * r2i * r2i
                    fdivr = jnp.where(
                        cut, r2i * r6i * (12.0 * lj1 * r6i - 6.0 * lj2),
                        0.0)
                    out = out + jnp.sum(fdivr[..., None] * dr, axis=-2)
        return out

    def _pe_local(posx):
        """Potential energy of owned planes (half-counted pairs)."""
        own = posx[1:nzl + 1]
        pe = jnp.zeros((), dtype)
        ar_y = jnp.arange(ny)
        ar_x = jnp.arange(nx)
        for dz in (-1, 0, 1):
            blkz = posx[1 + dz: 1 + dz + nzl]
            for dy in (-1, 0, 1):
                blky = jnp.roll(blkz, -dy, axis=1)
                sy = jnp.where(ar_y + dy < 0, -L, 0.0) \
                    + jnp.where(ar_y + dy >= ny, L, 0.0)
                for dx in (-1, 0, 1):
                    blk = jnp.roll(blky, -dx, axis=2)
                    sx = jnp.where(ar_x + dx < 0, -L, 0.0) \
                        + jnp.where(ar_x + dx >= nx, L, 0.0)
                    xj = blk + jnp.stack(
                        [jnp.broadcast_to(sx[None, None, :, None],
                                          blk.shape[:-1]),
                         jnp.broadcast_to(sy[None, :, None, None],
                                          blk.shape[:-1]),
                         jnp.zeros(blk.shape[:-1], dtype)], axis=-1)
                    dr = own[..., :, None, :] - xj[..., None, :, :]
                    r2 = jnp.sum(dr * dr, axis=-1)
                    valid = (r2 > 1e-6) & (r2 < rc2)
                    r2s = jnp.where(valid, r2, 1.0)
                    r6i = (1.0 / r2s) ** 3
                    e = jnp.where(valid,
                                  r6i * (lj1 * r6i - lj2) - e_shift, 0.0)
                    pe = pe + 0.5 * jnp.sum(e)
        return pe

    def _ghost_exchange(pos, tag):
        """pos (nzl, ny, nx, C, 3) owned; returns extended
        (nzl+2, ...) with neighbor boundary planes, z-shifts applied at
        the periodic seam."""
        me = jax.lax.axis_index('domain')
        top = pos[-1:]                    # goes up to me+1 as its lower ghost
        bot = pos[:1]                     # goes down to me-1 as upper ghost
        t_top = tag[-1:]
        t_bot = tag[:1]
        low_g = jax.lax.ppermute(top, 'domain', perm_up)
        up_g = jax.lax.ppermute(bot, 'domain', perm_dn)
        lt = jax.lax.ppermute(t_top, 'domain', perm_up)
        ut = jax.lax.ppermute(t_bot, 'domain', perm_dn)
        # periodic z shift at the seam (shard 0's lower ghost comes from
        # shard S-1 across the boundary; shard S-1's upper from shard 0)
        low_g = low_g.at[..., 2].add(jnp.where(me == 0, -L, 0.0))
        up_g = up_g.at[..., 2].add(jnp.where(me == S - 1, L, 0.0))
        # invalid slots must stay far away after the shift too
        low_g = jnp.where((lt >= 0)[..., None], low_g, PAD_COORD)
        up_g = jnp.where((ut >= 0)[..., None], up_g, PAD_COORD)
        return jnp.concatenate([low_g, pos, up_g], axis=0)

    def _rebin_local(pos, vel, frc, tag, me):
        """Sort owned particles into local cells; emit migration
        buffers for z-crossings.  Returns fresh layout + send buffers +
        overflow flag."""
        M = nzl * ny * nx * C
        pf = pos.reshape(M, 3)
        vf = vel.reshape(M, 3)
        ff = frc.reshape(M, 3)
        tf = tag.reshape(M)
        valid = tf >= 0
        pw = _wrap(pf)
        # global cell coordinates
        f = (pw / L + 0.5)
        f = f - jnp.floor(f)
        cz = jnp.clip((f[:, 2] * nz).astype(jnp.int32), 0, nz - 1)
        cy = jnp.clip((f[:, 1] * ny).astype(jnp.int32), 0, ny - 1)
        cx = jnp.clip((f[:, 0] * nx).astype(jnp.int32), 0, nx - 1)
        zlo = me * nzl
        stays = valid & (cz >= zlo) & (cz < zlo + nzl)
        go_up = valid & (cz == (zlo + nzl) % nz)
        go_dn = valid & (cz == (zlo - 1 + nz) % nz)
        lost = valid & ~stays & ~go_up & ~go_dn
        ovf = jnp.any(lost)

        def pack(sel):
            order = jnp.argsort(~sel)
            idx = order[:G]
            ok = sel[idx]
            return (jnp.where(ok[:, None], pw[idx], PAD_COORD),
                    jnp.where(ok[:, None], vf[idx], 0.0),
                    jnp.where(ok[:, None], ff[idx], 0.0),
                    jnp.where(ok, tf[idx], -1),
                    jnp.sum(sel) > G)
        pu, vu, fu, tu, o1 = pack(go_up)
        pd, vd, fd, td, o2 = pack(go_dn)
        ovf = ovf | o1 | o2
        return (pw, vf, ff, tf, stays, cz, cy, cx, pu, vu, fu, tu,
                pd, vd, fd, td, ovf)

    def _place(parts, me):
        """Scatter stayers + arrivals into the (nzl, ny, nx, C) layout."""
        (pw, vf, ff, tf, stays, cz, cy, cx,
         ap, av, af, at) = parts
        M = pw.shape[0]
        zlo = me * nzl
        # merge arrivals (2G rows) with stayers into one list
        a_ok = at >= 0
        aw = _wrap(ap)
        fa = (aw / L + 0.5)
        fa = fa - jnp.floor(fa)
        acz = jnp.clip((fa[:, 2] * nz).astype(jnp.int32), 0, nz - 1)
        acy = jnp.clip((fa[:, 1] * ny).astype(jnp.int32), 0, ny - 1)
        acx = jnp.clip((fa[:, 0] * nx).astype(jnp.int32), 0, nx - 1)
        allp = jnp.concatenate([pw, aw])
        allv = jnp.concatenate([vf, av])
        allf = jnp.concatenate([ff, af])
        allt = jnp.concatenate([tf, at])
        ok = jnp.concatenate([stays, a_ok])
        zz = jnp.concatenate([cz, acz])
        yy = jnp.concatenate([cy, acy])
        xx = jnp.concatenate([cx, acx])
        lc = (zz - zlo) * ny * nx + yy * nx + xx       # local cell id
        ncl = nzl * ny * nx
        key = jnp.where(ok, lc, ncl).astype(jnp.int32)
        order = jnp.argsort(key, stable=True)
        ks = key[order]
        idx = jnp.arange(ks.shape[0], dtype=jnp.int32)
        b = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
        first = jax.lax.associative_scan(jnp.maximum,
                                         jnp.where(b, idx, 0))
        rank = idx - first
        okr = (rank < C) & (ks < ncl)
        slot = jnp.where(okr, ks * C + rank, ncl * C)
        ovf = jnp.any((ks < ncl) & (rank >= C))
        Mout = ncl * C

        def scat(a, fill):
            base = jnp.full((Mout,) + a.shape[1:], fill, a.dtype)
            return base.at[slot].set(a[order], mode='drop')
        np_ = scat(allp, PAD_COORD).reshape(nzl, ny, nx, C, 3)
        nv = scat(allv, 0.0).reshape(nzl, ny, nx, C, 3)
        nf = scat(allf, 0.0).reshape(nzl, ny, nx, C, 3)
        nt = scat(allt, -1).reshape(nzl, ny, nx, C)
        return np_, nv, nf, nt, ovf

    def local_rebuild(pos, vel, frc, tag):
        me = jax.lax.axis_index('domain')
        (pw, vf, ff, tf, stays, cz, cy, cx, pu, vu, fu, tu,
         pd, vd, fd, td, ovf) = _rebin_local(pos, vel, frc, tag, me)
        pu, vu, fu, tu = [jax.lax.ppermute(x, 'domain', perm_up)
                          for x in (pu, vu, fu, tu)]
        pd, vd, fd, td = [jax.lax.ppermute(x, 'domain', perm_dn)
                          for x in (pd, vd, fd, td)]
        ap = jnp.concatenate([pu, pd])
        av = jnp.concatenate([vu, vd])
        af = jnp.concatenate([fu, fd])
        at = jnp.concatenate([tu, td])
        np_, nv, nf, nt, o2 = _place(
            (pw, vf, ff, tf, stays, cz, cy, cx, ap, av, af, at), me)
        return np_, nv, nf, nt, ovf | o2

    def local_step(pos, vel, frc, tag, ref, ts, danger):
        owned = (tag >= 0)[..., None]
        vel = jnp.where(owned, vel + 0.5 * dt * frc, vel)
        pos = jnp.where(owned, pos + dt * vel, pos)      # unwrapped
        d = pos - ref
        md2 = jnp.max(jnp.where(owned, jnp.sum(d * d, -1, keepdims=True),
                                0.0))
        danger = danger | (md2 > (0.5 * skin) ** 2)
        posx = _ghost_exchange(pos, tag)
        frc = _forces_local(posx)
        frc = jnp.where(owned, frc, 0.0)
        if kT is not None:
            # Langevin bath keyed by (seed, timestep, tag): identical
            # stream regardless of which shard owns the particle
            from .. import rng as rng_mod
            key = rng_mod.step_key(seed, ts, salt=8192)
            tg = jnp.maximum(tag, 0)
            ku = jax.random.fold_in(key, 0)
            # per-tag uniform noise via counter hashing on the tag value
            u = jax.vmap(lambda t: jax.random.uniform(
                jax.random.fold_in(ku, t), (3,), dtype=dtype,
                minval=-1.0, maxval=1.0))(tg.reshape(-1)).reshape(
                    tag.shape + (3,))
            gamma = 1.0
            noise = jnp.sqrt(6.0 * gamma * kT / dt) * u
            frc = jnp.where(owned, frc + noise - gamma * vel, 0.0)
        vel = jnp.where(owned, vel + 0.5 * dt * frc, vel)
        return pos, vel, frc, tag, ref, ts + 1, danger

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P('domain'), P('domain'), P('domain'), P('domain'),
                  P('domain'), P(), P(), P()),
        out_specs=(P('domain'), P('domain'), P('domain'), P('domain'),
                   P('domain'), P(), P(), P(), P(), P(), P()),
        check_vma=False)
    def _sharded_chunk(pos, vel, frc, tag, ref, ts, danger, nwin):
        """nwin windows of k_rebuild steps, each ending in rebuild +
        migration; returns thermo + flags."""
        ovf = jnp.zeros((), bool)

        def win(_, carry):
            pos, vel, frc, tag, ref, ts, danger, ovf = carry

            def stp(_, c):
                pos, vel, frc, tag, ref, ts, danger = c
                return local_step(pos, vel, frc, tag, ref, ts, danger)
            pos, vel, frc, tag, ref, ts, danger = jax.lax.fori_loop(
                0, k_rebuild, stp,
                (pos, vel, frc, tag, ref, ts, danger))
            pos, vel, frc, tag, o = local_rebuild(pos, vel, frc, tag)
            return pos, vel, frc, tag, pos, ts, danger, ovf | o
        pos, vel, frc, tag, ref, ts, danger, ovf = jax.lax.fori_loop(
            0, nwin, win, (pos, vel, frc, tag, ref, ts, danger, ovf))
        owned = (tag >= 0)[..., None]
        ke = 0.5 * jax.lax.psum(
            jnp.sum(jnp.where(owned, vel * vel, 0.0)), 'domain')
        pe = jax.lax.psum(_pe_local(_ghost_exchange(pos, tag)),
                          'domain')
        n = jax.lax.psum(jnp.sum(tag >= 0), 'domain')
        danger = jax.lax.pmax(danger.astype(jnp.int32), 'domain')
        ovf = jax.lax.pmax(ovf.astype(jnp.int32), 'domain')
        return (pos, vel, frc, tag, ref, ts, danger.astype(bool),
                ovf.astype(bool), ke, pe, n)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P('domain'), P('domain')), out_specs=P('domain'),
        check_vma=False)
    def _sharded_forces(pos, tag):
        frc = _forces_local(_ghost_exchange(pos, tag))
        return jnp.where((tag >= 0)[..., None], frc, 0.0)

    def init_fn(pos_global, vel_global):
        pos_global = np.asarray(pos_global)
        vel_global = np.asarray(vel_global)
        N = len(pos_global)
        f = (pos_global / L + 0.5) % 1.0
        cz = np.minimum((f[:, 2] * nz).astype(int), nz - 1)
        cy = np.minimum((f[:, 1] * ny).astype(int), ny - 1)
        cx = np.minimum((f[:, 0] * nx).astype(int), nx - 1)
        pos_d = np.full((nz, ny, nx, C, 3), PAD_COORD, np.float32)
        vel_d = np.zeros((nz, ny, nx, C, 3), np.float32)
        tag_d = np.full((nz, ny, nx, C), -1, np.int32)
        cnt = np.zeros((nz, ny, nx), np.int32)
        for i in range(N):
            z, y, x = cz[i], cy[i], cx[i]
            k = cnt[z, y, x]
            if k >= C:
                raise RuntimeError("cell capacity too small at init")
            pos_d[z, y, x, k] = pos_global[i]
            vel_d[z, y, x, k] = vel_global[i]
            tag_d[z, y, x, k] = i
            cnt[z, y, x] += 1
        sh = NamedSharding(mesh, P('domain'))
        pos = jax.device_put(jnp.asarray(pos_d, dtype), sh)
        vel = jax.device_put(jnp.asarray(vel_d, dtype), sh)
        frc = jax.device_put(jnp.zeros_like(pos), sh)
        tag = jax.device_put(jnp.asarray(tag_d), sh)
        frc = jax.jit(_sharded_forces)(pos, tag)
        carry = {'pos': pos, 'vel': vel, 'frc': frc, 'tag': tag,
                 'ref': pos, 'ts': jnp.zeros((), jnp.int32)}
        return carry

    @functools.partial(jax.jit, static_argnums=1)
    def _run(carry, nwin):
        out = _sharded_chunk(carry['pos'], carry['vel'], carry['frc'],
                             carry['tag'], carry['ref'], carry['ts'],
                             jnp.zeros((), bool),
                             jnp.asarray(nwin, jnp.int32))
        pos, vel, frc, tag, ref, ts, danger, ovf, ke, pe, n = out
        new = {'pos': pos, 'vel': vel, 'frc': frc, 'tag': tag,
               'ref': ref, 'ts': ts}
        return new, {'danger': danger, 'overflow': ovf, 'ke': ke,
                     'pe': pe, 'n_owned': n}

    def run_fn(carry, nwindows):
        """Run nwindows * k_rebuild steps; returns (carry, thermo)."""
        return _run(carry, int(nwindows))

    def gather_fn(carry):
        pos = np.asarray(jax.device_get(carry['pos'])).reshape(-1, 3)
        vel = np.asarray(jax.device_get(carry['vel'])).reshape(-1, 3)
        tag = np.asarray(jax.device_get(carry['tag'])).reshape(-1)
        sel = tag >= 0
        N = int(sel.sum())
        p = np.zeros((N, 3))
        v = np.zeros((N, 3))
        p[tag[sel]] = pos[sel] - L * np.round(pos[sel] / L)
        v[tag[sel]] = vel[sel]
        return p, v

    return init_fn, run_fn, gather_fn
