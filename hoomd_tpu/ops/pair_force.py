"""Neighbor-list pair force driver.

TPU-native equivalent of the reference PotentialPair template
(md/PotentialPair.h:83-309 CPU, md/PotentialPairGPU.cuh:209-258 GPU): one
vectorized pass over the padded (N, K) neighbor list computing force, energy
and virial simultaneously.  Where the reference assigns a warp fraction per
particle, here the whole (N, K) tile is a fused VPU computation — gathers
feed an elementwise evaluator and a K-axis reduction.

Pairs appear in both i's and j's lists, so every pair is evaluated twice and
no scatter is needed (identical to the reference GPU "full" neighbor list
mode); the 0.5 factors on energy/virial account for that.

Shift modes follow PotentialPair.h:83-147: 'none', 'shift' (energy shifted to
zero at r_cut) and 'xplor' (smoothing function between r_on and r_cut).
"""

from __future__ import annotations

import jax.numpy as jnp

from .._config import PAD_COORD, int_dtype


def pair_force_nlist(pos, typeid, charge, diameter, nbr_idx, box, evaluator,
                     param_tables, rcut_table, ron_table=None, mode='none'):
    """Compute (force (N,3), pe (N,), virial (N,6)) from a padded nlist.

    param_tables: dict name -> (ntypes, ntypes) derived-parameter tables.
    rcut_table:   (ntypes, ntypes); pairs beyond r_cut contribute zero.
    ron_table:    (ntypes, ntypes) XPLOR r_on (mode == 'xplor' only).
    """
    idt = int_dtype()
    N, K = nbr_idx.shape
    dtype = pos.dtype

    pos_pad = jnp.concatenate(
        [pos, jnp.full((1, 3), PAD_COORD, dtype=dtype)], axis=0)
    t_pad = jnp.concatenate([typeid, jnp.zeros((1,), dtype=idt)])

    j = nbr_idx
    dr = box.min_image(pos[:, None, :] - pos_pad[j])   # (N,K,3)
    r2 = jnp.sum(dr * dr, axis=-1)

    ti = typeid[:, None]
    tj = t_pad[j]
    p = {name: tbl[ti, tj] for name, tbl in param_tables.items()}
    rcut = rcut_table[ti, tj]
    rc2 = rcut * rcut

    if getattr(evaluator, 'needs_rcut', False):
        p['rcut'] = rcut
    if evaluator.needs_charge:
        q_pad = jnp.concatenate([charge, jnp.zeros((1,), dtype=dtype)])
        p['qiqj'] = charge[:, None] * q_pad[j]
    if evaluator.needs_diameter:
        d_pad = jnp.concatenate([diameter, jnp.ones((1,), dtype=dtype)])
        p['delta'] = 0.5 * (diameter[:, None] + d_pad[j]) - 1.0
        if getattr(evaluator, 'needs_both_diameters', False):
            p['di'] = diameter[:, None] + 0.0 * d_pad[j]
            p['dj'] = d_pad[j] + 0.0 * diameter[:, None]

    valid = (j < N) & (r2 < rc2) & (rc2 > 0.0)
    # keep masked lanes numerically tame before the evaluator sees them
    r2s = jnp.where(valid, r2, 1.0)
    fdivr, e = evaluator.energy_force(r2s, p)

    if mode == 'shift':
        _, e_rc = evaluator.energy_force(rc2, p)
        e = e - e_rc
    elif mode == 'xplor':
        assert ron_table is not None
        ron = ron_table[ti, tj]
        ron2 = ron * ron
        denom = (rc2 - ron2) ** 3
        s = jnp.where(
            r2s > ron2,
            (rc2 - r2s) ** 2 * (rc2 + 2.0 * r2s - 3.0 * ron2) / denom,
            1.0)
        ds_dr2 = jnp.where(
            r2s > ron2,
            (-2.0 * (rc2 - r2s) * (rc2 + 2.0 * r2s - 3.0 * ron2)
             + (rc2 - r2s) ** 2 * 2.0) / denom,
            0.0)
        f_x = fdivr * s - e * 2.0 * ds_dr2
        e_x = e * s
        # when r_on >= r_cut the reference falls back to plain shifting
        _, e_rc = evaluator.energy_force(rc2, p)
        fallback = ron2 >= rc2
        fdivr = jnp.where(fallback, fdivr, f_x)
        e = jnp.where(fallback, e - e_rc, e_x)

    fdivr = jnp.where(valid, fdivr, 0.0).astype(dtype)
    e = jnp.where(valid, e, 0.0).astype(dtype)

    force = jnp.sum(fdivr[:, :, None] * dr, axis=1)
    pe = 0.5 * jnp.sum(e, axis=1)
    # per-particle virial, 6 upper-triangular components xx,xy,xz,yy,yz,zz
    # (ForceCompute.h virial layout); 0.5 per double-counted pair
    vxx = 0.5 * jnp.sum(fdivr * dr[:, :, 0] * dr[:, :, 0], axis=1)
    vxy = 0.5 * jnp.sum(fdivr * dr[:, :, 0] * dr[:, :, 1], axis=1)
    vxz = 0.5 * jnp.sum(fdivr * dr[:, :, 0] * dr[:, :, 2], axis=1)
    vyy = 0.5 * jnp.sum(fdivr * dr[:, :, 1] * dr[:, :, 1], axis=1)
    vyz = 0.5 * jnp.sum(fdivr * dr[:, :, 1] * dr[:, :, 2], axis=1)
    vzz = 0.5 * jnp.sum(fdivr * dr[:, :, 2] * dr[:, :, 2], axis=1)
    virial = jnp.stack([vxx, vxy, vxz, vyy, vyz, vzz], axis=-1)
    return force, pe, virial
