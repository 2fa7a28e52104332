"""Anisotropic (orientation-dependent) pair force driver.

Equivalent of the reference AnisoPotentialPair template
(md/AnisoPotentialPair.h) producing force, TORQUE, energy and virial.

Design: evaluators define only the pair ENERGY as a function of the
separation vector and each particle's rotated body axis; forces and torques
come from one reverse-mode sweep (jax.grad) over the half-summed total
energy.  Because the padded neighbor list is symmetric (each pair appears in
both rows), gradients w.r.t. the per-particle axis arrays accumulate both
the "own-row" and "partner-row" contributions, yielding exact Newton-3
consistent torques with no scatter:

  F_i    = -2 * sum_k dE/ddr[i,k]          (E = half-summed pair energy)
  tau_i  = -e_i x dE/de_i                  (axis-vector torque identity)

This guarantees energy conservation in aniso NVE by construction — the
property the reference checks with CPU/GPU parity tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._config import PAD_COORD, int_dtype


def aniso_pair_force(pos, typeid, charge, quat_arr, nbr_idx, box, evaluator,
                     param_tables, rcut_table):
    """Returns (force (N,3), torque (N,3), pe (N,), virial (N,6))."""
    from . import quat as Q
    idt = int_dtype()
    N, K = nbr_idx.shape
    dtype = pos.dtype

    axis = jnp.asarray(evaluator.body_axis, dtype=dtype)
    e_i = Q.rotate(quat_arr, jnp.broadcast_to(axis, (N, 3)))   # (N,3)

    pos_pad = jnp.concatenate(
        [pos, jnp.full((1, 3), PAD_COORD, dtype)], axis=0)
    t_pad = jnp.concatenate([typeid, jnp.zeros((1,), idt)])
    q_pad = jnp.concatenate([charge, jnp.zeros((1,), dtype)])
    j = nbr_idx
    dr0 = box.min_image(pos[:, None, :] - pos_pad[j])      # (N,K,3)
    ti = typeid[:, None]
    tj = t_pad[j]
    p = {name: tbl[ti, tj] for name, tbl in param_tables.items()}
    if evaluator.needs_charge:
        p['qi'] = jnp.broadcast_to(charge[:, None], (N, K))
        p['qj'] = q_pad[j]
    rcut = rcut_table[ti, tj]
    r2 = jnp.sum(dr0 * dr0, axis=-1)
    valid = (j < N) & (r2 < rcut * rcut)

    def total_energy(dr, ei, ej_pad):
        eil = jnp.broadcast_to(ei[:, None, :], (N, K, 3))
        ejl = ej_pad[j]
        e = evaluator.energy(dr, eil, ejl, p, rcut)
        return 0.5 * jnp.sum(jnp.where(valid, e, 0.0)), \
            jnp.where(valid, e, 0.0)

    ej_pad_in = jnp.concatenate([e_i, jnp.zeros((1, 3), dtype)], axis=0)
    (E, e_lane), grads = jax.value_and_grad(
        total_energy, argnums=(0, 1, 2), has_aux=True)(dr0, e_i, ej_pad_in)
    g_dr, g_ei, g_ej = grads

    f_lane = -2.0 * g_dr                       # per-lane force on i
    force = jnp.sum(f_lane, axis=1)
    g_axis = g_ei + g_ej[:N]                   # total dE/de_i
    torque = -jnp.cross(e_i, g_axis)
    pe = jnp.sum(e_lane, axis=1) * 0.5
    pairs = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    virial = jnp.stack(
        [0.5 * jnp.sum(f_lane[:, :, a] * dr0[:, :, b], axis=1)
         for a, b in pairs], axis=-1)
    return (force.astype(dtype), torque.astype(dtype), pe.astype(dtype),
            virial.astype(dtype))


class gb_evaluator:
    """Gay-Berne for uniaxial ellipsoids (reference EvaluatorPairGB.h:95-185
    behavior): body z-axis is the symmetry axis; contact distance sigma from
    the overlap function; V = 4 eps (zeta^-12 - zeta^-6) with
    zeta = (r - sigma + sigma_min)/sigma_min, energy-shifted at the cutoff
    along the long axis."""
    body_axis = (0.0, 0.0, 1.0)
    needs_charge = False
    coeff_names = ('epsilon', 'lperp', 'lpar')
    defaults = {}

    @staticmethod
    def derive(p):
        return dict(p)

    @staticmethod
    def energy(dr, a3, b3, p, rcut):
        eps = p['epsilon']
        lperp = p['lperp']
        lpar = p['lpar']
        r2 = jnp.maximum(jnp.sum(dr * dr, axis=-1), 1e-12)
        r = jnp.sqrt(r2)
        u = dr / r[..., None]
        ca = jnp.sum(a3 * u, axis=-1)
        cb = jnp.sum(b3 * u, axis=-1)
        cab = jnp.sum(a3 * b3, axis=-1)
        lp2 = lpar * lpar
        lq2 = lperp * lperp
        chi = (lp2 - lq2) / (lp2 + lq2)
        chic = chi * cab
        chi_fact = chi / (1.0 - chic * chic)
        kap = (0.5 * r / lq2)[..., None] * (
            u - chi_fact[..., None] * ((ca - chic * cb)[..., None] * a3
                                       + (cb - chic * ca)[..., None] * b3))
        phi = 0.5 * jnp.sum(dr * kap, axis=-1) / r2
        sigma = 1.0 / jnp.sqrt(jnp.maximum(phi, 1e-12))
        sigma_min = 2.0 * jnp.minimum(lperp, lpar)
        sigma_max = 2.0 * jnp.maximum(lperp, lpar)
        zeta = jnp.maximum((r - sigma + sigma_min) / sigma_min, 0.05)
        z2i = 1.0 / (zeta * zeta)
        z6i = z2i * z2i * z2i
        v = 4.0 * eps * (z6i * z6i - z6i)
        # energy shift at the long-axis cutoff (EvaluatorPairGB.h:129-133)
        zc = (rcut - sigma_max + sigma_min) / sigma_min
        zc2i = 1.0 / (zc * zc)
        zc6i = zc2i * zc2i * zc2i
        v_cut = 4.0 * eps * (zc6i * zc6i - zc6i)
        return jnp.where(zeta < zc, v - v_cut, 0.0)


class dipole_evaluator:
    """Screened point dipoles + charges (reference EvaluatorPairDipole.h):
    dipole moment mu along the body x-axis, Yukawa screening
    prefactor A exp(-kappa r)."""
    body_axis = (1.0, 0.0, 0.0)
    needs_charge = True
    coeff_names = ('mu', 'A', 'kappa')
    defaults = {'A': 1.0}

    @staticmethod
    def derive(p):
        return dict(p)

    @staticmethod
    def energy(dr, ex_i, ex_j, p, rcut):
        mu = p['mu']
        A = p['A']
        kappa = p['kappa']
        qi, qj = p['qi'], p['qj']
        r2 = jnp.maximum(jnp.sum(dr * dr, axis=-1), 1e-12)
        r = jnp.sqrt(r2)
        pref = A * jnp.exp(-kappa * r)
        p_i = mu[..., None] * ex_i
        p_j = mu[..., None] * ex_j
        r3i = 1.0 / (r2 * r)
        r5i = r3i / r2
        u_dd = pref * (jnp.sum(p_i * p_j, axis=-1) * r3i
                       - 3.0 * jnp.sum(p_i * dr, axis=-1)
                       * jnp.sum(p_j * dr, axis=-1) * r5i)
        # dipole-charge terms (reference sign convention: dr = r_i - r_j)
        u_dq = pref * r3i * (qj * jnp.sum(p_i * dr, axis=-1)
                             - qi * jnp.sum(p_j * dr, axis=-1))
        u_qq = pref * qi * qj / r
        return u_dd + u_dq + u_qq
