"""Bonded (fixed-topology) force evaluation: bonds, angles, dihedrals,
impropers, special pairs.

TPU-native redesign of the reference's BondedGroupData + per-kind force
computes (hoomd/BondedGroupData.h; md/HarmonicAngleForceCompute.cc,
md/HarmonicDihedralForceCompute.cc, ...).  Instead of hand-derived force
expressions per interaction (error-prone for dihedrals), each interaction
defines only its scalar ENERGY as a function of the min-imaged displacement
vectors along the group; forces come from ``jax.grad`` — exact, fused by XLA,
and automatically consistent with the energy.  Per-particle energy and virial
are split equally among group members, matching the reference convention
(ForceCompute.h virial accounting).

Group tables hold particle *slot indices* (the caller maps tags -> slots via
rtag); padding rows use sentinel index N and are masked out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._config import int_dtype


def _safe_norm(v):
    return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1), 1e-12))


# --------------------------------------------------------------------------
# Energy functions.  Signature: energy(disps, p) -> scalar, where disps is a
# tuple of (arity-1) displacement 3-vectors b_k = r_{k+1} - r_k (min-imaged)
# and p is a dict of per-group scalar parameters.
# --------------------------------------------------------------------------

def bond_harmonic_energy(disps, p):
    """V = k/2 (r - r0)^2 (md/EvaluatorBondHarmonic.h; md/bond.py harmonic)."""
    r = _safe_norm(disps[0])
    return 0.5 * p['k'] * (r - p['r0']) ** 2


def bond_fene_energy(disps, p):
    """FENE + WCA (md/EvaluatorBondFENE.h; md/bond.py fene):
    V = -k/2 r0^2 ln(1-(r/r0)^2) + WCA(eps, sigma)."""
    r = _safe_norm(disps[0])
    x = jnp.clip((r / p['r0']) ** 2, 0.0, 0.99)
    fene = -0.5 * p['k'] * p['r0'] ** 2 * jnp.log1p(-x)
    # WCA: LJ cut at 2^(1/6) sigma, shifted up by epsilon
    s2 = (p['sigma'] ** 2) / jnp.maximum(r * r, 1e-12)
    s6 = s2 * s2 * s2
    wca = jnp.where(s2 > 2.0 ** (-1.0 / 3.0),
                    4.0 * p['epsilon'] * (s6 * s6 - s6) + p['epsilon'],
                    0.0)
    return fene + wca


def _cos_angle(d1, d2):
    return jnp.clip(jnp.dot(d1, d2) / (_safe_norm(d1) * _safe_norm(d2)),
                    -1.0 + 1e-7, 1.0 - 1e-7)


def angle_harmonic_energy(disps, p):
    """V = k/2 (theta - t0)^2 (md/HarmonicAngleForceCompute.cc).
    Convention: group (a,b,c), disps (b-a, c-b); theta is the angle at b
    between (a-b) and (c-b) = angle between -d1 and d2."""
    d1, d2 = disps
    c = _cos_angle(-d1, d2)
    theta = jnp.arccos(c)
    return 0.5 * p['k'] * (theta - p['t0']) ** 2


def angle_cosinesq_energy(disps, p):
    """V = k/2 (cos theta - cos t0)^2 (md/CosineSqAngleForceCompute.cc)."""
    d1, d2 = disps
    c = _cos_angle(-d1, d2)
    return 0.5 * p['k'] * (c - jnp.cos(p['t0'])) ** 2


def _dihedral_phi(b1, b2, b3):
    """Torsion angle via the atan2 formulation (numerically stable)."""
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    y = jnp.dot(jnp.cross(n1, n2), b2) / _safe_norm(b2)
    x = jnp.dot(n1, n2)
    return jnp.arctan2(y, x)


def dihedral_harmonic_energy(disps, p):
    """V = k/2 [1 + d cos(n phi)] (md/HarmonicDihedralForceCompute.cc)."""
    phi = _dihedral_phi(*disps)
    return 0.5 * p['k'] * (1.0 + p['d'] * jnp.cos(p['n'] * phi))


def dihedral_opls_energy(disps, p):
    """OPLS 4-term cosine series (md/OPLSDihedralForceCompute.cc)."""
    phi = _dihedral_phi(*disps)
    return 0.5 * (p['k1'] * (1.0 + jnp.cos(phi))
                  + p['k2'] * (1.0 - jnp.cos(2.0 * phi))
                  + p['k3'] * (1.0 + jnp.cos(3.0 * phi))
                  + p['k4'] * (1.0 - jnp.cos(4.0 * phi)))


def improper_harmonic_energy(disps, p):
    """V = k/2 (chi - chi0)^2 (md/HarmonicImproperForceCompute.cc)."""
    chi = _dihedral_phi(*disps)
    return 0.5 * p['k'] * (chi - p['chi0']) ** 2


def special_lj_energy(disps, p):
    """Per-listed-pair LJ (md/EvaluatorSpecialPairLJ.h), cut at r_cut and
    unshifted (the reference default)."""
    r2 = jnp.sum(disps[0] * disps[0])
    r2 = jnp.maximum(r2, 1e-12)
    r6 = (p['sigma'] ** 2 / r2) ** 3
    e = 4.0 * p['epsilon'] * (r6 * r6 - p['alpha'] * r6)
    return jnp.where(r2 < p['r_cut'] ** 2, e, 0.0)


def special_coulomb_energy(disps, p):
    """Per-listed-pair scaled Coulomb (md/EvaluatorSpecialPairCoulomb.h):
    V = alpha q_i q_j / r, cut at r_cut.  qiqj is injected per group."""
    r = _safe_norm(disps[0])
    e = p['alpha'] * p['qiqj'] / r
    return jnp.where(r < p['r_cut'], e, 0.0)


# --------------------------------------------------------------------------
# Generic driver
# --------------------------------------------------------------------------

def bonded_force(pos, box, groups, params, energy_fn):
    """Evaluate one bonded interaction kind over all its groups.

    pos:     (N,3); box: Box
    groups:  (M, arity) int slot indices; rows with any index >= N are
             padding and contribute nothing.
    params:  dict name -> (M,) per-group parameter arrays.
    energy_fn(disps, p): scalar energy of one group.

    Returns (force (N,3), pe (N,), virial (N,6)).
    """
    idt = int_dtype()
    N = pos.shape[0]
    M, arity = groups.shape
    dtype = pos.dtype
    if M == 0:
        z3 = jnp.zeros((N, 3), dtype=dtype)
        return z3, jnp.zeros((N,), dtype=dtype), jnp.zeros((N, 6),
                                                           dtype=dtype)

    valid = jnp.all(groups < N, axis=1)
    g = jnp.where(valid[:, None], groups, 0).astype(idt)
    r = pos[g]                                     # (M, arity, 3)
    disps = tuple(box.min_image(r[:, k + 1] - r[:, k])
                  for k in range(arity - 1))       # each (M,3)

    def term(disp_tuple, p):
        return energy_fn(disp_tuple, p)

    e_and_g = jax.vmap(jax.value_and_grad(term, argnums=0),
                       in_axes=(0, {k: 0 for k in params}))
    energy, grads = e_and_g(disps, params)         # energy (M,), grads tuple

    energy = jnp.where(valid, energy, 0.0).astype(dtype)
    grads = tuple(jnp.where(valid[:, None], gk, 0.0).astype(dtype)
                  for gk in grads)

    # F_i = -dE/dr_i = g_i - g_{i-1} with b_k = r_{k+1}-r_k, g_k = dE/db_k
    # (out-of-range g treated as zero)
    member_forces = []
    for k in range(arity):
        f = jnp.zeros((M, 3), dtype=dtype)
        if k < arity - 1:
            f = f + grads[k]
        if k > 0:
            f = f - grads[k - 1]
        member_forces.append(f)

    # total virial of a group is -sum_k b_k (x) g_k; split evenly (reference
    # ForceCompute convention), using the 6 upper-triangular components
    vir = jnp.zeros((M, 6), dtype=dtype)
    for bk, gk in zip(disps, grads):
        pairs = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
        v = jnp.stack([-bk[:, a] * gk[:, b] for a, b in pairs], axis=-1)
        vir = vir + v
    vir = vir / arity
    e_share = energy / arity

    force = jnp.zeros((N, 3), dtype=dtype)
    pe = jnp.zeros((N,), dtype=dtype)
    virial = jnp.zeros((N, 6), dtype=dtype)
    for k in range(arity):
        idx = g[:, k]
        force = force.at[idx].add(member_forces[k], mode='drop')
        pe = pe.at[idx].add(e_share, mode='drop')
        virial = virial.at[idx].add(vir, mode='drop')
    return force, pe, virial
