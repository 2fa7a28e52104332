"""Pair potential evaluators.

Vectorized re-implementations of the reference evaluator headers
(md/EvaluatorPairLJ.h and siblings; python surface md/pair.py:536-2705).
The contract mirrors the reference: given r^2 and per-pair parameters,
return (force_divr, pair_energy) where force_divr = -(dV/dr)/r.  Everything
is elementwise on (N, K) arrays so the whole pair pipeline fuses on the VPU.

Each evaluator is a namespace class:
  * ``coeff_names``: parameters of pair_coeff.set (matching the reference API)
  * ``derive(params) -> dict``: precompute the packed parameter tables
  * ``energy_force(r2, p) -> (force_divr, energy)``
  * ``needs_charge`` / ``needs_diameter``: extra per-pair inputs (q_i*q_j as
    p['qiqj'], diameter shift as p['delta']).

Evaluators are written to be safe when evaluated at masked entries (huge r2
from padded neighbors): intermediate infs/NaNs are tolerated because the
driver zeroes masked lanes afterwards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class lj:
    """Lennard-Jones (EvaluatorPairLJ.h; md/pair.py lj).
    V = 4 eps [ (sig/r)^12 - alpha (sig/r)^6 ]."""
    coeff_names = ('epsilon', 'sigma', 'alpha')
    defaults = {'alpha': 1.0}
    needs_charge = False
    needs_diameter = False

    @staticmethod
    def derive(p):
        s6 = p['sigma'] ** 6
        return {'lj1': 4.0 * p['epsilon'] * s6 * s6,
                'lj2': 4.0 * p['epsilon'] * p['alpha'] * s6}

    @staticmethod
    def energy_force(r2, p):
        r2inv = 1.0 / r2
        r6inv = r2inv * r2inv * r2inv
        fdivr = r2inv * r6inv * (12.0 * p['lj1'] * r6inv - 6.0 * p['lj2'])
        e = r6inv * (p['lj1'] * r6inv - p['lj2'])
        return fdivr, e


class gauss:
    """Gaussian (EvaluatorPairGauss.h). V = eps exp(-r^2/(2 sig^2))."""
    coeff_names = ('epsilon', 'sigma')
    defaults = {}
    needs_charge = False
    needs_diameter = False

    @staticmethod
    def derive(p):
        return {'epsilon': p['epsilon'], 'sigma2': p['sigma'] ** 2}

    @staticmethod
    def energy_force(r2, p):
        e = p['epsilon'] * jnp.exp(-0.5 * r2 / p['sigma2'])
        fdivr = e / p['sigma2']
        return fdivr, e


class slj:
    """Diameter-shifted LJ (EvaluatorPairSLJ.h): LJ evaluated at
    r' = r - Delta, Delta = (d_i + d_j)/2 - 1."""
    coeff_names = ('epsilon', 'sigma', 'alpha')
    defaults = {'alpha': 1.0}
    needs_charge = False
    needs_diameter = True

    @staticmethod
    def derive(p):
        s6 = p['sigma'] ** 6
        return {'lj1': 4.0 * p['epsilon'] * s6 * s6,
                'lj2': 4.0 * p['epsilon'] * p['alpha'] * s6}

    @staticmethod
    def energy_force(r2, p):
        r = jnp.sqrt(r2)
        rs = r - p['delta']
        rs = jnp.where(rs > 1e-6, rs, 1e-6)
        rsinv = 1.0 / rs
        rs2inv = rsinv * rsinv
        rs6inv = rs2inv * rs2inv * rs2inv
        f = rsinv * rs6inv * (12.0 * p['lj1'] * rs6inv - 6.0 * p['lj2'])
        e = rs6inv * (p['lj1'] * rs6inv - p['lj2'])
        return f / r, e


class yukawa:
    """Screened Coulomb (EvaluatorPairYukawa.h).
    V = eps exp(-kappa r)/r."""
    coeff_names = ('epsilon', 'kappa')
    defaults = {}
    needs_charge = False
    needs_diameter = False

    @staticmethod
    def derive(p):
        return dict(p)

    @staticmethod
    def energy_force(r2, p):
        r = jnp.sqrt(r2)
        ex = jnp.exp(-p['kappa'] * r)
        e = p['epsilon'] * ex / r
        fdivr = e * (p['kappa'] * r + 1.0) / r2
        return fdivr, e


class morse:
    """Morse (EvaluatorPairMorse.h).
    V = D0 [exp(-2 alpha (r-r0)) - 2 exp(-alpha (r-r0))]."""
    coeff_names = ('D0', 'alpha', 'r0')
    defaults = {}
    needs_charge = False
    needs_diameter = False

    @staticmethod
    def derive(p):
        return dict(p)

    @staticmethod
    def energy_force(r2, p):
        r = jnp.sqrt(r2)
        ex = jnp.exp(-p['alpha'] * (r - p['r0']))
        e = p['D0'] * (ex * ex - 2.0 * ex)
        fdivr = 2.0 * p['D0'] * p['alpha'] * (ex * ex - ex) / r
        return fdivr, e


class mie:
    """Mie n-m potential (EvaluatorPairMie.h)."""
    coeff_names = ('epsilon', 'sigma', 'n', 'm')
    defaults = {'n': 12.0, 'm': 6.0}
    needs_charge = False
    needs_diameter = False

    @staticmethod
    def derive(p):
        n, m = p['n'], p['m']
        pref = (n / (n - m)) * (n / m) ** (m / (n - m)) * p['epsilon']
        return {'c_n': pref * p['sigma'] ** n,
                'c_m': pref * p['sigma'] ** m,
                'n': n, 'm': m}

    @staticmethod
    def energy_force(r2, p):
        r = jnp.sqrt(r2)
        rn = r ** (-p['n'])
        rm = r ** (-p['m'])
        e = p['c_n'] * rn - p['c_m'] * rm
        fdivr = (p['n'] * p['c_n'] * rn - p['m'] * p['c_m'] * rm) / r2
        return fdivr, e


class buckingham:
    """Buckingham (EvaluatorPairBuckingham.h). V = A exp(-r/rho) - C/r^6."""
    coeff_names = ('A', 'rho', 'C')
    defaults = {}
    needs_charge = False
    needs_diameter = False

    @staticmethod
    def derive(p):
        return dict(p)

    @staticmethod
    def energy_force(r2, p):
        r = jnp.sqrt(r2)
        ex = p['A'] * jnp.exp(-r / p['rho'])
        r2inv = 1.0 / r2
        r6inv = r2inv * r2inv * r2inv
        e = ex - p['C'] * r6inv
        fdivr = ex / (p['rho'] * r) - 6.0 * p['C'] * r6inv * r2inv
        return fdivr, e


class lj1208:
    """12-8 LJ (EvaluatorPairLJ1208.h).
    V = 4 eps [ (sig/r)^12 - alpha (sig/r)^8 ]."""
    coeff_names = ('epsilon', 'sigma', 'alpha')
    defaults = {'alpha': 1.0}
    needs_charge = False
    needs_diameter = False

    @staticmethod
    def derive(p):
        s8 = p['sigma'] ** 8
        return {'lj1': 4.0 * p['epsilon'] * p['sigma'] ** 12,
                'lj2': 4.0 * p['epsilon'] * p['alpha'] * s8}

    @staticmethod
    def energy_force(r2, p):
        r2inv = 1.0 / r2
        r4inv = r2inv * r2inv
        r8inv = r4inv * r4inv
        e = p['lj1'] * r8inv * r4inv - p['lj2'] * r8inv
        fdivr = r2inv * r8inv * (12.0 * p['lj1'] * r4inv - 8.0 * p['lj2'])
        return fdivr, e


class force_shifted_lj:
    """Force-shifted LJ (EvaluatorPairForceShiftedLJ.h): F goes smoothly to
    zero at r_cut; requires rcut in params (driver injects p['rcut'])."""
    coeff_names = ('epsilon', 'sigma', 'alpha')
    defaults = {'alpha': 1.0}
    needs_charge = False
    needs_diameter = False
    needs_rcut = True

    @staticmethod
    def derive(p):
        s6 = p['sigma'] ** 6
        return {'lj1': 4.0 * p['epsilon'] * s6 * s6,
                'lj2': 4.0 * p['epsilon'] * p['alpha'] * s6}

    @staticmethod
    def energy_force(r2, p):
        def raw(r2):
            r2inv = 1.0 / r2
            r6inv = r2inv * r2inv * r2inv
            f = r2inv * r6inv * (12.0 * p['lj1'] * r6inv - 6.0 * p['lj2'])
            e = r6inv * (p['lj1'] * r6inv - p['lj2'])
            return f, e
        f, e = raw(r2)
        rc2 = p['rcut'] ** 2
        f_rc, e_rc = raw(rc2)
        r = jnp.sqrt(r2)
        rc = p['rcut']
        # F_fs(r) = F(r) - F(rc);  V_fs(r) = V(r) - V(rc) + (r - rc) F(rc)
        fmag_rc = f_rc * rc
        return f - fmag_rc / r, e - e_rc + (r - rc) * fmag_rc


class reaction_field:
    """Onsager reaction field (EvaluatorPairReactionField.h).
    V = eps [ 1/r + eps_rf_fac * r^2 / rc^3 ]; optionally scaled by q_i q_j."""
    coeff_names = ('epsilon', 'eps_rf', 'use_charge')
    defaults = {'use_charge': False}
    needs_charge = True
    needs_diameter = False
    needs_rcut = True

    @staticmethod
    def derive(p):
        eps_rf = p['eps_rf']
        fac = jnp.where(eps_rf == 0.0, -0.5,
                        (eps_rf - 1.0) / (2.0 * eps_rf + 1.0))
        return {'epsilon': p['epsilon'], 'fac': fac,
                'use_charge': p['use_charge']}

    @staticmethod
    def energy_force(r2, p):
        r = jnp.sqrt(r2)
        rc3 = p['rcut'] ** 3
        scale = jnp.where(p['use_charge'] != 0, p['qiqj'], 1.0)
        e = scale * p['epsilon'] * (1.0 / r + p['fac'] * r2 / rc3)
        fdivr = scale * p['epsilon'] * (1.0 / (r2 * r)
                                        - 2.0 * p['fac'] / rc3)
        return fdivr, e


class ewald:
    """Real-space Ewald (EvaluatorPairEwald.h): V = q_i q_j erfc(kappa r)/r.
    Used standalone or as the short-range part of PPPM (md/charge.py)."""
    coeff_names = ('kappa',)
    defaults = {}
    needs_charge = True
    needs_diameter = False

    @staticmethod
    def derive(p):
        return dict(p)

    @staticmethod
    def energy_force(r2, p):
        r = jnp.sqrt(r2)
        kr = p['kappa'] * r
        erfc = jax.scipy.special.erfc(kr)
        e = p['qiqj'] * erfc / r
        fdivr = p['qiqj'] * (erfc / r
                             + 2.0 * p['kappa'] / jnp.sqrt(jnp.pi)
                             * jnp.exp(-kr * kr)) / r2
        return fdivr, e


def erfc_approx(x):
    """erfc via Abramowitz-Stegun 7.1.26 (|err| <= 1.5e-7): rational
    prefactor times exp(-x^2) — only exp, which Mosaic lowers (unlike
    erf/erfc/atan), so the same formula traces in XLA and in Pallas
    kernels and both paths share one bit-stream."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return poly * jnp.exp(-x * x)


class lj_ewald:
    """Fused LJ + real-space Ewald for the cell-major stencil kernel:
    V = 4 eps [(sig/r)^12 - (sig/r)^6] + q_i q_j erfc(kappa r)/r.
    The PPPM bench config runs pair.lj and the solver's implicit
    pair.ewald on the SAME nlist with equal cutoffs; evaluating both in
    one scan halves the candidate passes (reference analog: one fused
    GPU kernel per potential pair, AllDriverPotentialPairGPU.cu)."""
    coeff_names = ('lj1', 'lj2', 'kappa')
    defaults = {}
    needs_charge = True
    needs_diameter = False

    @staticmethod
    def derive(p):
        return dict(p)

    @staticmethod
    def energy_force(r2, p):
        r2inv = 1.0 / r2
        r6inv = r2inv * r2inv * r2inv
        fdivr = r2inv * r6inv * (12.0 * p['lj1'] * r6inv
                                 - 6.0 * p['lj2'])
        e = r6inv * (p['lj1'] * r6inv - p['lj2'])
        rinv = jnp.sqrt(r2inv)
        r = r2 * rinv
        kr = p['kappa'] * r
        ec = erfc_approx(kr)
        qq = p['qiqj']
        e = e + qq * ec * rinv
        fdivr = fdivr + qq * (ec * rinv
                              + 2.0 * p['kappa']
                              * jnp.float32(0.5641895835477563)
                              * jnp.exp(-kr * kr)) * r2inv
        return fdivr, e


class dpd_conservative:
    """Conservative DPD (EvaluatorPairDPDThermo.h, conservative part only).
    F = A (1 - r/rc) rhat;  V = A rc/2 (1 - r/rc)^2."""
    coeff_names = ('A',)
    defaults = {}
    needs_charge = False
    needs_diameter = False
    needs_rcut = True

    @staticmethod
    def derive(p):
        return dict(p)

    @staticmethod
    def energy_force(r2, p):
        r = jnp.sqrt(r2)
        rc = p['rcut']
        w = jnp.maximum(1.0 - r / rc, 0.0)
        e = 0.5 * p['A'] * rc * w * w
        fdivr = p['A'] * w / r
        return fdivr, e


class dlvo:
    """DLVO colloid potential (reference EvaluatorPairDLVO.h:62-155):
    screened-electrostatic repulsion between spheres of radii a1, a2 plus
    the unretarded Hamaker sphere-sphere attraction.  Diameter-dependent;
    the cutoff test uses r < r_cut + delta like slj."""
    coeff_names = ('kappa', 'Z', 'A')
    defaults = {}
    needs_charge = False
    needs_diameter = True
    needs_both_diameters = True

    @staticmethod
    def derive(p):
        return {'kappa': p['kappa'], 'Z': p['Z'], 'A': p['A']}

    @staticmethod
    def energy_force(r2, p):
        r = jnp.sqrt(r2)
        di, dj = p['di'], p['dj']
        radsum = 0.5 * (di + dj)
        radsub = 0.5 * (di - dj)
        radprod = 0.25 * di * dj
        kappa, Z, A = p['kappa'], p['Z'], p['A']
        rmds = r - radsum
        rmdsqs = r2 - radsum * radsum
        rmdsqm = r2 - radsub * radsub
        safe = (rmdsqs > 1e-12) & (rmdsqm > 1e-12)
        rmdsqs = jnp.where(safe, rmdsqs, 1.0)
        rmdsqm = jnp.where(safe, rmdsqm, 1.0)
        exp_val = jnp.exp(-kappa * rmds)
        forcerep_divr = kappa * radprod / radsum * Z * exp_val / r
        radsumsq = 0.25 * (di * di + dj * dj)
        radsubsq = 0.25 * (di * di - dj * dj)
        t1 = r2 * r2 + radsubsq * radsubsq - 2.0 * r2 * radsumsq
        t1 = jnp.where(jnp.abs(t1) > 1e-12, t1, 1.0)
        forceatr_divr = -(32.0 / 3.0) * A * radprod ** 3 / (t1 * t1)
        f = forcerep_divr + forceatr_divr
        e = (r * forcerep_divr / jnp.where(kappa != 0, kappa, 1.0)
             - radprod / rmdsqs * A / 3.0
             - radprod / rmdsqm * A / 3.0
             - jnp.log(jnp.maximum(rmdsqs / rmdsqm, 1e-30)) * A / 6.0)
        f = jnp.where(safe, f, 0.0)
        e = jnp.where(safe, e, 0.0)
        return f, e


class moliere:
    """Moliere screened Coulomb (EvaluatorPairMoliere.h; md/pair.py moliere).
    V = Zi Zj e^2/(4 pi eps0 r) * sum_k c_k exp(-d_k r / aF)."""
    coeff_names = ('Z_i', 'Z_j', 'elementary_charge', 'a_0')
    defaults = {'elementary_charge': 1.0, 'a_0': 1.0}
    needs_charge = False
    needs_diameter = False
    _c = np.array([0.35, 0.55, 0.10])
    _d = np.array([0.3, 1.2, 6.0])

    @staticmethod
    def derive(p):
        e2 = p['elementary_charge'] ** 2
        Zsq = p['Z_i'] * p['Z_j'] * e2
        aF = 0.8853 * p['a_0'] / (jnp.sqrt(p['Z_i']) +
                                  jnp.sqrt(p['Z_j'])) ** (2.0 / 3.0)
        return {'Zsq': Zsq, 'aF': aF}

    @classmethod
    def energy_force(cls, r2, p):
        r = jnp.sqrt(r2)
        e = jnp.zeros_like(r)
        fdivr = jnp.zeros_like(r)
        for c, d in zip(cls._c, cls._d):
            ex = jnp.exp(-d * r / p['aF'])
            e = e + c * ex
            fdivr = fdivr + c * ex * (1.0 / r + d / p['aF'])
        pref = p['Zsq'] / r
        return pref * fdivr / r, pref * e


class zbl(moliere):
    """Ziegler-Biersack-Littmark (EvaluatorPairZBL.h): same functional form
    with the universal 4-term screening function."""
    _c = np.array([0.1818, 0.5099, 0.2802, 0.02817])
    _d = np.array([3.2, 0.9423, 0.4028, 0.2016])

    @staticmethod
    def derive(p):
        e2 = p['elementary_charge'] ** 2
        Zsq = p['Z_i'] * p['Z_j'] * e2
        aF = (0.8853 * p['a_0']
              / (p['Z_i'] ** 0.23 + p['Z_j'] ** 0.23))
        return {'Zsq': Zsq, 'aF': aF}


ALL_EVALUATORS = {
    'lj': lj, 'gauss': gauss, 'slj': slj, 'yukawa': yukawa, 'morse': morse,
    'mie': mie, 'buckingham': buckingham, 'lj1208': lj1208,
    'force_shifted_lj': force_shifted_lj, 'reaction_field': reaction_field,
    'ewald': ewald, 'dpd_conservative': dpd_conservative,
    'moliere': moliere, 'zbl': zbl,
}
