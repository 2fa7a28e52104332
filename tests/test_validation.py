"""Physics parity against published equations of state — the analog of
the reference's validation tier (hpmc/validation/lj_spheres.py:13-15,
sphere_eos.py; SURVEY.md §4.4):

* LJ NVT at rho*=0.6, T*=1.0, r_cut=3.0: U/N + analytic tail correction
  must match Johnson et al. (Mol. Phys. 78, 591 (1993)) U/N = -4.223.
* Hard spheres at low packing fraction: SDF pressure estimator vs the
  Carnahan-Starling equation of state.
"""

import numpy as np
import pytest

import hoomd_tpu as hoomd
from hoomd_tpu import hpmc, md


def _johnson_eos(n, melt_steps, equil_steps, n_samples):
    """LJ NVT vs Johnson et al. 1993 EOS; returns (u_full, u_trunc, tail,
    U_ref).  The reference gate is N=1000 / 0.3%
    (hpmc/validation/lj_spheres.py:13-15,30)."""
    rho, Tstar, rcut = 0.6, 1.0, 3.0
    U_ref = -4.223
    a = (1.0 / rho) ** (1.0 / 3.0)
    hoomd.context.initialize("--notice-level=0")
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=a), n=n)
    system = hoomd.context.current.system
    N = system.state.N

    rng = np.random.RandomState(3)
    snap = system.take_snapshot()
    v = rng.normal(0, np.sqrt(Tstar), (N, 3))
    v -= v.mean(axis=0)
    snap.particles.velocity[:] = v
    system.restore_snapshot(snap)

    nl = md.nlist.cell(r_buff=0.4)
    lj = md.pair.lj(r_cut=rcut, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    # NO shift: Johnson's EOS is for the full potential; we add the
    # standard mean-field tail correction for r > r_cut analytically
    lj.set_params(mode='no_shift')  # reference-spelling alias
    mode = md.integrate.mode_standard(dt=0.002)
    lan = md.integrate.langevin(group=hoomd.group.all(), kT=Tstar,
                                seed=11)
    hoomd.run(melt_steps, quiet=True)    # melt + equilibrate
    lan.disable()
    mode.set_params(dt=0.005)
    md.integrate.nvt(group=hoomd.group.all(), kT=Tstar, tau=0.5)
    hoomd.run(equil_steps, quiet=True)

    samples = []
    for _ in range(n_samples):
        hoomd.run(50, quiet=True)
        q = system.thermo_quantities()
        samples.append(q['potential_energy'] / N)
    u_trunc = float(np.mean(samples))
    # tail: (8/3) pi rho [ (1/3) rc^-9 - rc^-3 ]
    tail = (8.0 / 3.0) * np.pi * rho * ((1.0 / 3.0) * rcut ** -9
                                        - rcut ** -3)
    return u_trunc + tail, u_trunc, tail, U_ref


@pytest.mark.slow
def test_lj_nvt_johnson_eos():
    # 512 particles, ~2k tau sampling: 1.5% band (CI-speed tier)
    u_full, u_trunc, tail, U_ref = _johnson_eos(
        n=8, melt_steps=2000, equil_steps=2000, n_samples=40)
    assert abs(u_full - U_ref) / abs(U_ref) < 0.015, \
        (u_full, u_trunc, tail)


@pytest.mark.validation
def test_lj_nvt_johnson_eos_reference_grade():
    """The reference's own gate: N=1000, 0.3% band
    (hpmc/validation/lj_spheres.py:13-15,30) — bounds f32 accumulation
    error at the reference tolerance.  Run with -m validation."""
    u_full, u_trunc, tail, U_ref = _johnson_eos(
        n=10, melt_steps=4000, equil_steps=6000, n_samples=160)
    assert abs(u_full - U_ref) / abs(U_ref) < 0.003, \
        (u_full, u_trunc, tail)


@pytest.mark.slow
def test_hard_sphere_sdf_pressure_carnahan_starling():
    phi = 0.20
    d = 1.0
    rho = phi * 6.0 / np.pi
    a = (1.0 / rho) ** (1.0 / 3.0)
    n = 7                                # 343 spheres
    hoomd.context.initialize("--notice-level=0")
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=a), n=n)
    system = hoomd.context.current.system
    mc = hpmc.integrate.sphere(seed=17, d=0.22, nselect=2)
    mc.shape_param.set('A', diameter=d)
    hoomd.run(300, quiet=True)           # decorrelate from the lattice
    sdf = hpmc.analyze.sdf(mc, filename=None, xmax=0.02, dx=1e-3,
                           navg=1, period=10)
    hoomd.run(1200, quiet=True)
    betaP = sdf.betaP()
    Z = betaP / rho
    Z_cs = (1 + phi + phi ** 2 - phi ** 3) / (1 - phi) ** 3
    assert abs(Z - Z_cs) / Z_cs < 0.08, (Z, Z_cs)
    assert mc.count_overlaps() == 0
