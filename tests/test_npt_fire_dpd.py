"""NPT/NPH barostat, FIRE minimizer, DPD thermostat tests
(reference md/validation/npt_dimer_eos.py pattern, FIREEnergyMinimizer,
PotentialPairDPDThermo)."""

import numpy as np
import pytest


def lj_fluid(n=5, a=1.2, kT=1.0, seed=11):
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    rng = np.random.RandomState(seed)
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=a), n=n)
    sysd = hoomd.context.current.system
    snap = sysd.take_snapshot()
    v = rng.normal(0, np.sqrt(kT), (snap.particles.N, 3))
    v -= v.mean(axis=0)
    snap.particles.velocity[:] = v
    sysd.restore_snapshot(snap)
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=2.5, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    lj.set_params(mode='shift')
    return sysd


def test_npt_reaches_target_pressure():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    system = lj_fluid(a=1.2, kT=1.5)
    md.integrate.mode_standard(dt=0.004)
    md.integrate.npt(group=hoomd.group.all(), kT=1.5, tau=0.5, P=2.0,
                     tauP=1.0)
    hoomd.run(3000, quiet=True)
    ps, ts, vols = [], [], []
    for _ in range(30):
        hoomd.run(100, quiet=True)
        q = system.thermo_quantities()
        ps.append(q['pressure'])
        ts.append(q['temperature'])
        vols.append(q['volume'])
    assert np.mean(ps) == pytest.approx(2.0, rel=0.15)
    assert np.mean(ts) == pytest.approx(1.5, rel=0.1)
    # box actually moved from its initial volume
    assert abs(np.mean(vols) - 216.0) / 216.0 > 0.02


def test_npt_isotropic_coupling_keeps_cubic():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    system = lj_fluid(a=1.2, kT=1.0)
    md.integrate.mode_standard(dt=0.004)
    md.integrate.npt(group=hoomd.group.all(), kT=1.0, tau=0.5, P=1.0,
                     tauP=1.0, couple='xyz')
    hoomd.run(500, quiet=True)
    L = np.asarray(system.state.box.L)
    assert L[0] == pytest.approx(L[1], rel=1e-5)
    assert L[1] == pytest.approx(L[2], rel=1e-5)


def test_nph_conserves_no_thermostat():
    """NPH: pressure control without temperature control."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    system = lj_fluid(a=1.2, kT=1.0)
    md.integrate.mode_standard(dt=0.002)
    md.integrate.nph(group=hoomd.group.all(), P=1.0, tauP=1.0)
    hoomd.run(2000, quiet=True)
    ps = []
    for _ in range(20):
        hoomd.run(50, quiet=True)
        ps.append(system.thermo_quantities()['pressure'])
    assert np.mean(ps) == pytest.approx(1.0, abs=0.4)


def test_fire_minimizes_energy():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    # jittered lattice has PE above the lattice minimum; FIRE must descend
    rng = np.random.RandomState(3)
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=1.2), n=4)
    system = hoomd.context.current.system
    snap = system.take_snapshot()
    snap.particles.position[:] += rng.uniform(-0.15, 0.15,
                                              snap.particles.position.shape)
    system.restore_snapshot(snap)
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=2.5, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    lj.set_params(mode='shift')
    fire = md.integrate.mode_minimize_fire(dt=0.05, ftol=1e-2, Etol=1e-10)
    md.integrate.nve(group=hoomd.group.all())
    e0 = system.thermo_quantities()['potential_energy']
    hoomd.run(1000, quiet=True)
    e1 = system.thermo_quantities()['potential_energy']
    assert e1 < e0 - 1.0
    # forces near zero at the minimum
    f = np.asarray(system.state.net_force)
    assert np.abs(f).max() < 0.5
    assert fire.has_converged()


def test_dpd_thermostat_temperature():
    """DPD fluid equilibrates to kT without an external thermostat
    (reference dpd validation behavior)."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    # DPD fluid at the standard rho=3 state point
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=0.7), n=6)
    system = hoomd.context.current.system
    nl = md.nlist.cell()
    d = md.pair.dpd(r_cut=1.0, nlist=nl, kT=1.0, seed=5)
    d.pair_coeff.set('A', 'A', A=25.0, gamma=4.5)
    md.integrate.mode_standard(dt=0.01)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1000, quiet=True)
    temps = []
    for _ in range(20):
        hoomd.run(50, quiet=True)
        temps.append(system.thermo_quantities()['temperature'])
    assert np.mean(temps) == pytest.approx(1.0, rel=0.1)


def test_dpd_momentum_conservation():
    """DPD forces are pairwise antisymmetric: total momentum conserved
    (the property distinguishing DPD from Langevin)."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=0.7), n=5)
    system = hoomd.context.current.system
    nl = md.nlist.cell()
    d = md.pair.dpd(r_cut=1.0, nlist=nl, kT=1.0, seed=5)
    d.pair_coeff.set('A', 'A', A=25.0, gamma=4.5)
    md.integrate.mode_standard(dt=0.01)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(500, quiet=True)
    assert system.thermo_quantities()['momentum'] < 1e-2


def test_npt_triclinic_tilt():
    """NPT with shear DOF (xy/xz/yz): pressure reaches the setpoint, the
    tilt degrees of freedom move and stay bounded, and the mean
    off-diagonal stress is ~0."""
    import numpy as np
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd.context.initialize("--notice-level=0")
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=1.1), n=5)
    system = hoomd.context.current.system
    rng = np.random.RandomState(3)
    snap = system.take_snapshot()
    v = rng.normal(0, 1.0, (snap.particles.N, 3))
    v -= v.mean(axis=0)
    snap.particles.velocity[:] = v
    system.restore_snapshot(snap)
    nl = md.nlist.cell(r_buff=0.5)
    lj = md.pair.lj(r_cut=2.5, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    lj.set_params(mode='shift')
    md.integrate.mode_standard(dt=0.004)
    md.integrate.npt(group=hoomd.group.all(), kT=1.0, tau=0.5, P=2.0,
                     tauP=1.0, couple='none', xy=True, xz=True, yz=True)
    hoomd.run(500, quiet=True)
    Ps, tilts, Poffs = [], [], []
    for _ in range(20):
        hoomd.run(25, quiet=True)
        q = system.thermo_quantities()
        Ps.append(q['pressure'])
        tilts.append(np.asarray(system.state.box.tilt).copy())
        Poffs.append([q['pressure_xy'], q['pressure_xz'],
                      q['pressure_yz']])
    assert np.mean(Ps) == pytest.approx(2.0, rel=0.25)
    tilts = np.asarray(tilts)
    assert np.abs(tilts).max() < 0.5            # bounded
    assert np.abs(tilts).max() > 1e-6           # actually moving
    assert np.abs(np.mean(Poffs, axis=0)).max() < 0.6
    q = system.thermo_quantities()
    assert q['temperature'] == pytest.approx(1.0, rel=0.25)
