"""Integrator physics tests (reference md/test/test_nve_integrator.cc and
validation-style checks)."""

import numpy as np
import pytest


def lj_fluid(n=5, a=1.7, kT=1.0, seed=4):
    """Small LJ fluid initialized on an sc lattice with thermal velocities."""
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


def total_energy(system):
    q = system.thermo_quantities()
    return q['kinetic_energy'] + q['potential_energy']


def test_nve_energy_conservation():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    system = lj_fluid()
    md.integrate.mode_standard(dt=0.005)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(10, quiet=True)  # settle transients
    e0 = total_energy(system)
    hoomd.run(500, quiet=True)
    e1 = total_energy(system)
    n = system.state.N
    assert abs(e1 - e0) / n < 5e-4, f"drift {(e1 - e0) / n} per particle"


def test_nve_momentum_conservation():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    system = lj_fluid()
    md.integrate.mode_standard(dt=0.005)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(300, quiet=True)
    assert system.thermo_quantities()['momentum'] < 1e-2


def test_langevin_thermalizes():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    system = lj_fluid(kT=0.01)  # cold start
    md.integrate.mode_standard(dt=0.005)
    md.integrate.langevin(group=hoomd.group.all(), kT=1.2, seed=7)
    hoomd.run(2000, quiet=True)
    temps = []
    for _ in range(20):
        hoomd.run(50, quiet=True)
        temps.append(system.thermo_quantities()['temperature'])
    assert np.mean(temps) == pytest.approx(1.2, rel=0.1)


def test_nvt_mtk_thermalizes():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    system = lj_fluid(kT=0.8)
    md.integrate.mode_standard(dt=0.005)
    md.integrate.nvt(group=hoomd.group.all(), kT=1.0, tau=0.5)
    hoomd.run(2000, quiet=True)
    temps = []
    for _ in range(30):
        hoomd.run(50, quiet=True)
        temps.append(system.thermo_quantities()['temperature'])
    assert np.mean(temps) == pytest.approx(1.0, rel=0.08)


def test_brownian_temperature():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    system = lj_fluid(kT=0.01)
    md.integrate.mode_standard(dt=0.001)
    md.integrate.brownian(group=hoomd.group.all(), kT=0.9, seed=11)
    hoomd.run(200, quiet=True)
    temps = []
    for _ in range(20):
        hoomd.run(20, quiet=True)
        temps.append(system.thermo_quantities()['temperature'])
    assert np.mean(temps) == pytest.approx(0.9, rel=0.1)


def test_berendsen_approaches_target():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    system = lj_fluid(kT=0.2)
    md.integrate.mode_standard(dt=0.005)
    md.integrate.berendsen(group=hoomd.group.all(), kT=1.0, tau=0.5)
    hoomd.run(3000, quiet=True)
    T = system.thermo_quantities()['temperature']
    assert T == pytest.approx(1.0, rel=0.15)


def test_group_restricted_integration():
    """Only the integrated group moves."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    snap_sys = lj_fluid()
    import hoomd_tpu.group as grp
    n = snap_sys.state.N
    half = grp.tags(0, n // 2 - 1)
    md.integrate.mode_standard(dt=0.005)
    md.integrate.langevin(group=half, kT=1.0, seed=3)
    snap0 = snap_sys.take_snapshot()
    hoomd.run(50, quiet=True)
    snap1 = snap_sys.take_snapshot()
    moved = np.abs(snap1.particles.position
                   - snap0.particles.position).sum(axis=1)
    assert (moved[:n // 2] > 0).any()
    np.testing.assert_allclose(snap1.particles.position[n // 2:],
                               snap0.particles.position[n // 2:],
                               atol=1e-6)


def test_variant_kT():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    system = lj_fluid(kT=0.5)
    md.integrate.mode_standard(dt=0.005)
    ramp = hoomd.variant.linear_interp([(0, 0.5), (4000, 2.0)], zero=0)
    md.integrate.langevin(group=hoomd.group.all(), kT=ramp, seed=5)
    hoomd.run(4000, quiet=True)
    temps = []
    for _ in range(10):
        hoomd.run(50, quiet=True)
        temps.append(system.thermo_quantities()['temperature'])
    assert np.mean(temps) == pytest.approx(2.0, rel=0.15)


def test_determinism():
    """Same seed + same script => identical trajectories
    (reference md/test-py/test_deterministic.py)."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md

    def trajectory():
        hoomd.context.initialize('--notice-level=0')
        lj_fluid()
        md.integrate.mode_standard(dt=0.005)
        md.integrate.langevin(group=hoomd.group.all(), kT=1.0, seed=91)
        hoomd.run(100, quiet=True)
        snap = hoomd.context.current.system.take_snapshot()
        return snap.particles.position.copy()

    p1 = trajectory()
    p2 = trajectory()
    np.testing.assert_array_equal(p1, p2)
