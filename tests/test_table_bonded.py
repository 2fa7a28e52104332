"""Tabulated angle/dihedral potentials (reference md/angle.py:374,
md/dihedral.py:293) and the constraint_ellipsoid updater (reference
md/update.py:142): the table versions of analytic potentials must
reproduce the analytic trajectories."""

import numpy as np
import pytest


def _chain_snapshot(hoomd, with_dihedrals=False):
    """One 4-bead bent chain in a roomy box."""
    snap = hoomd.data.make_snapshot(
        4, hoomd.data.boxdim(L=20.0), particle_types=['A'],
        bond_types=['b'], angle_types=['a'],
        dihedral_types=['d'] if with_dihedrals else [])
    snap.particles.position[:] = [
        [-1.5, 0.2, 0.0], [-0.5, -0.1, 0.1],
        [0.5, 0.15, -0.05], [1.5, 0.3, 0.4]]
    snap.particles.velocity[:] = np.random.RandomState(3).normal(
        0, 0.1, (4, 3))
    snap.bonds.resize(3)
    snap.bonds.group[:] = [[0, 1], [1, 2], [2, 3]]
    snap.angles.resize(2)
    snap.angles.group[:] = [[0, 1, 2], [1, 2, 3]]
    if with_dihedrals:
        snap.dihedrals.resize(1)
        snap.dihedrals.group[:] = [[0, 1, 2, 3]]
    return snap


def _run_chain(make_extra_force, with_dihedrals=False, steps=100):
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd.context.initialize('--notice-level=0')
    hoomd.init.read_snapshot(_chain_snapshot(hoomd, with_dihedrals))
    bond = md.bond.harmonic()
    bond.bond_coeff.set('b', k=100.0, r0=1.0)
    make_extra_force(md)
    md.integrate.mode_standard(dt=0.002)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(steps, quiet=True)
    system = hoomd.context.current.system
    snap = system.take_snapshot()
    return snap.particles.position.copy()


def test_angle_table_matches_harmonic():
    k, t0 = 25.0, np.pi * 0.6

    def analytic(md):
        a = md.angle.harmonic()
        a.angle_coeff.set('a', k=k, t0=t0)

    def tabulated(md):
        def f(theta, kappa, theta0):
            return (0.5 * kappa * (theta - theta0) ** 2,
                    -kappa * (theta - theta0))
        a = md.angle.table(width=2000)
        a.angle_coeff.set('a', func=f, coeff=dict(kappa=k, theta0=t0))

    p_ref = _run_chain(analytic)
    p_tab = _run_chain(tabulated)
    assert np.max(np.abs(p_ref - p_tab)) < 2e-3, (p_ref, p_tab)


def test_dihedral_table_matches_harmonic():
    k = 8.0

    def analytic(md):
        d = md.dihedral.harmonic()
        d.dihedral_coeff.set('d', k=k, d=-1.0, n=2.0)

    def tabulated(md):
        def f(phi, kappa):
            # V = k/2 [1 - cos(2 phi)], T = -dV/dphi = -k sin(2 phi)
            return (0.5 * kappa * (1.0 - np.cos(2.0 * phi)),
                    -kappa * np.sin(2.0 * phi))
        d = md.dihedral.table(width=4000)
        d.dihedral_coeff.set('d', func=f, coeff=dict(kappa=k))

    p_ref = _run_chain(analytic, with_dihedrals=True)
    p_tab = _run_chain(tabulated, with_dihedrals=True)
    assert np.max(np.abs(p_ref - p_tab)) < 2e-3, (p_ref, p_tab)


def test_angle_table_set_from_file(tmp_path):
    k, t0 = 25.0, np.pi * 0.6
    width = 2000
    th = np.linspace(0.0, np.pi, width)
    fn = tmp_path / 'angle.dat'
    with open(fn, 'w') as fh:
        fh.write('# theta V T\n')
        for x, v, t in zip(th, 0.5 * k * (th - t0) ** 2,
                           -k * (th - t0)):
            fh.write(f'{x:.10f} {v:.10f} {t:.10f}\n')

    def analytic(md):
        a = md.angle.harmonic()
        a.angle_coeff.set('a', k=k, t0=t0)

    def from_file(md):
        a = md.angle.table(width=width)
        a.set_from_file('a', str(fn))

    p_ref = _run_chain(analytic)
    p_tab = _run_chain(from_file)
    assert np.max(np.abs(p_ref - p_tab)) < 5e-3


def test_constraint_ellipsoid_updater():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd.context.initialize('--notice-level=0')
    snap = hoomd.data.make_snapshot(
        16, hoomd.data.boxdim(L=30.0), particle_types=['A'])
    rng = np.random.RandomState(5)
    snap.particles.position[:] = rng.normal(0, 2.0, (16, 3))
    snap.particles.velocity[:] = rng.normal(0, 0.3, (16, 3))
    hoomd.init.read_snapshot(snap)
    md.integrate.mode_standard(dt=0.002)
    md.integrate.nve(group=hoomd.group.all())
    from hoomd_tpu.md import update as md_update
    md_update.constraint_ellipsoid(group=hoomd.group.all(),
                                   rx=4.0, ry=3.0, rz=2.0, period=1)
    hoomd.run(50, quiet=True)
    system = hoomd.context.current.system
    pos = system.take_snapshot().particles.position
    lhs = ((pos[:, 0] / 4.0) ** 2 + (pos[:, 1] / 3.0) ** 2
           + (pos[:, 2] / 2.0) ** 2)
    # particles move one integration step past the last projection,
    # so the residual is O(dt * v), not f32 epsilon
    assert np.max(np.abs(lhs - 1.0)) < 5e-3, lhs

    # sphere shorthand r= sets rx=ry=rz
    hoomd.context.initialize('--notice-level=0')
    hoomd.init.read_snapshot(snap)
    md.integrate.mode_standard(dt=0.002)
    md.integrate.nve(group=hoomd.group.all())
    md_update.constraint_ellipsoid(group=hoomd.group.all(), r=3.0)
    hoomd.run(10, quiet=True)
    system = hoomd.context.current.system
    pos = system.take_snapshot().particles.position
    r = np.linalg.norm(pos, axis=1)
    assert np.max(np.abs(r - 3.0)) < 5e-3 * 3.0
